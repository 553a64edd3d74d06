package graft.sources

import graft.SparkSpec
import java.sql.DriverManager

/** JDBC source exercised against an in-process embedded Derby database
  * (on the Spark classpath): whole-table read, subquery read, partitioned
  * parallel read, and filter/column pushdown. */
class JdbcSourceSpec extends SparkSpec {

  private lazy val url: String = {
    val dbDir = java.nio.file.Files.createTempDirectory("graft-derby").resolve("db")
    val u = s"jdbc:derby:$dbDir;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.executeUpdate("CREATE TABLE docs (id BIGINT PRIMARY KEY, lang VARCHAR(8), score DOUBLE)")
    val ins = conn.prepareStatement("INSERT INTO docs VALUES (?, ?, ?)")
    (0 until 100).foreach { i =>
      ins.setLong(1, i.toLong)
      ins.setString(2, if (i % 2 == 0) "en" else "de")
      ins.setDouble(3, i * 0.5)
      ins.executeUpdate()
    }
    ins.close(); st.close(); conn.close()
    u
  }

  test("whole-table read round-trips rows") {
    val df = Jdbc.readTable(spark, url, "docs")
    assert(df.count() === 100)
    val row = df.filter(org.apache.spark.sql.functions.col("ID") === 7).head()
    assert(row.getString(1) === "de")
    assert(row.getDouble(2) === 3.5)
  }

  test("subquery read + aggregation") {
    val df = Jdbc.readTable(spark, url, "(SELECT lang, count(*) AS n FROM docs GROUP BY lang) t")
    val m = df.collect().map(r => r.getString(0) -> r.getAs[Number](1).longValue()).toMap
    assert(m === Map("en" -> 50L, "de" -> 50L))
  }

  test("partitioned parallel read covers all rows exactly once; filter pushes down") {
    val df = Jdbc.readPartitioned(spark, url, "docs", "id", 0L, 99L, numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 100)
    assert(df.select("ID").collect().map(_.getLong(0)).sorted.toSeq === (0L until 100L))
    val filtered = df.filter(org.apache.spark.sql.functions.col("SCORE") > 40.0)
    assert(filtered.count() === 19)
    // the JDBC relation reports the pushed filter in its plan
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("Filter"), plan.take(500))
  }
}
