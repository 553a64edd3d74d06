package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.util.LongAccumulator

/**
 * Reverse search (the reference's monitor module, a.k.a. percolator /
 * Luwak): a registered set of queries is matched against a stream of
 * documents — "which saved alerts does this new document trigger?"
 * (`lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java:44-48`).
 *
 * The reference's core trick is the *presearcher*
 * (`TermFilteredPresearcher.java:65`): queries are themselves indexed by
 * extracted anchor terms, so each document only evaluates the queries whose
 * anchors it contains — never the whole registry. Anchor extraction follows
 * `QueryAnalyzer.java`/`QueryTree.java` semantics:
 *
 *  - disjunction (OR / single term): EVERY child term must be indexed (a doc
 *    can match through any one of them);
 *  - conjunction (AND / phrase): ONE child suffices — pick the highest-weight
 *    (longest, the reference's `TermWeightor.DEFAULT` length heuristic,
 *    `TermFilteredPresearcher.java:67-70`) so the candidate set stays small.
 *
 * Spark shape: the query registry is small relative to the document stream
 * (that IS the monitor model), so the anchor index is a broadcast hash map
 * and matching is ONE narrow typed pass over documents — zero shuffles, no
 * per-query jobs; throughput scales linearly with executors at any corpus
 * size. Verification of AND/phrase semantics runs per candidate against the
 * doc's local token-position map (the reference's CandidateMatcher step).
 */
object Monitor {

  /** A registered query (reference MonitorQuery.java: id + parsed query). */
  sealed trait MQuery extends Serializable {
    def id: String
    def terms: Seq[String]
  }
  /** Single term. */
  final case class TermQ(id: String, term: String) extends MQuery {
    def terms: Seq[String] = Seq(term)
  }
  /** All terms must be present (BooleanQuery MUST clauses). */
  final case class AndQ(id: String, terms: Seq[String]) extends MQuery
  /** Any term present (BooleanQuery SHOULD clauses). */
  final case class OrQ(id: String, terms: Seq[String]) extends MQuery
  /** Exact-position phrase. */
  final case class PhraseQ(id: String, terms: Seq[String]) extends MQuery

  /** Anchor terms to index a query under (presearcher extraction). */
  private def anchors(q: MQuery): Seq[String] = q match {
    case TermQ(_, t)    => Seq(t)
    case OrQ(_, ts)     => ts.distinct
    // conjunction: one representative term is enough; the reference weights
    // by term length (longer ~ rarer in natural text) — deterministic
    // tie-break on the term itself
    case AndQ(_, ts)    => Seq(ts.maxBy(t => (t.length, t)))
    case PhraseQ(_, ts) => Seq(ts.maxBy(t => (t.length, t)))
  }

  /**
   * Match every registered query against every document. Returns
   * (idCol, query_id) — one row per (document, matched query) pair.
   *
   * @param verifiedAcc optional accumulator counting candidate
   *        verifications — the presearcher-pruning evidence (compare with
   *        docs × queries for the exhaustive count).
   */
  def matches(docs: DataFrame, queries: Seq[MQuery], idCol: String = "doc_id",
              textCol: String = "text",
              verifiedAcc: Option[LongAccumulator] = None): DataFrame = {
    require(queries.map(_.id).distinct.size == queries.size,
      "duplicate query ids in the monitor registry")
    queries.foreach(q => require(q.terms.nonEmpty,
      s"monitor query '${q.id}' has no terms"))
    val spark = docs.sparkSession
    import spark.implicits._
    // anchor term -> query ordinals (the presearcher's query index)
    val anchorIndex: Map[String, Array[Int]] =
      queries.zipWithIndex
        .flatMap { case (q, i) => anchors(q).map(_ -> i) }
        .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).distinct.toArray }
    val bQueries = spark.sparkContext.broadcast(queries.toArray)
    val bAnchors = spark.sparkContext.broadcast(anchorIndex)
    val tokenRe = TextOps.TokenPattern

    val out = docs
      .select(org.apache.spark.sql.functions.col(idCol).cast("long"),
        org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.col(textCol),
            org.apache.spark.sql.functions.lit(""))))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val re = java.util.regex.Pattern.compile(tokenRe)
        val qs = bQueries.value
        val anchorIdx = bAnchors.value
        rows.flatMap { case (docId, text) =>
          // per-doc token -> ascending positions (local map, bounded by doc)
          val positions = new java.util.HashMap[String, java.util.ArrayList[Int]]()
          val m = re.matcher(text)
          var pos = 0
          while (m.find()) {
            positions.computeIfAbsent(m.group(), _ => new java.util.ArrayList[Int]())
              .add(pos)
            pos += 1
          }
          // presearch: candidate ordinals = union of anchor hits
          val cand = new java.util.TreeSet[Integer]()
          positions.keySet().forEach { t =>
            anchorIdx.get(t).foreach(_.foreach(i => cand.add(i): Unit))
          }
          verifiedAcc.foreach(_.add(cand.size().toLong))
          // verify candidates (CandidateMatcher step)
          val hits = Seq.newBuilder[(Long, String)]
          cand.forEach { i =>
            val q = qs(i)
            val ok = q match {
              case TermQ(_, _) | OrQ(_, _) => true // anchored by presence
              case AndQ(_, ts) => ts.forall(positions.containsKey)
              case PhraseQ(_, ts) =>
                ts.forall(positions.containsKey) && {
                  val first = positions.get(ts.head)
                  var found = false
                  var j = 0
                  while (!found && j < first.size()) {
                    val p0 = first.get(j)
                    found = ts.zipWithIndex.drop(1).forall { case (t, off) =>
                      positions.get(t).contains(p0 + off)
                    }
                    j += 1
                  }
                  found
                }
            }
            if (ok) hits += ((docId, q.id))
          }
          hits.result()
        }
      }
      .toDF(idCol, "query_id")
    out
  }

  /** Streaming percolation: the same broadcast-anchored matcher applied to a
    * micro-batch stream (the reference Monitor's match-as-documents-arrive
    * lifecycle) — `matches` is stateless per document, so it composes with
    * `readStream ... foreachBatch` unchanged. */
  def matchBatch(queries: Seq[MQuery], idCol: String = "doc_id",
                 textCol: String = "text")(batch: DataFrame): DataFrame =
    matches(batch, queries, idCol, textCol)

  /** Empty result frame (schema helper for sinks). */
  def emptyMatches(spark: org.apache.spark.sql.SparkSession,
                   idCol: String = "doc_id"): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField(idCol, LongType), StructField("query_id", StringType))))
}
