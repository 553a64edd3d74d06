package graft.operators

import graft.SparkSpec

/** DiversifiedTopDocsCollector parity: the streaming per-key-queue collector
  * converges to "per-key top maxPerKey, then global top k" — asserted here
  * against a brute-force Scala model with the HitQueue tie rule. */
class DiversifiedTopKSpec extends SparkSpec {

  // deterministic pseudo-random corpus with plenty of key and score ties
  private val rows: Seq[(Long, Long, Float)] =
    (1L to 600L).map(i => (i, i * 7919 % 23, (i * 104729 % 50).toFloat))

  private def brute(k: Int, maxPerKey: Int): Seq[(Long, Long, Float)] = {
    val ord = Ordering.by[(Long, Long, Float), (Float, Long)] { case (id, _, s) => (-s, id) }
    rows.groupBy(_._2).values
      .flatMap(g => g.sorted(ord).take(maxPerKey))
      .toSeq.sorted(ord).take(k)
  }

  private def run(k: Int, maxPerKey: Int): Seq[(Long, Long, Float)] = {
    import spark.implicits._
    val df = rows.toDF("id", "key", "score")
    Relational.diversifiedTopK(df, "id", "key", "score", k, maxPerKey)
      .as[(Long, Long, Float)].collect().toSeq
  }

  test("matches per-key-cap + global-top-k brute force") {
    for ((k, cap) <- Seq((40, 2), (100, 3), (10, 1), (600, 5))) {
      val got = run(k, cap)
      val want = brute(k, cap)
      assert(got == want, s"k=$k cap=$cap\ngot=${got.take(8)}\nwant=${want.take(8)}")
      // cap actually binds
      assert(got.groupBy(_._2).values.forall(_.size <= cap))
    }
  }

  test("maxPerKey=1 degenerates to collapse heads") {
    val got = run(1000, 1)
    assert(got.map(_._2).distinct.size == got.size)
    assert(got == brute(1000, 1))
  }
}
