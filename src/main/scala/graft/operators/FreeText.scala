package graft.operators

import graft.analysis.AnalyzerChain
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Free-text (n-gram language-model) suggester — the Spark shape of the
 * reference's FreeTextSuggester (lucene/suggest/src/java/org/apache/lucene/
 * search/suggest/analyzing/FreeTextSuggester.java: an n-gram model over the
 * corpus, completions of the last partially-typed token scored by "stupid
 * backoff" — Brants et al. 2007 — with ALPHA = 0.4 per backed-off order).
 *
 * The model is ONE narrow analysis pass + one aggregation shuffle, shaped
 * like the index build itself: rows (ord, context, word, cnt) for every
 * n-gram order 1..maxOrder, where `context` is the space-joined preceding
 * ord-1 tokens. At 100 TB the model is a written, context-bucketed sidecar
 * table (vocab^n-bounded, far smaller than the corpus); suggest() reads
 * only the handful of rows matching its own contexts via predicate
 * pushdown on (ord, context).
 */
object FreeText {

  val DefaultAlpha = 0.4

  /** Build the n-gram model: (ord INT, context STRING, word STRING, cnt LONG).
    * N-grams never cross document boundaries (each doc re-tokenized alone,
    * exactly the reference's per-input-string n-gram stream). */
  def model(docs: DataFrame, textCol: String, maxOrder: Int = 3,
            analyzer: AnalyzerChain = AnalyzerChain.standard): DataFrame = {
    require(maxOrder >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(textCol).cast("string")).as[String]
      .flatMap { text =>
        val toks = analyzer.terms(text)
        (1 to maxOrder).iterator.flatMap { o =>
          toks.sliding(o).filter(_.size == o)
            .map(g => (o, g.dropRight(1).mkString(" "), g.last))
        }
      }
      .toDF("ord", "context", "word")
      .groupBy("ord", "context", "word").agg(count("*").as("cnt"))
  }

  /**
   * Suggest completions of the LAST query token given the preceding tokens
   * as context. Stupid-backoff scoring, highest usable order o_top =
   * min(maxOrder, #context + 1):
   *
   *   score_o(w) = alpha^(o_top - o) * count(context_o + w) / count(context_o)
   *
   * where context_o is the last o-1 context tokens, the denominator is the
   * model's own (o-1)-gram count (total token count for o = 1), and a word
   * seen at a higher order is never re-reported from a lower one (the
   * reference's seen-set dedup). Returns (word, ord, score) ranked by
   * (score DESC, word ASC) — one declarative plan, no driver-side counts.
   */
  def suggest(model: DataFrame, queryTokens: Seq[String], k: Int,
              maxOrder: Int = 3, alpha: Double = DefaultAlpha): DataFrame = {
    require(queryTokens.nonEmpty, "need at least the partial token")
    require(k > 0)
    val prefix = queryTokens.last
    val ctx = queryTokens.dropRight(1)
    val oTop = math.min(maxOrder, ctx.size + 1)

    def orderCand(o: Int): DataFrame = {
      val contextO = ctx.takeRight(o - 1).mkString(" ")
      var factor = 1.0
      var i = o
      while (i < oTop) { factor *= alpha; i += 1 } // same fp product both sides
      val cand = model
        .filter(col("ord") === o && col("context") === contextO &&
          col("word").startsWith(prefix))
        .select(col("word"), col("cnt"))
      val denom =
        if (o == 1)
          model.filter(col("ord") === 1).agg(sum("cnt").as("denom"))
        else {
          // the context's own (o-1)-gram count: context = all but the last
          // context word, word = the last context word
          val parts = ctx.takeRight(o - 1)
          model.filter(col("ord") === (o - 1) &&
              col("context") === parts.dropRight(1).mkString(" ") &&
              col("word") === parts.last)
            .agg(sum("cnt").as("denom"))
        }
      cand.crossJoin(broadcast(denom))
        .select(col("word"), lit(o).as("ord"),
          (lit(factor) * (col("cnt").cast("double") / col("denom").cast("double"))).as("score"))
    }

    val all = (oTop to 1 by -1).map(orderCand).reduce(_ unionByName _)
    val dedup = all.withColumn("rn",
      row_number().over(Window.partitionBy("word").orderBy(desc("ord"))))
      .filter(col("rn") === 1).drop("rn")
    dedup.orderBy(desc("score"), asc("word")).limit(k)
  }

  /** Analyze free text with `analyzer` and suggest over the result (the
    * convenience entry matching FreeTextSuggester.lookup(CharSequence)). */
  def lookup(model: DataFrame, text: String, k: Int, maxOrder: Int = 3,
             analyzer: AnalyzerChain = AnalyzerChain.standard,
             alpha: Double = DefaultAlpha): DataFrame = {
    val toks = analyzer.terms(text)
    require(toks.nonEmpty, "query analyzed to zero tokens")
    suggest(model, toks, k, maxOrder, alpha)
  }
}
