package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Solr analytics contrib re-expressed Spark-first.
  *
  * The reference module (`solr/contrib/analytics/src/java/org/apache/solr/analytics/`)
  * evaluates *analytics requests*: named expressions built from mapping
  * functions (`function/mapping/` — per-row, multi-value aware) and
  * reduction functions (`function/reduction/` — count/docCount/missing/
  * unique/sum/mean/min/max plus the sorted-list order statistics median/
  * percentile/ordinal), optionally grouped by facets (`facet/ValueFacet.java`,
  * `RangeFacet.java`, `PivotFacet.java`, `QueryFacet.java`).
  *
  * Spark-first mapping:
  *   - mapping functions are plain `Column` combinators (codegen'd; no UDFs);
  *     only those whose reference semantics differ from a Spark builtin get a
  *     named wrapper here — the rest (add/mult/div/pow/log/neg/abs/date math)
  *     ARE `org.apache.spark.sql.functions`.
  *   - simple reductions are native aggregate Columns (map-side partials for
  *     free), see [[countValues]]/[[docCount]]/[[missingCount]]/[[uniqueCount]].
  *   - order statistics go through ONE rank shuffle per distinct value
  *     expression ([[orderStats]]), mirroring how the reference shares one
  *     `SortedListCollector` across median/percentile/ordinal reductions over
  *     the same expression (`reduction/data/SortedListCollector.java:43-45`) —
  *     but distributed: `row_number` over (group, value), never an in-memory
  *     per-group sorted list, so a 100 TB group cannot OOM a task.
  */
object Analytics {

  // ------------------------------------------------------------------
  // Mapping functions (function/mapping/*.java) whose semantics are not
  // a 1:1 Spark builtin. Reference: FillMissingFunction, ExistsFunction,
  // RemoveFunction, FilterFunction, IfFunction, ReplaceFunction,
  // TopFunction/BottomFunction, ConcatFunction.
  // ------------------------------------------------------------------

  /** `fill_missing(a,b)` — a, unless a is missing, then b. */
  def fillMissing(a: Column, b: Column): Column = coalesce(a, b)

  /** `exists(a)` — whether the (possibly mapped) value exists for the doc. */
  def existsF(a: Column): Column = a.isNotNull

  /** `remove(a,v)` — a with occurrences of v removed (missing if equal). */
  def removeF(a: Column, v: Column): Column =
    when(a <=> v, lit(null)).otherwise(a)

  /** Multi-valued `remove`: drop every element equal to v. */
  def removeArr(arr: Column, v: Column): Column = array_remove(arr, v)

  /** `filter(a,cond)` — a where cond holds, missing otherwise. */
  def filterF(a: Column, cond: Column): Column = when(cond, a)

  /** `if(cond,t,f)` — reference IfFunction (missing cond → missing result,
    * IfFunction.java:196-207; `otherwise` would wrongly take the else arm). */
  def ifF(cond: Column, t: Column, f: Column): Column = when(cond, t).when(!cond, f)

  /** `replace(a,target,repl)` — a with target values replaced by repl. */
  def replaceF(a: Column, target: Column, repl: Column): Column =
    when(a <=> target, repl).otherwise(a)

  /** `top(a,b,...)` / `bottom(a,b,...)` — per-row extrema of several values. */
  def topF(cs: Column*): Column = greatest(cs: _*)
  def bottomF(cs: Column*): Column = least(cs: _*)

  /** `top(multivalued)` / `bottom(multivalued)` — per-row array extrema. */
  def topArr(arr: Column): Column = array_max(arr)
  def bottomArr(arr: Column): Column = array_min(arr)

  /** `concat(...)` — missing operand → missing result (reference concat). */
  def concatF(cs: Column*): Column = concat(cs: _*)

  /** `concat_sep(sep, ...)` — separated concat skips missing values. */
  def concatSep(sep: String, cs: Column*): Column = concat_ws(sep, cs: _*)

  // ------------------------------------------------------------------
  // Simple reductions (function/reduction/*.java)
  // ------------------------------------------------------------------

  /** `count(expr)` — number of VALUES (multi-valued docs count each value). */
  def countValues(c: Column): Column = count(c)

  /** Multi-valued `count` without exploding: sum of per-row cardinalities. */
  def countArrValues(arr: Column): Column =
    sum(coalesce(size(arr), lit(0)))

  /** `doc_count(expr)` — number of docs with at least one value. */
  def docCount(c: Column): Column = count(when(c.isNotNull, lit(1)))

  /** `missing(expr)` — number of docs with no value. */
  def missingCount(c: Column): Column = count(when(c.isNull, lit(1)))

  /** `unique(expr)` — exact distinct value count. */
  def uniqueCount(c: Column): Column = countDistinct(c)

  /** `mean(expr)` — sum/count over values. */
  def meanF(c: Column): Column = avg(c)

  // ------------------------------------------------------------------
  // Order statistics (median / percentile / ordinal)
  // ------------------------------------------------------------------

  sealed trait OrdKind
  /** `percentile(p, expr)`, p in [0,1): sorted index = round(p*size - .5)
    * (`PercentileFunction.java:107`), which for p < 1 equals floor(p*size). */
  final case class Pct(p: Double) extends OrdKind {
    require(p >= 0 && p < 1, s"percentile must be in [0,1): $p")
  }
  /** `ordinal(k, expr)`: k >= 1 → k-th smallest, k <= -1 → |k|-th largest;
    * 0 rejected (`OrdinalFunction.java:60-63`). */
  final case class Ord(k: Int) extends OrdKind {
    require(k != 0, "ordinal 0 is not accepted")
  }
  /** `median(expr)` — odd size: middle value; even size: AVERAGE of the two
    * middle values as double (`MedianFunction.java:82-85`). Numeric only. */
  case object Med extends OrdKind

  /** One requested order statistic over a value expression. */
  final case class OrderStat(name: String, value: Column, kind: OrdKind)

  /** Exact grouped order statistics, reference `SortedListCollector`
    * semantics. One rank shuffle per DISTINCT value expression; stats on
    * the same expression share the pass (the reference shares one sorted
    * list the same way). A group smaller than a requested ordinal yields
    * null (reference: `exists == false`).
    */
  def orderStats(df: DataFrame, groupCols: Seq[String], stats: Seq[OrderStat]): DataFrame = {
    require(stats.nonEmpty, "no order statistics requested")
    require(groupCols.nonEmpty, "use a constant group column for ungrouped requests")
    val gcols = groupCols.map(col)
    // Column#toString is the canonical expression string — stable share key
    val frames = stats.groupBy(_.value.toString).values.map { ss =>
      val v      = ss.head.value
      val base   = df.select(gcols :+ v.as("__v"): _*).where(col("__v").isNotNull)
      val wOrd   = Window.partitionBy(gcols: _*).orderBy(col("__v"))
      val wAll   = Window.partitionBy(gcols: _*)
      val ranked = base.select(
        gcols ++ Seq(
          col("__v"),
          row_number().over(wOrd).as("__rn"),
          count(lit(1)).over(wAll).as("__n")): _*)
      val picks = ss.map { s =>
        s.kind match {
          case Med =>
            // 1-based middle ranks: odd n → both = (n+1)/2; even n → n/2, n/2+1
            val rLo = floor((col("__n") + 1) / 2)
            val rHi = floor(col("__n") / 2) + 1
            ((max(when(col("__rn") === rLo, col("__v"))).cast("double") +
              max(when(col("__rn") === rHi, col("__v"))).cast("double")) / 2)
              .as(s.name)
          case k =>
            val targetRank = k match {
              case Pct(p)           => floor(lit(p) * col("__n")) + 1
              case Ord(j) if j >= 1 => lit(j).cast("long")
              case Ord(j)           => col("__n") + j + 1
              case Med              => lit(0L) // unreachable
            }
            max(when(col("__rn") === targetRank, col("__v"))).as(s.name)
        }
      }
      ranked.groupBy(gcols: _*).agg(picks.head, picks.tail: _*)
    }.toSeq
    frames.reduce((a, b) => a.join(b, groupCols, "full_outer"))
  }

  /** A full analytics grouping: simple reductions in one hash aggregation,
    * order statistics via [[orderStats]], joined on the grouping. Groups
    * present in one side but not the other keep nulls for the absent
    * expressions (reference: per-expression `exists`). */
  def request(df: DataFrame, groupCols: Seq[String],
              simple: Seq[(String, Column)],
              order: Seq[OrderStat] = Nil): DataFrame = {
    require(groupCols.nonEmpty, "use a constant group column for ungrouped requests")
    val base =
      if (simple.isEmpty) null
      else df.groupBy(groupCols.map(col): _*)
             .agg(simple.head._2.as(simple.head._1),
                  simple.tail.map { case (n, c) => c.as(n) }: _*)
    if (order.isEmpty) base
    else if (base == null) orderStats(df, groupCols, order)
    else base.join(orderStats(df, groupCols, order), groupCols, "full_outer")
  }

  // ------------------------------------------------------------------
  // Facets
  // ------------------------------------------------------------------

  /** `ValueFacet` + `SortableFacet` (facet/ValueFacet.java, SortableFacet.java):
    * group by a field, sort buckets by a computed expression (desc) with the
    * facet value as tie-break, apply offset/limit. The rank window runs over
    * the AGGREGATED buckets (cardinality = distinct field values), not rows. */
  def valueFacet(df: DataFrame, field: String,
                 metrics: Seq[(String, Column)],
                 sortBy: String, limit: Int, offset: Int = 0): DataFrame = {
    val agg = df.groupBy(field).agg(
      metrics.head._2.as(metrics.head._1),
      metrics.tail.map { case (n, c) => c.as(n) }: _*)
    agg.withColumn("__r", row_number().over(Window.orderBy(desc(sortBy), col(field))))
      .where(col("__r") > offset && col("__r") <= offset + limit)
      .drop("__r")
  }

  /** `RangeFacet` (facet/RangeFacet.java:47-55 + the boundary loop in
    * util/FacetRangeGenerator.java:154-196): bucket boundaries are generated
    * driver-side exactly like the reference — the gap LIST is consumed in
    * order and the last gap repeats; `hardEnd` clips the final bucket at
    * `end`, otherwise the effective end extends past it to the gap edge.
    * include=lower ([lo,hi) per bucket — the reference default); `others` ⊆
    * {before, after, between}. Output rows: `bucket` (0-based; -1=before,
    * -2=after, -3=between), `lo`, `hi`, count + metrics. Bucket assignment is
    * a codegen'd when-chain over the (driver-bounded, human-facing) boundary
    * list — one narrow pass + one hash aggregation whose cardinality is the
    * bucket count. Additive metrics only for `between` (the reference
    * collects it in the same pass over the same docs). */
  def rangeFacet(df: DataFrame, v: Column,
                 start: Double, end: Double, gaps: Seq[Double],
                 hardEnd: Boolean = false,
                 others: Set[String] = Set.empty,
                 metrics: Seq[(String, Column)] = Nil): DataFrame = {
    require(gaps.nonEmpty && gaps.forall(_ > 0) && end >= start)
    // FacetRangeGenerator.getRanges: gaps consumed in order, last repeats
    val bounds = scala.collection.mutable.ArrayBuffer(start)
    var low = start; var effEnd = end; var gi = 0
    while (low < effEnd) {
      val gap = gaps(math.min(gi, gaps.size - 1)); gi += 1
      var high = low + gap
      if (effEnd < high) { if (hardEnd) high = effEnd else effEnd = high }
      require(high > low, s"range facet infinite loop at $low + $gap")
      bounds += high; low = high
    }
    val nb    = bounds.size - 1
    val nullB = lit(null).cast("int")
    var bucket =
      when(v.isNull, nullB)
        .when(v < start, if (others("before")) lit(-1) else nullB)
        .when(v >= bounds.last, if (others("after")) lit(-2) else nullB)
    for (b <- 0 until nb)
      bucket = bucket.when(v >= bounds(b) && v < bounds(b + 1), lit(b))
    val mcols = metrics.map { case (nm, c) => c.as(nm) }
    val agg = df.withColumn("__b", bucket).where(col("__b").isNotNull)
      .groupBy("__b")
      .agg(count(lit(1)).as("n"), mcols: _*)
    // between-row metric sums are rounded to 5 decimals: they add a
    // handful of already-aggregated doubles, and bare double addition is
    // partition-order-sensitive in its last ulp (the per-bucket metrics
    // themselves are whatever the caller's metric column produced)
    val withBetween =
      if (!others("between")) agg
      else agg.union(
        agg.where(col("__b") >= 0).groupBy(lit(-3).as("__b"))
           .agg(sum("n").as("n"),
             metrics.map { case (nm, _) => round(sum(nm), 5).as(nm) }: _*))
    val loArr = typedLit(bounds.init.toSeq)
    val hiArr = typedLit(bounds.tail.toSeq)
    withBetween.select(
      Seq(
        col("__b").as("bucket"),
        when(col("__b") >= 0, element_at(loArr, col("__b") + 1)).as("lo"),
        when(col("__b") >= 0, element_at(hiArr, col("__b") + 1)).as("hi"),
        col("n")) ++ metrics.map { case (nm, _) => col(nm) }: _*)
  }

  /** Two-level `PivotFacet` (facet/PivotFacet.java, PivotNode.java): top
    * `limit1` values of `f1` by count (value ASC tie-break), and for each
    * kept parent the top `limit2` child values of `f2`. Level-1 rows carry
    * a null `f2`. The rank windows run over aggregated buckets only; the
    * child pass is domain-restricted by a broadcast semi-join on the kept
    * parents, so the row-level work is one aggregation per level. */
  def pivotFacet2(df: DataFrame, f1: String, f2: String,
                  limit1: Int, limit2: Int,
                  metrics: Seq[(String, Column)] = Nil): DataFrame = {
    val mcols = metrics.map { case (nm, c) => c.as(nm) }
    val l1 = df.groupBy(f1).agg(count(lit(1)).as("n"), mcols: _*)
      .withColumn("__r", row_number().over(Window.orderBy(desc("n"), col(f1))))
      .where(col("__r") <= limit1).drop("__r")
    val l2 = df.join(broadcast(l1.select(f1)), Seq(f1))
      .groupBy(f1, f2).agg(count(lit(1)).as("n"), mcols: _*)
      .withColumn("__r", row_number().over(
        Window.partitionBy(f1).orderBy(desc("n"), col(f2))))
      .where(col("__r") <= limit2).drop("__r")
    val l1Cols = Seq(col(f1), lit(null).cast("string").as(f2), lit(1).as("level"), col("n")) ++
      metrics.map { case (nm, _) => col(nm) }
    val l2Cols = Seq(col(f1), col(f2), lit(2).as("level"), col("n")) ++
      metrics.map { case (nm, _) => col(nm) }
    l1.select(l1Cols: _*).union(l2.select(l2Cols: _*))
  }

  /** `QueryFacet` (facet/QueryFacet.java): named query domains, each with the
    * same reductions. ONE pass over the data — every metric becomes a
    * conditional aggregate (`agg(when(q, ...))`), then the single result row
    * is unpivoted to one row per query. Metrics must be expressible as
    * `aggFn(when(q, expr))` (count/sum/min/max/avg are). */
  def queryFacet(df: DataFrame, queries: Seq[(String, Column)],
                 metrics: Seq[(String, Column => Column)]): DataFrame = {
    require(queries.nonEmpty && metrics.nonEmpty)
    val cols = for {
      (qn, q)     <- queries
      (mn, mkAgg) <- metrics
    } yield mkAgg(q).as(s"${qn}__$mn")
    val one = df.agg(cols.head, cols.tail: _*)
    val stacked = queries.map { case (qn, _) =>
      one.select(
        lit(qn).as("facet") +:
          metrics.map { case (mn, _) => col(s"${qn}__$mn").as(mn) }: _*)
    }
    stacked.reduce(_ union _)
  }

  /** Java's Math.round semantics to 5 decimal digits — floor(x*1e5+0.5)/1e5
    * (half-up toward +inf, exactly RelatednessAgg.roundTo5Digits; DuckDB's
    * round() is half-away-from-zero, so the oracle SQL spells this same
    * floor form rather than using round()). */
  private def round5(c: Column): Column = floor(c * 1e5 + 0.5) / 1e5

  /** One scaled sigmoid term of the relatedness blend:
    * (x+offset) / (scale + |x+offset|). */
  private def sigmoidHelper(x: Column, offset: Double, scale: Double): Column =
    (x + offset) / (lit(scale) + abs(x + offset))

  /** The "relatedness" z-score → blended-sigmoid score of
    * solr/core/src/java/org/apache/solr/search/facet/RelatednessAgg.java:473
    * (computeRelatedness), as a set of derived Columns over per-bucket
    * counts. Inputs are the four counts of a bucket: fg_count (bucket ∩
    * foreground), fgSize (foreground set size), bg_count (bucket ∩
    * background), bgSize (background set size). */
  def relatednessScore(fgCount: Column, fgSize: Column,
                       bgCount: Column, bgSize: Column): Column = {
    val bgProb = bgCount.cast("double") / bgSize.cast("double")
    val num = fgCount.cast("double") - fgSize.cast("double") * bgProb
    val denom0 = sqrt(fgSize.cast("double") * bgProb * (lit(1.0) - bgProb))
    val denom = when(denom0 === 0.0, lit(1e-10)).otherwise(denom0)
    val z = num / denom
    round5(lit(0.2) * sigmoidHelper(z, -80, 50)
      + lit(0.2) * sigmoidHelper(z, -30, 30)
      + lit(0.2) * sigmoidHelper(z, 0, 30)
      + lit(0.2) * sigmoidHelper(z, 30, 30)
      + lit(0.2) * sigmoidHelper(z, 80, 50))
  }

  /**
   * RelatednessAgg (RelatednessAgg.java:56, the `relatedness($fg,$bg)`
   * JSON-facet aggregate): per-bucket foreground-vs-background semantic
   * significance. For each value of `bucketCol` the bucket's four counts
   * feed [[relatednessScore]]; `foreground_popularity` = fg_count/bg_size
   * (BACKGROUND size, intentionally — RelatednessAgg.java:356) and
   * `background_popularity` = bg_count/bg_size, both rounded to 5 digits.
   * With `minPop` > 0, buckets whose fg or bg popularity is below it get
   * relatedness = -Infinity so they sort last (RelatednessAgg.java:359-365).
   *
   * ONE pass over the table: per-bucket conditional counts with map-side
   * partial aggregation, set sizes re-derived as broadcast sums of the
   * bucket counts (no second input scan). Buckets = non-null values of
   * `bucketCol`; set sizes include null-bucket rows (the sets are
   * bucket-independent in the reference).
   */
  def relatedness(df: DataFrame, bucketCol: String, fgFilter: Column,
                  bgFilter: Column = lit(true), minPop: Double = 0.0): DataFrame = {
    val counts = df.groupBy(col(bucketCol)).agg(
      count(when(fgFilter && bgFilter, 1)).as("fg_count"),
      count(when(bgFilter, 1)).as("bg_count"))
    val sizes = counts.agg(sum("fg_count").as("__fgSize"), sum("bg_count").as("__bgSize"))
    val rel = relatednessScore(col("fg_count"), col("__fgSize"),
      col("bg_count"), col("__bgSize"))
    val fgPop = round5(col("fg_count").cast("double") / col("__bgSize"))
    val bgPop = round5(col("bg_count").cast("double") / col("__bgSize"))
    counts.crossJoin(broadcast(sizes))
      .filter(col(bucketCol).isNotNull)
      .withColumn("relatedness",
        if (minPop <= 0.0) rel
        else when(fgPop < minPop || bgPop < minPop, lit(Double.NegativeInfinity))
          .otherwise(rel))
      .withColumn("foreground_popularity", fgPop)
      .withColumn("background_popularity", bgPop)
      .drop("__fgSize", "__bgSize")
  }
}
