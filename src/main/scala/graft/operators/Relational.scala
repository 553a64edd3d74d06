package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The reference's relational dataflow surface (Solr streaming expressions,
 * solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/ — see
 * SURVEY.md §2.4) re-expressed as a Spark-first library. Each operator is a
 * thin, named combinator over DataFrames so Catalyst plans/optimizes the
 * whole pipeline (predicate pushdown, partial aggregation, broadcast joins,
 * AQE) — nothing here hand-schedules what the optimizer already does.
 *
 * Scale notes (100 TB design intent):
 *  - join operators leave strategy choice to Catalyst; [[hashJoin]] and
 *    [[fetch]] add an explicit broadcast hint for dimension-sized inputs so
 *    the big fact side never shuffles.
 *  - [[rollup]]/[[facet]]/[[stats]] are plain groupBy.agg → partial (map-side)
 *    + final aggregation, the distributed equivalent of Solr's two-phase
 *    facet refinement.
 *  - [[rank]] is orderBy(...).limit(k) → TakeOrderedAndProject: per-partition
 *    bounded heaps merged on the driver, never a global sort.
 */
object Relational {

  /**
   * Parent block join with child-score propagation (reference
   * lucene/join/src/java/org/apache/lucene/search/join/
   * ToParentBlockJoinQuery.java ScoreMode): parents with >= 1 matching
   * child, parent score = Max / Min / Avg / Total of the matching
   * children's `scoreCol` (None -> 0), plus the child match count. The
   * caller filters `children` to the matching set first (the child query);
   * the aggregation is map-side-combinable, so the shuffle carries one
   * partial per (partition, parent key).
   */
  def parentBlockJoin(parents: DataFrame, children: DataFrame,
                      parentKey: String, childKey: String,
                      scoreCol: String, scoreMode: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val scoreAgg = scoreMode.toLowerCase match {
      case "max"   => max(col(scoreCol))
      case "min"   => min(col(scoreCol))
      case "avg"   => avg(col(scoreCol))
      case "total" => sum(col(scoreCol))
      case "none"  => first(lit(0.0))
      case m => throw new IllegalArgumentException(
        s"scoreMode must be one of max/min/avg/total/none, got $m")
    }
    val ch = children.groupBy(col(childKey).as(parentKey))
      .agg(scoreAgg.cast("double").as("score"), count("*").as("n_matching_children"))
    parents.join(ch, Seq(parentKey))
  }

  /** ChildDocTransformer — Solr's `[child]` response transformer
    * (reference solr/core/src/java/org/apache/solr/response/transform/
    * ChildDocTransformerFactory.java:52-88): each matching parent carries
    * its first `limit` children (in child-id order, the reference's
    * segment docId order), optionally gated by a childFilter query. One
    * keyed window + one aggregation — children shuffle once on the parent
    * key; parents join on that same key, so a filtered parent set
    * broadcasts and the child table never moves twice. Children ride
    * along as an ordered id array plus the TOTAL matching-child count
    * (numFound, which ignores the limit like the reference). */
  def childDocTransformer(parents: DataFrame, children: DataFrame,
                          parentKey: String, childKey: String, childIdCol: String,
                          childFilter: Option[org.apache.spark.sql.Column] = None,
                          limit: Int = 10): DataFrame = {
    import org.apache.spark.sql.functions._
    val filtered = childFilter.fold(children)(children.filter)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(childKey)).orderBy(col(childIdCol).asc)
    val kept = filtered
      .withColumn("__rk", row_number().over(w))
      .groupBy(col(childKey).as(parentKey))
      .agg(
        sort_array(collect_list(when(col("__rk") <= limit, col(childIdCol))))
          .as("child_ids"),
        count("*").as("child_numfound"))
    parents.join(kept, Seq(parentKey), "left")
      .withColumn("child_ids", coalesce(col("child_ids"), array()))
      .withColumn("child_numfound", coalesce(col("child_numfound"), lit(0L)))
  }

  /** `[subquery]` response transformer (reference solr/core/src/java/org/
    * apache/solr/response/transform/SubQueryAugmenterFactory.java:46-88):
    * every result doc grows a named field holding the docs of a
    * parameterized sub-query — the canonical shape being
    * `foo.q={!terms f=<subField> v=$row.<rowField>}` with its own
    * `foo.sort`/`foo.rows`/`foo.fq`, i.e. SQL `JOIN ON emp.dept_id =
    * dept.id` per the reference's own docs.
    *
    * Spark-first: the per-result-doc sub-query loop collapses into ONE
    * equi-join. A multi-valued `rowField` (array column) explodes first —
    * the reference concatenates values into a terms query, which matches
    * any of them. Matches dedup per (parent, sub doc), rank under the
    * sub-query's sort, keep `rows`, and ride along as an ordered id array
    * plus the TOTAL match count (numFound ignores the limit, like the
    * reference's DocSlice). When `parents` is a top-k page it broadcasts,
    * so the sub table never shuffles; the only exchange is the bounded
    * matched set keyed by parent for the rank window. */
  def subqueryTransformer(parents: DataFrame, parentIdCol: String, rowField: String,
                          sub: DataFrame, subField: String, subIdCol: String,
                          sortBy: Seq[org.apache.spark.sql.Column], rows: Int = 10,
                          subFilter: Option[org.apache.spark.sql.Column] = None,
                          name: String = "subdocs"): DataFrame = {
    import org.apache.spark.sql.functions._
    val filtered = subFilter.fold(sub)(sub.filter)
    val isMulti = parents.schema(rowField).dataType
      .isInstanceOf[org.apache.spark.sql.types.ArrayType]
    val keyed =
      if (isMulti) parents.select(col(parentIdCol), explode(col(rowField)).as("__sq_k"))
      else parents.select(col(parentIdCol), col(rowField).as("__sq_k"))
    val matched = keyed
      .join(filtered.withColumn("__sq_k", col(subField)), Seq("__sq_k"))
      .select(col(parentIdCol), col(subIdCol))
      .distinct() // a sub doc matched via two parent values counts once
      .join(filtered, Seq(subIdCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(parentIdCol)).orderBy(sortBy: _*)
    val kept = matched
      .withColumn("__sq_rk", row_number().over(w))
      .groupBy(col(parentIdCol))
      .agg(
        transform(
          sort_array(collect_list(when(col("__sq_rk") <= rows,
            struct(col("__sq_rk").as("rk"), col(subIdCol).as("id"))))),
          x => x.getField("id")).as(s"${name}_ids"),
        count("*").as(s"${name}_numfound"))
    parents.join(kept, Seq(parentIdCol), "left")
      .withColumn(s"${name}_ids", coalesce(col(s"${name}_ids"), array()))
      .withColumn(s"${name}_numfound", coalesce(col(s"${name}_numfound"), lit(0L)))
  }

  /** ToChildBlockJoinQuery (reference lucene/join/src/java/org/apache/
    * lucene/search/join/ToChildBlockJoinQuery.java:37-47,
    * ToChildBlockJoinScorer.score :180-184): the mirror of
    * [[parentBlockJoin]] — a PARENT query's matches fan out to their
    * children, each child scoring exactly its parent's score. One
    * equi-join; when the scored parent frame is a top-k/filter result it
    * broadcasts and the child table never shuffles. */
  def toChildBlockJoin(parentsScored: DataFrame, children: DataFrame,
                       parentKey: String, childKey: String,
                       scoreCol: String = "score"): DataFrame =
    children.join(
      parentsScored.select(col(parentKey).as(childKey), col(scoreCol).as("parent_score")),
      Seq(childKey))

  /** innerJoin (InnerJoinStream.java:35) — sort-merge/hash equi-join. */
  def innerJoin(l: DataFrame, r: DataFrame, keys: Seq[String]): DataFrame =
    l.join(r, keys, "inner")

  /** leftOuterJoin (LeftOuterJoinStream.java:35). */
  def leftOuterJoin(l: DataFrame, r: DataFrame, keys: Seq[String]): DataFrame =
    l.join(r, keys, "left_outer")

  /** hashJoin (HashJoinStream.java:36-58) — build side broadcast, probe side
    * streams; Spark analogue = broadcast hash join of a dimension table. */
  def hashJoin(probe: DataFrame, build: DataFrame, keys: Seq[String]): DataFrame =
    probe.join(broadcast(build), keys, "inner")

  /** outerHashJoin (OuterHashJoinStream.java:41). */
  def outerHashJoin(probe: DataFrame, build: DataFrame, keys: Seq[String]): DataFrame =
    probe.join(broadcast(build), keys, "left_outer")

  /** intersect (IntersectStream.java:37-43) — semi-join: rows of A whose keys
    * appear in B, A's columns only. */
  def intersectOn(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.join(b, keys, "left_semi")

  /** complement (ComplementStream.java:37-43) — anti-join. */
  def complementOn(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.join(b, keys, "left_anti")

  /** fetch (FetchStream.java:47-55) — batched lookup-join enrichment of a
    * stream from a (small) collection: broadcast left-outer join. */
  def fetch(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left_outer")

  /** cartesianProduct (CartesianProductStream.java:47) — UNNEST of a
    * multivalued field into one tuple per value. */
  def cartesianProduct(df: DataFrame, arrayCol: Column, as: String): DataFrame =
    df.withColumn(as, explode(arrayCol))

  /** merge (MergeStream.java:35-41) — k-way ordered merge of sorted streams. */
  def mergeSorted(sortCols: Seq[Column], streams: DataFrame*): DataFrame =
    streams.reduce(_.unionByName(_)).orderBy(sortCols: _*)

  /** sort (SortStream.java:39-43). */
  def sortBy(df: DataFrame, cols: Column*): DataFrame = df.orderBy(cols: _*)

  /** top/rank (RankStream.java:42-48) — bounded top-N: per-partition heap +
    * driver merge (TakeOrderedAndProject). */
  def rank(df: DataFrame, n: Int, cols: Column*): DataFrame =
    df.orderBy(cols: _*).limit(n)

  /** unique (UniqueStream.java:41-46) — dedup on fields, keeping the first
    * row per key in `order`. Deterministic (unlike dropDuplicates). */
  def uniqueBy(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** distinct facade. */
  def distinctOn(df: DataFrame, cols: String*): DataFrame =
    df.select(cols.map(col): _*).distinct()

  /** reduce (ReducerStream.java:49-58) — one row per group with the grouped
    * values gathered (deterministically sorted). */
  def reduceGroups(df: DataFrame, keys: Seq[String], valueCol: Column, as: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(array_sort(collect_list(valueCol)).as(as))

  /** rollup / hashRollup (RollupStream.java:46, HashRollupStream.java:44) —
    * bucketed aggregation; Spark's hash-agg with partial+final phases covers
    * both the sorted-stream and hash variants. */
  def rollup(df: DataFrame, buckets: Seq[String], metrics: Column*): DataFrame =
    df.groupBy(buckets.map(col): _*).agg(metrics.head, metrics.tail: _*)

  /** facet with nested totals (FacetStream.java:56-62 + JSON facet nesting) —
    * CUBE produces every bucket combination plus grand totals in one pass. */
  def facetCube(df: DataFrame, buckets: Seq[String], metrics: Column*): DataFrame =
    df.cube(buckets.map(col): _*).agg(metrics.head, metrics.tail: _*)

  /** having (HavingStream.java:37-41). */
  def having(df: DataFrame, predicate: Column): DataFrame = df.filter(predicate)

  /** stats (StatsStream.java:53) — global, bucket-less aggregates. */
  def stats(df: DataFrame, metrics: Column*): DataFrame =
    df.agg(metrics.head, metrics.tail: _*)

  /** timeseries (TimeSeriesStream.java:57-113) — fixed-gap time buckets.
    * `gap` is a Spark window duration like "1 hour". */
  def timeseries(df: DataFrame, timeCol: Column, gap: String, metrics: Column*): DataFrame =
    df.groupBy(window(timeCol, gap)).agg(metrics.head, metrics.tail: _*)
      .select(col("window.start").as("bucket_start"), col("*")).drop("window")

  /** grouping (lucene/grouping two-pass GroupingSearch) — top-n rows per
    * group by an explicit order. */
  def topPerGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column], n: Int,
                  rankCol: String = "rn"): DataFrame = {
    require(!df.columns.contains(rankCol),
      s"input already has a '$rankCol' column — pass a different rankCol")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }

  /** significantTerms (SignificantTermsStream.java:59) — foreground vs
    * background over-representation of values of `termCol`.
    * Returns (term, fg, bg, score) with score = (fg/fgTotal)/(bg/bgTotal). */
  def significantTerms(fg: DataFrame, bg: DataFrame, termCol: String, minDf: Long = 1): DataFrame = {
    val f = fg.groupBy(termCol).agg(count("*").as("fg"))
    val b = bg.groupBy(termCol).agg(count("*").as("bg"))
    // totals derived lazily from the grouped frames (no extra input scans,
    // no eager jobs at plan-construction time)
    val fTot = f.agg(sum("fg").cast("double").as("__fgTot"))
    val bTot = b.agg(sum("bg").cast("double").as("__bgTot"))
    f.join(b, Seq(termCol), "inner")
      .crossJoin(broadcast(fTot)).crossJoin(broadcast(bTot))
      .filter(col("bg") >= minDf)
      .withColumn("score", (col("fg") / col("__fgTot")) / (col("bg") / col("__bgTot")))
      .drop("__fgTot", "__bgTot")
  }

  /** [[significantTerms]] for the common Solr case where the foreground IS
    * a subset of the background (fg = query matches, bg = whole
    * collection): ONE pass over the token table with conditional counts —
    * no second tokenization, no join. `fgFlag` marks foreground rows.
    * Result identical to significantTerms(tokens.filter(fgFlag), tokens)
    * (oracle-checked via q16). */
  def significantTermsSubset(tokens: DataFrame, fgFlag: Column, termCol: String,
                             minDf: Long = 1): DataFrame = {
    val counts = tokens.groupBy(termCol).agg(
      count(when(fgFlag, 1)).as("fg"), count("*").as("bg"))
    // totals over ALL terms (same as significantTerms: pre-minDf, and the
    // fg side naturally sums only foreground occurrences)
    val tot = counts.agg(sum("fg").cast("double").as("__fgTot"),
      sum("bg").cast("double").as("__bgTot"))
    counts.crossJoin(broadcast(tot))
      .filter(col("fg") > 0 && col("bg") >= minDf)
      .withColumn("score", (col("fg") / col("__fgTot")) / (col("bg") / col("__bgTot")))
      .drop("__fgTot", "__bgTot")
  }

  /** parallel (ParallelStream.java:42-48) — hash-repartition a sub-plan on
    * its keys; the Spark shuffle IS this operator. */
  def parallelOn(df: DataFrame, n: Int, keys: String*): DataFrame =
    df.repartition(n, keys.map(col): _*)

  /**
   * Salted two-phase aggregation for pathologically skewed group keys (the
   * north-star "salted repartitioning" pattern made explicit): phase 1
   * aggregates on (key, salt) — the hot key's rows spread over `salts`
   * reducers — phase 2 re-aggregates the per-salt partials by key.
   * Supported metrics are the decomposable ones (count/sum/min/max);
   * results are identical to the unsalted groupBy (oracle-checked).
   */
  def saltedRollup(df: DataFrame, keys: Seq[String], salts: Int,
                   sumCols: Seq[String] = Nil, countAs: Option[String] = None): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id()
      + monotonically_increasing_id(), lit(salts)))
    val phase1Aggs =
      sumCols.map(c => sum(col(c)).as(s"__sum_$c")) ++
        countAs.map(_ => count("*").as("__cnt")).toSeq
    val phase1 = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(phase1Aggs.head, phase1Aggs.tail: _*)
    val phase2Aggs =
      sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")) ++
        countAs.map(n => sum(col("__cnt")).as(n)).toSeq
    phase1.groupBy(keys.map(col): _*).agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }

  /**
   * gatherNodes (reference solr/solrj/src/java/org/apache/solr/client/
   * solrj/io/graph/GatherNodesStream.java): breadth-first frontier
   * expansion over an edge frame — `hops` rounds of frontier ⋈ edges with
   * the visited set subtracted, returning every reached node with its
   * FIRST-reach depth (seeds at depth 0).
   *
   * Scale shape (same iterative discipline as
   * [[graft.operators.Dedup.connectedComponents]]): each hop is one keyed
   * join + one anti-join; `localCheckpoint` truncates the iterative
   * lineage; the driver sees only an emptiness probe per hop. Frontiers
   * are node-id-only — no payload rides the loop.
   */
  def gatherNodes(edges: DataFrame, srcCol: String, dstCol: String,
                  seeds: Seq[Long], hops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast("long").as("__src"),
      col(dstCol).cast("long").as("__dst"))
    var visited = seeds.distinct.map(s => (s, 0)).toDF("node", "depth")
      .localCheckpoint(true)
    var frontier = visited.select("node")
    var h = 0
    while (h < hops && frontier.limit(1).count() > 0) {
      h += 1
      val next = e.join(frontier, e("__src") === col("node"))
        .select(col("__dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("depth", lit(h))
        .localCheckpoint(true)
      visited = visited.unionByName(next).localCheckpoint(true)
      frontier = next.select("node")
    }
    visited
  }

  /**
   * scoreNodes (reference solr/solrj/src/java/org/apache/solr/client/
   * solrj/io/stream/ScoreNodesStream.java:227-246 — tf-idf re-ranking of
   * gathered graph nodes): nodeScore = (ln(gatherCount) + 1) ·
   * (ln((numDocs+1)/(docFreq+1)) + 1), where gatherCount is how often the
   * traversal reached the node (`countCol` of `nodes`) and docFreq is the
   * node value's global frequency in the corpus column. High-degree hub
   * nodes get discounted exactly like common terms in tf-idf. The node
   * frame is traversal-sized and broadcasts into the docFreq aggregate.
   */
  def scoreNodes(nodes: DataFrame, nodeCol: String, countCol: String,
                 corpus: DataFrame, corpusNodeCol: String): DataFrame = {
    val stats = corpus.agg(count(lit(1)).as("__numDocs"))
    val dfs = corpus.groupBy(col(corpusNodeCol).as(nodeCol))
      .agg(count(lit(1)).as("docFreq"))
    broadcast(nodes).join(dfs, Seq(nodeCol), "left")
      .na.fill(0, Seq("docFreq"))
      .crossJoin(broadcast(stats))
      .withColumn("nodeScore",
        (log(col(countCol).cast("double")) + lit(1.0d)) *
          (log((col("__numDocs") + lit(1L)).cast("double") /
            (col("docFreq") + lit(1L)).cast("double")) + lit(1.0d)))
      .drop("__numDocs")
  }

  /**
   * random() streaming expression (reference solr/solrj io/stream/
   * RandomStream.java:196 — sort on a seeded pseudo-random field, take k).
   * The reference's random_<seed> sort is RNG-backed; distributed and
   * reproducibly, the same contract is a multiplicative hash of (id, seed)
   * — a deterministic shuffle of the id space, identical on any cluster
   * size — then a bounded TakeOrdered(k). Same primitive the stratified
   * sampler uses.
   */
  def randomSample(df: DataFrame, idCol: String, seed: Long, k: Int): DataFrame =
    df.withColumn("__r",
        pmod(col(idCol).cast("long") * 2654435761L + lit(seed), lit(1000003L)))
      .orderBy(col("__r").asc, col(idCol).asc)
      .limit(k)
      .drop("__r")

  /**
   * shortestPath (reference solr/solrj/src/java/org/apache/solr/client/
   * solrj/io/graph/ShortestPathStream.java): BFS from `from` toward `to`,
   * returning ALL shortest paths (as "a->b->c" strings, plus their depth)
   * within `maxDepth` hops; empty when unreachable. Nodes reached at an
   * earlier depth are pruned from later frontiers — sound for shortest
   * paths (a min-depth path visits every node at its first-reach depth) and
   * the reason frontier size stays bounded on dense graphs.
   */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
                    from: Long, to: Long, maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast("long").as("__src"),
      col(dstCol).cast("long").as("__dst"))
    val empty = Seq.empty[(String, Int)].toDF("path", "depth")
    if (from == to) return Seq((from.toString, 0)).toDF("path", "depth")
    // Search phase carries PARENT POINTERS, not paths: each level is the
    // (node, parent) edge set between consecutive BFS layers, so frontier
    // size is bounded by nodes+edges even when a dense graph has
    // exponentially many shortest paths (the old path-array frontier
    // fanned out by path multiplicity). Sound because in an unweighted
    // graph every prefix of a shortest path is itself shortest, so every
    // node on any shortest path is reached at its BFS depth.
    var frontier = Seq(from).toDF("node")
    var visited = frontier
    var depth = 0
    var levels: List[DataFrame] = Nil // head = (node, parent) at current depth
    var found = false
    var exhausted = false
    while (!found && !exhausted && depth < maxDepth) {
      depth += 1
      val step = e.join(frontier, e("__src") === col("node"))
        .select(col("__dst").as("node"), col("__src").as("parent"))
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint(true)
      levels ::= step
      if (step.filter(col("node") === to).limit(1).count() > 0) found = true
      else {
        val next = step.select("node").distinct().localCheckpoint(true)
        if (next.limit(1).count() == 0) exhausted = true
        else {
          frontier = next
          visited = visited.union(next).localCheckpoint(true)
        }
      }
    }
    if (!found) return empty
    // Reconstruction walks the per-depth parent tables backward from `to`;
    // only here do path rows multiply, and only to the output's own size.
    // Edge multiplicity is preserved (one row per parallel edge per step),
    // matching the previous per-edge path expansion.
    var paths = levels.head.filter(col("node") === to)
      .select(col("parent").as("cur"), array(col("parent"), col("node")).as("path"))
    for (level <- levels.tail) {
      paths = level.join(paths, level("node") === paths("cur"))
        .select(col("parent").as("cur"),
          concat(array(col("parent")), col("path")).as("path"))
        .localCheckpoint(true)
    }
    paths.filter(col("cur") === from)
      .select(array_join(col("path"), "->").as("path"),
        lit(depth).cast("int").as("depth"))
  }

  /**
   * Field collapse (reference solr/core/src/java/org/apache/solr/search/
   * CollapsingQParserPlugin.java: one representative document per collapse
   * key, chosen by max score — ties to the lowest doc id, matching the
   * collector's first-seen-docid behavior): returns the head row of each
   * `groupCol` group plus the group's size.
   *
   * Scale shape: a single partial-aggregated groupBy (`max_by` over a
   * comparable struct), NOT a window sort — map-side combine reduces each
   * group to one partial per partition before the exchange, so the shuffle
   * carries O(#groups x #partitions) rows regardless of corpus size.
   */
  def collapseOn(df: DataFrame, groupCol: String, orderCol: String,
                 idCol: String): DataFrame = {
    val pick = struct(col(orderCol), (-col(idCol)).as("__negid"))
    df.groupBy(groupCol)
      .agg(max_by(struct(df.columns.map(col): _*), pick).as("__head"),
        count("*").as("group_size"))
      .select(col("__head.*"), col("group_size"))
  }

  /**
   * Diversified top-k (reference lucene/misc/src/java/org/apache/lucene/
   * search/DiversifiedTopDocsCollector.java): global top `k` hits with at
   * most `maxPerKey` hits per grouping key. The reference's streaming
   * per-key queues converge to exactly "per-key top maxPerKey, then global
   * top k" — expressed here as the bounded-heap [[graft.functions.TopKAgg]]
   * per key (map-side partial aggregation: each partition reduces a key to
   * ≤ maxPerKey hits BEFORE the exchange, so the shuffle carries
   * O(#keys × #partitions × maxPerKey) rows however large the corpus is —
   * never a window sort of whole key groups), then one bounded
   * TakeOrderedAndProject for the global cut. Ties break (score DESC,
   * id ASC), the HitQueue rule.
   */
  def diversifiedTopK(df: DataFrame, idCol: String, keyCol: String,
                      scoreCol: String, k: Int, maxPerKey: Int): DataFrame = {
    df.groupBy(keyCol)
      .agg(graft.functions.TopKAgg.topHits(maxPerKey)(
        col(idCol).cast("long"), col(scoreCol).cast("float")))
      .select(col(keyCol), explode(col("top_hits")).as("__h"))
      .select(col("__h.docId").as(idCol), col(keyCol),
        col("__h.score").as(scoreCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Expand component (reference solr/core/src/java/org/apache/solr/handler/
   * component/ExpandComponent.java): for each collapsed group, the top-n
   * rows BEHIND the head, in head order — the "show more from this group"
   * companion of [[collapseOn]]. Window-ranked; n is facet-sized so the
   * per-group sort state is bounded.
   */
  def expandGroups(df: DataFrame, groupCol: String, order: Seq[Column],
                   n: Int): DataFrame = {
    require(!df.columns.contains("__rn"), "input already has a '__rn' column")
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1 && col("__rn") <= n + 1)
      .drop("__rn")
  }

  /**
   * Two-level pivot facet (reference solr/core/src/java/org/apache/solr/
   * handler/component/PivotFacetProcessor.java): counts of `colB` nested
   * under `colA`, each level keeping its top-n by (count DESC, value ASC) —
   * Solr's facet.pivot=A,B with facet.limit per level.
   *
   * One data pass: the (A, B) aggregation feeds both levels (level-1 counts
   * are re-aggregated from it, never a second scan); the level-1 winners are
   * facet.limit-sized, so the nested filter is a broadcast semi-join.
   */
  def facetPivot(df: DataFrame, colA: String, colB: String,
                 topA: Int, topBPerA: Int): DataFrame = {
    val ab = df.groupBy(colA, colB).agg(count("*").as("count_b"))
    val keepA = ab.groupBy(colA).agg(sum("count_b").as("count_a"))
      .orderBy(col("count_a").desc, col(colA).asc).limit(topA)
    topPerGroup(ab.join(broadcast(keepA), Seq(colA)),
        Seq(colA), Seq(col("count_b").desc, col(colB).asc), topBPerA)
      .drop("rn")
      .select(col(colA), col("count_a"), col(colB), col("count_b"))
  }

  /**
   * Query-time join with score aggregation (reference lucene/join
   * JoinUtil.createJoinQuery ScoreMode, join/ScoreMode.java: Max / Total /
   * Avg / Min): each TO-side row is scored by aggregating the FROM side's
   * scores sharing its join key. One partial-aggregated groupBy on the
   * FROM side collapses it to one row per key BEFORE the join, so the
   * join input is #keys-sized (usually broadcastable), never #docs-sized.
   */
  def scoreJoin(fromScored: DataFrame, to: DataFrame, fromKey: String,
                toKey: String, scoreCol: String, mode: String): DataFrame = {
    val agg = mode match {
      case "max"   => max(col(scoreCol))
      case "min"   => min(col(scoreCol))
      case "total" => sum(col(scoreCol))
      case "avg"   => avg(col(scoreCol))
      case m => throw new IllegalArgumentException(s"unknown ScoreMode $m")
    }
    val keyScores = fromScored.groupBy(fromKey)
      .agg(round(agg, 5).as("join_score"))
      .withColumnRenamed(fromKey, toKey)
    to.join(broadcast(keyScores), Seq(toKey))
  }

  /**
   * Child-document transformer (Solr [child] —
   * ChildDocTransformerFactory): each parent row returned with its
   * ordered child set nested as a CSV projection (the join-shaped
   * equivalent of Lucene block-join child retrieval). Children collapse
   * to one row per parent BEFORE the join (map-side combined), so the
   * join carries #parents rows, not #children.
   */
  def childTransform(parents: DataFrame, children: DataFrame,
                     parentKey: String, childKey: String,
                     childOrd: String): DataFrame = {
    val nested = children.groupBy(col(childKey).as(parentKey))
      .agg(count(lit(1)).as("n_children"),
        concat_ws(",", sort_array(collect_list(col(childOrd)))).as("children_csv"))
    parents.select(parentKey).join(nested, parentKey)
  }

  /**
   * Facet with a missing bucket (Solr facet.missing=true): per-value
   * counts plus one row counting docs whose facet field is NULL — the
   * reference emits it as an unlabeled trailing bucket; here the value
   * column is null on that row. One aggregation pass (null groups
   * naturally).
   */
  def facetWithMissing(df: DataFrame, field: String): DataFrame =
    df.groupBy(field).agg(count(lit(1)).as("cnt"))
      .orderBy(col(field).asc_nulls_last)

  /**
   * Sampled facet counts (reference lucene/facet
   * RandomSamplingFacetsCollector.java:93-143 — sample the hit set down to
   * `sampleSize`, facet the sample, amortize counts by 1/samplingRate
   * `:226-243`). The reference samples with a seeded XORShift over the
   * collector's doc order; a distributed scan has no stable doc order, so
   * the sample predicate here is the deterministic multiplicative id hash
   * ([[Pipeline.sampleBucket]]) — reproducible across cluster sizes and
   * re-runs, which the reference's sequential RNG cannot be. Sampling is a
   * narrow codegen filter BEFORE the facet aggregation's exchange: at
   * 100 TB only sampled (field) rows reach the shuffle.
   * Returns (field, sampled, amortized); totalHits <= sampleSize degrades
   * to exact counting (rate 1.0), like the reference.
   */
  def facetSampled(df: DataFrame, field: String, idCol: String,
                   sampleSize: Long): DataFrame = {
    val total = df.select(count(lit(1)).cast("double").as("__n"))
    df.crossJoin(broadcast(total))
      .withColumn("__rate", least(lit(1.0), lit(sampleSize.toDouble) / col("__n")))
      .filter(Pipeline.sampleBucket(col(idCol)) < col("__rate") * Pipeline.SampleModulus)
      .groupBy(field)
      .agg(count(lit(1)).as("sampled"), first(col("__rate")).as("__r"))
      .select(col(field), col("sampled"),
        round(col("sampled") / col("__r"), 5).as("amortized"))
  }

  /**
   * Interval facet (reference solr/core IntervalFacets.java —
   * facet.interval with explicit {!key=..}[lo,hi) sets): counts per
   * arbitrary, possibly OVERLAPPING [lo, hi) interval of a numeric field.
   * Hi = None means unbounded above.
   *
   * One pass, zero shuffles of row data: each interval is a conditional
   * SUM in a single global aggregate (partial map-side sums -> one tiny
   * final reduce), then the fixed-width result row unpivots driver-side
   * into (interval, cnt) rows. Overlap is free — a row feeds every
   * interval it lands in, which a groupBy-CASE could not express.
   */
  def intervalFacet(df: DataFrame, field: String,
                    intervals: Seq[(String, Double, Option[Double])]): DataFrame = {
    require(intervals.nonEmpty)
    val aggs = intervals.map { case (name, lo, hiOpt) =>
      val cond = hiOpt.fold(col(field) >= lo)(hi => col(field) >= lo && col(field) < hi)
      sum(when(cond, 1L).otherwise(0L)).as(name)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = intervals.map { case (name, _, _) => s"'$name', `$name`" }.mkString(", ")
    one.select(expr(s"stack(${intervals.size}, $stackArgs) AS (interval, cnt)"))
      .orderBy(asc("interval"))
  }

  /**
   * Hierarchical (taxonomy) facet counts — the reference facet module's
   * path dimensions (lucene/facet: FacetsConfig hierarchical dims,
   * TaxonomyFacetCounts): every row contributes one count to EACH prefix
   * of its path, so the whole taxonomy's counts come out of ONE pass.
   *
   * Plan shape: the prefix explode is a narrow projection (array ops in
   * codegen, no UDF); the count is a single map-side-combined aggregation
   * keyed on (path, level) — shuffle rows ≤ populated taxonomy nodes per
   * partition, independent of corpus size.
   *
   * @return (path, level, cnt) — level 1 = root dimension values.
   */
  def facetTaxonomy(df: DataFrame, pathCol: String, sep: String = "/"): DataFrame = {
    val parts = split(col(pathCol), java.util.regex.Pattern.quote(sep))
    df.select(explode(transform(sequence(lit(1), size(parts)),
        i => struct(i.cast("int").as("level"),
          array_join(slice(parts, lit(1), i), sep).as("path")))).as("pref"))
      .groupBy(col("pref.path").as("path"), col("pref.level").as("level"))
      .agg(count("*").as("cnt"))
      .orderBy(asc("level"), desc("cnt"), asc("path"))
  }

  /** Taxonomy drill-down (reference DrillDownQuery): counts of the children
    * one level below `prefix`. A pushable startsWith filter + one grouped
    * count — the narrow per-node navigation step. */
  def drillDown(df: DataFrame, pathCol: String, prefix: String,
                sep: String = "/"): DataFrame = {
    val depth = prefix.split(java.util.regex.Pattern.quote(sep)).length
    df.filter(col(pathCol).startsWith(prefix + sep))
      .select(split(col(pathCol), java.util.regex.Pattern.quote(sep))
        .getItem(depth).as("child"))
      .groupBy("child").agg(count("*").as("cnt"))
      .orderBy(desc("cnt"), asc("child"))
  }

  /** Grouped facets (reference lucene/grouping GroupFacetCollector /
    * Solr group.facet=true): facet counts tally DISTINCT GROUPS, not
    * docs — a facet value's count is the number of groups containing ≥1
    * doc with that value. One partial-aggregated countDistinct (Spark
    * plans it as two exchanges on narrow (facet, group) rows). */
  def groupedFacet(df: DataFrame, facetField: String, groupField: String): DataFrame =
    df.groupBy(col(facetField))
      .agg(countDistinct(col(groupField)).as("group_count"))
      .orderBy(desc("group_count"), asc(facetField))

  /** Range facet with the `other` buckets (reference solr facet.range +
    * facet.range.other=all, solr/core .../request/SimpleFacets
    * RangeFacetProcessor; lucene/facet LongRangeFacetCounts for the gap
    * buckets): fixed-`gap` buckets covering [start, end), PLUS the
    * before / after / between counters Solr always reports (zeros
    * included). Two aggregations over the single projected column — the
    * bucket groupBy and one global conditional-sum row; both map-side
    * combined, no row explosion.
    * @return (kind: range|before|after|between, bucket_start, cnt) */
  def rangeFacetWithOther(df: DataFrame, field: String,
                          start: Double, end: Double, gap: Double): DataFrame = {
    require(gap > 0 && end > start)
    val v = col(field).cast("double")
    val buckets = df.filter(v >= start && v < end)
      .select((lit(start) + floor((v - lit(start)) / lit(gap)).cast("double") * lit(gap))
        .as("bucket_start"))
      .groupBy("bucket_start").agg(count("*").as("cnt"))
      .select(lit("range").as("kind"), col("bucket_start"), col("cnt"))
    val others = df.agg(
        sum(when(v < start, 1L).otherwise(0L)).as("before"),
        sum(when(v >= end, 1L).otherwise(0L)).as("after"),
        sum(when(v >= start && v < end, 1L).otherwise(0L)).as("between"))
      .select(explode(array(
        struct(lit("before").as("kind"), lit(null).cast("double").as("bucket_start"),
          coalesce(col("before"), lit(0L)).as("cnt")),
        struct(lit("after").as("kind"), lit(null).cast("double").as("bucket_start"),
          coalesce(col("after"), lit(0L)).as("cnt")),
        struct(lit("between").as("kind"), lit(null).cast("double").as("bucket_start"),
          coalesce(col("between"), lit(0L)).as("cnt")))).as("x"))
      .select(col("x.kind").as("kind"), col("x.bucket_start").as("bucket_start"),
        col("x.cnt").as("cnt"))
    buckets.unionByName(others).orderBy(asc("kind"), asc("bucket_start"))
  }

  /** Association facets (reference lucene/facet taxonomy/
    * FloatAssociationFacetField.java + TaxonomyFacetSumFloatAssociations
    * .java:30-39): each doc carries a (category path, association value)
    * pair; the facet aggregates the SUM of association values per category
    * instead of a count. Same one-pass prefix explode as [[facetTaxonomy]]
    * — every hierarchy level in a single corpus scan, counts carried
    * alongside the sums. */
  def facetTaxonomySum(df: DataFrame, pathCol: String, valueCol: String,
                       sep: String = "/"): DataFrame = {
    val parts = split(col(pathCol), java.util.regex.Pattern.quote(sep))
    df.select(col(valueCol).cast("double").as("__v"),
        explode(transform(sequence(lit(1), size(parts)),
          i => struct(i.cast("int").as("level"),
            array_join(slice(parts, lit(1), i), sep).as("path")))).as("pref"))
      .groupBy(col("pref.path").as("path"), col("pref.level").as("level"))
      .agg(round(sum("__v"), 4).as("sum_assoc"), count("*").as("cnt"))
      .orderBy(asc("level"), desc("sum_assoc"), asc("path"))
  }

  /**
   * DrillSideways (reference lucene/facet/src/java/org/apache/lucene/facet/
   * DrillSideways.java:47-63, DrillSidewaysScorer.java:40-55): for a base
   * query with per-dimension drill-down selections, each dimension's facet
   * counts are computed over the docs matching the base query AND every
   * OTHER dimension's selection — "sideways" counts keep a dimension's
   * sibling values visible after drilling into one of them. Also emits the
   * drill-down hit count (all selections applied) as the `(__hits__, '')`
   * row — DrillSidewaysResult.hits.
   *
   * ONE corpus pass, the reference scorer's near-miss optimization in
   * relational form: per doc, count matched selections m; the doc
   * contributes to dim i's counts iff m − matched(i) == dims−1 (it matches
   * all OTHER selections), and to the hit count iff m == dims. The dims-way
   * per-doc fan-out is an array explode (narrow); the only exchange is the
   * final (dim, value) count aggregation — partial+final, |values|-sized.
   * A per-dim re-scan loop would read the corpus dims+1 times; this reads
   * it once, which at 100 TB is the difference that matters.
   *
   * @param dims (dimColumn, selectedPredicate) per drilled dimension
   * @return (dim, value, cnt), plus the (`__hits__`, '') drill-down count
   */
  // ---- JSON Facet API domain changes (reference solr/core .../search/
  // facet/FacetRequest.java:237 parseDomain: domain:{filter, excludeTags,
  // blockChildren, blockParent}): the facet is computed over a DOMAIN
  // derived from the base result set by composable transforms. ----

  /** A tagged top-level filter (Solr's `fq={!tag=x}...`): excludeTags
    * re-selects which of these form the base domain. */
  final case class TaggedFilter(tag: String, pred: Column)

  sealed trait DomainChange extends Serializable
  /** domain:{filter:...} — restrict the domain. */
  final case class DomainFilter(pred: Column) extends DomainChange
  /** domain:{blockChildren:...} — switch from parent docs to ALL their
    * children (the children of every parent in the current domain). */
  final case class DomainBlockChildren(children: DataFrame,
                                       parentKey: String, childKey: String) extends DomainChange
  /** domain:{blockParent:...} — switch from child docs to their DISTINCT
    * parents. */
  final case class DomainBlockParent(parents: DataFrame,
                                     childKey: String, parentKey: String) extends DomainChange
  /** domain:{excludeTags:[...]} — drop the matching tagged base filters
    * before the domain is formed (the drill-sideways move, composable). */
  final case class DomainExcludeTags(tags: Set[String]) extends DomainChange

  /**
   * Facet `facetField` over a transformed domain. Plan shape: the base is
   * the filtered scan; block switches are LEFT SEMI joins carrying ONLY
   * the key column of the current domain (the fact-side table never
   * widens), and the final count is a partial+final aggregation.
   */
  def facetDomain(docs: DataFrame, filters: Seq[TaggedFilter],
                  domain: Seq[DomainChange], facetField: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val excluded = domain.collect { case DomainExcludeTags(ts) => ts }
      .foldLeft(Set.empty[String])(_ ++ _)
    val base = filters.filterNot(f => excluded(f.tag))
      .foldLeft(docs)((d, f) => d.filter(f.pred))
    val dom = domain.foldLeft(base) {
      case (d, DomainFilter(p)) => d.filter(p)
      case (d, DomainBlockChildren(children, pk, ck)) =>
        children.join(d.select(col(pk).as(ck)).distinct(), Seq(ck), "left_semi")
      case (d, DomainBlockParent(parents, ck, pk)) =>
        parents.join(d.select(col(ck).as(pk)).distinct(), Seq(pk), "left_semi")
      case (d, _: DomainExcludeTags) => d
    }
    dom.groupBy(col(facetField).cast("string").as("value"))
      .agg(count("*").as("cnt"))
      .orderBy(desc("cnt"), asc("value"))
  }

  def drillSideways(df: DataFrame, base: Column,
                    dims: Seq[(String, Column)]): DataFrame = {
    require(dims.nonEmpty)
    val ms = dims.map { case (_, pred) => pred.cast("int") }
    val total = ms.reduce(_ + _)
    val contribs = dims.zipWithIndex.map { case ((c, _), i) =>
      when(total - ms(i) === dims.size - 1,
        struct(lit(c).as("dim"), col(c).cast("string").as("value")))
    } :+ when(total === dims.size,
      struct(lit("__hits__").as("dim"), lit("").as("value")))
    df.filter(base)
      .select(explode(array(contribs: _*)).as("x"))
      .filter(col("x").isNotNull)
      .groupBy(col("x.dim").as("dim"), col("x.value").as("value"))
      .agg(count("*").as("cnt"))
      .orderBy(asc("dim"), desc("cnt"), asc("value"))
  }
}
