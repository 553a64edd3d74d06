package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Solr atomic updates re-expressed Spark-first.
  *
  * The reference (`solr/core/src/java/org/apache/solr/update/processor/
  * AtomicUpdateDocumentMerger.java:100-560`) fetches the stored document by
  * unique key and applies per-field update commands in arrival order:
  * `set` (replace; null removes), `add` (append to multi-valued),
  * `add-distinct` (append unless present, doAddDistinct:444-477), `remove`
  * (each requested value removes ONE occurrence — `Collection.remove`,
  * doRemove:509-523), `removeregex` (removes ALL values whose WHOLE text
  * matches — `Matcher.matches()`, doRemoveRegex:525-545), and `inc`
  * (numeric add; a doc with no existing value takes the increment as the
  * new value, doInc:479-507).
  *
  * Spark-first shape — batch merge instead of per-doc RealTimeGet:
  *   1. ONE hash aggregation packs each doc's commands into per-field
  *      arrays ordered by a caller-supplied sequence number (`sort_array`
  *      over `collect_list(struct(seq, op, value))` — arrival order
  *      preserved without a window).
  *   2. ONE equi-join attaches the packed ops to the doc table (the ops
  *      side is the small one; Catalyst/AQE broadcasts it).
  *   3. Each field folds its op array over the current value with a
  *      codegen'd higher-order `aggregate` — no UDF, no per-doc driver
  *      round-trip, scales to any update-batch size.
  */
object AtomicUpdate {

  /** Column name for the packed ops of `field`. */
  private def opsCol(field: String) = s"__ops_$field"

  /** Single-valued string field: set / remove(equal value). */
  private def foldStr(f: String): String =
    s"""aggregate(coalesce(`${opsCol(f)}`, array()), `$f`, (acc, o) ->
       |  CASE o.op
       |    WHEN 'set' THEN o.v
       |    WHEN 'remove' THEN CASE WHEN acc <=> o.v THEN NULL ELSE acc END
       |    ELSE acc END)""".stripMargin

  /** Single-valued integral field: set / inc (missing existing -> set,
    * AtomicUpdateDocumentMerger.doInc:505-506). */
  private def foldNum(f: String, t: String): String =
    s"""aggregate(coalesce(`${opsCol(f)}`, array()), CAST(`$f` AS $t), (acc, o) ->
       |  CASE o.op
       |    WHEN 'set' THEN CAST(o.v AS $t)
       |    WHEN 'inc' THEN CASE WHEN acc IS NULL THEN CAST(o.v AS $t)
       |                        ELSE acc + CAST(o.v AS $t) END
       |    ELSE acc END)""".stripMargin

  /** Multi-valued string field. `remove` drops the FIRST occurrence only
    * (Collection.remove); `removeregex` drops ALL whole-string matches
    * (Matcher.matches() -> anchored rlike). */
  private def foldArr(f: String): String =
    s"""aggregate(coalesce(`${opsCol(f)}`, array()), `$f`, (acc, o) ->
       |  CASE o.op
       |    WHEN 'set' THEN CASE WHEN o.v IS NULL THEN NULL ELSE array(o.v) END
       |    WHEN 'add' THEN CASE WHEN acc IS NULL THEN array(o.v)
       |                        ELSE concat(acc, array(o.v)) END
       |    WHEN 'add-distinct' THEN
       |      CASE WHEN acc IS NULL THEN array(o.v)
       |           WHEN array_contains(acc, o.v) THEN acc
       |           ELSE concat(acc, array(o.v)) END
       |    WHEN 'remove' THEN
       |      CASE WHEN acc IS NULL THEN acc
       |           ELSE filter(acc, (x, i) -> i != array_position(acc, o.v) - 1) END
       |    WHEN 'removeregex' THEN
       |      CASE WHEN acc IS NULL THEN acc
       |           ELSE filter(acc, x -> NOT (x RLIKE concat('^(?:', o.v, ')$$'))) END
       |    ELSE acc END)""".stripMargin

  /** Apply an atomic-update batch to `docs`.
    *
    * `updates` is long-format: one row per command with columns
    * `(<id>, seq:int, field:string, op:string, value:string)` — values arrive
    * untyped exactly as in Solr's JSON atomic syntax and are cast at the
    * field's declared type (readableToIndexed in the reference). Commands
    * for one doc apply in ascending `seq`. Fields not named in any list
    * pass through untouched; docs with no commands are unchanged.
    */
  def merge(docs: DataFrame, id: String, updates: DataFrame,
            stringFields: Seq[String] = Nil,
            longFields: Seq[String] = Nil,
            doubleFields: Seq[String] = Nil,
            arrayFields: Seq[String] = Nil): DataFrame = {
    val fields = stringFields ++ longFields ++ doubleFields ++ arrayFields
    require(fields.nonEmpty, "no updatable fields declared")
    require(fields.toSet.size == fields.size, s"field declared twice: $fields")
    val packs = fields.map { f =>
      sort_array(collect_list(when(col("field") === f,
        struct(col("seq"), col("op"), col("value").as("v"))))).as(opsCol(f))
    }
    val packed = updates.groupBy(id).agg(packs.head, packs.tail: _*)
    val joined = docs.join(packed, Seq(id), "left")
    val outCols = docs.columns.map { c =>
      if (stringFields.contains(c)) expr(foldStr(c)).as(c)
      else if (longFields.contains(c)) expr(foldNum(c, "BIGINT")).as(c)
      else if (doubleFields.contains(c)) expr(foldNum(c, "DOUBLE")).as(c)
      else if (arrayFields.contains(c)) expr(foldArr(c)).as(c)
      else col(c)
    }
    joined.select(outCols.toSeq: _*)
  }

  /** RealTimeGetComponent (reference solr/core/src/java/org/apache/solr/
    * handler/component/RealTimeGetComponent.java:131-210): fetch documents
    * by id seeing UNCOMMITTED updates — the update log consulted before
    * the searcher's committed view. Here the committed view is `docs` and
    * the pending atomic-update batch is the update log; the result is the
    * doc state a subsequent commit would produce, restricted to the
    * requested ids (the id filter pushes below the merge, so only the
    * requested docs' command lists are ever folded). */
  def realTimeGet(docs: DataFrame, id: String, pendingUpdates: DataFrame,
                  ids: Seq[Any],
                  stringFields: Seq[String] = Nil,
                  longFields: Seq[String] = Nil,
                  doubleFields: Seq[String] = Nil,
                  arrayFields: Seq[String] = Nil): DataFrame =
    merge(docs.filter(col(id).isin(ids: _*)), id,
      pendingUpdates.filter(col(id).isin(ids: _*)),
      stringFields, longFields, doubleFields, arrayFields)
}
