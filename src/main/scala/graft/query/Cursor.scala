package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * CursorMark deep paging (reference solr/core/src/java/org/apache/solr/
 * search/CursorMark.java + CursorMarkParams.java): an opaque totem
 * serializing the sort values of the last returned doc; the next page
 * selects rows STRICTLY AFTER those values in the sort order, with the
 * unique key (docId) as the mandatory final tie-break (CursorMark.java:60
 * enforces the uniqueKey clause for exactly this reason).
 *
 * Why this scales where offset paging doesn't (Solr's own pitch): page N
 * is not "sort everything, skip N·k rows" — it is a fresh bounded-heap
 * top-k over rows passing the after-filter. The leading sort field's
 * predicate is a plain comparison, so parquet row-group min/max stats can
 * prune data pages below the cursor; per-partition heaps stay k-sized at
 * any depth.
 *
 * Totem format: '|'-joined type-prefixed values (l=long, d=double,
 * s=base64 string) — opaque round-trip, like the reference's base64 JSON.
 * [[Start]] ("*") is the first-page mark (CursorMarkParams.CURSOR_MARK_START).
 */
final case class Cursor(values: Seq[Any]) {
  def serialize: String = values.map {
    case l: Long    => "l" + l
    case i: Int     => "l" + i.toLong
    case d: Double  => "d" + java.lang.Double.toString(d)
    case f: Float   => "d" + java.lang.Double.toString(f.toDouble)
    case s: String  => "s" + java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case other => throw new IllegalArgumentException(
      s"unsupported cursor sort value type: ${other.getClass}")
  }.mkString("|")
}

object Cursor {
  /** CURSOR_MARK_START — request the first page. */
  val Start = "*"

  /** None for the first-page mark; Some(cursor) otherwise.
    * Throws IllegalArgumentException on a malformed totem. */
  def parse(mark: String): Option[Cursor] =
    if (mark == Start) None
    else Some(Cursor(mark.split('|').toSeq.map { t =>
      require(t.nonEmpty, s"malformed cursor mark '$mark'")
      t.head match {
        case 'l' => t.tail.toLong
        case 'd' => t.tail.toDouble
        case 's' => new String(java.util.Base64.getUrlDecoder.decode(t.tail),
          java.nio.charset.StandardCharsets.UTF_8)
        case c => throw new IllegalArgumentException(
          s"malformed cursor mark '$mark': unknown type tag '$c'")
      }
    }))

  /** Strictly-after predicate for a cursor position: lexicographic > in the
    * (sortBys..., docId ASC) order, honoring each field's direction. The
    * leading clause is a single comparison — pushable to columnar stats. */
  def afterPredicate(sortBys: Seq[(String, Boolean)], values: Seq[Any]): Column = {
    val keys = sortBys.map { case (f, a) => (col(f), a) } :+ ((col("docId"), true))
    require(values.length == keys.length,
      s"cursor carries ${values.length} values for ${keys.length} sort keys")
    keys.zip(values).zipWithIndex.map { case (((c, asc_), v), i) =>
      val tiePrefix = keys.take(i).zip(values.take(i))
        .map { case ((pc, _), pv) => pc === lit(pv) }
        .foldLeft(lit(true))(_ && _)
      tiePrefix && (if (asc_) c > lit(v) else c < lit(v))
    }.reduce(_ || _)
  }
}
