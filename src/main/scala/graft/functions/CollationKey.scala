package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Locale-aware binary sort keys — the CollationField / CollationKeyAnalyzer
 * capability (reference lucene/analysis/common/src/java/org/apache/lucene/
 * collation/CollationKeyAnalyzer.java:33-60, solr/core/src/java/org/apache/
 * solr/schema/CollationField.java:58-140): text converts once to its
 * `java.text.CollationKey` bytes so that plain UNSIGNED BINARY comparison
 * (which Spark's sort, range partitioner, and parquet min/max stats all
 * speak natively) realizes the locale's collation order. `strength` and
 * `decomposition` take the CollationField vocabulary
 * (primary/secondary/tertiary/identical · no/canonical/full).
 *
 * Spark-first shape: the key is a codegen'd expression column — sort keys
 * materialize in the scan stage, the global sort range-partitions on
 * BINARY, and a keyed doc-values column (`IndexStore.build(docValueCols)`)
 * persists them for engine-side sorted top-k. The reference's warning that
 * keys are only comparable when produced by the same JVM + locale +
 * strength applies unchanged — persist those three with the index exactly
 * as CollationField stores them in the schema.
 *
 * `java.text.Collator` is NOT thread-safe; each executor thread leases its
 * own instance from a per-thread cache keyed by (locale, strength,
 * decomposition).
 */
case class CollationKey(child: Expression, locale: String,
                        strength: String, decomposition: String)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_collation_key"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_collation_key expects STRING, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    CollationKey.key(v.asInstanceOf[UTF8String].toString, locale, strength, decomposition)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.CollationKey.key($c.toString(), "$locale", "$strength", "$decomposition")""")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CollationKey {

  import java.text.Collator

  private val cache = new ThreadLocal[java.util.HashMap[String, Collator]] {
    override def initialValue() = new java.util.HashMap[String, Collator]()
  }

  private def strengthOf(s: String): Int = s.toLowerCase match {
    case "primary" => Collator.PRIMARY
    case "secondary" => Collator.SECONDARY
    case "tertiary" => Collator.TERTIARY
    case "identical" => Collator.IDENTICAL
    case other => throw new IllegalArgumentException(
      s"strength '$other' (primary|secondary|tertiary|identical)")
  }

  private def decompositionOf(s: String): Int = s.toLowerCase match {
    case "no" => Collator.NO_DECOMPOSITION
    case "canonical" => Collator.CANONICAL_DECOMPOSITION
    case "full" => Collator.FULL_DECOMPOSITION
    case other => throw new IllegalArgumentException(
      s"decomposition '$other' (no|canonical|full)")
  }

  /** The thread's collator for this spec (CollationField.setup parsing:
    * locale as language[-country[-variant]]). */
  def collator(locale: String, strength: String, decomposition: String): Collator = {
    val k = s"$locale|$strength|$decomposition"
    val m = cache.get()
    var c = m.get(k)
    if (c == null) {
      val parts = locale.split("[-_]")
      val loc = parts.length match {
        case 1 => new java.util.Locale(parts(0))
        case 2 => new java.util.Locale(parts(0), parts(1))
        case _ => new java.util.Locale(parts(0), parts(1), parts(2))
      }
      c = Collator.getInstance(loc)
      c.setStrength(strengthOf(strength))
      c.setDecomposition(decompositionOf(decomposition))
      m.put(k, c)
    }
    c
  }

  def key(s: String, locale: String, strength: String, decomposition: String): Array[Byte] =
    collator(locale, strength, decomposition).getCollationKey(s).toByteArray

  /** Column API: binary collation sort key. */
  def apply(c: Column, locale: String, strength: String = "tertiary",
            decomposition: String = "canonical"): Column = {
    import org.apache.spark.sql.graftbridge.{columnOf, exprOf}
    columnOf(CollationKey(exprOf(c), locale, strength, decomposition))
  }
}
