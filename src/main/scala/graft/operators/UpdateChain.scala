package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/**
 * Update-request-processor chain — the Solr update pipeline's
 * field-mutating processors (reference solr/core/src/java/org/apache/solr/
 * update/processor/: FieldMutatingUpdateProcessor.java and its factories),
 * re-expressed as composable whole-batch DataFrame transforms. Solr runs
 * each document through the chain one at a time; here each step is a
 * declarative column rewrite applied to the whole micro-batch, so the
 * chain is one narrow codegen'd projection — no shuffle, no UDF in any
 * step below — and behaves identically per row.
 *
 * Multi-valued fields are ArrayType columns (a Solr multiValued field);
 * every value mutator applies element-wise to arrays and directly to
 * scalars, exactly like FieldValueMutatingUpdateProcessor iterates a
 * SolrInputField's values.
 *
 * Dedup signatures (MD5/Lookup3/TextProfile) live in [[Signatures]];
 * atomic updates in [[AtomicUpdate]]; classification-as-field in
 * [[Classify]] — this module is the remaining field-mutating family.
 */
object UpdateChain {

  type Step = DataFrame => DataFrame

  /** Run steps left to right (the processor chain order). */
  def chain(steps: Step*): Step = df => steps.foldLeft(df)((d, s) => s(d))

  /** Apply a value mutation element-wise on arrays, directly on scalars. */
  private def mutate(df: DataFrame, field: String, f: Column => Column): DataFrame = {
    val c = df.schema(field).dataType match {
      case ArrayType(_, _) => transform(col(field), f)
      case _ => f(col(field))
    }
    df.withColumn(field, c)
  }

  /** TrimFieldUpdateProcessorFactory: String.trim on every value. */
  def trimField(field: String): Step = df => mutate(df, field, trim(_))

  /** RemoveBlankFieldUpdateProcessorFactory: drop zero-length values;
    * a scalar blank (or an array emptied of all its values) becomes null
    * (the processor removes the field). */
  def removeBlankField(field: String): Step = df =>
    df.schema(field).dataType match {
      case ArrayType(_, _) =>
        val kept = filter(col(field), v => length(v) > 0)
        df.withColumn(field, when(size(kept) > 0, kept))
      case _ =>
        df.withColumn(field, when(length(col(field)) > 0, col(field)))
    }

  /** TruncateFieldUpdateProcessorFactory: values cut to maxLength chars. */
  def truncateField(field: String, maxLength: Int): Step =
    df => mutate(df, field, substring(_, 1, maxLength))

  /** RegexReplaceProcessorFactory: replaceAll(pattern, replacement) on
    * every value; `literalReplacement` (the reference default true) quotes
    * '\' and '$' in the replacement. */
  def regexReplace(field: String, pattern: String, replacement: String,
                   literalReplacement: Boolean = true): Step = {
    val rep =
      if (literalReplacement) java.util.regex.Matcher.quoteReplacement(replacement)
      else replacement
    df => mutate(df, field, regexp_replace(_, pattern, rep))
  }

  /** FieldLengthUpdateProcessorFactory: replace each value by its length. */
  def fieldLength(field: String): Step = df => mutate(df, field, length(_))

  /** CloneFieldUpdateProcessorFactory: append the source field's values to
    * `dest` (created multi-valued when absent; an existing dest keeps its
    * values first, like the processor adds to the SolrInputField). */
  def cloneField(source: String, dest: String): Step = df => {
    def asArr(c: Column, t: org.apache.spark.sql.types.DataType): Column = t match {
      case ArrayType(_, _) => coalesce(c, array())
      case _ => when(c.isNotNull, array(c)).otherwise(array())
    }
    val src = asArr(col(source), df.schema(source).dataType)
    val out =
      if (df.columns.contains(dest))
        concat(asArr(col(dest), df.schema(dest).dataType), src)
      else src
    df.withColumn(dest, out)
  }

  /** ConcatFieldUpdateProcessorFactory: join a multi-valued field into one
    * string (reference default delimiter "; "). */
  def concatField(field: String, delimiter: String = "; "): Step =
    df => df.withColumn(field, array_join(col(field), delimiter))

  /** CountFieldValuesUpdateProcessorFactory: value count (0 when null). */
  def countFieldValues(field: String, dest: String): Step =
    df => df.withColumn(dest,
      when(col(field).isNull, 0).otherwise(size(col(field))))

  /** FirstFieldValueUpdateProcessorFactory / Last...: keep one value. */
  def firstFieldValue(field: String): Step =
    df => df.withColumn(field, element_at(col(field), 1))
  def lastFieldValue(field: String): Step =
    df => df.withColumn(field, element_at(col(field), -1))

  /** Min/MaxFieldValueUpdateProcessorFactory: natural-order extreme. */
  def minFieldValue(field: String): Step =
    df => df.withColumn(field, array_min(col(field)))
  def maxFieldValue(field: String): Step =
    df => df.withColumn(field, array_max(col(field)))

  /** UniqFieldsUpdateProcessorFactory: drop duplicate values, keeping
    * first-occurrence order (the reference iterates a LinkedHashSet). */
  def uniqFieldValues(field: String): Step =
    df => df.withColumn(field, array_distinct(col(field)))

  /** DefaultValueUpdateProcessorFactory: fill a missing value. */
  def defaultValue(field: String, value: Any): Step = df => {
    val filled =
      if (df.columns.contains(field)) coalesce(col(field), lit(value))
      else lit(value)
    df.withColumn(field, filled)
  }

  /** TimestampUpdateProcessorFactory: stamp NOW on docs missing the field
    * (NOW passed in — this engine's replayability contract forbids wall
    * clocks inside operators). */
  def timestamp(field: String, now: java.sql.Timestamp): Step =
    defaultValue(field, now)

  /** ParseIntField/ParseLongField/ParseDoubleField/ParseFloatField
    * UpdateProcessorFactory (schemaless parsing): values that parse
    * mutate to the numeric type; values that don't are left as-is —
    * so the column stays a string column unless EVERY row parses, in
    * which case it becomes the numeric type (the factory's
    * shouldMutate-all contract per document, applied batch-wide). */
  def parseNumericField(field: String, to: String): Step = df => {
    val parsed = df.schema(field).dataType match {
      case ArrayType(_, _) => transform(col(field), v => v.try_cast(to))
      case _ => col(field).try_cast(to)
    }
    val allParse = df.schema(field).dataType match {
      case ArrayType(_, _) => df.filter(exists(parsed, _.isNull) &&
        exists(col(field), _.isNotNull)).isEmpty
      case _ => df.filter(parsed.isNull && col(field).isNotNull).isEmpty
    }
    if (allParse) df.withColumn(field, parsed) else df
  }

  /** ParseBooleanFieldUpdateProcessorFactory: configurable true/false
    * value sets, case-insensitive by default; mutates only if every
    * non-null value is in one of the sets. */
  def parseBooleanField(field: String,
                        trueValues: Set[String] = Set("true"),
                        falseValues: Set[String] = Set("false"),
                        caseInsensitive: Boolean = true): Step = df => {
    def norm(c: Column): Column = if (caseInsensitive) lower(c) else c
    val tv = (if (caseInsensitive) trueValues.map(_.toLowerCase) else trueValues).toSeq
    val fv = (if (caseInsensitive) falseValues.map(_.toLowerCase) else falseValues).toSeq
    val parsed = when(norm(col(field)).isin(tv: _*), lit(true))
      .when(norm(col(field)).isin(fv: _*), lit(false))
    if (df.filter(parsed.isNull && col(field).isNotNull).isEmpty)
      df.withColumn(field, parsed)
    else df
  }

  /** RegexpBoostProcessor (reference solr/core/src/java/org/apache/solr/
    * update/processor/RegexpBoostProcessor.java:107-134): boost starts at
    * 1.0 and each rule whose pattern FULLY matches the input value folds
    * in as `(b·1000)·(boost·1000)/1000000` (the reference's arithmetic,
    * kept verbatim); the product overwrites `boostField`. Docs with a
    * null input keep their existing boost untouched. */
  def regexpBoost(inputField: String, boostField: String,
                  rules: Seq[(String, Double)]): Step = df => {
    val boost = rules.foldLeft(lit(1.0): Column) { case (acc, (re, b)) =>
      when(col(inputField).rlike("^(?:" + re + ")$"),
        (lit(b * 1000) * (acc * 1000)) / 1000000).otherwise(acc)
    }
    val existing: Column =
      if (df.columns.contains(boostField)) col(boostField)
      else lit(null).cast("double")
    df.withColumn(boostField,
      when(col(inputField).isNotNull, boost).otherwise(existing))
  }

  /** IgnoreFieldUpdateProcessorFactory: remove the field entirely. */
  def ignoreField(field: String): Step = df => df.drop(field)

  /** FieldNameMutatingUpdateProcessorFactory: rename fields whose name
    * matches `pattern` via replaceAll. */
  def fieldNameMutating(pattern: String, replacement: String): Step = df =>
    df.columns.foldLeft(df) { (d, c) =>
      val renamed = c.replaceAll(pattern, replacement)
      if (renamed != c) d.withColumnRenamed(c, renamed) else d
    }

  /** IgnoreLargeDocumentProcessorFactory: drop docs whose given field
    * exceeds `limit` bytes (the reference estimates whole-doc size; the
    * dominant term is the content field). */
  def ignoreLargeDocuments(field: String, limitBytes: Long): Step =
    df => df.filter(octet_length(col(field)) <= limitBytes)

  /** DocExpirationUpdateProcessorFactory: `_ttl_` → absolute expiration
    * stamp, and the reaper's delete-by-query filter for a given NOW. */
  def withExpiration(ttlField: String, createdField: String,
                     expireField: String): Step =
    df => df.withColumn(expireField,
      when(col(ttlField).isNotNull,
        col(createdField) + make_dt_interval(
          lit(0), lit(0), lit(0), col(ttlField).cast("double"))))
  def reapExpired(expireField: String, now: java.sql.Timestamp): Step =
    df => df.filter(col(expireField).isNull || col(expireField) > lit(now))

  /** SkipExistingDocumentsProcessorFactory: drop updates whose id already
    * exists in the destination. */
  def skipExisting(updates: DataFrame, existing: DataFrame, id: String): DataFrame =
    updates.join(existing.select(id).distinct(), Seq(id), "left_anti")

  /** DocBasedVersionConstraintsProcessor: an update wins only when its
    * version is strictly newer than the stored doc's (equal loses, like
    * the reference's isVersionNewEnough). Returns the merged table. */
  def versionConstrainedUpsert(docs: DataFrame, updates: DataFrame,
                               id: String, versionField: String): DataFrame = {
    val winners = updates.as("u")
      .join(docs.select(col(id), col(versionField).as("__cur")).as("d"), Seq(id), "left")
      .filter(col("__cur").isNull || col(versionField) > col("__cur"))
      .drop("__cur")
    docs.join(winners.select(id).distinct(), Seq(id), "left_anti")
      .unionByName(winners)
  }
}
