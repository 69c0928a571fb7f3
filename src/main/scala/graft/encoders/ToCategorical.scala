package graft.encoders

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.ApplyToCols.RejectColumn

/** `ToCategorical` (reference skrub/_to_categorical.py:7-120) — mark a
  * string column as categorical for downstream stages. The reference
  * converts to a pandas/polars Categorical DTYPE; Spark has no dictionary
  * dtype, so the mark rides `StructField.metadata` (the SURVEY §1.2
  * mapping): the values stay plain strings, and the tag travels with the
  * schema through select/filter/join like a dtype would.
  *
  * Exactly like the reference, the tag is a ROUTING mark, not an
  * encoding: "converting to a Categorical is just a way to indicate to
  * downstream estimators that this column should be treated as
  * categorical" (`_to_categorical.py:35-43`). Consumers honoring it:
  *
  *   - `TableVectorizer.fit` routes a tagged column to the low-
  *     cardinality (one-hot) path regardless of its measured distinct
  *     count, behind a loud vocabulary cap (the tag is the caller
  *     TAKING RESPONSIBILITY for the vocabulary being bounded);
  *   - `TableReport.summarize` reports the column's dtype as
  *     `categorical` instead of `string`.
  *
  * Contract mirror of the reference: string columns are tagged (already-
  * tagged ones pass through unchanged — categories-of-categories is a
  * no-op there too); any other dtype raises `RejectColumn`, so the
  * transformer is always safe inside `ApplyToCols(allowReject = true)`
  * and as a TableVectorizer low-cardinality stage.
  */
object ToCategorical {

  val MetadataKey = "graft.categorical"

  def isCategorical(f: StructField): Boolean =
    f.metadata.contains(MetadataKey) && f.metadata.getBoolean(MetadataKey)

  /** The tagged column expression: same values, schema metadata marked. */
  def tagged(f: StructField): Column = {
    val md = new MetadataBuilder().withMetadata(f.metadata)
      .putBoolean(MetadataKey, true).build()
    col(f.name).as(f.name, md)
  }

  /** Tag `c` as categorical; reject non-string columns like the
    * reference (`RejectColumn: Column ... does not contain strings`).
    * Zero data movement — this is a schema-only projection.
    */
  def transform(df: DataFrame, c: String): DataFrame = {
    val f = df.schema.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(s"no column $c in ${df.columns.mkString(", ")}"))
    f.dataType match {
      case StringType =>
        if (isCategorical(f)) df // already categorical: pass through
        else df.withColumn(c, tagged(f))
      case other =>
        throw RejectColumn(
          s"ToCategorical: column '$c' has dtype ${other.simpleString}, " +
            "not string — only string/categorical columns can be marked " +
            "categorical (reference _to_categorical.py RejectColumn contract)")
    }
  }
}
