package graft.encoders

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** SimilarityEncoder (reference skrub/_similarity_encoder.py:133-571): a
  * one-hot generalization — each output column is the n-gram similarity of
  * the value to one fitted category instead of an exact-match indicator.
  *
  * Similarity: set-Jaccard over padded char 2-4-grams (our deterministic
  * n-gram family; the reference's count-vector similarity is a close
  * variant — deviation documented, semantics ours and oracle-verifiable).
  * Fit collects the distinct categories (driver-side; the reference
  * one-hot-fits the same vocabulary), transform is a single `select` of
  * one codegen'd expression per category.
  */
object SimilarityEncoder {

  def gramSet(c: Column): Column = array_distinct(FuzzyJoin.charNgrams234(c))

  /** Jaccard similarity of the gram sets of `value` and literal `category`. */
  def similarity(value: Column, category: String): Column = {
    val a = gramSet(value)
    val b = gramSet(lit(category))
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_distinct(concat(a, b))).cast("double")
    when(value.isNull, lit(null).cast("double"))
      .otherwise(round(inter / union, 6))
  }

  /** Categories beyond this are rejected: one-hot-style expansion of a
    * genuinely high-cardinality column would emit thousands of output
    * columns and collect an unbounded vocabulary to the driver. The
    * reference treats ~30 categories as the one-hot/high-card boundary
    * (skrub/_column_associations.py:11 `_CATEGORICAL_THRESHOLD`); columns
    * above it belong to StringEncoder / MinHashEncoder.
    */
  val DefaultMaxCategories = 30

  /** Encode column `c` into one similarity column per fitted category
    * (sorted vocabulary for deterministic column order). Throws
    * `IllegalArgumentException` when the column has more than
    * `maxCategories` distinct values — the RejectColumn contract.
    */
  def encode(df: DataFrame, c: String,
             maxCategories: Int = DefaultMaxCategories): DataFrame = {
    // limit(max+1) bounds both the job and the driver collect: one extra row
    // is enough to detect overflow without counting the full vocabulary
    val probe = df.select(col(c)).filter(col(c).isNotNull).distinct()
      .limit(maxCategories + 1).collect()
    if (probe.length > maxCategories)
      throw new IllegalArgumentException(
        s"SimilarityEncoder: column '$c' has more than $maxCategories distinct " +
          "values; use StringEncoder or MinHashEncoder for high-cardinality columns")
    val cats = probe.map(_.getString(0)).toSeq.sorted
    val exprs = cats.map(cat =>
      similarity(col(c), cat).as(s"${c}_sim_${cat.replaceAll("[^A-Za-z0-9]+", "_")}"))
    df.select(df.columns.map(col).toSeq ++ exprs: _*)
  }
}
