package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pairwise column association via bias-corrected Cramér's V (reference:
  * skrub/_column_associations.py:16-326, Bergsma-style correction).
  *
  * Fully distributed: contingency table = one groupBy(a, b) aggregate;
  * marginals are window sums over the (tiny) contingency frame — the input
  * is scanned exactly once per pair, and nothing but the contingency rows
  * (|distinct a| x |distinct b|) ever leaves the executors.
  */
object ColumnAssociations {

  /** One-row frame: (col_a, col_b, cramers_v) for a categorical pair. */
  def cramersV(df: DataFrame, a: String, b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val obs = df.filter(col(a).isNotNull && col(b).isNotNull)
      .groupBy(col(a), col(b)).agg(count(lit(1)).cast(DoubleType).as("o"))
    val wAll = Window.partitionBy()
    val wA = Window.partitionBy(col(a))
    val wB = Window.partitionBy(col(b))
    val enriched = obs
      .withColumn("n", sum(col("o")).over(wAll))
      .withColumn("rt", sum(col("o")).over(wA))
      .withColumn("ct", sum(col("o")).over(wB))
      .withColumn("r", size(collect_set(col(a)).over(wAll)).cast(DoubleType))
      .withColumn("c", size(collect_set(col(b)).over(wAll)).cast(DoubleType))
    val cell = (col("o") - col("rt") * col("ct") / col("n")) *
      (col("o") - col("rt") * col("ct") / col("n")) / (col("rt") * col("ct") / col("n"))
    val aggd = enriched.agg(
      sum(cell).as("chi2"),
      first(col("n")).as("n"), first(col("r")).as("r"), first(col("c")).as("c"))
    aggd.select(
      lit(a).as("col_a"), lit(b).as("col_b"),
      round(biasCorrectedV(col("chi2"), col("n"), col("r"), col("c")), 6).as("cramers_v"))
  }

  /** Bias-corrected Cramér's V (matches the reference's formula). */
  private def biasCorrectedV(chi2: org.apache.spark.sql.Column,
                             n: org.apache.spark.sql.Column,
                             r: org.apache.spark.sql.Column,
                             c: org.apache.spark.sql.Column) = {
    val phi2 = chi2 / n
    val phi2corr = greatest(lit(0.0), phi2 - (r - 1) * (c - 1) / (n - 1))
    val rcorr = r - (r - 1) * (r - 1) / (n - 1)
    val ccorr = c - (c - 1) * (c - 1) / (n - 1)
    sqrt(phi2corr / least(rcorr - 1, ccorr - 1))
  }

  /** All given pairs, unioned (each pair is one independent small job). */
  def forPairs(df: DataFrame, pairs: Seq[(String, String)]): DataFrame =
    pairs.map { case (a, b) => cramersV(df, a, b) }.reduce(_.unionByName(_))
}
