package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-group normalization (beyond reference): z-score each value against
  * its OWN group's mean/std — the per-source feature scaling a mixed-corpus
  * training pipeline applies so no source dominates by raw magnitude
  * (per-user for behavioral features, per-shard for heterogeneous sensors).
  *
  * Scale shape: one groupBy(keys) moments aggregate (map-side combined,
  * output bounded by |groups|) joined back — NOT a window, which would sort
  * every row; AQE demotes the join to broadcast when the group count is
  * small. Moment sums route through DECIMAL so mean/std are
  * aggregation-order-independent at any partitioning (the TableReport
  * discipline: DECIMAL(18,6) operands keep products exact under the
  * 38-digit cap). Sample std (ddof=1); groups with zero variance or a
  * single row emit z = 0.0 (no signal, not a divide-by-zero); null values
  * stay null.
  */
object GroupNormalize {

  def zscore(df: DataFrame, on: Seq[String], valueCol: String,
             outCol: String = "z"): DataFrame = {
    require(on.nonEmpty, "need at least one group key")
    val v = col(valueCol)
    val stats = df.groupBy(on.map(c => col(c).as(s"__k_$c")): _*).agg(
      count(v).as("__n"),
      sum(v.cast(DecimalType(30, 6))).cast(DoubleType).as("__sx"),
      sum(v.cast(DecimalType(18, 6)) * v.cast(DecimalType(18, 6)))
        .cast(DoubleType).as("__sxx"))
    val n = col("__n").cast(DoubleType)
    val mean = col("__sx") / n
    val varS = greatest((col("__sxx") - col("__sx") * col("__sx") / n) /
      (n - 1.0), lit(0.0))
    val std = sqrt(varS)
    val joined = df.join(stats,
      on.map(c => df(c) <=> stats(s"__k_$c")).reduce(_ && _), "left")
    joined
      .withColumn(outCol,
        when(v.isNull, lit(null).cast(DoubleType))
          .when(col("__n") <= 1 || std <= 0.0, lit(0.0))
          .otherwise((v - mean) / std))
      .drop((on.map(c => s"__k_$c") ++ Seq("__n", "__sx", "__sxx")): _*)
  }
}
