package graft.encoders

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SquashingScaler (reference: skrub/_squashing_scaler.py:56-339): robust
  * centering/scaling by median and quantile range, followed by a smooth
  * clip x -> x / sqrt(1 + (x/B)^2) mapping outliers into (-B, B); +/-inf go
  * to +/-B, NaN/null pass through as null.
  *
  * Fit is one exact-percentile aggregate job (at 100 TB swap `percentile`
  * for `percentile_approx` — the constant is then approximate but the
  * transform stays a pure expression); transform is a codegen'd expression.
  */
object SquashingScaler {

  final case class Model(median: Double, scale: Double, maxAbs: Double) {
    def expr(c: Column): Column = {
      val centered = (c.cast(DoubleType) - median) / scale
      val squashed = centered / sqrt(lit(1.0) + pow(centered / maxAbs, 2))
      when(c.isNull || isnan(c.cast(DoubleType)), lit(null).cast(DoubleType))
        .when(c === Double.PositiveInfinity, lit(maxAbs))
        .when(c === Double.NegativeInfinity, lit(-maxAbs))
        .otherwise(squashed)
    }
  }

  /** Fit on quantiles [q_low, median, q_high]; scale = q_high - q_low
    * (falls back to 1.0 when degenerate, like the reference).
    */
  def fit(df: DataFrame, colName: String, maxAbs: Double = 3.0,
          qLow: Double = 0.25, qHigh: Double = 0.75): Model = {
    val row = df.filter(col(colName).isNotNull)
      .agg(expr(s"percentile($colName, array($qLow, 0.5, $qHigh))").as("qs"))
      .collect()(0)
    val qs = row.getSeq[Double](0)
    val scale = if (qs(2) - qs(0) == 0.0) 1.0 else qs(2) - qs(0)
    Model(qs(1), scale, maxAbs)
  }

  def fitTransform(df: DataFrame, colName: String, out: String,
                   maxAbs: Double = 3.0): DataFrame = {
    val m = fit(df, colName, maxAbs)
    df.withColumn(out, round(m.expr(col(colName)), 6))
  }
}
