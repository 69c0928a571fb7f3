package graft.encoders

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Quantile binning (sklearn KBinsDiscretizer strategy="quantile", ordinal
  * encode — beyond reference: skrub routes numerics raw and bins only for
  * associations; equal-POPULATION bins are the standard discretization for
  * monotone-robust features and privacy-style coarsening).
  *
  * fit: k-1 inner edges at the i/k interpolated quantiles — ONE exact
  * `percentile` aggregate (sorts values; swap `percentile_approx` for the
  * constant-memory GK sketch at 100 TB, same contract as
  * TableReport.summarize's `exactQuantiles=false`). Duplicate edges (mass
  * concentrations) collapse, like sklearn's duplicate-bin removal.
  *
  * transform: bin(x) = #{edges <= x} as a literal comparison chain — pure
  * whole-stage codegen, zero shuffles, edges are fit-time literals (the
  * NearestCells discipline: model state rides the expression). Nulls/NaN
  * stay null.
  */
object KBins {

  final case class Model(col: String, edges: Seq[Double]) {
    def binExpr(c: Column): Column = {
      val bin = edges.map(e => when(c >= e, 1).otherwise(0))
        .reduceOption(_ + _).getOrElse(lit(0))
      when(c.isNull || isnan(c.cast(DoubleType)), lit(null).cast(IntegerType))
        .otherwise(bin)
    }
    def transform(df: DataFrame, outCol: String = ""): DataFrame = {
      val out = if (outCol.nonEmpty) outCol else s"${col}_bin"
      df.withColumn(out, binExpr(df(col).cast(DoubleType)))
    }
  }

  def fit(df: DataFrame, c: String, k: Int = 10): Model = {
    require(k >= 2, s"need k >= 2 bins, got $k")
    // the transform is a k-1-branch literal comparison chain; hundreds of
    // branches would silently overflow codegen into interpreted eval (the
    // known wide-expression pitfall), so the discretization contract caps k
    require(k <= 256, s"k = $k bins would generate a $k-branch expression " +
      "chain past codegen limits; use fewer bins")
    val qs = (1 until k).map(i => i.toDouble / k)
    val row = df.agg(expr(
      s"percentile(`$c`, array(${qs.mkString("D, ")}D))").as("q")).head()
    val edges =
      if (row.isNullAt(0)) Seq.empty[Double]
      else row.getSeq[Double](0).filterNot(_.isNaN).distinct
    Model(c, edges)
  }

  def fitTransform(df: DataFrame, c: String, k: Int = 10,
                   outCol: String = ""): DataFrame =
    fit(df, c, k).transform(df, outCol)

  /** Pipeline-citizen form: composes into graft Plans and (via
    * `SparkMl.stage`) native `ml.Pipeline`s like every other encoder.
    */
  def estimator(c: String, k: Int = 10): graft.plans.Estimator =
    new graft.plans.Estimator {
      def fit(df: DataFrame): graft.plans.Transformer = {
        val m = KBins.fit(df, c, k)
        new graft.plans.Transformer {
          def transform(d: DataFrame): DataFrame = m.transform(d)
        }
      }
    }
}
