package graft.encoders

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Quantile binning (sklearn KBinsDiscretizer strategy="quantile", ordinal
  * encode — beyond reference: skrub routes numerics raw and bins only for
  * associations; equal-POPULATION bins are the standard discretization for
  * monotone-robust features and privacy-style coarsening).
  *
  * fit: k-1 inner edges at the i/k quantiles — ONE aggregate, exact
  * `percentile` at profiling scale and `percentile_approx` (the
  * constant-memory GK sketch, same contract as TableReport.summarize's
  * `exactQuantiles=false`) above `DefaultMaxExactRows`, auto-routed by a
  * cheap count probe. Duplicate edges (mass concentrations) collapse, like
  * sklearn's duplicate-bin removal.
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

  /** Row count above which auto mode fits with `percentile_approx` (the
    * constant-memory GK sketch) instead of exact `percentile` (whose
    * aggregation state is a full sorted copy of the column — fine at
    * profiling scale, a memory wall at 100 TB).
    */
  val DefaultMaxExactRows: Long = 10000000L

  /** `mode`: "exact" — exact interpolated percentiles (sort-width state);
    * "approx" — `percentile_approx` at `approxAccuracy` (bounded state, the
    * 100 TB path; edges land on actual data values within 1/accuracy rank
    * error — deviation pinned by KBinsSpec); "auto" (default) — one cheap
    * count probe (a zero-column scan) routes exact below `maxExactRows`,
    * approx above.
    */
  def fit(df: DataFrame, c: String, k: Int = 10, mode: String = "auto",
          approxAccuracy: Int = 10000,
          maxExactRows: Long = DefaultMaxExactRows): Model = {
    require(k >= 2, s"need k >= 2 bins, got $k")
    // the transform is a k-1-branch literal comparison chain; hundreds of
    // branches would silently overflow codegen into interpreted eval (the
    // known wide-expression pitfall), so the discretization contract caps k
    require(k <= 256, s"k = $k bins would generate a $k-branch expression " +
      "chain past codegen limits; use fewer bins")
    require(Set("auto", "exact", "approx")(mode),
      s"mode must be auto|exact|approx, got '$mode'")
    val useApprox = mode == "approx" ||
      (mode == "auto" && df.count() > maxExactRows)
    val qs = (1 until k).map(i => i.toDouble / k)
    val fn =
      if (useApprox) s"percentile_approx(`$c`, array(${qs.mkString("D, ")}D), " +
        s"$approxAccuracy)"
      else s"percentile(`$c`, array(${qs.mkString("D, ")}D))"
    val row = df.agg(expr(fn).cast(ArrayType(DoubleType)).as("q")).head()
    val edges =
      if (row.isNullAt(0)) Seq.empty[Double]
      else row.getSeq[Double](0).filter(java.lang.Double.isFinite).distinct
        // finite-only (NaN AND +/-Inf): an infinite edge is useless as a
        // cut point and poisons the JSON model file (bare Infinity)
    Model(c, edges)
  }

  def fitTransform(df: DataFrame, c: String, k: Int = 10,
                   outCol: String = "", mode: String = "auto"): DataFrame =
    fit(df, c, k, mode).transform(df, outCol)

  /** Pipeline-citizen form: composes into graft Plans and (via
    * `SparkMl.stage`) native `ml.Pipeline`s like every other encoder.
    */
  def estimator(c: String, k: Int = 10,
                mode: String = "auto"): graft.plans.Estimator =
    new graft.plans.Estimator {
      def fit(df: DataFrame): graft.plans.Transformer = {
        val m = KBins.fit(df, c, k, mode)
        new graft.plans.Transformer {
          def transform(d: DataFrame): DataFrame = m.transform(d)
        }
      }
    }

  /** Persist / reload a fitted Model (the Bpe.save discipline — byte-
    * stable JSON, bit-identical transform after reload; spec-pinned in
    * PersistenceSpec).
    */
  def save(model: Model, path: String): Unit = {
    import graft.plans.Json
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p, Json.obj(Seq(
      "type" -> Json.str("graft.KBins.Model"),
      "col" -> Json.str(model.col),
      "edges" -> Json.arr(model.edges.map(Json.num)))))
  }

  def load(path: String): Model = {
    import graft.plans.Json
    val o = Json.parse(java.nio.file.Files.readString(
      java.nio.file.Paths.get(path))).asInstanceOf[Map[String, Any]]
    require(o.get("type").contains("graft.KBins.Model"), "not a KBins.Model file")
    Model(o("col").asInstanceOf[String],
      o("edges").asInstanceOf[Seq[Any]].map {
        case d: Double => d
        case l: Long   => l.toDouble
        case other     => other.toString.toDouble
      })
  }
}
