package graft.encoders

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DatetimeEncoder (reference: skrub/_datetime_encoder.py:100-713): explode a
  * datetime column into numeric feature columns, optionally adding circular
  * (sin/cos) periodic encodings. Pure column expressions — a single `select`,
  * fully inside whole-stage codegen, no shuffle, no fit step.
  *
  * Weekday convention follows the reference: Monday=1..Sunday=7 (ISO), unlike
  * Spark's dayofweek (Sunday=1).
  */
object DatetimeEncoder {

  val Resolutions: Seq[String] =
    Seq("year", "month", "day", "hour", "minute", "second")

  /** Circular-encoding periods (reference `_DEFAULT_ENCODING_PERIODS`,
    * _datetime_encoder.py:30-35).
    */
  val Periods: Map[String, Int] =
    Map("month" -> 12, "day" -> 30, "hour" -> 24, "weekday" -> 7)

  def isoWeekday(c: Column): Column = ((dayofweek(c) + 5) % 7) + 1

  def part(c: Column, name: String): Column = name match {
    case "year"          => year(c)
    case "month"         => month(c)
    case "day"           => dayofmonth(c)
    case "hour"          => hour(c)
    case "minute"        => minute(c)
    case "second"        => second(c)
    case "weekday"       => isoWeekday(c)
    case "day_of_year"   => dayofyear(c)
    case "total_seconds" => unix_micros(c).cast(DoubleType) / 1e6
    case other           => throw new IllegalArgumentException(s"unknown part $other")
  }

  /** Feature expressions for one datetime column. Output naming matches the
    * reference: `{col}_{part}`, `{col}_{part}_circular_sin/cos`.
    */
  def encode(colName: String, resolution: String = "hour",
             addWeekday: Boolean = true, addDayOfYear: Boolean = true,
             addTotalSeconds: Boolean = true,
             periodic: Boolean = false,
             asDouble: Boolean = false): Seq[Column] = {
    val c = col(colName)
    val upTo = Resolutions.take(Resolutions.indexOf(resolution) + 1)
    val parts = upTo ++
      (if (addWeekday) Seq("weekday") else Nil) ++
      (if (addDayOfYear) Seq("day_of_year") else Nil) ++
      (if (addTotalSeconds) Seq("total_seconds") else Nil)
    val base = parts.map { p =>
      val e = if (asDouble) part(c, p).cast(DoubleType) else part(c, p)
      e.as(s"${colName}_$p")
    }
    val circ =
      if (!periodic) Nil
      else Periods.toSeq.sortBy(_._1).flatMap { case (p, period) =>
        val v = part(c, p).cast(DoubleType) * lit(2.0 * math.Pi) / lit(period.toDouble)
        // + 0.0 normalizes IEEE -0.0 (round(sin(2*pi), 6) is -0.0)
        Seq((round(sin(v), 6) + lit(0.0)).as(s"${colName}_${p}_circular_sin"),
          (round(cos(v), 6) + lit(0.0)).as(s"${colName}_${p}_circular_cos"))
      }
    base ++ circ
  }

  def transform(df: DataFrame, colName: String, resolution: String = "hour",
                periodic: Boolean = false): DataFrame =
    df.select(df.columns.map(col).toSeq ++ encode(colName, resolution, periodic = periodic): _*)

  /** (output suffix, expression) pairs — the un-aliased form `encode` wraps,
    * for per-column frameworks (ApplyToCols) that name outputs themselves.
    */
  def partColumns(c: Column, resolution: String,
                  addTotalSeconds: Boolean): Seq[(String, Column)] = {
    val upTo = Resolutions.take(Resolutions.indexOf(resolution) + 1)
    val parts = upTo ++ Seq("weekday", "day_of_year") ++
      (if (addTotalSeconds) Seq("total_seconds") else Nil)
    parts.map(p => p -> part(c, p))
  }

  // ---------------------------------------------------------------------
  // B-spline periodic encoding (reference periodic='spline':
  // SplineTransformer(degree=3, extrapolation='periodic'), n_splines per
  // period _datetime_encoder.py:36-41). For UNIFORM periodic knots the
  // degree-3 basis has the closed cardinal form b3 below, so each basis
  // function is a small codegen'd piecewise-cubic expression — no fit step,
  // no UDF, and the same closed form is SQL-expressible for the oracle.
  // ---------------------------------------------------------------------

  /** Cardinal cubic B-spline kernel b3(t), support |t| < 2. */
  def b3(t: Column): Column = {
    val a = abs(t)
    when(a < 1.0, (lit(4.0) - lit(6.0) * a * a + lit(3.0) * a * a * a) / 6.0)
      .when(a < 2.0, (lit(2.0) - a) * (lit(2.0) - a) * (lit(2.0) - a) / 6.0)
      .otherwise(0.0)
  }

  /** Periodic spline basis j of nSplines for a value with the given period:
    * b3 of the wrapped distance between value*n/period and knot j.
    */
  def splineBasis(value: Column, period: Double, nSplines: Int, j: Int): Column = {
    val y = value.cast(DoubleType) * nSplines / period
    // wrap (y - j) into [-n/2, n/2) for periodic extrapolation
    val d = y - j
    val n = nSplines.toDouble
    val wrapped = d - round(d / n, 0) * n
    round(b3(wrapped), 6) + lit(0.0)
  }

  /** Spline feature expressions: `{col}_{part}_spline_{j}` for every
    * circular-period part, nSplines basis functions each.
    */
  def encodeSpline(colName: String, nSplines: Int = 4): Seq[Column] = {
    val c = col(colName)
    Periods.toSeq.sortBy(_._1).flatMap { case (p, period) =>
      (0 until nSplines).map { j =>
        splineBasis(part(c, p), period.toDouble, nSplines, j)
          .as(s"${colName}_${p}_spline_$j")
      }
    }
  }
}
