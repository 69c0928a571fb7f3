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
}
