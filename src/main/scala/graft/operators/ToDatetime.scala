package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ToDatetime: datetime parsing with fit-time format guessing (reference
  * skrub/_to_datetime.py:85-562).
  *
  * Fit samples up to `SampleSize` (30, reference `_SAMPLE_SIZE`
  * _to_datetime.py:17) non-null values on the driver and picks the first
  * candidate format that parses every sample; transform applies the ONE
  * fitted format with `to_timestamp` (non-parsing values -> null, the
  * reference's errors="coerce").
  *
  * Day/month ambiguity (reference `_guess_datetime_format` month-first
  * preference with day>12 evidence): month-first candidates are ordered
  * before day-first, and a sample with day > 12 makes the month-first
  * pattern fail to parse, which naturally falls through to day-first —
  * the same evidence rule, with no special casing.
  *
  * Timezone: fixtures are tz-naive; tz-aware normalization (reference
  * `_convert_time_zone`) reduces in Spark to the session timezone contract
  * (UTC) — "%z"-style inputs parse with an explicit offset pattern and are
  * normalized to UTC by `to_timestamp` itself.
  */
object ToDatetime {

  val SampleSize = 30

  /** Candidate Spark datetime patterns, in priority order. */
  val CandidateFormats: Seq[String] = Seq(
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd",
    "yyyy/MM/dd HH:mm:ss",
    "yyyy/MM/dd",
    "MM/dd/yyyy HH:mm:ss",
    "MM/dd/yyyy HH:mm",
    "MM/dd/yyyy",
    "dd/MM/yyyy HH:mm:ss",
    "dd/MM/yyyy HH:mm",
    "dd/MM/yyyy",
    "dd.MM.yyyy HH:mm:ss",
    "dd.MM.yyyy",
    "yyyyMMdd")

  /** Driver-side format guess over pre-collected sample strings; None if no
    * candidate parses every sample (the column is rejected — left unchanged).
    */
  def guessFormat(samples: Seq[String]): Option[String] = {
    if (samples.isEmpty) return None
    val fmts = CandidateFormats.map { f =>
      f -> java.time.format.DateTimeFormatter.ofPattern(
        f.replace("'T'", "'T'"), java.util.Locale.ROOT)
    }
    fmts.collectFirst {
      case (f, fmt) if samples.forall { s =>
        try {
          java.time.LocalDateTime.parse(s.trim, fmt); true
        } catch {
          case _: Exception =>
            try { java.time.LocalDate.parse(s.trim, fmt); true }
            catch { case _: Exception => false }
        }
      } => f
    }
  }

  /** Collect up to SampleSize non-null values of `c` (one small limit-pushdown
    * job — never a full scan).
    */
  def sample(df: DataFrame, c: String): Seq[String] =
    df.select(col(c)).filter(col(c).isNotNull).limit(SampleSize)
      .collect().map(_.getString(0)).toSeq

  /** Fit on a sample, returning the transform column (None = rejected). */
  def fitCol(df: DataFrame, c: String): Option[Column] =
    guessFormat(sample(df, c)).map(f => try_to_timestamp(col(c), lit(f)))

  /** Eager form: parse `c` with a guessed format; rejected -> unchanged df. */
  def toDatetime(df: DataFrame, c: String): DataFrame =
    fitCol(df, c).map(expr => df.withColumn(c, expr)).getOrElse(df)
}
