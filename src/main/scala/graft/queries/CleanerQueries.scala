package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Kernel
import graft.operators.{Cleaner, ToDatetime}

/** ToDatetime / Cleaner / duration queries with DuckDB oracles. Fixture
  * strings are rendered deterministically from typed columns inside the
  * query (same pattern as q_to_float_locale), so the parse path is fully
  * exercised and fully verifiable.
  */
object CleanerQueries {

  private def t(s: SparkSession, dir: String, n: String) = Kernel.table(s, dir, n)

  private val markersIn = Kernel.DefaultNullMarkers
    .map(m => s"'${m.replace("'", "''")}'").mkString("(", ", ", ")")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ToDatetime: guess "dd.MM.yyyy HH:mm:ss" from a 30-row sample, parse back
    "q_to_datetime" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "dd.MM.yyyy HH:mm:ss").as("od_str"))
      ToDatetime.toDatetime(o, "od_str")
    }),

    // Cleaner: null-string cleaning, uninformative drops, datetime + float
    // parsing, all composed; const/null columns must disappear.
    "q_cleaner" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val messy = o.select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("od_str"),
        col("o_totalprice").cast(DecimalType(12, 2)).cast(StringType).as("price_str"),
        when(col("o_orderstatus") === "F", "N/A")
          .otherwise(col("o_orderstatus")).as("status_m"),
        lit("X").as("const_col"),
        lit(null).cast(StringType).as("null_col"))
      Cleaner.fitTransform(messy)
    }),

    // DurationToFloat / total_seconds: seconds into the day of each event
    "q_duration_seconds" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.select(col("event_id"),
        Kernel.totalSecondsBetween(col("ts"), date_trunc("day", col("ts")))
          .as("secs_into_day"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_to_datetime" ->
      """SELECT o_orderkey,
        |  strptime(strftime(o_orderdate, '%d.%m.%Y %H:%M:%S'),
        |           '%d.%m.%Y %H:%M:%S') AS od_str
        |FROM orders""".stripMargin,

    "q_cleaner" ->
      s"""SELECT o_orderkey,
         |  strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
         |           '%Y-%m-%d %H:%M:%S') AS od_str,
         |  TRY_CAST(trim(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR))
         |    AS DOUBLE) AS price_str,
         |  CASE WHEN trim(CASE WHEN o_orderstatus = 'F' THEN 'N/A'
         |                      ELSE o_orderstatus END) IN $markersIn THEN NULL
         |       ELSE trim(CASE WHEN o_orderstatus = 'F' THEN 'N/A'
         |                      ELSE o_orderstatus END) END AS status_m
         |FROM orders""".stripMargin,

    "q_duration_seconds" ->
      """SELECT event_id,
        |  (epoch_us(ts) - epoch_us(date_trunc('day', ts))) / 1000000.0
        |    AS secs_into_day
        |FROM events""".stripMargin
  )
}
