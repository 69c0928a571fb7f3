package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Time-series feature engineering over event streams — the two stations
  * every temporal feature pipeline runs besides sessionization and as-of
  * enrichment:
  *
  *  - `rolling`: per-row trailing-window aggregates ("events / value sum
  *    over the last hour for this user, as of this event") via a
  *    RANGE-framed window on the microsecond timeline — declarative, ONE
  *    key-partitioned shuffle, and point-in-time correct by construction
  *    (the frame ends at the current row, so no future leakage — the
  *    property training-feature joins must prove);
  *  - `resample`: fixed-bucket downsampling (counts/aggregates per key per
  *    aligned time bucket) via integer bucket arithmetic on unix_micros —
  *    one groupBy, map-side combined, no window at all.
  *
  * Both are pure Spark built-ins on purpose: the declarative forms are
  * exactly what Catalyst optimizes well, and both reproduce in SQL for
  * the hash oracle (DuckDB RANGE BETWEEN INTERVAL / integer bucketing).
  */
object TimeFeatures {

  /** For each input row: aggregates over rows of the same keys whose
    * timestamp lies in [ts - windowUs, ts] (inclusive trailing window).
    * `aggs` maps output name -> a raw AGGREGATE column (count/sum/min/...)
    * — the frame is applied here; wrap casts/arithmetic around the output
    * column afterwards (a cast around the aggregate would displace the
    * window application and analyze as a group-by-less aggregate).
    */
  def rolling(df: DataFrame, on: Seq[String], tsCol: String, windowUs: Long,
              aggs: Seq[(String, Column)]): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowUs, 0)
    aggs.foldLeft(df) { case (d, (name, agg)) =>
      d.withColumn(name, agg.over(w))
    }
  }

  /** The family's shared per-key total order: partition by `on`, order by
    * (tsCol, tieCols). ONE definition of the tie-break/null-ordering
    * contract for interArrival / fillForward / lagFeatures / ewma — the
    * order-dependent operators cannot silently diverge.
    */
  private def keyedWindow(on: Seq[String], tsCol: String,
                          tieCols: Seq[String]) =
    Window.partitionBy(on.map(col): _*)
      .orderBy((col(tsCol) +: tieCols.map(col)): _*)

  /** `keyedWindow` with the running ROWS frame (unbounded preceding →
    * current) the fold/fill operators consume.
    */
  private def runningWindow(on: Seq[String], tsCol: String,
                            tieCols: Seq[String]) =
    keyedWindow(on, tsCol, tieCols)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Inter-arrival features: per-key time since the PREVIOUS event
    * (`gap_us`, null on each key's first event) and the 1-based event
    * index (`event_seq`) — the standard recency/position features of
    * behavioral models, and the raw material of sessionization gaps.
    * One key shuffle + per-key sort; `tieCols` complete the total order.
    */
  def interArrival(df: DataFrame, on: Seq[String], tsCol: String,
                   tieCols: Seq[String]): DataFrame = {
    val w = keyedWindow(on, tsCol, tieCols)
    df.withColumn("gap_us",
        unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("event_seq", row_number().over(w).cast(LongType))
  }

  /** Per-key forward fill (pandas `ffill` within groups): each null in
    * `cols` takes the most recent non-null value of the same key in
    * (tsCol, tieCols) order; leading nulls stay null. The sensor-feed /
    * sparse-observation repair step of a feature pipeline. One key
    * shuffle + per-key sort shared by every filled column — the running
    * `last(ignoreNulls)` frame is O(rows) per key.
    */
  def fillForward(df: DataFrame, on: Seq[String], tsCol: String,
                  tieCols: Seq[String], cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fillForward: no columns to fill")
    val clashes = cols.map(_ + "_ffill").filter(df.columns.contains)
    require(clashes.isEmpty,
      s"fillForward: output columns ${clashes.mkString(", ")} already " +
        "exist — refusing to silently overwrite (was fillForward applied twice?)")
    val w = runningWindow(on, tsCol, tieCols)
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c + "_ffill", last(col(c), ignoreNulls = true).over(w)))
  }

  /** Per-key lagged copies of `valueCol` at each offset in `lags`
    * (`<value>_lag_<n>`, null where the key has no n-th predecessor) —
    * the autoregressive feature block. Same one-shuffle/per-key-sort
    * shape as `interArrival`; all lags share the single sort.
    */
  def lagFeatures(df: DataFrame, on: Seq[String], tsCol: String,
                  tieCols: Seq[String], valueCol: String,
                  lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ > 0),
      s"lagFeatures: lags must be positive, got $lags")
    val w = keyedWindow(on, tsCol, tieCols)
    lags.foldLeft(df)((d, n) =>
      d.withColumn(s"${valueCol}_lag_$n", lag(col(valueCol), n).over(w)))
  }

  /** Per-key exponentially weighted moving average of `valueCol` in event
    * order (pandas `ewm(alpha, adjust=False)` semantics: y_0 = x_0,
    * y_i = (1-alpha)*y_{i-1} + alpha*x_i, nulls carry the previous value).
    * `tieCols` complete the (tsCol, tieCols) total order — required: the
    * recurrence is order-dependent, so ties must be broken
    * deterministically, and the ROWS running frame feeds the fold one row
    * at a time in exactly that order. One shuffle on `on` + one per-key
    * sort, O(rows) fold per key — no quadratic re-folds at any stream
    * length (see functions.Ewma).
    */
  def ewma(df: DataFrame, on: Seq[String], tsCol: String, tieCols: Seq[String],
           valueCol: String, alpha: Double,
           outCol: String = "ewma"): DataFrame = {
    val w = runningWindow(on, tsCol, tieCols)
    df.withColumn(outCol,
      graft.functions.Ewma.ewma(col(valueCol).cast(
        org.apache.spark.sql.types.DoubleType), alpha).over(w))
  }

  /** Aligned fixed-width buckets: one row per (keys, bucket) with count
    * and value aggregates; `bucket_start` is the bucket's inclusive lower
    * timestamp. Epoch-aligned integer arithmetic (floor-division of
    * unix_micros) — identical in any engine, no calendar semantics.
    */
  def resample(df: DataFrame, on: Seq[String], tsCol: String,
               bucketUs: Long, valueCol: String): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val bucket = floor(unix_micros(col(tsCol)) / bucketUs).cast(LongType)
    df.withColumn("__b", bucket)
      .groupBy((on.map(col) :+ col("__b")): _*)
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol)
          .cast(org.apache.spark.sql.types.DecimalType(12, 2)))
          .cast(org.apache.spark.sql.types.DoubleType), 2).as("value_sum"),
        min(col(tsCol)).as("first_ts"), max(col(tsCol)).as("last_ts"))
      .withColumn("bucket_start", timestamp_micros(col("__b") * bucketUs))
      .drop("__b")
  }
}
