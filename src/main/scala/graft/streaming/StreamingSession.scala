package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming surface (SURVEY §2.11): the reference has no streaming engine —
  * this is the "beyond reference" capability Spark provides for free, exposed
  * in the same vocabulary as the batch operators.
  *
  * `sessionizeStream` is the streaming twin of
  * graft.operators.SessionEncoder: Structured Streaming's `session_window`
  * maintains per-key session state with watermark-driven eviction, so the
  * same gap semantics run incrementally over an unbounded source. State per
  * key is bounded by the watermark delay — at 100 TB/day the state store
  * holds only open sessions, never history.
  *
  * Batch frames accept the same call (session_window works in batch mode),
  * which is how the semantics are unit-tested without a streaming sink.
  */
object StreamingSession {

  /** Per-(key, session-window) aggregates with a `gap`-based session window.
    *
    * @param df        streaming OR batch frame
    * @param keys      entity key columns
    * @param tsCol     event-time column (TimestampType)
    * @param gap       session gap, e.g. "300 seconds"
    * @param watermark late-data bound, e.g. "10 minutes" (streaming only)
    */
  def sessionizeStream(df: DataFrame, keys: Seq[String], tsCol: String,
                       gap: String, watermark: String = "10 minutes"): DataFrame = {
    val withWm =
      if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    withWm
      .groupBy((session_window(col(tsCol), gap) +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .select(keys.map(col) ++ Seq(
        col("session_window.start").as("window_start"),
        col("session_window.end").as("window_end"),
        col("n_events"), col("session_start"), col("session_end")): _*)
  }

  /** Windowed event counts with watermarking — the standard incremental
    * aggregation shape (tumbling window).
    */
  def windowedCounts(df: DataFrame, keys: Seq[String], tsCol: String,
                     window: String, watermark: String = "10 minutes"): DataFrame = {
    val withWm =
      if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    withWm
      .groupBy((org.apache.spark.sql.functions.window(col(tsCol), window) +:
        keys.map(col)): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(keys.map(col) ++ Seq(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_events")): _*)
  }
}
