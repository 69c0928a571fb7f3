package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication (SURVEY §2.11 companion to
  * graft.operators.Dedup.exact): at training-data-pipeline scale the dedup
  * usually runs as documents ARRIVE, not as a batch sweep — Structured
  * Streaming's `dropDuplicatesWithinWatermark` keeps per-key state only
  * until the watermark passes, so state is bounded by the late-data window
  * rather than corpus history.
  *
  * Batch frames accept the same call with the deterministic twin semantic:
  * the EARLIEST event per key wins (ties broken by the remaining columns),
  * which is the steady-state outcome of the streaming form (the first
  * arrival suppresses later duplicates) and is exactly reproducible by a
  * SQL oracle — a bare `dropDuplicates` would keep an arbitrary row.
  */
object StreamingDedup {

  /** Keep one row per `keys`: streaming = first-arrival-within-watermark;
    * batch = minimum (tsCol, remaining columns) row per key.
    */
  def dedupStream(df: DataFrame, keys: Seq[String], tsCol: String,
                  watermark: String = "10 minutes"): DataFrame = {
    if (df.isStreaming)
      df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keys)
    else {
      val others = df.columns.filterNot(keys.contains).toSeq
      val payload = struct(others.map(col): _*)
      val order = struct((col(tsCol) +: others.filterNot(_ == tsCol).map(col)): _*)
      df.groupBy(keys.map(col): _*)
        .agg(min_by(payload, order).as("__p"))
        .select(keys.map(col) ++ others.map(c => col(s"__p.$c").as(c)): _*)
    }
  }
}
