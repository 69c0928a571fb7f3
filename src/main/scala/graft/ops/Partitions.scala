package graft.ops

import org.apache.spark.sql.DataFrame

/** Partition-count heuristic for the CPU-spreading repartitions.
  *
  * Context (BASELINE.md round-6 "single-task-scan trap"): projections below
  * the first exchange run inside the scan's task, so hash-heavy kernels
  * (minhash/simhash/TF-IDF/bucketing) repartition their raw input with an
  * EXPLICIT count — a bare repartition(col) is REPARTITION_BY_COL, which AQE
  * coalesces back to one partition for small-bytes inputs. Round 6 always
  * used defaultParallelism for that count: 32 shuffle tasks even for a
  * kilobyte vocabulary, pure scheduling overhead that magnifies under box
  * load (the round-6 driver-bench regression suspect). The count is instead
  * derived from the optimizer's size ESTIMATE (parquet file bytes scaled by
  * column pruning — driver-side stats, no job): one task per `bytesPerTask`,
  * floored at `minTasks` so per-row hashing is never serialized back onto
  * one core, capped at defaultParallelism (on a real cluster the byte count
  * dominates and the cap is what binds — the heuristic only matters for
  * small inputs).
  */
object Partitions {

  /** Tasks for a CPU-bound per-row kernel over `df`: 16 KiB of estimated
    * input per task — chosen so the sf0.1 bench tables (0.6-10 MB) still
    * spread across all 32 local cores, while a small dimension/vocabulary
    * stops paying full-width shuffle overhead.
    */
  def cpuSpread(df: DataFrame, bytesPerTask: Long = 1L << 14,
                minTasks: Int = 8): Int = {
    val max = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val byBytes =
      if (bytes > BigInt(Long.MaxValue)) max
      else math.ceil(bytes.toDouble / bytesPerTask).toInt
    math.max(math.min(minTasks, max), math.min(byBytes, max))
  }
}
