package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Hive-style partitioned parquet layout — the directory-pruning half of
  * the storage story next to `Bucketize`'s co-located joins. The fixtures
  * are flat parquet; a 100 TB corpus is date/source-partitioned, and the
  * difference between "scan one day" and "scan three years" is whether
  * the partition filter prunes DIRECTORIES before any I/O is scheduled.
  *
  * There is nothing custom in the read path — `spark.read.parquet` plans
  * partition pruning by itself when the filter touches a partition
  * column. What this object adds is (a) the layout-writing convention and
  * (b) `scanEvidence`, which extracts the proof from an executed plan
  * (files actually read, the partition filters that pruned, the data
  * filters pushed into parquet), so specs and rehearsals assert pruning
  * instead of assuming it. PlanShapeSpec pins the behavior; BASELINE.md
  * carries the measured pruned-vs-flat rehearsal row.
  */
object Partitioned {

  /** Write a partitioned layout: one directory per distinct value chain
    * of `partitionCols` (`.../col1=v1/col2=v2/part-*.parquet`). Choose
    * low-cardinality, filter-bearing columns (event date, source) —
    * thousands of directories prune beautifully; millions of tiny ones
    * drown the driver in file listing instead.
    */
  def write(df: DataFrame, path: String, partitionCols: Seq[String],
            mode: String = "overwrite"): Unit = {
    require(partitionCols.nonEmpty, "partition columns must be non-empty")
    df.write.partitionBy(partitionCols: _*).mode(mode).parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Pruning proof extracted from an executed frame's file scan. */
  final case class ScanEvidence(numFiles: Long, partitionFilters: String,
                                pushedFilters: String)

  /** Execute `df` and report what its (first) parquet scan actually did:
    * `numFiles` is the runtime metric — files READ after pruning, not
    * files present — and the two filter strings are the planning-time
    * metadata (`PartitionFilters` prune directories, `PushedFilters`
    * reach the parquet row groups).
    */
  def scanEvidence(df: DataFrame): ScanEvidence = {
    // execute THIS frame's QueryExecution without materializing rows on
    // the driver (collect would OOM on a large corpus; a count() would
    // run a separate QueryExecution and leave this plan's AQE
    // un-finalized)
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(throw new IllegalStateException(
      s"no FileSourceScanExec in:\n$plan"))
    ScanEvidence(scan.metrics("numFiles").value,
      scan.metadata.getOrElse("PartitionFilters", ""),
      scan.metadata.getOrElse("PushedFilters", ""))
  }
}
