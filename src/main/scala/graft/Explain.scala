package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan (and optionally times)
  * one named query from SparkEntry at a given SF dir.
  * Usage: runMain graft.Explain <queryName> [sfDir] [--run]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1 && !args(1).startsWith("--")) args(1)
                else "/root/testdata/sf0.01"
    val doRun = args.contains("--run")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (doRun) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"[explain] $name rows=$n in ${(System.nanoTime() - t0) / 1e9}%.2f sec"
        .replace("%.2f", f"${(System.nanoTime() - t0) / 1e9}%.2f"))
    }
    spark.stop()
  }
}
