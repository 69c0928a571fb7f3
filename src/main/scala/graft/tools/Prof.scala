package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"TIMER $label ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val orders = graft.ops.Kernel.table(spark, dir, "orders")
      .withColumn("status_copy", col("o_orderstatus"))
    // warmup (codegen/JIT)
    graft.operators.ColumnAssociations.allPairs(orders).collect()
    time("allPairs_total") {
      graft.operators.ColumnAssociations.allPairs(orders).collect()
    }
    val cols = orders.columns.toSeq
    time("fitBins_only") {
      graft.operators.ColumnAssociations.fitBins(orders, cols)
    }
    val plans = graft.operators.ColumnAssociations.fitBins(orders, cols)
    val binned = orders.select(plans.labels.map(_._2): _*)
    time("binned_scan_only") { binned.count() }
    binned.createOrReplaceTempView("__prof_binned")
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.length }
      yield (cols(i), cols(j))
    val sets = pairs.map { case (a, b) => s"(`$a`, `$b`)" }.mkString(", ")
    val gs = spark.sql(
      s"SELECT ${cols.map(c => s"`$c`").mkString(", ")}, count(1) AS __cnt " +
        s"FROM __prof_binned GROUP BY GROUPING SETS ($sets)")
    time("grouping_sets_only") { gs.count() }
    spark.stop()
  }
}
