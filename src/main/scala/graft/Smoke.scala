package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: executes the driver contract's `entry` flagship
  * pipeline exactly as the driver would and prints the row/column counts.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n cols=${df.columns.length}")
    println(s"[smoke] columns: ${df.columns.mkString(", ")}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
