package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    // Untimed warmup: run the alphabetically-first query once so JVM startup,
    // codegen compilation, and parquet-footer reads are not billed to it
    // (round 2's q1_agg absorbed ~5s of warmup and corrupted cross-round
    // comparison).
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    try ordered.head._2(spark, sfDir).count() catch { case _: Throwable => () }
    // A failed query must never read as a fast time: it is emitted as null
    // in `queries` (consumers summing timings skip it) and its error surfaces
    // in `errors` + a nonzero exit.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = ordered.map { case (name, fn) =>
      // Queries are independent: drop any cached plans or persisted blocks a
      // previous query left behind (outside the timed section) so its
      // storage-memory pressure is not billed to this one — the DuckDB
      // oracle baseline runs every query in a fresh process, this is the
      // same discipline.
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        name -> Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
          errors(name) = msg
          System.err.println(s"[bench] FAILED $name: $msg")
          name -> None
      }
    }
    val qs = results.map { case (k, v) =>
      s"\"" + esc(k) + "\":" + v.fold("null")(_.toString)
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"\"${esc(k)}\":\"${esc(v)}\"" }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
