package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence tool for the canonical-map connected-components paths at Nx
  * scale (r17 verdict task 7): run `Dedup.deduplicate` over the SAME
  * corpus twice — once with the default driver-side union-find fast path
  * (pair graph collected when it fits under maxDriverPairs) and once with
  * `maxDriverPairs = 0`, which forces the distributed min-label-
  * propagation loop — and report wall time, job count, and total shuffle
  * read/write bytes for each, plus the pair-graph size that drives the
  * routing. The two variants must return identical translation maps
  * (asserted here), so the comparison is purely about the CC mechanism.
  *
  * Usage: runMain graft.tools.CcRehearsal [corpusDir] [textCol]
  *        (default /tmp/graft-sf10x, "text"; reads documents.parquet)
  */
object CcRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf10x")
    val textCol = if (args.length > 1) args(1) else "text"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config(graft.Sessions.CodegenCacheKey, graft.Sessions.CodegenCacheEntries)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val jobs = new AtomicInteger()
    val shufR = new AtomicLong()
    val shufW = new AtomicLong()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        shufR.addAndGet(e.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    }

    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }

    def run(label: String, maxDriverPairs: Int): Array[org.apache.spark.sql.Row] = {
      clear()
      jobs.set(0); shufR.set(0); shufW.set(0)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val out = graft.operators.Dedup.deduplicate(docs, textCol,
        minJaccard = 0.4, maxDriverPairs = maxDriverPairs)
      val rows = out.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300)
      println(f"CCREHEARSAL $label wall=$wall%.2f s jobs=${jobs.get()} " +
        f"shufR=${shufR.get() / 1e6}%.1f MB shufW=${shufW.get() / 1e6}%.1f MB " +
        s"rows=${rows.length}")
      out.rdd.unpersist(false)
      rows
    }

    // pair-graph size (the routing driver): same generator deduplicate uses
    val nPairs = {
      val vals = docs.filter(col(textCol).isNotNull)
        .groupBy(col(textCol).as("text"))
        .agg(count(lit(1)).as("freq"))
        .withColumn("id", md5(col("text")))
      graft.operators.Dedup.minhashLshPairs(vals, "text", "id",
        n = 3, minJaccard = 0.4).count()
    }
    println(s"CCREHEARSAL pair-graph edges=$nPairs (driver path taken when <= 1000000)")

    // warmup (codegen/JIT for both paths)
    run("warmup-driver", maxDriverPairs = 1000000)
    run("warmup-distributed", maxDriverPairs = 0)
    val a = run("driver-union-find", maxDriverPairs = 1000000)
    val b = run("distributed-cc", maxDriverPairs = 0)
    val same = a.map(r => (r.getString(0), r.getString(1))).sorted.toSeq ==
      b.map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    println(s"CCREHEARSAL translation-maps-identical=$same")
    require(same, "the two CC paths must produce identical canonical maps")
    spark.stop()
  }
}
