package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch phase-timing diagnostics (not part of the library surface). */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm up
    time("warmup full")(Dedup.deduplicate(docs, "text", minJaccard = 0.4).count())

    import org.apache.spark.storage.StorageLevel
    val vals = docs.filter(col("text").isNotNull).groupBy(col("text").as("v"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("id", md5(col("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("vals materialize")(vals.count())
    val pairs = Dedup.ngramJaccardPairs(
      vals.select(col("v").as("text"), col("id")), "text", "id",
      n = 3, minJaccard = 0.4)
    val pc = time("pairs compute")(pairs.persist(StorageLevel.MEMORY_AND_DISK).count())
    println(s"[diag] n_pairs=$pc n_vals=${vals.count()}")
    val (labels, blocks) = time("cc loop")(
      graft.operators.DedupDiag.cc(vals.select(col("id")), pairs))
    time("labels count")(labels.count())
    val labeled = vals.join(labels, Seq("id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("label"))
    val out = labeled
      .withColumn("canonical",
        min_by(col("v"), struct(negate(col("freq")), col("v"))).over(w))
      .select(col("v").as("value"), col("canonical"))
    time("window+checkpoint")(out.localCheckpoint().count())
    time("full again")(Dedup.deduplicate(docs, "text", minJaccard = 0.4).count())
    // mimic Bench's inter-query hygiene, then re-time
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
    time("full after bench-clear")(Dedup.deduplicate(docs, "text", minJaccard = 0.4).count())
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
    time("full after bench-clear 2")(Dedup.deduplicate(docs, "text", minJaccard = 0.4).count())
    spark.stop()
  }
}
