package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Bucketize

/** Bucketed co-located joins: the layout pays the shuffle once, every
  * subsequent equi-join on the bucket keys plans with ZERO exchanges.
  * The plan assertion is the point — at 100 TB the absent shuffle IS the
  * feature, and a spec that only checked rows would let a silently
  * re-shuffling plan stay green.
  */
class BucketizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("co-located join on bucketed tables plans zero shuffle exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketize").toString
    val facts = (1 to 1000).map(i => (i % 97, i, s"f$i"))
      .toDF("k", "seq", "payload")
    val dims = (0 until 97).map(i => (i, s"dim$i")).toDF("k", "name")
    Bucketize.writeBucketed(facts, "graft_bkt_facts", s"$dir/facts", Seq("k"), 8)
    Bucketize.writeBucketed(dims, "graft_bkt_dims", s"$dir/dims", Seq("k"), 8)
    try {
      // broadcast off so the join actually exercises the bucketed SMJ path
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val joined = spark.table("graft_bkt_facts")
          .join(spark.table("graft_bkt_dims"), "k")
        assert(Bucketize.shuffleExchanges(joined) === 0,
          joined.queryExecution.executedPlan.toString)
        // and a bucket-key aggregate rides the same layout shuffle-free
        val agg = spark.table("graft_bkt_facts").groupBy("k").count()
        assert(Bucketize.shuffleExchanges(agg) === 0)
        assert(joined.count() === 1000)
        // same rows as the plain (shuffling) join
        val plain = facts.join(dims, "k")
        assert(joined.select("k", "seq", "payload", "name").collect().toSet ===
          plain.select("k", "seq", "payload", "name").collect().toSet)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_dims")
    }
  }

  test("writes emit exactly one sorted file per bucket, appends one per " +
    "batch-bucket, and compact restores one per bucket (r16: the write is " +
    "clustered by the bucket key — without it each task wrote one file per " +
    "bucket it saw, M*B small files per layout)") {
    def parquetFiles(d: String) = new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val dir = java.nio.file.Files.createTempDirectory("graft_bktfiles").toString
    // >1 upstream partition so the old shape would multiply files per task
    val df = (1L to 5000L).map(i => (i, s"v$i")).toDF("k", "v").repartition(4)
    Bucketize.writeBucketed(df, "graft_bkt_files", s"$dir/t", Seq("k"), 4)
    try {
      assert(parquetFiles(s"$dir/t") === 4,
        "a fresh write must emit exactly numBuckets files")
      Bucketize.appendBucketed(
        (5001L to 9000L).map(i => (i, s"v$i")).toDF("k", "v").repartition(4),
        "graft_bkt_files", Seq("k"))
      assert(parquetFiles(s"$dir/t") === 8,
        "an append adds at most one file per bucket")
      // compaction: back to one sorted file per bucket, zero-shuffle
      // rewrite (the scan is pinned bucketed — one task merges one bucket)
      val dirC = java.nio.file.Files.createTempDirectory("graft_bktfiles2")
        .toString
      Bucketize.compact(spark, "graft_bkt_files", s"$dirC/t")
      assert(parquetFiles(s"$dirC/t") === 4,
        "compact must restore exactly one file per bucket")
      assert(spark.table("graft_bkt_files").count() === 9000)
    } finally spark.sql("DROP TABLE IF EXISTS graft_bkt_files")
  }

  test("mismatched bucket counts fall back to a shuffled but correct join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketize2").toString
    val a = (1 to 100).map(i => (i % 11, i)).toDF("k", "va")
    val b = (0 until 11).map(i => (i, s"b$i")).toDF("k", "vb")
    Bucketize.writeBucketed(a, "graft_bkt_a", s"$dir/a", Seq("k"), 8)
    Bucketize.writeBucketed(b, "graft_bkt_b", s"$dir/b", Seq("k"), 4)
    try {
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
        // one side re-shuffles (or both, depending on the planner's choice) —
        // correctness is unaffected
        assert(joined.count() === 100)
        assert(Bucketize.shuffleExchanges(joined) >= 1)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("date-partitioned layout prunes directories: a one-day filter reads " +
    "fewer files, the partition filter is in the plan, and data filters " +
    "still push into parquet") {
    import graft.sources.Partitioned
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val events = TestSpark.table("events")
      .withColumn("event_date", to_date(col("ts")))
    Partitioned.write(events, dir, Seq("event_date"))
    val back = Partitioned.read(spark, dir)

    val full = Partitioned.scanEvidence(
      back.select(col("event_id"), col("value")))
    val oneDay = back.filter(
      col("event_date") === events.agg(max(to_date(col("ts")))).head().getDate(0))
    val pruned = Partitioned.scanEvidence(
      oneDay.select(col("event_id"), col("value")))
    assert(pruned.numFiles < full.numFiles,
      s"one-day filter must read fewer files: ${pruned.numFiles} vs ${full.numFiles}")
    assert(pruned.partitionFilters.contains("event_date"),
      s"the date predicate must prune as a PartitionFilter, got: ${pruned.partitionFilters}")

    // a data-column predicate on the same layout pushes into parquet
    val dataFiltered = Partitioned.scanEvidence(
      back.filter(col("event_type") === "click")
        .select(col("event_id"), col("event_type")))
    assert(dataFiltered.pushedFilters.contains("event_type"),
      s"data predicate must reach PushedFilters, got: ${dataFiltered.pushedFilters}")

    // pruning changed I/O, never answers: equal to the flat-layout filter
    val viaFlat = events
      .filter(col("event_date") === events.agg(max(to_date(col("ts")))).head().getDate(0))
      .agg(count(lit(1)), sum(col("value"))).head()
    val viaPruned = oneDay.agg(count(lit(1)), sum(col("value"))).head()
    assert(viaPruned === viaFlat,
      "partitioned reads must return exactly the flat layout's rows")
  }
}
