package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.encoders.{MinHashEncoder, SimilarityEncoder, SquashingScaler, StringEncoder, TableVectorizer}

/** Encoder invariants: MinHash join-back alignment, StringEncoder SVD
  * determinism + shape, TableVectorizer routing incl. the high-cardinality
  * path and the exact-count threshold boundary, similarity self-identity,
  * squashing bounds.
  */
class EncodersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MinHashEncoder: same value -> same signature; nulls stay null") {
    val df = Seq("alpha", "beta", "alpha", null).toDF("v")
    val out = MinHashEncoder.encode(df, "v", nComponents = 4)
    assert(out.columns.count(_.startsWith("v_minhash_")) === 4)
    val byVal = out.collect().groupBy(r => Option(r.getString(0)))
    assert(byVal(Some("alpha")).map(_.getDouble(1)).distinct.length === 1)
    assert(byVal(None).forall(_.isNullAt(1)))
  }

  test("StringEncoder: shape, determinism, null passthrough") {
    val df = TestSpark.table("customer").select($"c_custkey", $"c_name").limit(200)
    val out1 = StringEncoder.encode(df, "c_name", nComponents = 8, nBuckets = 64)
    assert(out1.columns.count(_.startsWith("c_name_svd_")) === 8)
    val out2 = StringEncoder.encode(df, "c_name", nComponents = 8, nBuckets = 64)
    val a = out1.orderBy($"c_custkey").collect().map(_.toString)
    val b = out2.orderBy($"c_custkey").collect().map(_.toString)
    assert(a === b) // deterministic incl. eigenvector sign convention
    val withNull = df.withColumn("c_name",
      when($"c_custkey" % 2 === 0, $"c_name"))
    val outN = StringEncoder.encode(withNull, "c_name", 4, 64)
    assert(outN.filter($"c_name".isNull && $"c_name_svd_0".isNotNull).count() === 0)
  }

  test("StringEncoder components are energy-ordered (uncentered SVD)") {
    val df = TestSpark.table("customer").select($"c_name").limit(300)
    val out = StringEncoder.encode(df, "c_name", nComponents = 4, nBuckets = 64)
    // TruncatedSVD is uncentered: components order by E[x^2] (eigenvalues of
    // the Gram), not by variance — the top component is the common direction
    val energy = (0 until 4).map { i =>
      out.agg(avg(col(s"c_name_svd_$i") * col(s"c_name_svd_$i")))
        .head().getDouble(0)
    }
    assert(energy === energy.sorted.reverse)
  }

  test("TableVectorizer routes kinds and executes the high-card join path") {
    val cust = TestSpark.table("customer")
    val model = TableVectorizer.fit(cust)
    val kinds = model.columnToKind.toMap
    assert(kinds("c_name") === TableVectorizer.HighCardinality)
    assert(kinds("c_mktsegment") === TableVectorizer.LowCardinality)
    assert(kinds("c_acctbal") === TableVectorizer.Numeric)
    val out = model.transform(cust)
    assert(out.columns.count(_.startsWith("c_name_minhash_")) === 30)
    assert(out.columns.contains("c_mktsegment_BUILDING"))
    assert(out.count() === cust.count())
  }

  test("TableVectorizer threshold boundary uses an exact distinct count") {
    // exactly threshold-1 distinct values -> LowCardinality even though the
    // HLL estimate may wobble around the boundary
    val n = 39
    val df = spark.range(1000).select(
      (col("id") % n).cast("string").as("v"))
    val model = TableVectorizer.fit(df, cardinalityThreshold = 40)
    assert(model.columnToKind.toMap.apply("v") === TableVectorizer.LowCardinality)
  }

  test("SimilarityEncoder: self-similarity is 1, null maps to null") {
    val df = Seq("apple", "orange", null).toDF("v")
    val out = SimilarityEncoder.encode(df, "v")
    val rows = out.collect().map(r => Option(r.getString(0)) -> r).toMap
    assert(rows(Some("apple")).getAs[Double]("v_sim_apple") === 1.0)
    assert(rows(Some("orange")).getAs[Double]("v_sim_orange") === 1.0)
    assert(rows(Some("apple")).getAs[Double]("v_sim_orange") < 1.0)
    assert(rows(None).isNullAt(out.columns.indexOf("v_sim_apple")))
  }

  test("fit-time persists are released: no leaked blocks after encode/deduplicate") {
    import spark.implicits._
    val sc = spark.sparkContext
    // drain anything earlier suites left (e.g. lazy operators whose persist
    // is released by the ContextCleaner, not eagerly)
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val before = sc.getPersistentRDDs.keySet
    val df = Seq("london", "londres", "paris", "parris", "berlin")
      .toDF("city")
    // StringEncoder's driver-vocab path must leave NO persisted blocks
    graft.encoders.StringEncoder.encode(df, "city", nComponents = 4).count()
    val afterEncode = sc.getPersistentRDDs.keySet -- before
    assert(afterEncode.isEmpty,
      s"StringEncoder leaked persisted RDDs: $afterEncode")
    // deduplicate frees every INTERMEDIATE (vals persist, CC label
    // checkpoints); the single surviving block is the checkpoint backing its
    // returned frame, released with the result like any consumer-owned frame
    graft.operators.Dedup.deduplicate(df, "city", minJaccard = 0.3).count()
    val afterDedup = sc.getPersistentRDDs.keySet -- before
    assert(afterDedup.size <= 1,
      s"deduplicate leaked intermediates beyond its result: $afterDedup")
  }

  test("SquashingScaler output is bounded by max_absolute_value") {
    val cust = TestSpark.table("customer")
    val out = SquashingScaler.fitTransform(cust, "c_acctbal", "scaled")
    val mx = out.agg(max(abs(col("scaled")))).head().getDouble(0)
    assert(mx <= 3.0)
  }
}
