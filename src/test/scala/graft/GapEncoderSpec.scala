package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.encoders.GapEncoder
import graft.functions.NgramVec

/** GapEncoder: KL divergence decreases under the multiplicative updates,
  * activations are positive and deterministic, similar strings get closer
  * topic activations than dissimilar ones.
  */
class GapEncoderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val values = Seq("london kings cross", "london bridge",
    "london victoria", "paris nord", "paris est", "berlin hbf")

  test("multiplicative updates monotonically decrease KL divergence") {
    val v = values.map(NgramVec.tf(_, 64)).toArray
    val (h0, w0) = GapEncoder.nmf(v, 3, maxIter = 1)
    val (h5, w5) = GapEncoder.nmf(v, 3, maxIter = 5)
    val (h30, w30) = GapEncoder.nmf(v, 3, maxIter = 30)
    val d1 = GapEncoder.klDivergence(v, h0, w0)
    val d5 = GapEncoder.klDivergence(v, h5, w5)
    val d30 = GapEncoder.klDivergence(v, h30, w30)
    assert(d5 <= d1 && d30 <= d5, s"KL not decreasing: $d1, $d5, $d30")
  }

  test("encode: shape, positivity, determinism, null passthrough") {
    val df = (values :+ null).toDF("v")
    val out1 = GapEncoder.encode(df, "v", nComponents = 3, nBuckets = 64)
    assert(out1.columns.count(_.startsWith("v_gap_")) === 3)
    val acts = out1.filter($"v".isNotNull)
      .select("v_gap_0", "v_gap_1", "v_gap_2").collect()
    acts.foreach(r => (0 until 3).foreach(i => assert(r.getDouble(i) > 0)))
    assert(out1.filter($"v".isNull).head().isNullAt(1))
    val out2 = GapEncoder.encode(df, "v", nComponents = 3, nBuckets = 64)
    assert(out1.orderBy($"v").collect().map(_.toString) ===
      out2.orderBy($"v").collect().map(_.toString))
  }

  test("similar strings land closer in topic space than dissimilar ones") {
    val df = values.toDF("v")
    val out = GapEncoder.encode(df, "v", nComponents = 3, nBuckets = 64)
      .collect().map(r => r.getString(0) ->
        Array(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    def norm(a: Array[Double]) = {
      val s = math.sqrt(a.map(x => x * x).sum); a.map(_ / s)
    }
    def cos(a: Array[Double], b: Array[Double]) =
      norm(a).zip(norm(b)).map { case (x, y) => x * y }.sum
    val londonPair = cos(out("london kings cross"), out("london bridge"))
    val crossPair = cos(out("london kings cross"), out("berlin hbf"))
    assert(londonPair > crossPair,
      s"london-london $londonPair <= london-berlin $crossPair")
  }

  test("partialFit folds batches in: KL on all seen data shrinks with batches") {
    val batch1 = values.take(3).toDF("city")
    val batch2 = values.drop(3).toDF("city")
    val m0 = GapEncoder.initOnline("city", nComponents = 3, nBuckets = 64)
    val m1 = GapEncoder.partialFit(m0, batch1)
    val m2 = GapEncoder.partialFit(m1, batch2)
    // more passes over the SAME data keep improving the fit
    val m3 = GapEncoder.partialFit(GapEncoder.partialFit(m2, batch1), batch2)
    val v = values.map(NgramVec.tf(_, 64)).toArray
    def klOf(m: GapEncoder.OnlineModel): Double = {
      val h = values.map(x => m.hDict(x)).toArray
      GapEncoder.klDivergence(v, h, m.w)
    }
    assert(m2.hDict.size === 6)
    assert(klOf(m3) < klOf(m2), s"${klOf(m3)} !< ${klOf(m2)}")
    // determinism: replaying the same batches yields the same topics
    val m2b = GapEncoder.partialFit(
      GapEncoder.partialFit(GapEncoder.initOnline("city", 3, 64), batch1), batch2)
    assert(m2b.w.flatten.toSeq === m2.w.flatten.toSeq)
  }

  test("beyond-cap corpora fit via hash-partitioned partialFit with bounded state") {
    // The documented recourse for a messy column with more distinct values
    // than encode's maxDistinct cap: slice the distinct stream by a hash of
    // the value and fold each slice in with partialFit. Here the "cap" is
    // 40 and the corpus has 120 distinct values; per-batch driver state
    // must stay within maxBatchDistinct and the LRU dictionary cap.
    val many = (0 until 120).map(i => s"city street $i block ${i % 7}")
    val df = many.toDF("city")
    val cap = 40
    val nBatches = 4
    var m = GapEncoder.initOnline("city", nComponents = 3, nBuckets = 64)
    for (b <- 0 until nBatches) {
      val slice = df.filter(org.apache.spark.sql.functions
        .abs(org.apache.spark.sql.functions.hash(col("city"))) % nBatches === b)
      m = GapEncoder.partialFit(m, slice, maxBatchDistinct = cap, maxHDict = 100)
      assert(m.hDict.size <= 100, s"hDict grew past the cap: ${m.hDict.size}")
    }
    // every distinct value was genuinely folded into the fit (modulo LRU)
    assert(m.hDict.size === math.min(120, 100))
    // and the model transforms the full corpus (seen replay + H-step)
    val out = m.transform(df)
    assert(out.count() === 120)
    // a single over-cap batch still fails loudly, pointing at this recourse
    val e = intercept[IllegalArgumentException] {
      GapEncoder.partialFit(GapEncoder.initOnline("city", 3, 64), df,
        maxBatchDistinct = cap)
    }
    assert(e.getMessage.contains("partialFit once per slice"))
  }

  test("online model save/load round-trips bit-identically and keeps fitting") {
    val m = GapEncoder.partialFit(
      GapEncoder.initOnline("city", nComponents = 3, nBuckets = 64),
      values.take(3).toDF("city"))
    val loaded = GapEncoder.loadOnline(GapEncoder.saveOnline(m))
    assert(loaded.w.flatten.toSeq === m.w.flatten.toSeq)
    assert(loaded.hDict.keySet === m.hDict.keySet)
    // a loaded model continues partial-fitting identically to the original
    val next = values.drop(3).toDF("city")
    val cont = GapEncoder.partialFit(loaded, next)
    val direct = GapEncoder.partialFit(m, next)
    assert(cont.w.flatten.toSeq === direct.w.flatten.toSeq)
  }

  test("online transform replays seen values and H-steps unseen ones") {
    val m = GapEncoder.partialFit(
      GapEncoder.initOnline("city", nComponents = 3, nBuckets = 64),
      values.toDF("city"))
    val out = m.transform(
      (values :+ "marseille st charles").toDF("city").withColumn("k", lit(1)))
    assert(out.count() === 7)
    val gaps = out.filter(col("city") === "marseille st charles")
      .select("city_gap_0", "city_gap_1", "city_gap_2").collect()(0)
    assert((0 until 3).forall(i => gaps.getDouble(i) > 0.0)) // unseen encoded
    val seen = out.filter(col("city") === "london bridge")
      .select("city_gap_0").collect()(0).getDouble(0)
    assert(math.abs(seen - m.hDict("london bridge")(0)) < 1e-12)
  }
}
