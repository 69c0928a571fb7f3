package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance resampling: the weights must actually separate
  * target-like text from the rest, the model must round-trip through
  * persistence bit-identically, and the resample must be a deterministic
  * without-replacement top-k.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = TestSpark.table("documents")
    .select(col("doc_id"), col("text"), col("source"))

  private lazy val targetSource =
    docs.agg(min(col("source"))).head().getString(0)

  test("target-source documents score higher on average than the rest") {
    val target = docs.filter(col("source") === targetSource)
    val model = Dsir.fit(docs, target, "text", nBuckets = 2048)
    val w = Dsir.weights(docs, "text", "doc_id", model)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    val means = w.groupBy(col("source") === targetSource)
      .agg(avg(col("weight_micro"))).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"target mean ${means(true)} must exceed non-target ${means(false)}")
  }

  test("model save/load round-trips and reproduces weights bit-identically") {
    val target = docs.filter(col("source") === targetSource)
    val model = Dsir.fit(docs, target, "text", nBuckets = 512)
    val p = java.nio.file.Files.createTempDirectory("graft_dsir")
      .resolve("model.json").toString
    model.save(p)
    val back = Dsir.DsirModel.load(p)
    assert(back.nBuckets === model.nBuckets)
    assert(back.logRatio.toSeq === model.logRatio.toSeq)
    val a = Dsir.weights(docs, "text", "doc_id", model)
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = Dsir.weights(docs, "text", "doc_id", back)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("resample is a deterministic without-replacement top-k") {
    val target = docs.filter(col("source") === targetSource)
    val model = Dsir.fit(docs, target, "text", nBuckets = 512)
    val r1 = Dsir.resample(docs, "text", "doc_id", model, k = 10)
      .orderBy("rank").collect().map(_.toSeq)
    val r2 = Dsir.resample(docs, "text", "doc_id", model, k = 10)
      .orderBy("rank").collect().map(_.toSeq)
    assert(r1.length === 10)
    assert(r1.toSeq === r2.toSeq, "md5-derived Gumbel draws are deterministic")
    assert(r1.map(_.head).distinct.length === 10, "without replacement")
    // ranks are keyed strictly: key_micro non-increasing in rank
    val keys = r1.map(_(2).asInstanceOf[Long])
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
  }

  test("selectFraction keeps ~frac by a clean key threshold, no driver list") {
    val target = docs.filter(col("source") === targetSource)
    val model = Dsir.fit(docs, target, "text", nBuckets = 512)
    val sel = Dsir.selectFraction(docs, "text", "doc_id", model, frac = 0.4)
    val total = docs.count().toDouble
    val got = sel.count().toDouble
    assert(math.abs(got / total - 0.4) < 0.1,
      s"selected ${got / total} of the corpus, wanted ~0.4")
    // threshold property: every selected key >= every rejected key
    val minSel = sel.agg(min(col("key_micro"))).head().getLong(0)
    val rejected = Dsir.selectFraction(docs, "text", "doc_id", model, 1.0)
      .join(sel.select("doc_id"), Seq("doc_id"), "left_anti")
    val maxRej = rejected.agg(max(col("key_micro"))).head().getLong(0)
    assert(minSel > maxRej, s"threshold violated: $minSel <= $maxRej")
    // frac = 1.0 keeps everything
    assert(Dsir.selectFraction(docs, "text", "doc_id", model, 1.0)
      .count() === total.toLong)
    intercept[IllegalArgumentException] {
      Dsir.selectFraction(docs, "text", "doc_id", model, 0.0)
    }
  }

  test("KL diagnostic: zero against itself, drops after selection") {
    val target = docs.filter(col("source") === targetSource)
    val model = Dsir.fit(docs, target, "text", nBuckets = 2048)
    assert(Dsir.klDiagnostic(target, target, "text", 2048) === 0L,
      "identical distributions have exactly zero KL (every term is pt*ln(1))")
    val sel = Dsir.resample(docs, "text", "doc_id", model, k = 60)
      .select(col("doc_id"))
    val klRaw = Dsir.klDiagnostic(docs, target, "text", 2048)
    val klSel = Dsir.klDiagnostic(docs.join(sel, "doc_id"), target,
      "text", 2048)
    assert(klSel < klRaw,
      s"selection must move the corpus toward the target: $klSel !< $klRaw")
  }

  test("loop-codegen gramBuckets matches the composed reference form") {
    val fixture = docs.select(col("text"))
      .union(Seq("", "one", "Two tokens", "a  b   c!d").toDF("text"))
    val both = fixture.select(
      graft.functions.VecExprs.gramBuckets(coalesce(col("text"), lit("")),
        997).as("fast"),
      Dsir.buckets(coalesce(col("text"), lit("")), 997).as("ref"))
    assert(both.filter(not(col("fast") === col("ref"))).count() === 0L)
  }

  test("classifierFlag separates a controlled pos/neg vocabulary and " +
    "reads empty docs as low-quality") {
    import spark.implicits._
    // disjoint vocabularies: every pos doc must flag true, every neg false
    val pos = (1L to 20L).map(i => (i, s"alpha beta alpha gamma beta $i"))
      .toDF("doc_id", "text")
    val neg = (21L to 40L).map(i => (i, s"zork quux blorp zork quux $i"))
      .toDF("doc_id", "text")
    val scored = graft.operators.Dsir.classifierFlag(
      pos.union(neg).union(Seq((99L, "")).toDF("doc_id", "text")),
      "text", "doc_id", pos, neg, nBuckets = 1024)
    val byId = scored.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    (1L to 20L).foreach(i => assert(byId(i)._3,
      s"pos doc $i scored ${byId(i)._1} over ${byId(i)._2} grams"))
    (21L to 40L).foreach(i => assert(!byId(i)._3,
      s"neg doc $i scored ${byId(i)._1}"))
    // empty doc: explicitly low-quality via the token-count conjunct
    assert(!byId(99L)._3 && byId(99L)._2 === 1L)
    // the case the conjunct exists for: pos = tiny seed, neg = big corpus
    // (the GPT-3 setup) makes the unseen-'' fallback gram's smoothed
    // log-ratio POSITIVE — without the conjunct empty docs would flag true
    val bigNeg = (100L to 400L).map(i => (i, s"noise words $i here"))
      .toDF("doc_id", "text")
    val tinyPos = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val scored2 = graft.operators.Dsir.classifierFlag(
      Seq((7L, ""), (8L, "   ")).toDF("doc_id", "text"),
      "text", "doc_id", tinyPos, bigNeg, nBuckets = 1024)
    scored2.collect().foreach { r =>
      assert(!r.getBoolean(3),
        s"empty/whitespace doc ${r.getLong(0)} flagged high-quality " +
          s"(score ${r.getLong(1)})")
    }
  }

  test("fit refuses an unbounded bucket count") {
    intercept[IllegalArgumentException] {
      Dsir.fit(docs, docs, "text", nBuckets = (1 << 22) + 1)
    }
  }
}
