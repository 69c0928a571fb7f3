package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.{NgramVec, Text}
import graft.operators.Dedup

/** Text/hash primitive invariants: minhash permutation-independence and
  * containment monotonicity (scalacheck generators, fixed seeds), simhash
  * aggregate/expression agreement, NgramVec <-> expression equality.
  */
class TextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(6))
  private val tokens: Gen[List[String]] =
    Gen.nonEmptyListOf(token).map(_.take(8))

  /** Deterministic scalacheck samples (one Spark job total per property). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("c4Filter applies the published line and page rules") {
    import spark.implicits._
    val df = Seq(
      (1L, "A good long line with enough words here.\nshort one.\n" +
        "no terminal punctuation at all here\n" +
        "this javascript line would otherwise be kept fine!\n" +
        "Another perfectly reasonable sentence right here!\n" +
        "A third keeper sentence to clear the page gate?"),
      (2L, "Only one decent sentence lives on this page."),
      (3L, "First keeper line with plenty of words here.\n" +
        "Second keeper line with plenty of words too.\n" +
        "Third keeper { line with a brace in it." )
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .c4Filter(df, "text", Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 6 lines, keeps the 3 full sentences (short / unpunctuated /
    // javascript lines dropped), page passes
    assert(out(1L).getAs[Long]("n_lines_total") === 6L)
    assert(out(1L).getAs[Long]("n_lines_kept") === 3L)
    assert(out(1L).getAs[Boolean]("page_ok"))
    assert(!out(1L).getAs[String]("clean_text").contains("javascript"))
    // doc 2: line kept but page fails the min-lines gate
    assert(out(2L).getAs[Long]("n_lines_kept") === 1L)
    assert(!out(2L).getAs[Boolean]("page_ok"))
    // doc 3: enough kept lines but the brace kills the page
    assert(out(3L).getAs[Long]("n_lines_kept") === 3L)
    assert(!out(3L).getAs[Boolean]("page_ok"))
  }

  test("minhash signature is permutation-independent") {
    val cases = samples(tokens, 10).map { toks =>
      (toks, scala.util.Random.shuffle(toks))
    }
    val df = cases.toDF("a", "b")
    df.select(
      Text.minhashSignature(array_distinct($"a"), 4).as("sa"),
      Text.minhashSignature(array_distinct($"b"), 4).as("sb"))
      .collect().foreach { row =>
        assert(row.getSeq[String](0) === row.getSeq[String](1))
      }
  }

  test("minhash signature is monotone under shingle-set containment") {
    val cases = samples(Gen.zip(tokens, tokens), 10).map {
      case (a, extra) => (a, a ++ extra)
    }
    val df = cases.toDF("a", "b")
    df.select(
      Text.minhashSignature(array_distinct($"a"), 4).as("sa"),
      Text.minhashSignature(array_distinct($"b"), 4).as("sb"))
      .collect().foreach { row =>
        row.getSeq[String](0).zip(row.getSeq[String](1)).foreach {
          case (sa, sb) => assert(sb <= sa) // min over superset is <=
        }
      }
  }

  test("simhash64 expression matches the fingerprint path; low half == simhash32") {
    val docs = TestSpark.table("documents").limit(50)
    val viaExpr = docs.select($"doc_id".as("id"), Text.simhash64($"text").as("sim"))
    val viaAgg = Dedup.simhashFingerprints(docs, "text", "doc_id")
    assert(viaExpr.except(viaAgg).count() === 0)
    assert(viaAgg.except(viaExpr).count() === 0)
    // bits 0..31 of simhash64 are DEFINED as simhash32 (same md5 parities)
    val halves = docs.select(
      Text.simhash32($"text").as("s32"),
      (Text.simhash64($"text").bitwiseAND(lit(0xffffffffL))).as("lo"))
    assert(halves.filter($"s32" =!= $"lo").count() === 0)
  }

  test("lshBands: identical signatures collide on every band") {
    val df = Seq((Seq("a b c", "b c d"), Seq("b c d", "a b c"))).toDF("a", "b")
    val row = df.select(
      Text.lshBands(Text.minhashSignature(array_distinct($"a"), 8), 2, 4).as("ba"),
      Text.lshBands(Text.minhashSignature(array_distinct($"b"), 8), 2, 4).as("bb"))
      .head()
    assert(row.getSeq[String](0) === row.getSeq[String](1))
    assert(row.getSeq[String](0).length === 4)
  }

  test("normalize collapses non-alphanumerics") {
    val out = Seq("  Hello,   World!42 ").toDF("s")
      .select(Text.normalize($"s")).head().getString(0)
    assert(out === "hello world 42")
  }

  test("NgramVec mirrors the Catalyst expression vectorization") {
    import graft.operators.FuzzyJoin
    val samples = Seq("FRANCE", "unit ed kingdom", "a", "", "Ægypt 12!x")
    val df = samples.toDF("s")
    val exprRows = df.select($"s", FuzzyJoin.charNgrams234($"s").as("g"),
      FuzzyJoin.tfArray($"s", 32).as("tf")).collect()
    exprRows.foreach { r =>
      val s = r.getString(0)
      assert(r.getSeq[String](1) === NgramVec.grams234(s), s"grams of '$s'")
      assert(r.getSeq[Double](2) === NgramVec.tf(s, 32).toSeq, s"tf of '$s'")
    }
  }

  test("loop-codegen NgramTf/NgramTfIdf/ArrayDist2 are bit-identical to the HOF forms") {
    import graft.operators.FuzzyJoin
    import graft.functions.VecExprs
    // include a document-length value — the case the HOF form evaluated in
    // O(len^2) and the loop form exists for
    val doc = Seq.tabulate(200)(i => s"word$i token${i % 7}").mkString(" ")
    val samples = Seq("FRANCE", "unit ed kingdom", "a", "", "Ægypt 12!x", doc, null)
    val weights = Array.tabulate(32)(i => math.sqrt((1.0 + 7) / (1.0 + i)))
    val wLit = array(weights.map(lit(_)): _*)
    val df = samples.toDF("s")
    val rows = df.select(
      FuzzyJoin.tfArray($"s", 32).as("tf_hof"),
      VecExprs.ngramTf($"s", 32).as("tf_loop"),
      FuzzyJoin.l2Normalize(zip_with(FuzzyJoin.tfArray($"s", 32), wLit,
        (t, w) => t * w)).as("v_hof"),
      VecExprs.ngramTfIdf($"s",
        scala.collection.immutable.ArraySeq.unsafeWrapArray(weights)).as("v_loop"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      assert(r.isNullAt(2) === r.isNullAt(3))
      if (!r.isNullAt(0)) assert(r.getSeq[Double](0) === r.getSeq[Double](1))
      if (!r.isNullAt(2)) {
        // exact double equality — same index-order multiply/accumulate
        val a = r.getSeq[Double](2); val b = r.getSeq[Double](3)
        assert(a.length === b.length)
        a.indices.foreach(i =>
          assert(java.lang.Double.doubleToLongBits(a(i)) ===
            java.lang.Double.doubleToLongBits(b(i)), s"dim $i"))
      }
    }
    val pairs = df.filter($"s".isNotNull).select(
        VecExprs.ngramTfIdf($"s",
          scala.collection.immutable.ArraySeq.unsafeWrapArray(weights)).as("v"))
      .crossJoin(spark.range(1).select(
        VecExprs.ngramTfIdf(lit("unit ed kingdom"),
          scala.collection.immutable.ArraySeq.unsafeWrapArray(weights)).as("w")))
      .select(FuzzyJoin.dist2($"v", $"w").as("d_hof"),
        VecExprs.arrayDist2($"v", $"w").as("d_loop")).collect()
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("scrubPii: sequential replacement, counts on original text") {
    val df = Seq(
      (1L, "see https://x.io/a@b.co end mail a@b.co call 555-123-4567"),
      (2L, "clean text, no pii at all"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.scrubPii(df, "text")
      .orderBy("doc_id").collect()
    // URL consumed first, so the email inside it never reaches the email
    // rule in the SCRUBBED text...
    assert(out(0).getAs[String]("scrubbed") ===
      "see <URL> end mail <EMAIL> call <PHONE>")
    // ...but counts are per-rule matches over the ORIGINAL text: the URL's
    // embedded a@b.co counts as an email too (the audit number answers
    // "how many matches of this pattern existed", not "how many survived
    // other rules")
    assert(out(0).getAs[Long]("n_url") === 1L)
    assert(out(0).getAs[Long]("n_email") === 2L)
    assert(out(0).getAs[Long]("n_phone") === 1L)
    assert(out(1).getAs[String]("scrubbed") === "clean text, no pii at all")
    assert(out(1).getAs[Long]("n_url") === 0L)
    assert(out(2).isNullAt(out(2).fieldIndex("scrubbed"))) // null text -> null
  }
}
