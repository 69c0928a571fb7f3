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
}
