package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.{Text, VecExprs}

/** Randomized cross-checks of the loop-codegen expressions against their
  * composed built-in formulations (the fixture-based pins in VecExprsSpec
  * cover realistic text; these sweep generated edge shapes — unicode,
  * repeated tokens, degenerate whitespace, adversarial posting lists).
  * Generators run with fixed seeds so failures reproduce.
  */
class ExprLawsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val word: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("the", "quick", "BROWN", "fox", "déjà", "naïve", "東京", "a1"),
    Gen.const(""), Gen.const("!!"), Gen.const("  "))

  private val text: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.oneOf(" ", "  ", ", ", "\t", " - ")
  } yield ws.mkString(sep)

  test("ContingencyAll == groupBy contingency on generated code frames") {
    val frame: Gen[Seq[(Int, Int, Int)]] = for {
      n <- Gen.choose(0, 120)
      rows <- Gen.listOfN(n, for {
        a <- Gen.choose(0, 3); b <- Gen.choose(0, 4); c <- Gen.choose(0, 2)
      } yield (a, b, c))
    } yield rows
    val vocabs = Seq(4, 5, 3)
    val pairA = Seq(0, 0, 1)
    val pairB = Seq(1, 2, 2)
    samples(frame, 8, 4242L).foreach { rows =>
      val df = if (rows.isEmpty)
        spark.range(0).selectExpr("0 AS a", "0 AS b", "0 AS c")
      else rows.toDF("a", "b", "c")
      val flat = df
        .select(array(col("a"), col("b"), col("c")).as("codes"))
        .agg(graft.functions.Contingency.contingencyAll(
          col("codes"), vocabs, pairA, pairB).as("cells"))
        .head().getSeq[Long](0)
      val offs = graft.functions.Contingency.ContingencyAll
        .offsets(vocabs, pairA, pairB)
      // expected from plain scala counting
      val exp = new Array[Long](offs.last)
      rows.foreach { case (a, b, c) =>
        val codes = Array(a, b, c)
        for (p <- pairA.indices) {
          val vb = vocabs(pairB(p))
          exp(offs(p) + codes(pairA(p)) * vb + codes(pairB(p))) += 1L
        }
      }
      assert(flat === exp.toSeq, s"rows=${rows.take(5)}...")
    }
  }

  test("distinctAtMost == least(countDistinct, cap + 1) on generated columns") {
    val vals: Gen[Seq[Option[Int]]] = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, Gen.option(Gen.choose(0, 12)))
    } yield rows
    samples(vals, 10, 777L).foreach { rows =>
      val df = rows.toDF("v")
      val cap = 5
      val r = df.agg(
        graft.functions.Contingency.distinctAtMost(col("v"), cap).as("d"),
        countDistinct(col("v")).as("e")).head()
      val expected = math.min(r.getLong(1), cap + 1L)
      assert(r.getLong(0) === expected, s"rows=$rows")
    }
  }

  test("Simhash32 == composed parity-vote form on generated texts") {
    def composed(c: org.apache.spark.sql.Column) = {
      val hexes = transform(Text.tokens(c), t => md5(t))
      val odd = Seq("1", "3", "5", "7", "9", "b", "d", "f")
      (0 until 32).map { i =>
        val votes = aggregate(hexes, lit(0),
          (acc, h) => acc + when(h.substr(i + 1, 1).isin(odd: _*), 1).otherwise(-1))
        when(votes > 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val texts = samples(text, 60, 11L)
    val rows = texts.toDF("t")
      .select(Text.simhash32(col("t")).as("fast"), composed(col("t")).as("slow"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getLong(0) === r.getLong(1), s"text=<$t>")
    }
  }

  test("Simhash64 == composed two-family parity-vote form on generated texts") {
    // bits 0..31 vote on md5(token) digit parities, 32..63 on
    // md5(token || '@') — the definition the DuckDB oracle CTE mirrors
    def composed(c: org.apache.spark.sql.Column) = {
      val h1 = transform(Text.tokens(c), t => md5(t))
      val h2 = transform(Text.tokens(c), t => md5(concat(t, lit("@"))))
      val odd = Seq("1", "3", "5", "7", "9", "b", "d", "f")
      (0 until 64).map { i =>
        val hexes = if (i < 32) h1 else h2
        val d = i % 32
        val votes = aggregate(hexes, lit(0),
          (acc, h) => acc + when(h.substr(d + 1, 1).isin(odd: _*), 1).otherwise(-1))
        when(votes > 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val texts = samples(text, 40, 47L)
    val rows = texts.toDF("t")
      .select(Text.simhash64(col("t")).as("fast"), composed(col("t")).as("slow"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getLong(0) === r.getLong(1), s"text=<$t>")
    }
  }

  test("MinhashSig == composed min-aggregate form on generated texts") {
    val texts = samples(text, 60, 23L)
    val rows = texts.toDF("t")
      .select(
        VecExprs.minhashSig(VecExprs.tokenShingles(col("t"), 3), 8).as("fast"),
        Text.minhashSignature(Text.shingleSet(col("t"), 3), 8).as("slow"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), s"text=<$t>")
    }
  }

  test("PostingPairs == composed nested-transform form on generated lists") {
    val entry: Gen[(String, Int)] = for {
      id <- Gen.alphaNumStr.map(_.take(6))
      n <- Gen.choose(1, 60)
    } yield (id, n)
    val list: Gen[Seq[(String, Int)]] = for {
      n <- Gen.choose(0, 10)
      es <- Gen.listOfN(n, entry)
    } yield es.distinctBy(_._1).sortBy(_._1)
    val lists = samples(list, 40, 37L)
    for (minJ <- Seq(0.0, 0.3, 0.7)) {
      val df = lists.toDF("docs")
      val fast = df.select(explode(
          VecExprs.postingPairs(col("docs"), minJ)).as("p"))
        .select(col("p.a._1"), col("p.a._2"), col("p.b._1"), col("p.b._2"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getInt(3)))
        .sorted
      val slow = df.select(explode(flatten(transform(col("docs"),
          (x, i) => transform(
            slice(col("docs"), i + lit(2), size(col("docs")) - i - lit(1)),
            y => struct(x.getField("_1").as("id_a"), x.getField("_2").as("n_a"),
              y.getField("_1").as("id_b"), y.getField("_2").as("n_b")))))).as("p"))
        .select(col("p.*"))
        .filter(least(col("n_a"), col("n_b")).cast("double") >=
          lit(minJ) * greatest(col("n_a"), col("n_b")).cast("double"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getInt(3)))
        .sorted
      assert(fast.toSeq === slow.toSeq, s"minJaccard=$minJ")
    }
  }

  test("BpeMerge laws: lossless concatenation, idempotence past fixpoint") {
    import graft.functions.BpeMerge
    val merges = Seq(("a", "b"), ("ab", "c"), ("d", "d"), ("x", "ab"))
    val words = samples(Gen.listOfN(10,
      Gen.oneOf("a", "b", "c", "d", "x")).map(_.mkString), 200, 77L)
      .filter(_.nonEmpty)
    words.foreach { w =>
      val enc = BpeMerge.encodeWord(w, merges)
      // concatenating the subwords always reconstructs the word exactly
      assert(enc.mkString("") === w, s"lossy encode of $w")
      // re-applying the same merges to the encoded symbols changes nothing
      // (greedy merge is a fixpoint per rank)
      val again = merges.foldLeft(enc) { case (s, (l, r)) =>
        BpeMerge.applyMerge(s, l, r)
      }
      assert(again.toSeq === enc.toSeq, s"not a fixpoint for $w")
    }
  }

  test("RemoveTokenSpans == indexed-filter/exists HOF form on generated " +
    "texts and span-start sets") {
    val spanN = 3
    val rmGen: Gen[Seq[Int]] = for {
      n <- Gen.choose(0, 10)
      ps <- Gen.listOfN(n, Gen.choose(-2, 30)) // out-of-range + dupes legal
    } yield ps
    val cases: Seq[(String, Seq[Int])] =
      samples(text, 120, seed = 3333L).zip(samples(rmGen, 120, seed = 4444L)) ++
        Seq(("a b c d e", Seq.empty[Int]), ("a b c d e", Seq(0, 2)),
          ("a b c d e", Seq(1, 1, 1)), ("", Seq(0)), ("x", Seq(-1, 5)),
          ("a b c d e f g", Seq(0, 4))) // disjoint intervals with a gap
    val df = cases.toDF("t", "rm")
    val loop = df.select(
      VecExprs.removeTokenSpans(col("t"), col("rm"), spanN).as("x"))
      .collect().map(_.getString(0))
    val composed = df.select(array_join(
        filter(Text.tokens(col("t")), (_, i) =>
          !exists(col("rm"), s => s <= i && i < s + lit(spanN))),
        " ").as("x"))
      .collect().map(_.getString(0))
    loop.zip(composed).zip(cases).foreach { case ((a, b), c) =>
      assert(a === b, s"case: $c")
    }
    // null text or null start array -> null, like the HOF chain
    assert(Seq((Option.empty[String], Option(Seq(1))))
      .toDF("t", "rm")
      .select(VecExprs.removeTokenSpans(col("t"), col("rm"), spanN))
      .head().isNullAt(0))
    assert(Seq((Option("a b"), Option.empty[Seq[Int]]))
      .toDF("t", "rm")
      .select(VecExprs.removeTokenSpans(col("t"), col("rm"), spanN))
      .head().isNullAt(0))
  }

  test("AsciiTokens == regex+split+filter chain on generated texts") {
    val texts = samples(text, 160, seed = 1111L) ++ Seq(
      "", " ", "a", "A!B", "a b", "x".repeat(300), "déjà vu 東京 a1  b2",
      "ÄÖÜ ß İ", "0x00FF", "tab\tsep", "ümlaut-Ümlaut")
    val df = texts.toDF("t")
    val loop = df.select(Text.tokens(col("t")).as("x")).collect().map(_.getSeq[String](0))
    val composed = df.select(filter(split(
        trim(regexp_replace(lower(col("t")), "[^a-z0-9]+", " ")), " "),
      s => length(s) > 0).as("x")).collect().map(_.getSeq[String](0))
    loop.zip(composed).zip(texts).foreach { case ((a, b), t) =>
      assert(a === b, s"text: '$t'")
    }
    // null in, null out — same as the regex chain
    assert(Seq(Option.empty[String]).toDF("t")
      .select(Text.tokens(col("t"))).head().isNullAt(0))
  }

  test("L2Normalize == transform/aggregate HOF form on generated vectors; " +
    "zero vectors normalize to themselves") {
    val vec: Gen[Seq[Option[Double]]] = for {
      n <- Gen.choose(0, 9)
      xs <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(-10.0, 10.0).map(Some(_)),
        Gen.const(Some(0.0)), Gen.const(Option.empty[Double])))
    } yield xs
    // nonzero-norm (or null-carrying) vectors: bit-identical to the HOF
    // chain. Exact-zero vectors are EXCLUDED from the composed comparison:
    // under ANSI the HOF form throws double-div-by-zero there — exactly
    // the behavior the expression's documented clip replaces.
    val vecs = (samples(vec, 120, seed = 2222L) ++
      Seq(Seq.empty, Seq(Some(3.0), Some(4.0)), Seq(Some(1e-150))))
      .filter(v => v.exists(_.isEmpty) || v.flatten.exists(_ != 0.0) || v.isEmpty)
    val df = vecs.toDF("v")
    val loop = df.select(VecExprs.l2normalize(col("v")).as("x"))
      .collect().map(_.getSeq[Any](0))
    val composed = df.select({
      val d = transform(col("v"), x => x.cast("double"))
      val norm = sqrt(aggregate(d, lit(0.0), (acc, x) => acc + x * x))
      transform(d, x => x / norm).as("x")
    }).collect().map(_.getSeq[Any](0))
    loop.zip(composed).zip(vecs).foreach { case ((a, b), v) =>
      assert(a.length === b.length, s"vec: $v")
      a.zip(b).foreach {
        case (null, null) => ()
        case (x: Double, y: Double) =>
          assert(java.lang.Double.compare(x, y) === 0 ||
            (x.isNaN && y.isNaN), s"vec: $v -> $a vs $b")
        case (x, y) => fail(s"vec: $v mixed nulls: $x vs $y")
      }
    }
    // the zero-norm clip: zeros come back unchanged, no throw, no NaN
    val z = Seq(Seq(0.0, 0.0, 0.0)).toDF("v")
      .select(VecExprs.l2normalize(col("v"))).head().getSeq[Double](0)
    assert(z === Seq(0.0, 0.0, 0.0))
    // integral element types keep working (the HOF form cast per element)
    val iv = Seq(Seq(3, 4)).toDF("v")
      .select(VecExprs.l2normalize(col("v"))).head().getSeq[Double](0)
    assert(iv === Seq(0.6, 0.8))
    val lv = Seq(Seq(0L, 5L)).toDF("v")
      .select(VecExprs.l2normalize(col("v"))).head().getSeq[Double](0)
    assert(lv === Seq(0.0, 1.0))
  }

  test("TokenChunks law: stride==size chunks partition the token stream") {
    val texts = samples(text, 120, 91L)
    val df = texts.toDF("text")
    val toksAndChunks = df.select(Text.tokens(col("text")).as("toks"),
      VecExprs.tokenChunks(col("text"), 5, 5).as("ch")).collect()
    toksAndChunks.foreach { r =>
      val toks = r.getSeq[String](0)
      val chunks = r.getSeq[org.apache.spark.sql.Row](1)
      // non-overlapping chunks concatenate back to the full token stream
      assert(chunks.flatMap(_.getString(1).split(" ").filter(_.nonEmpty))
        === toks)
      // every chunk except the last is exactly `size` tokens
      chunks.dropRight(1).foreach(c => assert(c.getLong(2) === 5L))
      assert(chunks.map(_.getLong(2)).sum === toks.length)
    }
  }
}
