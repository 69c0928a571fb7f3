package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Mix, NgramLm}

/** NgramLm perplexity scoring + temperature source mixing. */
class LmMixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("NgramLm hand case: stupid-backoff log-probs") {
    // uni: a:4 b:2, N=6, V=2; bigrams: (a,b):2 (b,a):1 (a,a):1
    val corpus = Seq((1L, "a b a b"), (2L, "a a")).toDF("doc_id", "text")
    val m = NgramLm.fit(corpus, "text", vocabSize = 10, minCount = 1L)
    assert(m.totalTokens === 6L && m.vocabCount === 2)
    val r = NgramLm.score(m, corpus, "text", Seq("doc_id"))
      .orderBy($"doc_id").collect()
    // doc1 "a b a b": ln(5/9) + ln(2/4) + ln(1/2) + ln(2/4), each round6
    // = -(0.587787 + 3*0.693147)/4 = -2.667228/4 -> avg_nll 0.666807
    assert(r(0).getAs[Long]("n_tokens") === 4L)
    assert(r(0).getAs[Double]("oov_frac") === 0.0)
    assert(r(0).getAs[Double]("avg_nll") === 0.666807)
    // doc2 "a a": ln(5/9) + ln(c2(a,a)/c(a)) = ln(5/9) + ln(1/4)
    // = -(0.587787 + 1.386294)/2 = -1.974081/2 -> 0.987041 (round .5 up)
    assert(r(1).getAs[Long]("n_tokens") === 2L)
    assert(r(1).getAs[Double]("avg_nll") === 0.987041)
  }

  test("NgramLm: OOV backoff and empty docs") {
    val corpus = Seq((1L, "a b a b"), (2L, "a a")).toDF("doc_id", "text")
    val m = NgramLm.fit(corpus, "text", vocabSize = 10, minCount = 1L)
    val target = Seq((10L, "a zzz"), (11L, "")).toDF("doc_id", "text")
    val r = NgramLm.score(m, target, "text", Seq("doc_id"))
      .orderBy($"doc_id").collect()
    // "a zzz": ln(5/9) then backoff ln(0.4 * 1/9); zzz is OOV
    assert(r(0).getAs[Double]("oov_frac") === 0.5)
    val lp2 = BigDecimal(math.log(0.4 * (1.0 / 9.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lp1 = BigDecimal(math.log(5.0 / 9.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = math.rint(-(lp1 + lp2) * 1000000 / 2) / 1000000.0
    assert(r(0).getAs[Double]("avg_nll") === expect)
    // empty doc: no tokens -> 0 + null metrics
    assert(r(1).getAs[Long]("n_tokens") === 0L)
    assert(r(1).isNullAt(r(1).fieldIndex("avg_nll")))
  }

  test("NgramLm: vocabSize and maxBigrams bounds bind") {
    val corpus = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val m = NgramLm.fit(corpus, "text", vocabSize = 2, minCount = 1L, maxBigrams = 1)
    // top-2 vocab by (count desc, token asc): a(3), b(2); c is OOV
    assert(m.vocab.orderBy($"w").as[(String, Long)].collect().toSeq ===
      Seq(("a", 3L), ("b", 2L)))
    // in-vocab pairs: (a,a):2 (a,b):1 (b,b):1 — top-1 by (c desc, prev, w)
    assert(m.bigrams.as[(String, String, Long)].collect().toSeq ===
      Seq(("a", "a", 2L)))
  }

  test("TokenPairs matches the composed higher-order-function form") {
    // composed form: the O(tokens^2) CodegenFallback definition the loop
    // expression replaces (same discipline as the NgramRepStats pin)
    val docs = TestSpark.table("documents").limit(60)
      .select($"text").union(Seq("", "  ", "one").toDF("text"))
    val toks = graft.functions.Text.tokens($"text")
    val composed = docs.select(
      when(size(toks) <= 0, array().cast("array<struct<w:string,prev:string>>"))
        .otherwise(transform(sequence(lit(1), size(toks)), i =>
          struct(element_at(toks, i).as("w"),
            when(i === lit(1), lit(null).cast("string"))
              .otherwise(element_at(toks, i - 1)).as("prev")))).as("p"))
    val viaExpr = docs.select(
      graft.functions.VecExprs.tokenPairs($"text").as("p"))
    assert(viaExpr.except(composed).count() === 0)
    assert(composed.except(viaExpr).count() === 0)
  }

  test("Chunk.split: windows, overlap continuity, boundary and empty docs") {
    import graft.operators.Chunk
    // 10 tokens, size 4, overlap 2 (stride 2) -> starts 0,2,4,6,8:
    // count = 1 + ceil((10-4)/2) = 4 ... tail start 6 covers [6,10); BUT
    // formula: 1 + ceil(6/2) = 4 chunks, last = [6..10)
    val doc = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b c d"), (3L, "x"), (4L, "")).toDF("doc_id", "text")
    val out = Chunk.split(df, "text", Seq("doc_id"), size = 4, overlap = 2)
      .orderBy($"doc_id", $"chunk_id").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getAs[String]("chunk_text")).toSeq === Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    // overlap continuity: each chunk's first 2 tokens = previous last 2
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[String]("chunk_text").split(" ").take(2).toSeq ===
        a.getAs[String]("chunk_text").split(" ").takeRight(2).toSeq)
    }
    // n == size -> exactly one chunk; shorter -> one chunk; empty -> none
    assert(out.filter(_.getLong(0) == 2L).map(_.getAs[String]("chunk_text")).toSeq ===
      Seq("a b c d"))
    assert(out.filter(_.getLong(0) == 3L).map(_.getAs[Long]("n_chunk_tokens")).toSeq ===
      Seq(1L))
    assert(!out.exists(_.getLong(0) == 4L))
  }

  test("Boilerplate: per-source frequent lines stripped, cross-source kept") {
    import graft.operators.Boilerplate
    val df = Seq(
      (1L, "A", "hello world\nunique one"),
      (2L, "A", "hello world\nunique two"),
      (3L, "A", "hello world"),            // all-boilerplate doc
      (4L, "B", "hello world\nother text") // same line, different source
    ).toDF("doc_id", "source", "text")
    val out = Boilerplate.removeFrequentLines(df, "text", "doc_id", "source",
      minDocs = 3).orderBy($"doc_id").collect()
    assert(out(0).getAs[String]("clean_text") === "unique one")
    assert(out(0).getAs[Long]("n_lines_removed") === 1L)
    // every line boilerplate -> empty census row, not a dropped doc
    assert(out(2).getAs[String]("clean_text") === "")
    assert(out(2).getAs[Long]("n_lines_kept") === 0L)
    // source B's single occurrence is below minDocs -> untouched
    assert(out(3).getAs[String]("clean_text") === "hello world\nother text")
    assert(out(3).getAs[Long]("n_lines_removed") === 0L)
  }

  test("Embed.pca: variance ordering, truncation shrinkage, centered output") {
    import graft.operators.Embed
    val emb = TestSpark.table("embeddings")
    val m = Embed.fitPca(emb, "embedding", k = 8)
    // eigenvalues (= component variances * n) come back descending
    assert(m.eigenvalues.sliding(2).forall { case Array(a, b) => a >= b },
      m.eigenvalues.toSeq.toString)
    val full = Embed.transformPca(emb, "embedding", Seq("vec_id"),
      Embed.fitPca(emb, "embedding", k = 64))
    val trunc = Embed.transformPca(emb, "embedding", Seq("vec_id"), m)
    def norms(df: org.apache.spark.sql.DataFrame) = df.select($"vec_id",
        sqrt(graft.functions.VecExprs.arrayDot($"pca", $"pca")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (nf, nt) = (norms(full), norms(trunc))
    // truncation can only shrink the centered norm (projection property)
    nf.keys.foreach(id => assert(nt(id) <= nf(id) + 1e-9, s"vec $id grew"))
    // the projected corpus is centered: per-component means ~ 0
    val compMeans = trunc
      .select(posexplode($"pca").as(Seq("p", "x")))
      .groupBy($"p").agg(avg($"x").as("m")).collect()
    compMeans.foreach(r => assert(math.abs(r.getDouble(1)) < 1e-9))
  }

  test("AsofJoin: inclusive match, null-payload rows not skipped, ties, census") {
    import graft.operators.AsofJoin
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 1L, ts("2021-01-01 00:10:00")),
      (2L, 1L, ts("2021-01-01 00:20:00")),
      (3L, 2L, ts("2021-01-01 00:05:00")) // user 2 has no prior right row
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 1L, ts("2021-01-01 00:10:00"), Some(5.0)),  // equal ts: matches
      (101L, 1L, ts("2021-01-01 00:15:00"), None),       // null VALUE, latest ROW
      (102L, 2L, ts("2021-01-01 00:30:00"), Some(9.0))   // after left -> no match
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsofJoin.asof(left, right, Seq("user_id"), "ts",
        Seq("event_id" -> "ref_id", "value" -> "ref_value"),
        rightTie = Seq("event_id"))
      .orderBy($"event_id").collect()
    // equal timestamps match inclusively (l.ts >= r.ts)
    assert(out(0).getAs[Long]("ref_id") === 100L)
    assert(out(0).getAs[Double]("ref_value") === 5.0)
    // the LATEST right ROW wins even when its payload value is null
    assert(out(1).getAs[Long]("ref_id") === 101L)
    assert(out(1).isNullAt(out(1).fieldIndex("ref_value")))
    // left join census: no predecessor -> row kept with null payload
    assert(out(2).isNullAt(out(2).fieldIndex("ref_id")))
    // deterministic tie-break: two right rows at the same (key, ts) ->
    // the greater tie id wins (last in (ts, side, tie) order)
    val tied = AsofJoin.asof(
      Seq((1L, 1L, ts("2021-01-01 01:00:00"))).toDF("event_id", "user_id", "ts"),
      Seq((200L, 1L, ts("2021-01-01 00:30:00"), 1.0),
          (201L, 1L, ts("2021-01-01 00:30:00"), 2.0))
        .toDF("event_id", "user_id", "ts", "value"),
      Seq("user_id"), "ts", Seq("event_id" -> "ref_id"),
      rightTie = Seq("event_id")).collect()(0)
    assert(tied.getAs[Long]("ref_id") === 201L)
  }

  test("Skew.saltedJoin: identical result set, salt spreads a hot key") {
    import graft.ops.Skew
    // one hot key (90% of probe rows) + a cold one + an unmatched one
    val probe = ((0L until 90L).map(i => (i, "hot")) ++
      (90L until 100L).map(i => (i, "cold")) :+ (100L, "orphan"))
      .toDF("row_id", "k")
    val build = Seq(("hot", 1.0), ("cold", 2.0)).toDF("k", "v")
    val salted = Skew.saltedJoin(probe, build, Seq("k"), buckets = 8,
      probeSaltKeys = Seq("row_id"), joinType = "left")
    val plain = probe.join(build, Seq("k"), "left")
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
    assert(salted.count() === 101L) // left census, no fan-out duplicates
    // the salt really spreads the hot key across buckets
    val salts = probe.filter($"k" === "hot")
      .select(pmod(conv(substring(md5($"row_id".cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(8L)).as("s"))
      .distinct().count()
    assert(salts > 4, s"hot key only hit $salts of 8 salt buckets")
  }

  test("TimeFeatures: rolling is point-in-time correct; resample buckets align") {
    import graft.operators.TimeFeatures
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, ts("2021-01-01 00:00:00"), 1.0),
      (2L, 1L, ts("2021-01-01 00:30:00"), 2.0),
      (3L, 1L, ts("2021-01-01 01:30:00"), 4.0), // 1h window: drops event 1
      (4L, 2L, ts("2021-01-01 00:10:00"), 8.0)  // other key
    ).toDF("event_id", "user_id", "ts", "value")
    val r = TimeFeatures.rolling(ev, Seq("user_id"), "ts",
        windowUs = 3600000000L,
        aggs = Seq("roll_n" -> count(lit(1)), "roll_sum" -> sum($"value")))
      .orderBy($"event_id").collect()
    // event 2 sees {1, 2}; event 3 sees {2, 3} (event 1 aged out; event 3
    // itself included — frame ends at current row, nothing from the future)
    assert(r(0).getAs[Long]("roll_n") === 1L)
    assert(r(1).getAs[Long]("roll_n") === 2L && r(1).getAs[Double]("roll_sum") === 3.0)
    assert(r(2).getAs[Long]("roll_n") === 2L && r(2).getAs[Double]("roll_sum") === 6.0)
    assert(r(3).getAs[Long]("roll_n") === 1L) // keys never mix
    // hourly resample: events 1,2 share a bucket; 3 its own; key 2 separate
    val b = TimeFeatures.resample(ev, Seq("user_id"), "ts",
        bucketUs = 3600000000L, valueCol = "value")
      .orderBy($"user_id", $"bucket_start").collect()
    assert(b.length === 3)
    assert(b(0).getAs[Long]("n_events") === 2L)
    assert(b(0).getAs[Double]("value_sum") === 3.0)
    assert(b(0).getAs[Timestamp]("bucket_start") === ts("2021-01-01 00:00:00"))
  }

  test("AsofJoin: nearest picks the closer side, ties toward backward") {
    import graft.operators.AsofJoin
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // left at t=10: back at 7 (gap 3), fwd at 12 (gap 2) -> forward
    // left at t=20: back at 18 (gap 2), fwd at 22 (gap 2) -> tie -> backward
    // left at t=30: only backward matches remain, latest is 22; t=1: only fwd at 7
    val left = Seq((1L, ts(10)), (2L, ts(20)), (3L, ts(30)), (4L, ts(1)))
      .toDF("lid", "ts").withColumn("user_id", org.apache.spark.sql.functions.lit(1L))
    val right = Seq((107L, ts(7)), (112L, ts(12)), (118L, ts(18)), (122L, ts(22)))
      .toDF("rid", "ts").withColumn("user_id", org.apache.spark.sql.functions.lit(1L))
    val out = AsofJoin.asof(left, right, Seq("user_id"), "ts",
        payload = Seq("rid" -> "ref"), rightTie = Seq("rid"),
        direction = "nearest")
      .collect().map(r => r.getAs[Long]("lid") -> r.getAs[Long]("ref")).toMap
    assert(out === Map(1L -> 112L, 2L -> 118L, 3L -> 122L, 4L -> 107L))
    // tolerance applies to BOTH sides: at 2s only the gap-2 matches survive
    val tol = AsofJoin.asof(left, right, Seq("user_id"), "ts",
        payload = Seq("rid" -> "ref"), rightTie = Seq("rid"),
        direction = "nearest", toleranceUs = Some(2000000L))
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[Any]("ref"))).toMap
    assert(tol(1L) === Some(112L) && tol(2L) === Some(118L))
    assert(tol(3L) === None && tol(4L) === None)
  }

  test("AsofJoin: forward direction and tolerance") {
    import graft.operators.AsofJoin
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, 1L, ts("2021-01-01 00:10:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 1L, ts("2021-01-01 00:05:00"), 1.0),  // before left
      (101L, 1L, ts("2021-01-01 00:12:00"), 2.0),  // nearest after
      (102L, 1L, ts("2021-01-01 00:30:00"), 3.0)   // farther after
    ).toDF("event_id", "user_id", "ts", "value")
    // forward: earliest right at-or-after -> 101, never 100 or 102
    val fwd = AsofJoin.asof(left, right, Seq("user_id"), "ts",
      Seq("event_id" -> "ref_id"), rightTie = Seq("event_id"),
      direction = "forward").collect()(0)
    assert(fwd.getAs[Long]("ref_id") === 101L)
    // backward tolerance 2 min: the 5-min-old match nulls out
    val tol = AsofJoin.asof(left, right, Seq("user_id"), "ts",
      Seq("event_id" -> "ref_id"), rightTie = Seq("event_id"),
      toleranceUs = Some(120000000L)).collect()(0)
    assert(tol.isNullAt(tol.fieldIndex("ref_id")))
    // tolerance 10 min admits it
    val ok = AsofJoin.asof(left, right, Seq("user_id"), "ts",
      Seq("event_id" -> "ref_id"), rightTie = Seq("event_id"),
      toleranceUs = Some(600000000L)).collect()(0)
    assert(ok.getAs[Long]("ref_id") === 100L)
  }

  test("normalizeUnicode: composes combining sequences, flags only changes") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "cafe\u0301"),     // decomposed e + U+0301
      (2L, "café"),      // already precomposed
      (3L, "plain ascii")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.normalizeUnicode(df, "text")
      .orderBy($"doc_id").collect()
    assert(r(0).getAs[Boolean]("nfc_changed"))
    assert(r(0).getAs[String]("nfc_text") === "café")
    assert(!r(1).getAs[Boolean]("nfc_changed"))
    assert(!r(2).getAs[Boolean]("nfc_changed"))
    // idempotent: normalizing the normalized output changes nothing
    val again = TextAnalysis.normalizeUnicode(
      r.map(x => (x.getLong(0), x.getAs[String]("nfc_text"))).toSeq
        .toDF("doc_id", "text"), "text")
    assert(again.filter($"nfc_changed").count() === 0)
  }

  test("Embed.whitened: unit component variances; zero-variance axes untouched") {
    import graft.operators.Embed
    val emb = TestSpark.table("embeddings")
    val n = emb.count()
    val m = Embed.whitened(Embed.fitPca(emb, "embedding", k = 4), n)
    val comps = Embed.transformPca(emb, "embedding", Seq("vec_id"), m)
      .select(posexplode($"pca").as(Seq("p", "x")))
      .groupBy($"p").agg(var_samp($"x").as("v")).collect()
    comps.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-6,
      s"component ${r.getInt(0)} variance ${r.getDouble(1)}"))
  }

  test("Mix.temperatureFlag: null source is a stratum, not a dropped row") {
    val df = (0L until 40L)
      .map(i => (i, if (i % 4 == 0) null else s"s${i % 2}"))
      .toDF("id", "source")
    val flags = Mix.temperatureFlag(df, "source", Seq("id"),
      temperature = 2.0, targetFrac = 1.0, seed = 3L)
    // census: every input row present, including the null-source stratum
    assert(flags.count() === 40L)
    assert(flags.filter($"source".isNull).count() === 10L)
    assert(flags.filter($"source".isNull && $"rate".isNotNull).count() === 10L)
  }

  test("DupSpans hand case: shared windows, overlapping-coverage union") {
    import graft.operators.DupSpans
    val df = Seq(
      (1L, "a b c d e f"),      // windows [abc][bcd][cde][def]
      (2L, "x y a b c d z"),    // shares [abc] (pos 2) and [bcd] (pos 3)
      (3L, "q r s")             // no shared span
    ).toDF("doc_id", "text")
    val r = DupSpans.stats(df, "text", "doc_id", n = 3)
      .orderBy($"doc_id").collect()
    // doc1: dup windows at pos 0,1 -> coverage [0,3)u[1,4) = 4 tokens of 6
    assert(r(0).getAs[Long]("n_dup_windows") === 2L)
    assert(r(0).getAs[Long]("covered_tokens") === 4L)
    assert(r(0).getAs[Double]("dup_span_frac") === 0.666667)
    // doc2: pos 2,3 -> [2,5)u[3,6) = 4 of 7
    assert(r(1).getAs[Long]("covered_tokens") === 4L)
    assert(r(1).getAs[Double]("dup_span_frac") === 0.571429)
    // doc3: untouched census row
    assert(r(2).getAs[Long]("n_dup_windows") === 0L)
    assert(r(2).getAs[Double]("dup_span_frac") === 0.0)
    // a window repeated WITHIN one doc only is not cross-doc duplication
    val self = DupSpans.stats(
      Seq((1L, "p q p q p q")).toDF("doc_id", "text"), "text", "doc_id", n = 2)
      .collect()(0)
    assert(self.getAs[Long]("n_dup_windows") === 0L)
  }

  test("Decontaminate.scrubSpans excises exactly the benchmark-shared " +
    "windows; short bench items are invisible") {
    import graft.operators.Decontaminate
    val train = Seq((1L, "a b c d e f"), (2L, "p q r")).toDF("doc_id", "text")
    val bench = Seq((100L, "x c d e y"), (101L, "p q")).toDF("doc_id", "text")
    val r = Decontaminate.scrubSpans(train, bench, "text", "doc_id", n = 3)
      .orderBy($"doc_id").collect()
    // bench windows: [xcd][cde][dey]; train hit [cde]@2 -> remove pos 2..4
    assert(r(0).getAs[String]("clean_text") === "a b f")
    assert(r(0).getAs[Long]("n_removed") === 3L)
    // "p q" is shorter than n: no window, so doc2 is untouched by the
    // scrub (whole-doc flag/clean territory, spec'd elsewhere)
    assert(r(1).getAs[String]("clean_text") === "p q r")
    assert(r(1).getAs[Long]("n_removed") === 0L)
  }

  test("DupSpans.remove hand cases: remove-all vs keep-first policies") {
    import graft.operators.DupSpans
    val df = Seq(
      (1L, "a b c d e f"),      // windows [abc][bcd][cde][def]
      (2L, "x y a b c d z"),    // shares [abc] (pos 2) and [bcd] (pos 3)
      (3L, "q r s")             // untouched
    ).toDF("doc_id", "text")
    // remove-all: doc1 loses coverage [0,4) -> "e f"; doc2 loses [2,6)
    val all = DupSpans.remove(df, "text", "doc_id", n = 3)
      .orderBy($"doc_id").collect()
    assert(all(0).getAs[Long]("n_tokens") === 6L)
    assert(all(0).getAs[Long]("n_removed") === 4L)
    assert(all(0).getAs[String]("clean_text") === "e f")
    assert(all(1).getAs[String]("clean_text") === "x y z")
    assert(all(2).getAs[Long]("n_removed") === 0L)
    assert(all(2).getAs[String]("clean_text") === "q r s")
    // keep-first: doc1 holds the canonical (smallest (id, pos))
    // occurrences, so it survives intact; doc2's copies still go
    val kf = DupSpans.remove(df, "text", "doc_id", n = 3, keepFirst = true)
      .orderBy($"doc_id").collect()
    assert(kf(0).getAs[Long]("n_removed") === 0L)
    assert(kf(0).getAs[String]("clean_text") === "a b c d e f")
    assert(kf(1).getAs[String]("clean_text") === "x y z")
    // null text: n_tokens stays null, but the rebuild columns take the
    // no-op verdict — the oracle's coalesce rule, pinned on the Spark side
    val nt = DupSpans.remove(
      Seq((1L, Option("a b c")), (2L, Option.empty[String]))
        .toDF("doc_id", "text"), "text", "doc_id", n = 3)
      .orderBy($"doc_id").collect()
    assert(nt(1).isNullAt(nt(1).fieldIndex("n_tokens")))
    assert(nt(1).getAs[Long]("n_removed") === 0L)
    assert(nt(1).getAs[String]("clean_text") === "")
  }

  test("DupSpans.remove keep-first overlap rule: removal wins") {
    import graft.operators.DupSpans
    // [bcd] canonical at (0,0); [abc] canonical at (1,0). doc1's [bcd]@1
    // is non-canonical -> removes pos 1..3 even though the SURVIVING
    // canonical [abc] covers pos 0..2: removal wins on overlap.
    val df = Seq(
      (0L, "b c d x"),
      (1L, "a b c d"),
      (2L, "a b c y")
    ).toDF("doc_id", "text")
    val r = DupSpans.remove(df, "text", "doc_id", n = 3, keepFirst = true)
      .orderBy($"doc_id").collect()
    assert(r(0).getAs[String]("clean_text") === "b c d x")
    assert(r(1).getAs[String]("clean_text") === "a")
    assert(r(1).getAs[Long]("n_removed") === 3L)
    // doc2's [abc]@0 is non-canonical -> only the unshared tail survives
    assert(r(2).getAs[String]("clean_text") === "y")
  }

  test("Bpe.fit hand case: weighted pair counts, chained merges, tie-break") {
    import graft.operators.Bpe
    // words: aa x2, ab x1 -> pairs (a,a):2 (a,b):1 -> merge1 (a,a);
    // then aa=[aa] has no pairs, ab=[a,b] -> merge2 (a,b)
    val df = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val m = Bpe.fit(df, "text", numMerges = 2)
    assert(m.merges === Seq(("a", "a", 2L), ("a", "b", 1L)))
    // lexicographic tie-break on equal counts: (a,b) before (c,d)
    val tie = Bpe.fit(Seq((1L, "ab cd")).toDF("doc_id", "text"), "text", 1)
    assert(tie.merges.head === ("a", "b", 1L))
    // greedy overlap: "aaa" with (a,a) merges left-to-right -> [aa, a]
    assert(graft.functions.BpeMerge.applyMerge(
      Array("a", "a", "a"), "a", "a").toSeq === Seq("aa", "a"))
    // chained encode: (a,a) then (a,b) on "aaab" -> [aa, ab]
    assert(graft.functions.BpeMerge.encodeWord("aaab",
      Seq(("a", "a"), ("a", "b"))).toSeq === Seq("aa", "ab"))
  }

  test("Bpe model save/load round-trips bit-identically and re-tokenizes the same") {
    import spark.implicits._
    val docs = Seq("low lower lowest", "newer newest new", "low low lower")
      .toDF("text")
    val m = graft.operators.Bpe.fit(docs, "text", numMerges = 8)
    val path = java.nio.file.Files.createTempDirectory("bpe_spec")
      .resolve("model.json").toString
    graft.operators.Bpe.save(m, path)
    val loaded = graft.operators.Bpe.load(path)
    assert(loaded === m)
    val a = graft.operators.Bpe.tokenize(docs, "text", Nil, m)
      .collect().map(_.getSeq[String](0)).toSeq
    val b = graft.operators.Bpe.tokenize(docs, "text", Nil, loaded)
      .collect().map(_.getSeq[String](0)).toSeq
    assert(a === b)
  }

  test("Bpe: maxWords cap binds the fit but capped-out words still encode") {
    import graft.operators.Bpe
    // "zz" is rarest -> excluded from the 2-word fit table, so (z,z) is
    // never a merge candidate; encoding still decomposes it (to chars)
    val df = Seq((1L, "aa aa ab ab zz")).toDF("doc_id", "text")
    val m = Bpe.fit(df, "text", numMerges = 3, maxWords = 2)
    assert(!m.merges.exists(x => x._1 == "z"))
    val enc = Bpe.tokenize(df, "text", Seq("doc_id"), m)
      .select($"bpe_tokens").head().getSeq[String](0)
    assert(enc.containsSlice(Seq("z", "z")))
  }

  test("TimeFeatures: fillForward repairs within keys, lagFeatures shift " +
    "exactly, leading positions stay null") {
    import graft.operators.TimeFeatures
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, ts("2021-01-01 00:00:00"), Some(1.0)),
      (2L, 1L, ts("2021-01-01 00:30:00"), None),
      (3L, 1L, ts("2021-01-01 01:30:00"), None),
      (4L, 1L, ts("2021-01-01 02:00:00"), Some(4.0)),
      (5L, 2L, ts("2021-01-01 00:10:00"), None) // leading null, other key
    ).toDF("event_id", "user_id", "ts", "value")
    val f = TimeFeatures.fillForward(ev, Seq("user_id"), "ts",
        Seq("event_id"), Seq("value"))
      .orderBy($"event_id").collect()
    assert(f.map(r => Option(r.getAs[Any]("value_ffill"))).toSeq ===
      Seq(Some(1.0), Some(1.0), Some(1.0), Some(4.0), None),
      "nulls take the key's most recent non-null; leading nulls stay null")
    val l = TimeFeatures.lagFeatures(ev, Seq("user_id"), "ts",
        Seq("event_id"), "value", Seq(1, 2))
      .orderBy($"event_id").collect()
    assert(l.map(r => Option(r.getAs[Any]("value_lag_1"))).toSeq ===
      Seq(None, Some(1.0), None, None, None))
    assert(l.map(r => Option(r.getAs[Any]("value_lag_2"))).toSeq ===
      Seq(None, None, Some(1.0), None, None))
    intercept[IllegalArgumentException] {
      TimeFeatures.lagFeatures(ev, Seq("user_id"), "ts", Seq("event_id"),
        "value", Seq(0))
    }
    // refuses to silently overwrite an existing _ffill column
    intercept[IllegalArgumentException] {
      TimeFeatures.fillForward(
        TimeFeatures.fillForward(ev, Seq("user_id"), "ts", Seq("event_id"),
          Seq("value")),
        Seq("user_id"), "ts", Seq("event_id"), Seq("value"))
    }
  }

  test("TimeFeatures.ewma: exact recurrence, null carry, merge refuses") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, Double.NaN), (1L, 4L, 40.0),
      (2L, 1L, 5.0)
    ).toDF("user_id", "seq", "v")
      .withColumn("v", org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.isnan(org.apache.spark.sql.functions.col("v")),
        org.apache.spark.sql.functions.lit(null)).otherwise(
        org.apache.spark.sql.functions.col("v")))
    val out = graft.operators.TimeFeatures.ewma(df, Seq("user_id"), "seq",
        Nil, "v", alpha = 0.5)
      .orderBy("user_id", "seq")
      .select("user_id", "seq", "ewma").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out((1L, 1L)) === Some(10.0))                 // y0 = x0
    assert(out((1L, 2L)) === Some(15.0))                 // 0.5*10 + 0.5*20
    assert(out((1L, 3L)) === Some(15.0))                 // null carries y
    assert(out((1L, 4L)) === Some(27.5))                 // 0.5*15 + 0.5*40
    assert(out((2L, 1L)) === Some(5.0))                  // fresh key resets
    // non-window (mergeable) use must fail loudly, not silently mis-fold
    val e = intercept[Exception] {
      df.agg(graft.functions.Ewma.ewma(
        org.apache.spark.sql.functions.col("v"), 0.5)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("window function")), msgs(e).mkString("|"))
  }

  test("Mix.temperatureRates: T=2 hand case") {
    // A:4 B:1 -> srt 2,1; S=3; total=5; frac=1:
    // rate_A = min(1, (2/3)*5/4) = 0.833333; rate_B = min(1, (1/3)*5) = 1
    val df = (Seq.fill(4)("A") ++ Seq("B")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "source")
    val r = Mix.temperatureRates(df, "source", temperature = 2.0, targetFrac = 1.0)
      .orderBy($"source").collect()
    assert(r(0).getAs[Double]("rate") === 0.833333)
    assert(r(1).getAs[Double]("rate") === 1.0)
    assert(r(0).getAs[Double]("weight") === 0.666667)
  }

  test("Mix: rate-1 strata keep everything; sample = flag survivors; deterministic") {
    val df = (0L until 200L).map(i => (i, if (i % 5 == 0) "rare" else "common"))
      .toDF("id", "source")
    val flags = Mix.temperatureFlag(df, "source", Seq("id"),
      temperature = 2.0, targetFrac = 0.6, seed = 7L)
    // the rare stratum is upweighted past 1 -> every rare row survives
    val rare = flags.filter($"source" === "rare")
    assert(rare.filter($"sampled").count() === rare.count())
    val sampled = Mix.temperatureSample(df, "source", Seq("id"),
      temperature = 2.0, targetFrac = 0.6, seed = 7L)
    assert(sampled.count() ===
      flags.filter($"sampled").count())
    // deterministic: same seed -> identical survivor set
    val again = Mix.temperatureSample(df, "source", Seq("id"),
      temperature = 2.0, targetFrac = 0.6, seed = 7L)
    assert(sampled.select("id").except(again.select("id")).count() === 0)
    assert(again.select("id").except(sampled.select("id")).count() === 0)
  }

  test("Mix.repeatEpochs: whole+fractional repeats, subsample, drop, " +
    "default 1.0, unique (id, repeat_idx)") {
    val df = (1L to 400L).map { i =>
      (i, s"s${i % 4}", s"payload $i")
    }.toDF("id", "src", "text")
    val out = graft.operators.Mix.repeatEpochs(df, "src", Seq("id"),
      Map("s0" -> 2.45, "s1" -> 0.6, "s2" -> 0.0))
    val bySrc = out.groupBy($"src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // s0: 100 docs x 2.45 -> every doc >= 2 repeats, ~45 get a third
    assert(bySrc("s0") >= 200 && bySrc("s0") < 300, s"s0 -> ${bySrc("s0")}")
    assert(math.abs(bySrc("s0") - 245L) <= 25, s"s0 ~245, got ${bySrc("s0")}")
    // s1: subsampled to ~60
    assert(math.abs(bySrc("s1") - 60L) <= 20, s"s1 ~60, got ${bySrc("s1")}")
    // s2: dropped entirely; s3 absent from the map -> exactly 1.0 epochs
    assert(!bySrc.contains("s2"))
    assert(bySrc("s3") === 100L)
    // (id, repeat_idx) unique; repeat_idx dense from 0 per id
    assert(out.select($"id", $"repeat_idx").distinct().count() === out.count())
    val maxIdx = out.filter($"src" === "s0").groupBy($"id")
      .agg(max($"repeat_idx").as("m"), count(lit(1)).as("n")).collect()
    maxIdx.foreach(r => assert(r.getLong(1) === r.getLong(2) - 1,
      "repeat_idx must be dense 0..n-1"))
    // determinism: same seed -> identical frame
    val again = graft.operators.Mix.repeatEpochs(df, "src", Seq("id"),
      Map("s0" -> 2.45, "s1" -> 0.6, "s2" -> 0.0))
    assert(out.exceptAll(again).count() === 0 &&
      again.exceptAll(out).count() === 0)
    // a unit mistake fails loudly
    intercept[IllegalArgumentException] {
      graft.operators.Mix.repeatEpochs(df, "src", Seq("id"),
        Map("s0" -> 2450.0))
    }
  }

  test("Splits.leakageSafeSplit: duplicated content never straddles the split") {
    // case/whitespace variants share a content fingerprint -> same side
    val docs = Seq(
      (1L, "The Quick Brown Fox"),
      (2L, "the quick   brown fox!!"),
      (3L, "THE QUICK BROWN FOX"),
      (4L, "a completely different document"),
      (5L, "yet another one entirely")).toDF("id", "text")
    val labeled = graft.plans.Splits.withLeakageSafeLabel(
      docs, "text", testFraction = 0.5, seed = 3L)
    val sides = labeled.filter($"id" <= 3).select($"split")
      .distinct().collect().map(_.getString(0))
    assert(sides.length === 1,
      s"all three fox variants must land one side, got ${sides.toSeq}")
    // id-keyed split CAN straddle (the failure mode this API exists for):
    // demonstrate on a seed where the ids actually split — find one
    val straddles = (0L to 50L).exists { s =>
      graft.plans.Splits.withSplitLabel(docs, Seq("id"),
        testFraction = 0.5, seed = s)
        .filter($"id" <= 3).select($"split").distinct().count() > 1
    }
    assert(straddles, "some id-keyed seed should split the duplicates " +
      "(otherwise this test proves nothing)")
  }

  test("Mix: T=1 keeps natural proportions (every rate = targetFrac)") {
    val df = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("id", "source")
    val r = Mix.temperatureRates(df, "source", temperature = 1.0, targetFrac = 0.4)
    // srt_s = n_s, S = total, so rate_s = (n_s/total)*(total*0.4)/n_s = 0.4
    assert(r.select("rate").as[Double].collect().toSeq === Seq.fill(3)(0.4))
  }
}
