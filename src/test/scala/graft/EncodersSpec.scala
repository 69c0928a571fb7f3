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

  test("ToCategorical: the tag routes a high-cardinality column low-card " +
    "in TableVectorizer, survives projections, rejects non-strings, and " +
    "caps unbounded vocabularies loudly") {
    import graft.encoders.ToCategorical
    val cust = TestSpark.table("customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    // c_name is unique per row — untagged it must route high-cardinality
    val unTagged = TableVectorizer.fit(cust.limit(300)).columnToKind.toMap
    assert(unTagged("c_name") === TableVectorizer.HighCardinality)
    val tagged = ToCategorical.transform(cust.limit(300), "c_name")
    assert(ToCategorical.isCategorical(tagged.schema("c_name")))
    // the tag is schema metadata: it must survive projection/filter
    val projected = tagged.select(col("c_name")).filter(col("c_name").isNotNull)
    assert(ToCategorical.isCategorical(projected.schema("c_name")),
      "the categorical tag must travel with the schema like a dtype")
    // tagged, the same column routes low-cardinality (300 <= MaxTaggedVocab)
    val kinds = TableVectorizer.fit(tagged).columnToKind.toMap
    assert(kinds("c_name") === TableVectorizer.LowCardinality,
      "a ToCategorical tag must force the low-cardinality route")
    // TableReport displays the tag as its own dtype
    val dt = graft.operators.TableReport.summarize(tagged, exactQuantiles = false)
      .filter(col("column_name") === "c_name").select(col("dtype"))
      .head().getString(0)
    assert(dt === "categorical")
    // a numeric column rejects (the reference RejectColumn contract)
    intercept[graft.operators.ApplyToCols.RejectColumn] {
      ToCategorical.transform(cust, "c_acctbal")
    }
    // tagging is idempotent
    assert(ToCategorical.transform(tagged, "c_name").schema === tagged.schema)
    // a tag on a genuinely unbounded vocabulary fails loudly, not OOM:
    // 5000 distinct values > MaxTaggedVocab
    val wide = spark.range(5000)
      .select(concat(lit("v"), col("id")).as("v").cast("string").as("v"))
    val e = intercept[IllegalArgumentException] {
      TableVectorizer.fit(ToCategorical.transform(wide, "v"))
    }
    assert(e.getMessage.contains("MaxTaggedVocab")
      || e.getMessage.contains("distinct"),
      s"the cap error must explain itself, got: ${e.getMessage}")
  }

  test("TextEncoder: provider sees each DISTINCT value exactly once; " +
    "null encodes as the empty string") {
    import graft.encoders.{EmbeddingProvider, HashEmbeddingProvider, TextEncoder}
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val counting = new EmbeddingProvider {
      val inner = HashEmbeddingProvider(4)
      def dim = 4
      def embed(values: org.apache.spark.sql.DataFrame) = {
        // materialize the input to count what the engine actually hands us
        seen.addAndGet(values.count())
        inner.embed(values)
      }
    }
    val df = Seq(Some("a"), Some("a"), Some("b"), None, Some(""), Some("a"))
      .toDF("s")
    val out = TextEncoder.encode(df, "s", counting, nComponents = None)
    assert(out.count() === 6)
    // distinct values: "a", "b", "" (null canonicalized to "") — and the
    // fit + transform each run the provider once over them
    assert(seen.get() === 6L,
      s"expected 2 provider calls x 3 distinct values, saw ${seen.get()}")
    val nullRow = out.filter(col("s").isNull).select(col("s_0")).head()
    val emptyRow = out.filter(col("s") === "").select(col("s_0")).head()
    assert(nullRow.getDouble(0) === emptyRow.getDouble(0),
      "null must embed exactly like the empty string")
  }

  test("TextEncoder: PCA reduces to nComponents; block scaling makes the " +
    "output's total std 1; tiny inputs truncate instead") {
    import graft.encoders.{HashEmbeddingProvider, TextEncoder}
    val names = TestSpark.table("customer").select(col("c_name")).limit(300)
    val out = TextEncoder.encode(names, "c_name", HashEmbeddingProvider(16),
      nComponents = Some(4))
    val featCols = (0 until 4).map(i => s"c_name_$i")
    assert(featCols.forall(out.columns.contains),
      s"expected ${featCols.mkString(",")} in ${out.columns.mkString(",")}")
    assert(!out.columns.contains("c_name_4"), "PCA must cut to nComponents")
    // block normalization: sqrt(Σ_j var_pop(f_j)) == 1 after scaling
    val n = out.count().toDouble
    val totalVar = featCols.map { c =>
      val r = out.agg(sum(col(c)).as("s"), sum(col(c) * col(c)).as("sq"))
        .head()
      (r.getDouble(1) - r.getDouble(0) * r.getDouble(0) / n) / n
    }.sum
    assert(math.abs(math.sqrt(totalVar) - 1.0) < 1e-3,
      s"block scale must normalize total std to 1, got ${math.sqrt(totalVar)}")
    // 3 rows < nComponents=4: the reference's warning path truncates
    val tiny = Seq("x", "y", "z").toDF("s")
    val t4 = TextEncoder.encode(tiny, "s", HashEmbeddingProvider(16),
      nComponents = Some(4))
    assert((0 until 4).forall(i => t4.columns.contains(s"s_$i")) &&
      !t4.columns.contains("s_4"),
      "too-few-rows path must truncate to the first nComponents dims")
  }

  test("TableVectorizer routes high-cardinality strings through TextEncoder " +
    "with highCardEncoder=text") {
    import graft.encoders.HashEmbeddingProvider
    val cust = TestSpark.table("customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val n = cust.count()
    val out = TableVectorizer.fit(cust, highCardEncoder = "text")
      .transform(cust, textProvider = HashEmbeddingProvider(64))
    // c_name is high-card -> 30 TextEncoder features; c_mktsegment one-hots
    assert((0 until 30).forall(i => out.columns.contains(s"c_name_$i")),
      s"expected c_name_0..29 in ${out.columns.mkString(",")}")
    assert(!out.columns.contains("c_name"), "raw column must be replaced")
    assert(out.columns.exists(_.startsWith("c_mktsegment_")))
    assert(out.count() === n)
  }

  test("TextEncoder: a precomputed lookup table reproduces the in-process " +
    "provider; missing keys surface as null features") {
    import graft.encoders.{HashEmbeddingProvider, TableEmbeddingProvider, TextEncoder}
    val df = Seq("alpha", "beta", "gamma", "alpha").toDF("s")
    val hash = HashEmbeddingProvider(6)
    // offline batch-inference stand-in: the hash provider's own output
    // persisted as a (string, vector) lookup
    val lookup = hash.embed(
      df.select(col("s").as("value")).distinct()).toDF("k", "v")
    val table = TableEmbeddingProvider(lookup, "k", "v", 6)
    val a = TextEncoder.encode(df, "s", hash, nComponents = None)
      .orderBy("s").collect().map(_.toSeq)
    val b = TextEncoder.encode(df, "s", table, nComponents = None)
      .orderBy("s").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq,
      "table-served embeddings must be indistinguishable from in-process")
    val partial = TableEmbeddingProvider(
      lookup.filter(col("k") =!= "beta"), "k", "v", 6)
    val miss = TextEncoder.encode(df, "s", partial, nComponents = None)
    assert(miss.filter(col("s") === "beta")
      .filter(col("s_0").isNull).count() === 1,
      "a value absent from the lookup must surface as null features")
  }
}
