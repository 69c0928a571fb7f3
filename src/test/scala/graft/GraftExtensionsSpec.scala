package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL registration of the custom expression library: every registered
  * function must be callable from `spark.sql` and agree exactly with its
  * Scala-façade twin (same Expression class, so this pins the builders'
  * argument wiring, not the expressions themselves — those have their own
  * laws in VecExprsSpec/ExprLawsSpec).
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }

  test("register is idempotent and covers the whole table") {
    GraftFunctions.register(spark) // second registration must not throw
    GraftFunctions.all.foreach { case (id, _, _) =>
      assert(spark.catalog.functionExists(id.funcName), id.funcName)
    }
  }

  test("scalar functions match their Scala facade on a fixture") {
    import spark.implicits._
    val df = Seq(
      ("The quick brown fox jumps over the lazy dog", Seq(1.0, 2.0, 3.0)),
      ("pack my box with five dozen liquor jugs", Seq(-1.0, 0.5, 2.0)),
    ).toDF("text", "vec")
    df.createOrReplaceTempView("ext_fixture")

    val sql = spark.sql(
      """SELECT
        |  graft_array_dot(vec, vec) AS dot,
        |  graft_array_dist2(vec, array(0.0D, 0.0D, 0.0D)) AS d2,
        |  graft_simhash32(text) AS sh32,
        |  graft_simhash64(text) AS sh64,
        |  graft_token_shingles(text, 3) AS sh,
        |  graft_minhash_sig(graft_token_shingles(text, 3), 8) AS sig,
        |  graft_ngram_tf(text, 16) AS tf,
        |  graft_hyperplane_buckets(vec, 4, 2) AS bkt,
        |  graft_ngram_rep_stats(text, 2) AS reps,
        |  graft_token_pairs(text) AS tp,
        |  graft_token_chunks(text, 4, 3) AS tc,
        |  graft_token_window_hashes(text, 3) AS twh,
        |  graft_gram_buckets(text, 997) AS gb
        |FROM ext_fixture""".stripMargin)

    val api = df.select(
      graft.functions.VecExprs.arrayDot(col("vec"), col("vec")).as("dot"),
      graft.functions.VecExprs.arrayDist2(col("vec"),
        array(lit(0.0), lit(0.0), lit(0.0))).as("d2"),
      graft.functions.VecExprs.simhash32(col("text")).as("sh32"),
      graft.functions.VecExprs.simhash64(col("text")).as("sh64"),
      graft.functions.VecExprs.tokenShingles(col("text"), 3).as("sh"),
      graft.functions.VecExprs.minhashSig(
        graft.functions.VecExprs.tokenShingles(col("text"), 3), 8).as("sig"),
      graft.functions.VecExprs.ngramTf(col("text"), 16).as("tf"),
      graft.functions.VecExprs.hyperplaneBuckets(col("vec"), 4, 2).as("bkt"),
      graft.functions.VecExprs.ngramRepStats(col("text"), 2).as("reps"),
      graft.functions.VecExprs.tokenPairs(col("text")).as("tp"),
      graft.functions.VecExprs.tokenChunks(col("text"), 4, 3).as("tc"),
      graft.functions.VecExprs.tokenWindowHashes(col("text"), 3).as("twh"),
      graft.functions.VecExprs.gramBuckets(col("text"), 997).as("gb"))

    assert(sql.collect().toSeq == api.collect().toSeq)
  }

  test("aggregate functions: ewma window, distinct_at_most, min_k_by, mode") {
    import spark.implicits._
    Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (2L, 1L, 5.0))
      .toDF("k", "seq", "v").createOrReplaceTempView("agg_fixture")
    val ew = spark.sql(
      """SELECT k, seq, graft_ewma(v, 0.5) OVER (PARTITION BY k ORDER BY seq
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
        |FROM agg_fixture""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ew((1L, 1L)) === 10.0 && ew((1L, 2L)) === 15.0 && ew((2L, 1L)) === 5.0)
    val r = spark.sql(
      """SELECT graft_distinct_at_most(v, 1) AS d,
        |  graft_min_k_by(v, 2) AS mk, graft_mode(k) AS mo
        |FROM agg_fixture""".stripMargin).head()
    assert(r.getLong(0) === 2L) // saturated: more than 1 distinct
    assert(r.getSeq[Double](1) === Seq(5.0, 10.0))
    assert(r.getLong(2) === 1L)
  }

  test("posting_pairs and ngram_tfidf take literal tuning arguments") {
    val pairs = spark.sql(
      """SELECT graft_posting_pairs(
        |  array(named_struct('id', 1, 'n', 10),
        |        named_struct('id', 2, 'n', 10),
        |        named_struct('id', 3, 'n', 1)), 0.5) AS p""".stripMargin)
      .selectExpr("size(p) AS n").collect().head.getInt(0)
    // (1,2) passes the size-ratio prefilter; anything with n=1 vs 10 cannot
    // reach jaccard 0.5
    assert(pairs == 1)

    val w = (0 until 16).map(_ => 1.0)
    val tfidf = spark.sql(
      s"""SELECT graft_ngram_tfidf('hello world',
         |  array(${w.mkString(", ")})) AS v""".stripMargin)
      .selectExpr("size(v) AS n").collect().head.getInt(0)
    assert(tfidf == 16)
  }

  test("geometry arguments must be literals") {
    import spark.implicits._
    Seq(("abc", 2)).toDF("s", "k").createOrReplaceTempView("ext_badargs")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_token_shingles(s, k) FROM ext_badargs")
        .collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("withExtensions wires the functions into a newly built session") {
    import org.apache.spark.sql.SparkSession
    // Force the builder to construct a NEW SparkSession (reusing the test
    // SparkContext) so the extensions hook actually runs — the same code
    // path `--conf spark.sql.extensions=graft.GraftExtensions` takes on a
    // cluster. getOrCreate() short-circuits to the default session when one
    // is set, so clear and restore it around the build.
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val fresh = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(fresh ne shared)
      assert(fresh.sql(
        "SELECT graft_array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head.getDouble(0) == 11.0)
      // a plain sibling session sees nothing — registration is per-session
      assert(!shared.newSession().catalog.functionExists("graft_array_dot"))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
