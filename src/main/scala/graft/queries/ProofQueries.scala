package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Kernel
import graft.plans._
import graft.selectors.Selectors

/** CORRECTNESS registration for surfaces that were implemented but unproven
  * through round 4 (VERDICT r4 task 1): exact-n sampling, is_sorted,
  * selector boolean algebra + glob/regex/has_nulls, content/name filters,
  * all_null_like, materialize round-trip, the Plan/Learner frozen-fit
  * contract, and deterministic train/test splitting.
  */
object ProofQueries {

  private def t(s: SparkSession, dir: String, n: String) = Kernel.table(s, dir, n)

  /** Frozen-vocabulary one-hot estimator: fit collects the sorted distinct
    * vocabulary, transform replays it on ANY frame — a frame missing a
    * fitted category still emits that category's column (all zeros), which
    * is exactly what distinguishes a fitted learner from a refit.
    */
  private final class FrozenOneHot(c: String, prefix: String) extends Estimator {
    def fit(df: DataFrame): Transformer = {
      val vocab = df.select(col(c)).filter(col(c).isNotNull).distinct()
        .orderBy(col(c)).collect().map(_.getString(0)).toSeq
      new Transformer {
        def transform(d: DataFrame): DataFrame =
          d.select(col("o_orderkey") +: vocab.map(v =>
            when(col(c) === v, 1.0).otherwise(0.0)
              .as(prefix + "_" + v.replaceAll("[^A-Za-z0-9]+", "_"))): _*)
      }
    }
  }

  /** One definition feeds BOTH the Spark query and the oracle's CASE
    * thresholds — the keep-rates cannot drift apart. Two priority
    * classes are deliberately unlisted (kept at 0).
    */
  private val StratifiedFractions: Map[String, Double] =
    Map("1-URGENT" -> 0.30, "3-MEDIUM" -> 0.10, "5-LOW" -> 0.02)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact-n deterministic sample: md5-keyed ordering, reproducible by the
    // oracle regardless of partition layout
    "q_sample" -> ((s, dir) =>
      Kernel.sampleExactBy(t(s, dir, "orders"), 200, 42, Seq("o_orderkey"))),

    // stratified fraction sampling: one codegen'd hash-threshold filter,
    // different keep-rates per priority class, two classes unlisted (drop)
    "q_sample_stratified" -> ((s, dir) =>
      Kernel.sampleStratifiedFraction(t(s, dir, "orders"), "o_orderpriority",
        StratifiedFractions, 42, Seq("o_orderkey"))),

    // exact k-per-stratum via the bounded MinKBy aggregate (shuffle is
    // O(|strata| * k) rows, stratum skew notwithstanding)
    "q_sample_stratified_exact" -> ((s, dir) =>
      Kernel.sampleStratifiedExact(t(s, dir, "orders"), "o_orderpriority",
        50, 42, Seq("o_orderkey"))),

    // is_sorted: a monotone column and a non-monotone column under the same
    // explicit ordering, one row out
    "q_is_sorted" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = Kernel.isSorted(o, "o_orderkey", Seq("o_orderkey"))
        .select(col("is_sorted").as("key_sorted"))
      val b = Kernel.isSorted(o, "o_totalprice", Seq("o_orderkey"))
        .select(col("is_sorted").as("price_sorted"))
      a.crossJoin(b)
    }),

    // selector algebra: And/Inv/Sub/XOr/Or over glob + regex + dtype +
    // data-dependent has_nulls legs, resolved against orders
    "q_selector_algebra" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val sel = (Selectors.numeric & ~Selectors.glob("*key")) |
        ((Selectors.glob("o_order*") - Selectors.cols("o_orderkey")) ^ Selectors.string) |
        Selectors.hasNulls(0.5) |
        Selectors.regex("priority$")
      Selectors.select(o, sel & Selectors.nameFilter(_.startsWith("o_")))
    }),

    // content filter (s.filter): one aggregate job evaluating every column's
    // predicate together — keep columns whose stringified max length <= 12
    // (drops c_name, 18 chars), intersected with a name filter
    "q_selector_filter" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val sel = Selectors.filter(n =>
        max(length(col(n).cast("string"))) <= 12) &
        Selectors.nameFilter(_.startsWith("c_"))
      Selectors.select(c, sel)
    }),

    // all_null_like: same schema, n all-null rows
    "q_all_null_like" -> ((s, dir) =>
      Kernel.allNullLike(t(s, dir, "orders"), 7)),

    // materialize round-trip: collect() to the driver and rebuild the frame
    // from local rows — proves the materialization boundary preserves values
    "q_materialize" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val rows = o.orderBy(col("o_orderkey")).limit(100).collect().toSeq
      s.createDataFrame(s.sparkContext.parallelize(rows), o.schema)
    }),

    // Plan/Learner frozen-fit contract on the X frontier: fit the one-hot
    // vocabulary on the FULL orders table, then transform a frame from which
    // one category is entirely absent — the fitted learner must still emit
    // that category's column (a refit would drop it, failing the oracle)
    "q_plan_learner" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val plan = Apply(
        MarkX(Transform(Var("orders"),
          d => d.select(col("o_orderkey"), col("o_orderpriority")))),
        new FrozenOneHot("o_orderpriority", "prio"))
      val learner = Plan.makeLearner(plan)
      learner.fit(Map("orders" -> orders))
      learner.transform(Map("orders" ->
        orders.filter(col("o_orderpriority") =!= "1-URGENT")))
    }),

    // the search DRIVER end to end (r6: the last unit-only family gets an
    // oracle): gridSearch fits one Learner per candidate threshold, scores
    // each on the val frame, and ranks best-first; scores are plain row
    // counts so the oracle replays the whole loop in SQL
    "q_grid_search" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val results = Choices.gridSearch(
        Seq(Choices.chooseFrom("thr", Seq(0.0, 1000.0, 5000.0))),
        p => Var("x").transform(_.filter(
          col("c_acctbal") > lit(p("thr").asInstanceOf[Double]))),
        fitEnv = Map("x" -> cust), valEnv = Map("x" -> cust),
        score = _.count().toDouble)
      import s.implicits._
      results.zipWithIndex.map { case (r, i) =>
        (r.params("thr").asInstanceOf[Double], r.score, i + 1)
      }.toDF("thr", "score", "rank")
    }),

    // deterministic train/test split as a labeled column: md5-bucket
    // predicate, no shuffle, replayed exactly by the oracle
    "q_train_test_split" -> ((s, dir) =>
      Splits.withSplitLabel(t(s, dir, "orders"), Seq("o_orderkey"),
        testFraction = 0.2, seed = 42)
        .select(col("o_orderkey"), col("split")))
      ,

    // dataset generator, hash-verified end to end: the md5-derived
    // pseudo-random stream is cross-engine reproducible, so DuckDB regrows
    // the exact same frame. (`end` is omitted: it draws through ln(), whose
    // rounding is not IEEE-identical across engines.)
    "q_toy_cities" -> ((s, _) =>
      graft.sources.Generators.toyCities(s, seed = 1L, size = 5000L,
          nulls = 0.1, nMetrics = 2)
        .select(col("uid"), col("cities"), col("encoded_cities"),
          unix_timestamp(col("start")).as("start_s"),
          col("metric_0"), col("metric_1"))),

    // the misspelling generator, hash-verified: every flip decision and
    // replacement letter reproduced by the oracle from the same md5 stream
    "q_make_dedup_data" -> ((s, _) =>
      graft.sources.Generators.makeDeduplicationData(s,
        Seq("black", "white", "red"), Seq(30, 25, 20),
        probMistake = 0.3, seed = 7L)),

    // preview-mode subsampling through a Learner: deterministic md5-order
    // 'random' sample of a projected frame, replayed exactly by the oracle
    "q_subsample_preview" -> ((s, dir) => {
      val plan = Var("orders")
        .transform(d => d.select(col("o_orderkey"), col("o_orderpriority")))
        .subsample(500, how = "random")
      Plan.makeLearner(plan).preview(Map("orders" -> t(s, dir, "orders")))
    })
  )

  private val toyCitiesOracle: String = {
    def u(salt: String) =
      s"(('0x' || substr(md5(id::VARCHAR || ':' || '$salt' || ':' || '1'), 1, 6))::BIGINT / 16777216.0)"
    val cities = Seq("Amsterdam", "Athens", "Berlin", "Bratislava",
      "Brussels", "Bucharest", "Budapest", "Copenhagen", "Dublin", "Helsinki",
      "Lisbon", "Ljubljana", "Madrid", "Paris", "Prague", "Rome", "Stockholm",
      "Tallinn", "Vienna", "Warsaw").map(c => s"'$c'").mkString("[", ", ", "]")
    val uid = (0 until 10).map(j =>
      s"substr('abcdefghijklmnopqrstuvwxyz', CAST(floor(${u(s"uid$j")} * 26) AS INTEGER) + 1, 1)")
      .mkString(" || ")
    s"""WITH ids AS (SELECT unnest(range(0, 5000)) AS id),
       |g AS (
       |  SELECT id,
       |    $uid AS uid,
       |    CAST(floor(${u("city")} * 20) AS INTEGER) AS city_idx,
       |    ${u("citynull")} < 0.1 AS city_null,
       |    CAST(1577836800 + floor(${u("start")} * 94608000) AS BIGINT) AS start_s,
       |    round(${u("metric0")}, 6) AS metric_0,
       |    round(${u("metric1")}, 6) AS metric_1
       |  FROM ids)
       |SELECT uid,
       |  CASE WHEN city_null THEN NULL ELSE ($cities)[city_idx + 1] END AS cities,
       |  CASE WHEN city_null THEN NULL ELSE city_idx END AS encoded_cities,
       |  start_s, metric_0, metric_1
       |FROM g""".stripMargin
  }

  private val planLearnerOracle: String = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val cols = prios.map(v =>
      s"CASE WHEN o_orderpriority = '$v' THEN 1.0 ELSE 0.0 END AS prio_${v.replaceAll("[^A-Za-z0-9]+", "_")}")
    s"""SELECT o_orderkey,
       |  ${cols.mkString(",\n  ")}
       |FROM orders WHERE o_orderpriority <> '1-URGENT'""".stripMargin
  }

  private val makeDedupOracle: String = {
    def u(cid: String, salt: String) =
      s"(('0x' || substr(md5($cid || ':' || '$salt' || ':' || '7'), 1, 6))::BIGINT / 16777216.0)"
    val cid = "(eid::VARCHAR || '_' || cp::VARCHAR || '#' || j::VARCHAR)"
    s"""WITH ex AS (
       |  SELECT * FROM (VALUES (0, 'black', 30), (1, 'white', 25),
       |    (2, 'red', 20)) AS t(eid, ex, n)),
       |copies AS (
       |  SELECT eid, ex, unnest(range(0, n)) AS cp FROM ex)
       |SELECT array_to_string(list_transform(range(0, length(ex)), j ->
       |  CASE WHEN cp = 0 THEN substr(ex, CAST(j AS INTEGER) + 1, 1)
       |       WHEN ${u(cid, "flip")} < 0.3
       |         THEN substr('abcdefghijklmnopqrstuvwxyz',
       |           CAST(floor(${u(cid, "repl")} * 26) AS INTEGER) + 1, 1)
       |       ELSE substr(ex, CAST(j AS INTEGER) + 1, 1) END), '') AS value
       |FROM copies""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // scores are strictly decreasing in thr on this data, so rank order is
    // unambiguous; the tie-break mirror (score DESC, thr ASC) matches the
    // stable sortBy over the ascending grid
    "q_grid_search" ->
      """WITH cand AS (SELECT unnest([0.0, 1000.0, 5000.0]) AS thr),
        |scored AS (
        |  SELECT thr,
        |    (SELECT CAST(count(*) AS DOUBLE) FROM customer
        |     WHERE c_acctbal > thr) AS score
        |  FROM cand)
        |SELECT thr, score,
        |  CAST(row_number() OVER (ORDER BY score DESC, thr) AS INT) AS rank
        |FROM scored""".stripMargin,

    "q_toy_cities" -> toyCitiesOracle,

    "q_make_dedup_data" -> makeDedupOracle,

    "q_subsample_preview" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |ORDER BY md5(o_orderkey::VARCHAR || o_orderpriority)
        |LIMIT 500""".stripMargin,

    "q_sample" ->
      """SELECT * FROM orders
        |ORDER BY md5(CAST(o_orderkey AS VARCHAR) || ':' || '42'), o_orderkey
        |LIMIT 200""".stripMargin,

    "q_sample_stratified" -> {
      val cases = StratifiedFractions.map { case (s, f) =>
        s"WHEN '$s' THEN '${Kernel.hexThreshold15(f)}'"
      }.mkString(" ")
      s"""SELECT * FROM orders
         |WHERE substr(md5(CAST(o_orderkey AS VARCHAR) || ':' || '42'), 1, 15)
         |  < CASE o_orderpriority $cases END""".stripMargin
    },

    "q_sample_stratified_exact" ->
      """SELECT * EXCLUDE (rn) FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY md5(CAST(o_orderkey AS VARCHAR) || ':' || '42')) AS rn
        |  FROM orders)
        |WHERE rn <= 50""".stripMargin,

    "q_is_sorted" ->
      """SELECT
        |  (SELECT count(*) FROM (
        |     SELECT lag(o_orderkey) OVER (ORDER BY o_orderkey) AS p,
        |       o_orderkey AS v
        |     FROM orders WHERE o_orderkey IS NOT NULL) WHERE p > v) = 0
        |    AS key_sorted,
        |  (SELECT count(*) FROM (
        |     SELECT lag(o_totalprice) OVER (ORDER BY o_orderkey) AS p,
        |       o_totalprice AS v
        |     FROM orders WHERE o_totalprice IS NOT NULL) WHERE p > v) = 0
        |    AS price_sorted""".stripMargin,

    "q_selector_algebra" ->
      "SELECT o_totalprice, o_orderdate, o_orderpriority FROM orders",

    "q_selector_filter" ->
      "SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment FROM customer",

    "q_all_null_like" ->
      """SELECT CAST(NULL AS BIGINT) AS o_orderkey,
        |  CAST(NULL AS BIGINT) AS o_custkey,
        |  CAST(NULL AS VARCHAR) AS o_orderstatus,
        |  CAST(NULL AS DOUBLE) AS o_totalprice,
        |  CAST(NULL AS TIMESTAMP) AS o_orderdate,
        |  CAST(NULL AS VARCHAR) AS o_orderpriority
        |FROM range(7)""".stripMargin,

    "q_materialize" ->
      "SELECT * FROM orders ORDER BY o_orderkey LIMIT 100",

    "q_plan_learner" -> planLearnerOracle,

    "q_train_test_split" ->
      """SELECT o_orderkey,
        |  CASE WHEN ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' || '42'), 1, 4))::INT % 1000 < 200
        |       THEN 'test' ELSE 'train' END AS split
        |FROM orders""".stripMargin
  )
}
