package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Kernel
import graft.operators.Joins
import graft.selectors.{Selector, Selectors}

/** Relational / kernel queries with DuckDB oracles.
  *
  * Float-parity rules used throughout (see SURVEY §7.4.1):
  *  - money aggregates go through DECIMAL(12,2) (exact, order-independent)
  *    and are cast to DOUBLE at the very end — both engines produce the
  *    identical double;
  *  - means are expressed as exact-decimal-sum / count (deterministic double
  *    division), never engine `avg` over doubles;
  *  - quantile outputs are rounded to 6 decimals.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Kernel.table(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- groupBy aggregate (TPC-H Q1 shape) --------------------------------
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(12, 2))).cast(DoubleType).as("sum_price"),
          (sum(col("l_quantity").cast(DecimalType(12, 2))).cast(DoubleType) /
            count(col("l_quantity"))).as("avg_qty"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(16, 6))).cast(DoubleType).as("revenue"))
    }),

    // --- filter + projection (pushdown-friendly) ---------------------------
    "q_filter_select" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 1000.0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // --- order by + limit (deterministic tie-break) ------------------------
    "q_sort_topn" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // --- exact left join with collision-safe rename ------------------------
    "q_join_left" -> ((s, dir) => {
      Joins.leftJoin(t(s, dir, "orders"), t(s, dir, "customer"),
          Seq("o_custkey"), Seq("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          col("c_acctbal"), col("c_mktsegment"))
    }),

    // salted skew join: deterministic md5 salt on the probe side, build
    // side replicated x8, join on (key, salt) — the result set must be
    // IDENTICAL to the plain left join, so it passes q_join_left's oracle
    "q_join_salted" -> ((s, dir) =>
      graft.ops.Skew.saltedJoin(
        t(s, dir, "orders"),
        t(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey"),
        on = Seq("o_custkey"), buckets = 8,
        probeSaltKeys = Seq("o_orderkey"), joinType = "left")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          col("c_acctbal"), col("c_mktsegment"))),

    // --- AggJoiner: aggregate lineitem per order, join onto orders ---------
    "q_agg_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("l_quantity", col("l_quantity").cast(DecimalType(12, 2)))
      Joins.aggJoinPerCol(t(s, dir, "orders"), li, Seq("o_orderkey"), Seq("l_orderkey"),
          Seq("l_quantity" -> Seq("count", "sum"),
            "l_extendedprice" -> Seq("min", "max"),
            "l_returnflag" -> Seq("mode")))
        .select(col("o_orderkey"), col("o_totalprice"),
          col("l_quantity_count"),
          col("l_quantity_sum").cast(DoubleType).as("l_quantity_sum"),
          col("l_extendedprice_min"), col("l_extendedprice_max"),
          col("l_returnflag_mode"))
    }),

    // --- AggTarget: per-key stats of a target column joined back -----------
    "q_agg_target" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("o_totalprice", col("o_totalprice").cast(DecimalType(12, 2)))
      Joins.aggTarget(o, Seq("o_custkey"), "o_totalprice", Seq("count", "min", "max", "sum"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast(DoubleType).as("o_totalprice"),
          col("o_totalprice_count"),
          col("o_totalprice_min").cast(DoubleType).as("o_totalprice_min"),
          col("o_totalprice_max").cast(DoubleType).as("o_totalprice_max"),
          col("o_totalprice_sum").cast(DoubleType).as("o_totalprice_sum"))
    }),

    // --- MultiAggJoiner: two aux tables folded on ---------------------------
    "q_multi_agg_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("l_quantity", col("l_quantity").cast(DecimalType(12, 2)))
      val main = t(s, dir, "orders")
      val step1 = Joins.aggJoin(main, li, Seq("o_orderkey"), Seq("l_orderkey"),
        Seq("l_quantity"), Seq("count", "sum"))
      val cust = t(s, dir, "customer")
      val step2 = Joins.aggJoin(step1, cust, Seq("o_custkey"), Seq("c_custkey"),
        Seq("c_acctbal"), Seq("min", "max"))
      step2.select(col("o_orderkey"), col("l_quantity_count"),
        col("l_quantity_sum").cast(DoubleType).as("l_quantity_sum"),
        col("c_acctbal_min"), col("c_acctbal_max"))
    }),

    // --- diagonal-relaxed vertical concat -----------------------------------
    "q_concat_diagonal" -> ((s, dir) => {
      val a = t(s, dir, "orders")
        .select(col("o_orderkey").as("id"), col("o_totalprice").as("amount"))
      val b = t(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_acctbal").as("amount"),
          col("c_name").as("name"))
      Kernel.concatDiagonal(Seq(a, b))
    }),

    // --- value_counts -------------------------------------------------------
    "q_value_counts" -> ((s, dir) =>
      Kernel.valueCounts(t(s, dir, "orders"), "o_orderpriority")),

    // --- whole-column stats: n_unique + exact quantiles ---------------------
    "q_col_stats" -> ((s, dir) => {
      t(s, dir, "orders").agg(
        countDistinct(col("o_custkey")).as("n_unique"),
        round(expr("percentile(o_totalprice, 0.25)"), 6).as("q25"),
        round(expr("percentile(o_totalprice, 0.5)"), 6).as("q50"),
        round(expr("percentile(o_totalprice, 0.75)"), 6).as("q75"))
    }),

    // --- positional head over explicit order --------------------------------
    "q_head_sorted" -> ((s, dir) =>
      t(s, dir, "orders").orderBy(col("o_orderkey")).limit(50)),

    // --- scalar kernel: where / replace / fill ------------------------------
    "q_scalar_funcs" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        Kernel.whereCol(col("l_discount") > 0.05, lit("HI"), lit("LO")).as("disc_band"),
        Kernel.replaceExact(col("l_returnflag"), lit("N"), lit("NONE")).as("flag_repl"),
        Kernel.whereCol(Kernel.isNullLike(li, "l_tax"), lit(0.0), col("l_tax")).as("tax_filled"))
    }),

    // --- CleanNullStrings ----------------------------------------------------
    "q_clean_null_strings" -> ((s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        Kernel.cleanNullStrings(col("c_mktsegment"),
          Seq("", "N/A", "BUILDING")).as("segment_clean"))
    }),

    // --- ToFloat locale parse (round-trip through a comma-decimal string) ---
    "q_to_float_locale" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // deterministic string fixture: decimal-comma rendering, negatives as (x)
      val asText = regexp_replace(
        col("l_extendedprice").cast(DecimalType(12, 2)).cast(StringType), "\\.", ",")
      val withParens = when(col("l_discount") > 0.05, concat(lit("("), asText, lit(")")))
        .otherwise(asText)
      li.select(col("l_orderkey"), col("l_linenumber"),
        withParens.as("raw_text"),
        Kernel.toFloatLocale(withParens, thousandSep = " ", decimalSep = ",").as("parsed"))
    }),

    // --- selector algebra with data-dependent cardinality --------------------
    "q_selector_cardinality" -> ((s, dir) =>
      Selectors.select(t(s, dir, "orders"),
        Selectors.cardinalityBelow(10) & Selectors.string))
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(16,6))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_select" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0""".stripMargin,

    "q_sort_topn" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q_join_left" ->
      """SELECT o_orderkey, o_custkey, c_name, c_acctbal, c_mktsegment
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin,

    // salting must not change the result set: the plain join IS the oracle
    "q_join_salted" ->
      """SELECT o_orderkey, o_custkey, c_name, c_acctbal, c_mktsegment
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q_agg_join" ->
      """WITH agg AS (
        |  SELECT l_orderkey,
        |    count(l_quantity) AS l_quantity_count,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS l_quantity_sum,
        |    min(l_extendedprice) AS l_extendedprice_min,
        |    max(l_extendedprice) AS l_extendedprice_max
        |  FROM lineitem GROUP BY l_orderkey),
        |md AS (
        |  SELECT l_orderkey, l_returnflag AS l_returnflag_mode FROM (
        |    SELECT l_orderkey, l_returnflag,
        |      row_number() OVER (PARTITION BY l_orderkey
        |        ORDER BY count(*) DESC, l_returnflag ASC) AS rn
        |    FROM lineitem GROUP BY l_orderkey, l_returnflag) WHERE rn = 1)
        |SELECT o_orderkey, o_totalprice, l_quantity_count, l_quantity_sum,
        |  l_extendedprice_min, l_extendedprice_max, l_returnflag_mode
        |FROM orders
        |LEFT JOIN agg ON o_orderkey = agg.l_orderkey
        |LEFT JOIN md ON o_orderkey = md.l_orderkey""".stripMargin,

    "q_agg_target" ->
      """WITH agg AS (
        |  SELECT o_custkey AS k,
        |    count(o_totalprice) AS o_totalprice_count,
        |    CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS o_totalprice_min,
        |    CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS o_totalprice_max,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS o_totalprice_sum
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
        |  o_totalprice_count, o_totalprice_min, o_totalprice_max, o_totalprice_sum
        |FROM orders LEFT JOIN agg ON o_custkey = agg.k""".stripMargin,

    "q_multi_agg_join" ->
      """WITH li AS (
        |  SELECT l_orderkey, count(l_quantity) AS l_quantity_count,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS l_quantity_sum
        |  FROM lineitem GROUP BY l_orderkey),
        |cu AS (
        |  SELECT c_custkey, min(c_acctbal) AS c_acctbal_min, max(c_acctbal) AS c_acctbal_max
        |  FROM customer GROUP BY c_custkey)
        |SELECT o_orderkey, l_quantity_count, l_quantity_sum, c_acctbal_min, c_acctbal_max
        |FROM orders
        |LEFT JOIN li ON o_orderkey = li.l_orderkey
        |LEFT JOIN cu ON o_custkey = cu.c_custkey""".stripMargin,

    "q_concat_diagonal" ->
      """SELECT o_orderkey AS id, o_totalprice AS amount, CAST(NULL AS VARCHAR) AS name
        |FROM orders
        |UNION ALL
        |SELECT c_custkey, c_acctbal, c_name FROM customer""".stripMargin,

    "q_value_counts" ->
      """SELECT o_orderpriority, count(*) AS count FROM orders
        |WHERE o_orderpriority IS NOT NULL GROUP BY o_orderpriority""".stripMargin,

    "q_col_stats" ->
      """SELECT count(DISTINCT o_custkey) AS n_unique,
        |  round(quantile_cont(o_totalprice, 0.25), 6) AS q25,
        |  round(quantile_cont(o_totalprice, 0.5), 6) AS q50,
        |  round(quantile_cont(o_totalprice, 0.75), 6) AS q75
        |FROM orders""".stripMargin,

    "q_head_sorted" ->
      "SELECT * FROM orders ORDER BY o_orderkey LIMIT 50",

    "q_scalar_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_discount > 0.05 THEN 'HI' ELSE 'LO' END AS disc_band,
        |  CASE WHEN l_returnflag = 'N' THEN 'NONE' ELSE l_returnflag END AS flag_repl,
        |  CASE WHEN l_tax IS NULL OR isnan(l_tax) THEN 0.0 ELSE l_tax END AS tax_filled
        |FROM lineitem""".stripMargin,

    "q_clean_null_strings" ->
      """SELECT c_custkey,
        |  CASE WHEN trim(c_mktsegment) IN ('', 'N/A', 'BUILDING') THEN NULL
        |       ELSE trim(c_mktsegment) END AS segment_clean
        |FROM customer""".stripMargin,

    "q_to_float_locale" ->
      """WITH fx AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_discount > 0.05
        |      THEN '(' || replace(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR), '.', ',') || ')'
        |      ELSE replace(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR), '.', ',')
        |    END AS raw_text
        |  FROM lineitem),
        |st AS (
        |  SELECT l_orderkey, l_linenumber, raw_text,
        |    regexp_replace(trim(raw_text), '\s+', '', 'g') AS s1 FROM fx),
        |st2 AS (
        |  SELECT l_orderkey, l_linenumber, raw_text,
        |    CASE WHEN regexp_matches(s1, '^\(.*\)$')
        |      THEN '-' || regexp_replace(s1, '^\((.*)\)$', '\1')
        |      ELSE s1 END AS s2 FROM st)
        |SELECT l_orderkey, l_linenumber, raw_text,
        |  TRY_CAST(replace(replace(s2, ' ', ''), ',', '.') AS DOUBLE) AS parsed
        |FROM st2""".stripMargin,

    "q_selector_cardinality" ->
      "SELECT o_orderstatus, o_orderpriority FROM orders"
  )
}
