package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.ops.Kernel
import graft.operators.{Multimodal, TableReport}
import graft.encoders.{DropSimilar, SimilarityEncoder}

/** Kernel-completion queries (slice, horizontal concat, scaling factor,
  * DropSimilar, TableReport summary, SimilarityEncoder) with DuckDB oracles.
  */
object KernelQueries {

  private def t(s: SparkSession, dir: String, n: String) = Kernel.table(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // positional slice over an explicit ordering
    "q_slice" -> ((s, dir) =>
      Kernel.slice(t(s, dir, "orders"), Seq("o_orderkey"), 100, 150)),

    // horizontal concat: zip two projections by row_number over o_orderkey
    "q_concat_horizontal" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.select(col("o_orderkey"), col("o_totalprice"))
      val b = o.select(col("o_orderkey").as("k2"), col("o_orderpriority"))
      Kernel.concatHorizontal(Seq(a -> Seq("o_orderkey"), b -> Seq("k2")))
    }),

    // TableReport distribution sections (r6): top-K value counts per string
    // column in one melted minKBy aggregate, and fixed-width histograms per
    // numeric column in a min/max pass + one melted bin-count aggregate
    "q_report_value_counts" -> ((s, dir) =>
      graft.operators.TableReport.valueCounts(t(s, dir, "customer"), topK = 5)),
    "q_report_histograms" -> ((s, dir) =>
      graft.operators.TableReport.numericHistograms(t(s, dir, "customer"),
        nBins = 10)),

    // total-standard-deviation scaler over lineitem numeric columns
    "q_scaling_factor" -> ((s, dir) =>
      Kernel.scalingFactor(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // HLL++ distinct estimator (TableVectorizer's routing primitive,
    // Selectors.cardinalityBelow's stats job): the estimate must land within
    // 3x the requested rsd of the EXACT distinct count for columns at three
    // different cardinality magnitudes — hash-verified as an all-TRUE row
    "q_approx_distinct" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val cols = Seq("l_orderkey", "l_partkey", "l_returnflag")
      val rsd = 0.02
      val aggs = cols.flatMap(c => Seq(
        approx_count_distinct(col(c), rsd).cast(DoubleType).as(s"ap_$c"),
        countDistinct(col(c)).cast(DoubleType).as(s"ex_$c")))
      li.agg(aggs.head, aggs.tail: _*).select(cols.map { c =>
        (abs(col(s"ap_$c") - col(s"ex_$c")) <= col(s"ex_$c") * (3 * rsd))
          .as(s"ok_$c")
      }: _*)
    }),

    // constant-memory quantile path (Kernel.quantileApprox — the 100 TB
    // alternative to exact percentile): the GK sketch's estimate must land
    // between the EXACT quantiles at q ± 0.01 (its rank-error guarantee is
    // n/accuracy ≈ 1e-4 rank fraction here, two orders under the bracket),
    // hash-verified as an all-TRUE row
    "q_quantile_approx" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val c = "l_extendedprice"
      val qs = Seq("25" -> 0.25, "50" -> 0.5, "75" -> 0.75)
      val aggs = qs.flatMap { case (n, q) => Seq(
        expr(s"percentile($c, ${q - 0.01})").as(s"lo_$n"),
        expr(s"percentile_approx($c, $q, 10000)").cast(DoubleType).as(s"ap_$n"),
        expr(s"percentile($c, ${q + 0.01})").as(s"hi_$n"))
      }
      li.agg(aggs.head, aggs.tail: _*).select(qs.map { case (n, _) =>
        (col(s"ap_$n") >= col(s"lo_$n") && col(s"ap_$n") <= col(s"hi_$n"))
          .as(s"ok_q$n")
      }: _*)
    }),

    // DropSimilar: a verbatim duplicate column must be detected (V = 1) and
    // dropped, everything else kept
    "q_drop_similar" -> ((s, dir) =>
      DropSimilar.transform(
        t(s, dir, "orders").withColumn("status_copy", col("o_orderstatus")),
        threshold = 1.0)),

    // TableReport summary: per-column profiling stats, long format
    "q_table_report" -> ((s, dir) =>
      TableReport.summarize(t(s, dir, "orders"))),

    // TableReport sample tab: top/bottom slices by an explicit key
    "q_table_report_sample" -> ((s, dir) =>
      TableReport.sampleSlices(t(s, dir, "orders"), Seq("o_orderkey"))),

    // SimilarityEncoder: per-category ngram-jaccard similarity columns
    "q_similarity_encoder" -> ((s, dir) =>
      SimilarityEncoder.encode(
        t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        "c_mktsegment")),

    // InterpolationJoiner with a FULL oracle: the payload is a closed-form
    // function of the key (10*nationkey + 5), so the GBT regression must
    // recover it near-exactly for every main row (25 key steps fit exactly
    // at maxDepth 8) — pred_ok gates |prediction - truth| <= 1.0 and is
    // hash-verified as all-TRUE. Real-payload (s_acctbal) behavior and the
    // warn/raise/pass policy stay covered in InterpolationJoinerSpec.
    "q_interpolation_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val supp = t(s, dir, "supplier").withColumn("payload_det",
        (col("s_nationkey") * 10 + 5).cast(DoubleType))
      val joined = graft.operators.InterpolationJoiner.interpolationJoin(
        cust, supp, Seq("c_nationkey" -> "s_nationkey"), Seq("payload_det"),
        maxIter = 5, onError = graft.operators.InterpolationJoiner.Raise,
        maxDepth = 8)
      // the recovery assertion only binds where the aux COVERS the key:
      // a nationkey absent from supplier (possible at tiny SF) makes the
      // GBT extrapolate, which is correct ML behavior, not an error —
      // uncovered rows pass vacuously, keeping the oracle scale-robust
      val covered = supp.select(col("s_nationkey")).distinct()
        .withColumn("__cov", lit(true))
      joined.join(covered, joined("c_nationkey") === covered("s_nationkey"),
          "left")
        .select(col("c_custkey"), col("c_nationkey"),
          (col("__cov").isNull ||
            abs(col("payload_det_predicted") - (col("c_nationkey") * 10 + 5)) <= 1.0)
            .as("pred_ok"))
    }),

    // multimodal plumbing: binary payload + typed metadata, stub decode,
    // frame-sampling plan, deterministic pseudo-embedding — all md5-exact
    "q_multimodal" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val packed = d.select(col("doc_id"),
        Multimodal.pack(encode(col("text"), "UTF-8"), "text/plain").as("media"))
      val data = col("media.data")
      val (w, h, ch) = Multimodal.decodeStubDims(data)
      packed.select(Seq(col("doc_id"),
        col("media.meta.media_type").as("media_type"),
        col("media.meta.n_bytes").as("n_bytes"),
        col("media.meta.content_id").as("content_id"),
        w.as("width"), h.as("height"), ch.as("channels"),
        Multimodal.nFrames(col("media.meta.n_bytes"), 1024).as("n_frames")) ++
        Multimodal.fakeEmbedding(data, 8): _*)
    }),

    // corpus drift (r8): PSI per column between an even-key reference
    // snapshot and an odd-key current one with totalprice shifted +10% —
    // the numeric column must show drift, the categoricals near zero
    "q_drift_psi" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_totalprice"), col("o_orderstatus"), col("o_orderpriority"))
      val ref = o.filter(col("o_orderkey") % 2 === 0)
      val cur = o.filter(col("o_orderkey") % 2 === 1)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      graft.operators.Drift.psi(ref, cur,
        Seq("o_totalprice", "o_orderstatus", "o_orderpriority"))
    }),

    // KS drift (r9): sup |F_ref - F_cur| over the reference's transferred
    // 50-bin discretization — the +10% price shift must register; the
    // oracle replays the identical binned-CDF arithmetic
    "q_drift_ks" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val ref = o.filter(col("o_orderkey") % 2 === 0)
      val cur = o.filter(col("o_orderkey") % 2 === 1)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      graft.operators.Drift.ks(ref, cur, Seq("o_totalprice"), nBins = 50)
    }),

    // new-category alert feed (r9): values in the current snapshot never
    // seen in the reference — drop MACHINERY from ref, it must surface
    // with its current count; nationkeys (present in both) must not
    "q_drift_newcats" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_mktsegment"), col("c_nationkey"))
      val ref = c.filter(col("c_mktsegment") =!= "MACHINERY")
      graft.operators.Drift.newCategories(ref, c,
        Seq("c_mktsegment", "c_nationkey"))
    }),

    // the estimator+persistence twins (r9): the DRIVER-VERIFIED cross-
    // session product shape — fit on the reference, save the model to
    // JSON, reload it in (conceptually) another job, score. Must hash-
    // match the same oracles as the two-frame batch forms above.
    "q_drift_ks_reload" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val ref = o.filter(col("o_orderkey") % 2 === 0)
      val cur = o.filter(col("o_orderkey") % 2 === 1)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      val f = java.nio.file.Files.createTempDirectory("graft_ks")
        .toString + "/ks.json"
      graft.operators.Drift.savePsi(
        graft.operators.Drift.fitKs(ref, Seq("o_totalprice"), nBins = 50), f)
      graft.operators.Drift.loadPsi(f, s).scoreKs(cur)
    }),

    // schema drift (r9): the monitoring trio's third signal — added /
    // removed / type-changed columns between snapshots, pure driver-side
    // metadata (zero Spark jobs at any corpus size)
    "q_drift_schema" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val ref = c.drop("c_mktsegment")
      val cur = c.drop("c_nationkey")
        .withColumn("c_acctbal", col("c_acctbal").cast("string"))
      graft.operators.Drift.schemaDiff(ref, cur)
    }),

    "q_drift_newcats_reload" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_mktsegment"), col("c_nationkey"))
      val ref = c.filter(col("c_mktsegment") =!= "MACHINERY")
      val f = java.nio.file.Files.createTempDirectory("graft_nc")
        .toString + "/nc.json"
      graft.operators.Drift.saveNewCats(
        graft.operators.Drift.fitNewCats(ref,
          Seq("c_mktsegment", "c_nationkey")), f)
      graft.operators.Drift.loadNewCats(f, s).score(c)
    }),

    // sketch-based join-key discovery (r8): KMV k-min md5 sketches per
    // column, pair estimates from merged sketches — the bounded-state
    // 100 TB path; the deterministic estimates themselves hash-verify
    "q_join_discovery_sketch" -> ((s, dir) =>
      graft.operators.Discovery.joinKeysSketch(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_orderpriority")),
        t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"),
          col("c_mktsegment")), k = 64)),

    // join-key discovery (beyond reference, r8): distinct-value inclusion
    // + jaccard for every comparable column pair — o_custkey must surface
    // c_custkey at inclusion 1.0. Long and string columns only in the
    // fixture (exact cross-engine string formatting).
    "q_join_discovery" -> ((s, dir) =>
      graft.operators.Discovery.joinKeys(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_orderpriority")),
        t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"),
          col("c_mktsegment")))),

    // frame sampling + resize plan (r8): every 2nd 256-byte slice of the
    // packed payload materialized via binary substr (real byte slicing)
    // with per-frame md5, plus the aspect-preserving resize plan from the
    // stub dims. The oracle mirrors the byte slices with varchar substr —
    // valid because the fixture corpus is pure ASCII (byte offsets ==
    // char offsets); the OPERATOR itself works on binary.
    "q_multimodal_frames" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val packed = d.select(col("doc_id"),
        Multimodal.pack(encode(col("text"), "UTF-8"), "text/plain").as("media"))
      val data = col("media.data")
      val (w, h, _) = Multimodal.decodeStubDims(data)
      val (ow, oh) = Multimodal.resizeFit(w, h, 64, 64)
      val withPlan = packed.select(col("doc_id"), data.as("data"),
        ow.as("out_w"), oh.as("out_h"))
      Multimodal.sampleFrames(withPlan, Seq("doc_id", "out_w", "out_h"),
        col("data"), frameBytes = 256, everyK = 2)
    }),

    // REAL image decode (r9): PNG bytes encoded per nation key (solid
    // color, dims derived from the key), decoded with javax.imageio on the
    // executors, pixel fingerprint = md5 over the row-major rrggbb hex
    // serialization. PNG is lossless, so the oracle recomputes the SAME
    // fingerprint purely arithmetically — if the decode were fake, the md5
    // could not match.
    "q_multimodal_decode" -> ((s, dir) => {
      import s.implicits._
      val pngs = t(s, dir, "nation").select(col("n_nationkey").cast("long"))
        .as[Long]
        .map { n =>
          val (w, h) = (3 + (n % 5).toInt, 2 + (n % 3).toInt)
          val rgb = (((n * 37) % 256) << 16 | ((n * 59) % 256) << 8 |
            ((n * 83) % 256)).toInt
          (n, Multimodal.encodePng(w, h, rgb))
        }
        .toDF("id", "png")
      Multimodal.decodeImages(pngs, "id", "png")
        .select(col("id"), col("ok"), col("width"), col("height"),
          col("channels"), col("pixel_md5"),
          round(col("mean_luma"), 6).as("mean_luma"))
    })
  )


  /** Oracle for q_join_discovery_sketch: mirrors Discovery.joinKeysSketch —
    * distinct 60-bit md5 hashes per column, k-min sketch via row_number,
    * KMV merge per pair, identical estimator arithmetic order.
    */
  private val joinSketchOracle: String = {
    val k = 64
    val lcols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val rcols = Seq("c_custkey", "c_nationkey", "c_mktsegment")
    def hashes(tbl: String, cols: Seq[String]): String = cols.map(c =>
      s"SELECT DISTINCT '$c' AS c, ('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15))::BIGINT AS h " +
        s"FROM $tbl WHERE $c IS NOT NULL").mkString("\n    UNION ")
    val pairs = for { a <- lcols; b <- rcols } yield (a, b)
    val pairCtes = pairs.zipWithIndex.map { case ((a, b), i) =>
      s"""u_$i AS (SELECT h, max(ia) AS ia, max(ib) AS ib FROM (
         |    SELECT h, 1 AS ia, 0 AS ib FROM lsk WHERE c = '$a'
         |    UNION ALL SELECT h, 0 AS ia, 1 AS ib FROM rsk WHERE c = '$b')
         |  GROUP BY h ORDER BY h LIMIT $k),
         |e_$i AS (SELECT '$a' AS lc, '$b' AS rc,
         |    CAST(count(*) AS BIGINT) AS uu,
         |    CAST(coalesce(sum(ia * ib), 0) AS BIGINT) AS ii
         |  FROM u_$i)""".stripMargin
    }
    s"""WITH lh AS (
       |    ${hashes("orders", lcols)}),
       |rh AS (
       |    ${hashes("customer", rcols)}),
       |lsk AS (SELECT c, h FROM (
       |    SELECT c, h, row_number() OVER (PARTITION BY c ORDER BY h) AS rk
       |    FROM lh) WHERE rk <= $k),
       |rsk AS (SELECT c, h FROM (
       |    SELECT c, h, row_number() OVER (PARTITION BY c ORDER BY h) AS rk
       |    FROM rh) WHERE rk <= $k),
       |ln AS (SELECT c, CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
       |    ELSE ${k - 1} * 1152921504606846976.0 / CAST(max(h) AS DOUBLE) END AS nd
       |  FROM lsk GROUP BY c),
       |rn AS (SELECT c, CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
       |    ELSE ${k - 1} * 1152921504606846976.0 / CAST(max(h) AS DOUBLE) END AS nd
       |  FROM rsk GROUP BY c),
       |${pairCtes.mkString(",\n")},
       |est AS (${pairs.indices.map(i => s"SELECT * FROM e_$i").mkString("\n  UNION ALL ")})
       |SELECT est.lc AS left_column, est.rc AS right_column,
       |  round(least(1.0, ((CASE WHEN uu = 0 THEN 0.0 ELSE ii * 1.0 / uu END)
       |    * (ln.nd + rn.nd) / (1.0 + (CASE WHEN uu = 0 THEN 0.0 ELSE ii * 1.0 / uu END)))
       |    / ln.nd), 6) AS inclusion_est,
       |  round(CASE WHEN uu = 0 THEN 0.0 ELSE ii * 1.0 / uu END, 6) AS jaccard_est
       |FROM est JOIN ln ON est.lc = ln.c JOIN rn ON est.rc = rn.c
       |WHERE ii > 0""".stripMargin
  }


  /** Oracle for q_drift_psi: fitBins labels fit on the REF slice (stats
    * CTE), applied to both slices, eps-floored PSI per column.
    */
  private val driftOracle: String = {
    val labelNum =
      """CASE WHEN o_totalprice IS NULL OR isnan(o_totalprice) THEN '__null'
        | ELSE 'b' || CAST(CAST(least(floor((o_totalprice - st.mn)
        |   / (st.mx - st.mn) * 9), 8.0) AS INTEGER) AS VARCHAR) END""".stripMargin
    def labelCat(c: String) =
      s"CASE WHEN $c IS NULL THEN '__null' ELSE $c END"
    def melt(src: String) =
      s"""SELECT 'o_totalprice' AS c, $labelNum AS b FROM $src, st
         |    UNION ALL SELECT 'o_orderstatus', ${labelCat("o_orderstatus")} FROM $src
         |    UNION ALL SELECT 'o_orderpriority', ${labelCat("o_orderpriority")} FROM $src""".stripMargin
    s"""WITH ref0 AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
       |cur0 AS (SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice,
       |    o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 2 = 1),
       |st AS (SELECT min(CAST(o_totalprice AS DOUBLE)) AS mn,
       |    max(CAST(o_totalprice AS DOUBLE)) AS mx FROM ref0),
       |pm AS (SELECT c, b, CAST(count(*) AS BIGINT) AS n_ref FROM (
       |    ${melt("ref0")}) GROUP BY c, b),
       |qm AS (SELECT c, b, CAST(count(*) AS BIGINT) AS n_cur FROM (
       |    ${melt("cur0")}) GROUP BY c, b),
       |tt AS (SELECT CAST((SELECT count(*) FROM ref0) AS DOUBLE) AS tr,
       |    CAST((SELECT count(*) FROM cur0) AS DOUBLE) AS tc),
       |j AS (SELECT coalesce(pm.c, qm.c) AS c, coalesce(pm.b, qm.b) AS b,
       |    greatest(coalesce(n_ref, 0) / tt.tr, 1e-6) AS p,
       |    greatest(coalesce(n_cur, 0) / tt.tc, 1e-6) AS q
       |  FROM pm FULL OUTER JOIN qm ON pm.c = qm.c AND pm.b = qm.b, tt)
       |SELECT c AS column_name, round(sum((p - q) * ln(p / q)), 6) AS psi,
       |  CAST(count(*) AS BIGINT) AS n_bins
       |FROM j GROUP BY c""".stripMargin
  }

  private val tableReportOracle: String = {
    def entry(c: String, dtype: String, isNum: Boolean, isStr: Boolean,
              isTs: Boolean): String = {
      val minNum =
        if (isNum) s"CAST(min($c) AS DOUBLE)"
        else if (isTs) s"CAST(min(epoch_us($c)) AS DOUBLE) / 1000000.0"
        else "CAST(NULL AS DOUBLE)"
      val maxNum =
        if (isNum) s"CAST(max($c) AS DOUBLE)"
        else if (isTs) s"CAST(max(epoch_us($c)) AS DOUBLE) / 1000000.0"
        else "CAST(NULL AS DOUBLE)"
      val minStr = if (isStr) s"min($c)" else "CAST(NULL AS VARCHAR)"
      val maxStr = if (isStr) s"max($c)" else "CAST(NULL AS VARCHAR)"
      val mean =
        if (isNum)
          s"round(CAST(sum(CAST($c AS DECIMAL(24,6))) AS DOUBLE) / count($c), 6)"
        else "CAST(NULL AS DOUBLE)"
      val std =
        if (isNum)
          s"""round(sqrt(greatest(
             |    (CAST(sum(CAST($c AS DECIMAL(19,6)) * CAST($c AS DECIMAL(19,6))) AS DOUBLE)
             |     - CAST(sum(CAST($c AS DECIMAL(30,6))) AS DOUBLE)
             |       * CAST(sum(CAST($c AS DECIMAL(30,6))) AS DOUBLE) / count($c))
             |    / (count($c) - 1), 0.0)), 6)""".stripMargin
        else "CAST(NULL AS DOUBLE)"
      def quart(q: String) =
        if (isNum) s"round(quantile_cont($c, $q), 6) + 0.0"
        else "CAST(NULL AS DOUBLE)"
      val modeV =
        if (isStr)
          s"""(SELECT v FROM (SELECT $c AS v, count(*) AS cnt FROM orders
             |    WHERE $c IS NOT NULL GROUP BY 1 ORDER BY cnt DESC, v LIMIT 1))""".stripMargin
        else "CAST(NULL AS VARCHAR)"
      val modeC =
        if (isStr)
          s"""(SELECT CAST(cnt AS BIGINT) FROM (SELECT count(*) AS cnt FROM orders
             |    WHERE $c IS NOT NULL GROUP BY $c ORDER BY cnt DESC, $c LIMIT 1))""".stripMargin
        else "CAST(NULL AS BIGINT)"
      s"""SELECT '$c' AS column_name, '$dtype' AS dtype,
         |  count($c) AS count,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
         |  round(CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / greatest(count(*), 1), 6) AS null_proportion,
         |  count(DISTINCT $c) AS n_unique,
         |  count(DISTINCT $c) > 40 AS is_high_cardinality,
         |  count(DISTINCT $c) = 1
         |    AND sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) = 0 AS value_is_constant,
         |  $minNum AS min_numeric, $maxNum AS max_numeric,
         |  $minStr AS min_string, $maxStr AS max_string,
         |  $mean AS mean,
         |  $std AS std,
         |  ${quart("0.25")} AS q25, ${quart("0.5")} AS q50, ${quart("0.75")} AS q75,
         |  $modeV AS mode_value,
         |  $modeC AS mode_count
         |FROM orders""".stripMargin
    }
    Seq(
      entry("o_orderkey", "bigint", isNum = true, isStr = false, isTs = false),
      entry("o_custkey", "bigint", isNum = true, isStr = false, isTs = false),
      entry("o_orderstatus", "string", isNum = false, isStr = true, isTs = false),
      entry("o_totalprice", "double", isNum = true, isStr = false, isTs = false),
      entry("o_orderdate", "timestamp", isNum = false, isStr = false, isTs = true),
      entry("o_orderpriority", "string", isNum = false, isStr = true, isTs = false)
    ).mkString("\nUNION ALL\n")
  }

  private val simOracle: String = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    def grams(v: String) = s"list_distinct(${SqlFragments.ngrams234Sql(v)})"
    val cols = segs.map { cat =>
      s"""CASE WHEN c_mktsegment IS NULL THEN NULL ELSE
         |  round(CAST(len(list_intersect(${grams("c_mktsegment")}, ${grams(s"'$cat'")})) AS DOUBLE)
         |    / len(list_distinct(list_concat(${grams("c_mktsegment")}, ${grams(s"'$cat'")}))), 6)
         |END AS c_mktsegment_sim_$cat""".stripMargin
    }
    s"SELECT c_custkey, c_mktsegment,\n  ${cols.mkString(",\n  ")}\nFROM customer"
  }

  val oracle: Map[String, String] = Map(
    "q_slice" ->
      "SELECT * FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100",

    "q_concat_horizontal" ->
      """WITH a AS (
        |  SELECT o_orderkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_orderkey) AS rn FROM orders),
        |b AS (
        |  SELECT o_orderkey AS k2, o_orderpriority,
        |    row_number() OVER (ORDER BY o_orderkey) AS rn FROM orders)
        |SELECT a.o_orderkey, a.o_totalprice, b.k2, b.o_orderpriority
        |FROM a JOIN b USING (rn)""".stripMargin,

    "q_report_value_counts" -> {
      val strCols = Seq("c_name", "c_mktsegment")
      strCols.map { c =>
        s"""SELECT * FROM (
           |  SELECT '$c' AS column_name, $c AS value,
           |    count(*) AS value_count,
           |    CAST(row_number() OVER (ORDER BY count(*) DESC, $c) AS INT) AS rank
           |  FROM customer WHERE $c IS NOT NULL GROUP BY $c)
           |WHERE rank <= 5""".stripMargin
      }.mkString("\nUNION ALL\n")
    },

    "q_report_histograms" -> {
      val numCols = Seq("c_custkey", "c_nationkey", "c_acctbal")
      numCols.map { c =>
        s"""SELECT '$c' AS column_name, bin,
           |  round(mn + bin * w, 6) AS bin_start,
           |  round(mn + (bin + 1) * w, 6) AS bin_end,
           |  count(*) AS bin_count
           |FROM (
           |  SELECT CAST(least(greatest(
           |      floor((CAST($c AS DOUBLE) - mn) / w), 0), 9) AS INT) AS bin,
           |    mn, w
           |  FROM customer, (
           |    SELECT min(CAST($c AS DOUBLE)) AS mn,
           |      CASE WHEN max(CAST($c AS DOUBLE)) > min(CAST($c AS DOUBLE))
           |        THEN (max(CAST($c AS DOUBLE)) - min(CAST($c AS DOUBLE))) / 10
           |        ELSE 1.0 END AS w
           |    FROM customer)
           |  WHERE $c IS NOT NULL)
           |GROUP BY bin, mn, w""".stripMargin
      }.mkString("\nUNION ALL\n")
    },

    "q_scaling_factor" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val vars = cols.map { c =>
        val dec = s"CAST($c AS DECIMAL(24,6))"
        s"""((CAST(sum($dec * $dec) AS DOUBLE)
           |  - CAST(sum($dec) AS DOUBLE) * CAST(sum($dec) AS DOUBLE) / count($c))
           |  / count($c))""".stripMargin
      }
      s"""WITH s AS (
         |  SELECT round(sqrt(${vars.mkString(" + ")}), 6) AS sf FROM lineitem)
         |SELECT CASE WHEN sf < 1e-12 THEN 1.0 ELSE sf END AS scaling_factor
         |FROM s""".stripMargin
    },

    "q_drop_similar" -> "SELECT * FROM orders",

    "q_quantile_approx" ->
      "SELECT TRUE AS ok_q25, TRUE AS ok_q50, TRUE AS ok_q75",

    "q_approx_distinct" ->
      ("SELECT TRUE AS ok_l_orderkey, TRUE AS ok_l_partkey, " +
        "TRUE AS ok_l_returnflag"),

    "q_interpolation_join" ->
      "SELECT c_custkey, c_nationkey, TRUE AS pred_ok FROM customer",

    "q_table_report" -> tableReportOracle,

    "q_table_report_sample" ->
      """SELECT *, 'top' AS slice FROM (
        |  SELECT * FROM orders ORDER BY o_orderkey LIMIT 5)
        |UNION ALL
        |SELECT *, 'bottom' AS slice FROM (
        |  SELECT * FROM orders ORDER BY o_orderkey DESC LIMIT 5)""".stripMargin,

    "q_similarity_encoder" -> simOracle,

    "q_multimodal" -> {
      val embs = (0 until 8).map { j =>
        s"""('0x' || substr(md5(md5(text) || '$j'), 1, 8))::BIGINT
           | / 2147483648.0 - 1.0 AS emb_$j""".stripMargin
      }
      s"""SELECT doc_id,
         |  'text/plain' AS media_type,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  md5(text) AS content_id,
         |  64 + ('0x' || substr(md5(text), 1, 2))::INTEGER % 192 AS width,
         |  64 + ('0x' || substr(md5(text), 3, 2))::INTEGER % 192 AS height,
         |  3 AS channels,
         |  CAST(floor(octet_length(encode(text)) / 1024.0) AS BIGINT) + 1 AS n_frames,
         |  ${embs.mkString(",\n  ")}
         |FROM documents""".stripMargin
    },

    "q_join_discovery" ->
      """WITH la AS (
        |    SELECT DISTINCT 'o_orderkey' AS lc, CAST(o_orderkey AS VARCHAR) AS v FROM orders WHERE o_orderkey IS NOT NULL
        |    UNION SELECT DISTINCT 'o_custkey' AS lc, CAST(o_custkey AS VARCHAR) AS v FROM orders WHERE o_custkey IS NOT NULL
        |    UNION SELECT DISTINCT 'o_orderstatus' AS lc, CAST(o_orderstatus AS VARCHAR) AS v FROM orders WHERE o_orderstatus IS NOT NULL
        |    UNION SELECT DISTINCT 'o_orderpriority' AS lc, CAST(o_orderpriority AS VARCHAR) AS v FROM orders WHERE o_orderpriority IS NOT NULL),
        |rb AS (
        |    SELECT DISTINCT 'c_custkey' AS rc, CAST(c_custkey AS VARCHAR) AS v FROM customer WHERE c_custkey IS NOT NULL
        |    UNION SELECT DISTINCT 'c_nationkey' AS rc, CAST(c_nationkey AS VARCHAR) AS v FROM customer WHERE c_nationkey IS NOT NULL
        |    UNION SELECT DISTINCT 'c_mktsegment' AS rc, CAST(c_mktsegment AS VARCHAR) AS v FROM customer WHERE c_mktsegment IS NOT NULL),
        |na AS (SELECT lc, count(*) AS na FROM la GROUP BY 1),
        |nb AS (SELECT rc, count(*) AS nb FROM rb GROUP BY 1),
        |i AS (SELECT lc, rc, count(*) AS ni
        |  FROM la JOIN rb USING (v) GROUP BY 1, 2)
        |SELECT lc AS left_column, rc AS right_column,
        |  round(ni * 1.0 / na, 6) AS inclusion,
        |  round(ni * 1.0 / (na + nb - ni), 6) AS jaccard
        |FROM i JOIN na USING (lc) JOIN nb USING (rc)""".stripMargin,

    "q_join_discovery_sketch" -> joinSketchOracle,

    "q_drift_psi" -> driftOracle,

    "q_drift_ks" -> ksOracle,

    // the estimator+persistence twins (fit -> save -> load -> score)
    // replay the identical arithmetic
    "q_drift_ks_reload" -> ksOracle,

    "q_drift_newcats" -> newcatsOracle,

    "q_drift_newcats_reload" -> newcatsOracle,

    // the expected diff is static by construction (the query builds the
    // two snapshots from the same table with known edits)
    "q_drift_schema" ->
      """SELECT 'c_mktsegment' AS column_name, 'added' AS change,
        |       CAST(NULL AS VARCHAR) AS ref_type, 'string' AS cur_type
        |UNION ALL SELECT 'c_nationkey', 'removed', 'int', NULL
        |UNION ALL SELECT 'c_acctbal', 'type_changed', 'double', 'string'""".stripMargin,

    "q_multimodal_frames" ->
      """WITH p AS (SELECT doc_id, text,
        |    octet_length(encode(text)) AS nb,
        |    64 + ('0x' || substr(md5(text), 1, 2))::INTEGER % 192 AS w,
        |    64 + ('0x' || substr(md5(text), 3, 2))::INTEGER % 192 AS h
        |  FROM documents),
        |r AS (SELECT doc_id, text, nb, w, h,
        |    least(64.0 / w, 64.0 / h) AS sc FROM p),
        |f AS (SELECT doc_id, text,
        |    CAST(greatest(floor(w * sc), 1.0) AS INTEGER) AS out_w,
        |    CAST(greatest(floor(h * sc), 1.0) AS INTEGER) AS out_h,
        |    unnest(range(0, CAST(floor(nb / 256.0) AS BIGINT) + 1, 2)) AS fid
        |  FROM r)
        |SELECT doc_id, out_w, out_h, CAST(fid AS BIGINT) AS frame_id,
        |  CAST(length(substr(text, CAST(fid * 256 + 1 AS BIGINT), 256)) AS BIGINT) AS frame_len,
        |  md5(substr(text, CAST(fid * 256 + 1 AS BIGINT), 256)) AS frame_md5
        |FROM f""".stripMargin,

    "q_multimodal_decode" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |  true AS ok,
        |  CAST(3 + n_nationkey % 5 AS INTEGER) AS width,
        |  CAST(2 + n_nationkey % 3 AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS channels,
        |  md5(repeat(printf('%02x%02x%02x',
        |        (n_nationkey * 37) % 256,
        |        (n_nationkey * 59) % 256,
        |        (n_nationkey * 83) % 256),
        |      (3 + n_nationkey % 5) * (2 + n_nationkey % 3))) AS pixel_md5,
        |  round(((n_nationkey * 37) % 256 + (n_nationkey * 59) % 256
        |         + (n_nationkey * 83) % 256) / 3.0, 6) AS mean_luma
        |FROM nation""".stripMargin
  )

  private def ksOracle: String =
      """WITH ref AS (SELECT o_totalprice AS x FROM orders
        |    WHERE o_orderkey % 2 = 0),
        |cur AS (SELECT o_totalprice * 1.1 AS x FROM orders
        |    WHERE o_orderkey % 2 = 1),
        |st AS (SELECT min(x) AS mn, max(x) AS mx FROM ref WHERE NOT isnan(x)),
        |rb AS (SELECT CAST(least(floor((x - st.mn) / (st.mx - st.mn) * 49),
        |      48.0) AS INTEGER) AS idx, count(*) AS n_ref
        |    FROM ref, st WHERE x IS NOT NULL AND NOT isnan(x) GROUP BY 1),
        |cb AS (SELECT CAST(least(floor((x - st.mn) / (st.mx - st.mn) * 49),
        |      48.0) AS INTEGER) AS idx, count(*) AS n_cur
        |    FROM cur, st WHERE x IS NOT NULL AND NOT isnan(x) GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(sum(n_ref) AS DOUBLE) FROM rb) AS tr,
        |    (SELECT CAST(sum(n_cur) AS DOUBLE) FROM cb) AS tc),
        |j AS (SELECT coalesce(rb.idx, cb.idx) AS idx,
        |    coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        |  FROM rb FULL OUTER JOIN cb ON rb.idx = cb.idx),
        |cdf AS (SELECT idx,
        |    CAST(sum(n_ref) OVER (ORDER BY idx) AS DOUBLE) / tot.tr AS fr,
        |    CAST(sum(n_cur) OVER (ORDER BY idx) AS DOUBLE) / tot.tc AS fc
        |  FROM j, tot)
        |SELECT 'o_totalprice' AS column_name,
        |  round(max(abs(fr - fc)), 6) AS ks,
        |  CAST(count(*) AS BIGINT) AS n_bins
        |FROM cdf""".stripMargin

  private def newcatsOracle: String =
      """WITH refv AS (
        |    SELECT DISTINCT 'c_mktsegment' AS column_name,
        |        c_mktsegment AS value
        |      FROM customer WHERE c_mktsegment <> 'MACHINERY'
        |        AND c_mktsegment IS NOT NULL
        |    UNION SELECT DISTINCT 'c_nationkey',
        |        CAST(c_nationkey AS VARCHAR)
        |      FROM customer WHERE c_mktsegment <> 'MACHINERY'
        |        AND c_nationkey IS NOT NULL),
        |curv AS (
        |    SELECT 'c_mktsegment' AS column_name, c_mktsegment AS value
        |      FROM customer WHERE c_mktsegment IS NOT NULL
        |    UNION ALL SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR)
        |      FROM customer WHERE c_nationkey IS NOT NULL),
        |cc AS (SELECT column_name, value, CAST(count(*) AS BIGINT) AS n_cur
        |    FROM curv GROUP BY 1, 2)
        |SELECT column_name, value, n_cur FROM cc
        |WHERE NOT EXISTS (SELECT 1 FROM refv r
        |  WHERE r.column_name = cc.column_name AND r.value = cc.value)""".stripMargin
}
