package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Kernel
import graft.encoders.{DatetimeEncoder, DropUninformative, MinHashEncoder, SquashingScaler, TableVectorizer}
import graft.operators.ColumnAssociations

/** Encoder / profiling queries with DuckDB oracles. */
object EncoderQueries {

  private def t(s: SparkSession, dir: String, n: String) = Kernel.table(s, dir, n)

  private val squashSql =
    """WITH q AS (
      |  SELECT quantile_cont(c_acctbal, 0.25) AS q1,
      |    quantile_cont(c_acctbal, 0.5) AS q2,
      |    quantile_cont(c_acctbal, 0.75) AS q3
      |  FROM customer WHERE c_acctbal IS NOT NULL),
      |z AS (
      |  SELECT c_custkey, c_acctbal,
      |    (c_acctbal - q2) / (CASE WHEN q3 - q1 = 0 THEN 1.0 ELSE q3 - q1 END) AS zc
      |  FROM customer, q)
      |SELECT c_custkey, c_acctbal,
      |  CASE WHEN c_acctbal IS NULL OR isnan(c_acctbal) THEN NULL
      |    ELSE round(zc / sqrt(1.0 + (zc / 3.0) * (zc / 3.0)), 6) END AS c_acctbal_scaled
      |FROM z""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // embedding PCA at FULL RANK: the projection is an orthonormal change
    // of basis, so the oracle checks centered norms / centered ref-dots
    // computed in the ORIGINAL space (the q_string_encoder trick);
    // truncation is spec-covered (EmbedSpec: variance ordering, shrinkage)
    "q_embed_pca" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // no persist needed: Embed.pca fits eagerly (model state rides the
      // CenterProject expression), so the ref-vector collect is one
      // pushed-down single-row scan and the final select re-projects from
      // parquet — nothing is computed twice, and no cached blocks leak
      // across the query sweep
      val out = graft.operators.Embed.pca(emb, "embedding", Seq("vec_id"),
        k = 64)
      val refId = emb.agg(min(col("vec_id"))).collect()(0).getLong(0)
      val refVec = out.filter(col("vec_id") === refId)
        .select(col("pca")).limit(1).collect()(0).getSeq[Double](0)
      val refLit = typedLit(refVec)
      import graft.functions.VecExprs
      out.select(col("vec_id"),
        (round(sqrt(VecExprs.arrayDot(col("pca"), col("pca"))), 6) + lit(0.0))
          .as("pca_norm"),
        (round(VecExprs.arrayDot(col("pca"), refLit), 6) + lit(0.0))
          .as("pca_ref_dot"))
    }),
    // DatetimeEncoder with circular (sin/cos) periodic features
    "q_datetime_encoder" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.select(Seq(col("o_orderkey")) ++
        DatetimeEncoder.encode("o_orderdate", "hour", periodic = true, asDouble = true): _*)
    }),

    // B-spline periodic datetime features (closed-form cardinal basis)
    "q_datetime_spline" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.select(Seq(col("o_orderkey")) ++
        DatetimeEncoder.encodeSpline("o_orderdate", nSplines = 4): _*)
    }),

    // SquashingScaler: robust scale + smooth clip
    "q_squashing_scaler" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      SquashingScaler.fitTransform(c, "c_acctbal", "c_acctbal_scaled")
        .select(col("c_custkey"), col("c_acctbal"), col("c_acctbal_scaled"))
    }),

    // spark.ml interop, end to end: the SAME SquashingScaler fit, but
    // driven through a native ml.Pipeline via SparkMl.stage — fit state
    // lives in the PipelineModel, transform replays through MLlib's
    // Transformer contract. Shares q_squashing_scaler's oracle SQL: the
    // interop wrapper must be a zero-semantics pass-through, and the
    // hash-match IS that proof.
    "q_sparkml_pipeline" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val est = new graft.plans.Estimator {
        def fit(df: DataFrame): graft.plans.Transformer = {
          val m = SquashingScaler.fit(df, "c_acctbal")
          new graft.plans.Transformer {
            def transform(d: DataFrame): DataFrame =
              d.withColumn("c_acctbal_scaled", round(m.expr(col("c_acctbal")), 6))
          }
        }
      }
      val model = new org.apache.spark.ml.Pipeline()
        .setStages(Array(graft.plans.SparkMl.stage(est))).fit(c)
      model.transform(c)
        .select(col("c_custkey"), col("c_acctbal"), col("c_acctbal_scaled"))
    }),

    // ApplyToCols end to end: selector + exclusion, RejectColumn passthrough
    // for the string columns, rename format, ONE batched quantile job for
    // both accepted numeric columns
    "q_apply_to_cols" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      graft.operators.ApplyToCols.fitTransform(c,
        graft.operators.ApplyToCols.squashingScaler(),
        cols = graft.selectors.Selectors.all,
        excludeCols = Some(graft.selectors.Selectors.cols("c_custkey")),
        allowReject = true,
        renameColumns = "scaled_{}")
    }),

    // TableVectorizer flagship: route + encode every orders column
    "q_table_vectorizer" -> ((s, dir) =>
      TableVectorizer.fitTransform(t(s, dir, "orders"))),

    // TableVectorizer with an ACTUAL high-cardinality column: c_name (all
    // distinct) routes to the minhash encoder join path; everything still
    // hash-verified (md5-exact signatures)
    "q_tv_high_card" -> ((s, dir) =>
      TableVectorizer.fitTransform(t(s, dir, "customer"))),

    // StringEncoder with a FULL oracle despite SVD sign/rotation freedom:
    // at full rank (nComponents = nBuckets) the eigenbasis is a complete
    // orthonormal basis, so the encoding preserves norms and dot products of
    // the underlying TF-IDF vectors EXACTLY — both are rotation-invariant
    // and DuckDB-computable (md5 bucket hashing + idf from distinct-value
    // document frequencies). svd_ref_dot = cosine of each value against the
    // lexicographically-smallest value, through the fitted SVD space; any
    // error in grams, hashing, tf, idf, normalization, or the eigenbasis
    // breaks the hash. Truncation (k < nBuckets) stays spec-covered
    // (StringEncoderSpec: eigenvalue ordering, norm shrinkage).
    "q_string_encoder" -> ((s, dir) => {
      val nb = 64
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      // persist at the fan-out: the ref-vector probe and the final
      // projection both consume the encoded frame
      val enc = graft.encoders.StringEncoder.encode(cust, "c_name",
        nComponents = nb, nBuckets = nb).persist()
      val vec = array((0 until nb).map(i => col(s"c_name_svd_$i")): _*)
      val refName = cust.filter(col("c_name").isNotNull)
        .agg(min(col("c_name"))).collect()(0).getString(0)
      val refVec = enc.filter(col("c_name") === refName)
        .select(vec.as("v")).limit(1).collect()(0).getSeq[Double](0)
      val refLit = typedLit(refVec)
      import graft.functions.VecExprs
      enc.select(col("c_custkey"), col("c_name"),
        when(col("c_name").isNull, lit(null).cast(DoubleType))
          .otherwise(round(sqrt(VecExprs.arrayDot(vec, vec)), 6) + lit(0.0))
          .as("svd_norm"),
        when(col("c_name").isNull, lit(null).cast(DoubleType))
          .otherwise(round(VecExprs.arrayDot(vec, refLit), 6) + lit(0.0))
          .as("svd_ref_dot"))
    }),

    // DropUninformative: all-unique string columns dropped. The corpus
    // text is uniquified with the doc id so the column is all-unique at
    // EVERY scale (at sf0.1 the raw corpus contains exact duplicate texts,
    // which would correctly flip the drop decision and break the static
    // oracle column list — the operator's uniqueness rule itself is what
    // this query pins, not the corpus's duplicate structure)
    "q_drop_uninformative" -> ((s, dir) =>
      DropUninformative.transform(
        t(s, dir, "documents").withColumn("text",
          concat(col("text"), lit(":"), col("doc_id"))),
        dropIfUnique = true)),

    // Pearson correlation matrix entry
    "q_pearson_corr" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"))),

    // quantile binning (beyond reference, r8): k-1 interpolated-quantile
    // edges fit in one exact percentile job, codegen'd comparison-chain
    // transform; nulls/NaN stay null
    "q_kbins" -> ((s, dir) =>
      graft.encoders.KBins.fitTransform(
        t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal")),
        "c_acctbal", k = 4)
        .select(col("c_custkey"), col("c_acctbal"), col("c_acctbal_bin"))),

    // m-estimate target encoding (beyond reference, r8): per-category
    // smoothed target means, DECIMAL-routed sums for order independence
    "q_target_encoder" -> ((s, dir) =>
      graft.encoders.TargetEncoder.encode(
        t(s, dir, "customer"), "c_mktsegment", "c_acctbal", m = 10.0)
        .select(col("c_custkey"), col("c_mktsegment"),
          round(col("c_mktsegment_target_enc"), 6).as("target_enc"))),

    // leakage-safe out-of-fold variant: each row's encoding uses ONLY the
    // complement folds' statistics (md5-keyed deterministic folds)
    "q_target_encoder_oof" -> ((s, dir) =>
      graft.encoders.TargetEncoder.encodeOutOfFold(
        t(s, dir, "customer"), "c_mktsegment", "c_acctbal", "c_custkey",
        k = 5, m = 10.0, seed = 42L)
        .select(col("c_custkey"), col("c_mktsegment"),
          col("__fold").as("fold"),
          round(col("c_mktsegment_target_enc"), 6).as("target_enc"))),

    // Bias-corrected Cramér's V associations
    "q_column_assoc" -> ((s, dir) =>
      ColumnAssociations.forPairs(t(s, dir, "orders"),
        Seq(("o_orderstatus", "o_orderpriority")))),

    // ALL-pairs associations: one grouping-sets contingency job over every
    // orders column pair (numeric + datetime binned, categorical lumped),
    // V + pearson per pair
    "q_column_assoc_all" -> ((s, dir) =>
      ColumnAssociations.allPairs(t(s, dir, "orders"))),

    // MinHashEncoder: 30 md5-minhash components of c_name char 2-4-grams,
    // fit on distinct values and joined back
    "q_minhash_encoder" -> ((s, dir) =>
      MinHashEncoder.encode(
        t(s, dir, "customer").select(col("c_custkey"), col("c_name")),
        "c_name", nComponents = 30)),

    // GapEncoder with a FULL oracle: the iterative factorization itself is
    // not SQL-expressible, so the query emits the two oracle-checkable
    // diagnostics — gram_total, the EXACT count-matrix row sum (= the
    // value's char-2-4-gram count, computed from the same V the NMF
    // factorizes), and row_sum_ok, gating that the fitted reconstruction HW
    // preserves each row sum within 1% (KL-NMF preserves row sums at
    // stationarity — a convergence gate hash-verified as all-TRUE).
    // Activation geometry stays spec-covered (GapEncoderSpec: KL
    // monotonicity, determinism, topic separation).
    "q_gap_encoder" -> ((s, dir) =>
      graft.encoders.GapEncoder.encode(
        t(s, dir, "supplier").select(col("s_suppkey"), col("s_name")),
        "s_name", nComponents = 10, nBuckets = 128, diagnostics = true)
        .select(col("s_suppkey"), col("s_name"),
          col("s_name_gap_gram_total").as("gram_total"),
          col("s_name_gap_row_sum_ok").as("row_sum_ok"))),

    // ToCategorical is schema-only (the tag rides StructField.metadata),
    // so the oracle pins the data contract: values pass through untouched
    // and the tag + report dtype are surfaced as columns
    "q_to_categorical" -> ((s, dir) => {
      import graft.encoders.ToCategorical
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val tagged = ToCategorical.transform(cust, "c_mktsegment")
      val dtype = graft.operators.TableReport
        .summarize(tagged, exactQuantiles = false)
        .filter(col("column_name") === "c_mktsegment")
        .select(col("dtype")).head().getString(0)
      tagged.select(col("c_custkey"), col("c_mktsegment"),
        lit(ToCategorical.isCategorical(tagged.schema("c_mktsegment")))
          .as("is_categorical"),
        lit(dtype).as("dtype"))
    }),

    // TextEncoder pipeline over the deterministic hash provider with PCA
    // skipped (nComponents = None): every stage — null ≡ "" canonicali-
    // zation, unique-value embedding, micro-exact block scaling factor,
    // scaled features — is exactly SQL-replayable, so the pretrained-
    // embedding INTEGRATION SHAPE gets a full hash oracle (the model
    // itself is pluggable; PCA reduction is spec-covered in EncodersSpec)
    "q_text_encoder_shape" -> ((s, dir) => {
      import graft.encoders.{HashEmbeddingProvider, TextEncoder}
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      TextEncoder.encode(cust, "c_mktsegment", HashEmbeddingProvider(8),
          nComponents = None)
        .select(col("c_custkey") +:
          (0 until 8).map(i => col(s"c_mktsegment_$i").as(s"f_$i")): _*)
    }),

    // REAL ONNX forward pass as the TextEncoder provider (VERDICT r14
    // task 4): a dyadic-weight 8->6(Relu)->4 MLP serialized to actual
    // ONNX bytes (OnnxMini.writeMlp), parsed once per executor JVM,
    // batched matmuls over hashed bag-of-bigram features of each
    // DISTINCT doc text (the pinned gramBuckets expression — the Dsir
    // md5 discipline). Every arithmetic step is exact: integer gram
    // counts x k/16 weights -> multiples of 2^-8, x 2^16 -> exact
    // integers — so the whole model forward hashes against a DuckDB
    // replay of the same matmul (generated literal SQL below).
    "q_onnx_embed" -> ((s, dir) => {
      import graft.encoders.{OnnxEmbeddingProvider, OnnxMini}
      val docs = t(s, dir, "documents")
      val model = OnnxMini.writeMlp(OnnxMini.demoWeights(8, 6, 4))
      val prov = OnnxEmbeddingProvider(model, inDim = 8, dim = 4)
      val vals = docs.select(
        coalesce(col("text").cast(StringType), lit("")).as("value"))
        .distinct()
      docs.select(col("doc_id"),
          coalesce(col("text").cast(StringType), lit("")).as("value"))
        .join(prov.embed(vals), Seq("value"))
        .select(col("doc_id") +: (0 until 4).map(m =>
          (element_at(col("embedding"), m + 1) * lit(65536.0))
            .cast(LongType).as(s"e_$m")): _*)
    }),

    // numeric profile with decimal-exact std (order-independent)
    "q_num_profile" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val dec = col("o_totalprice").cast(DecimalType(12, 2))
      val sumD = sum(dec).cast(DoubleType)
      val sumSq = sum(dec * dec).cast(DoubleType)
      val n = count(col("o_totalprice")).cast(DoubleType)
      o.agg(
        n.cast(LongType).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        (sumD / n).as("mean_price"),
        round(sqrt((sumSq - sumD * sumD / n) / (n - lit(1.0))), 6).as("std_price"))
    })
  )

  private val tvOracle: String = {
    val statuses = Seq("F", "O", "P")
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    def onehot(c: String, vs: Seq[String]) =
      vs.map(v =>
        s"CASE WHEN $c = '$v' THEN 1.0 ELSE 0.0 END AS ${c}_${v.replaceAll("[^A-Za-z0-9]+", "_")}") :+
        s"CASE WHEN $c IS NULL THEN 1.0 ELSE 0.0 END AS ${c}__null"
    val cols = Seq(
      "CAST(o_orderkey AS DOUBLE) AS o_orderkey",
      "CAST(o_custkey AS DOUBLE) AS o_custkey") ++
      onehot("o_orderstatus", statuses) ++
      Seq("CAST(o_totalprice AS DOUBLE) AS o_totalprice",
        "CAST(year(o_orderdate) AS DOUBLE) AS o_orderdate_year",
        "CAST(month(o_orderdate) AS DOUBLE) AS o_orderdate_month",
        "CAST(dayofmonth(o_orderdate) AS DOUBLE) AS o_orderdate_day",
        "CAST(hour(o_orderdate) AS DOUBLE) AS o_orderdate_hour",
        "CAST(isodow(o_orderdate) AS DOUBLE) AS o_orderdate_weekday",
        "CAST(dayofyear(o_orderdate) AS DOUBLE) AS o_orderdate_day_of_year",
        "epoch_us(CAST(o_orderdate AS TIMESTAMP)) / 1000000.0 AS o_orderdate_total_seconds") ++
      onehot("o_orderpriority", prios)
    s"SELECT\n  ${cols.mkString(",\n  ")}\nFROM orders"
  }

  private val dtOracle: String = {
    val base = Seq(
      "o_orderkey",
      "CAST(year(o_orderdate) AS DOUBLE) AS o_orderdate_year",
      "CAST(month(o_orderdate) AS DOUBLE) AS o_orderdate_month",
      "CAST(dayofmonth(o_orderdate) AS DOUBLE) AS o_orderdate_day",
      "CAST(hour(o_orderdate) AS DOUBLE) AS o_orderdate_hour",
      "CAST(isodow(o_orderdate) AS DOUBLE) AS o_orderdate_weekday",
      "CAST(dayofyear(o_orderdate) AS DOUBLE) AS o_orderdate_day_of_year",
      "epoch_us(CAST(o_orderdate AS TIMESTAMP)) / 1000000.0 AS o_orderdate_total_seconds")
    // periods sorted by part name: day=30, hour=24, month=12, weekday=7
    val circ = Seq("day" -> 30, "hour" -> 24, "month" -> 12, "weekday" -> 7).flatMap {
      case (p, period) =>
        val v = p match {
          case "day"     => "dayofmonth(o_orderdate)"
          case "hour"    => "hour(o_orderdate)"
          case "month"   => "month(o_orderdate)"
          case "weekday" => "isodow(o_orderdate)"
        }
        Seq(
          s"round(sin(CAST($v AS DOUBLE) * 2 * pi() / $period), 6) + 0.0 AS o_orderdate_${p}_circular_sin",
          s"round(cos(CAST($v AS DOUBLE) * 2 * pi() / $period), 6) + 0.0 AS o_orderdate_${p}_circular_cos")
    }
    s"SELECT\n  ${(base ++ circ).mkString(",\n  ")}\nFROM orders"
  }

  private val minhashOracle: String = {
    val comps = (0 until 30).map { k =>
      s"CAST(sig[${k + 1}] AS DOUBLE) AS c_name_minhash_$k"
    }.mkString(",\n  ")
    s"""WITH d AS (SELECT DISTINCT c_name FROM customer WHERE c_name IS NOT NULL),
       |sigs AS (
       |  SELECT c_name, list_transform(range(0, 30), k ->
       |    ('0x' || substr(list_min(list_transform(${SqlFragments.ngrams234Sql("c_name")},
       |      g -> md5(g || '#' || k))), 1, 8))::BIGINT) AS sig
       |  FROM d)
       |SELECT c.c_custkey, c.c_name,
       |  $comps
       |FROM customer c LEFT JOIN sigs s ON c.c_name = s.c_name""".stripMargin
  }

  private val tvHighCardOracle: String = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val onehot = segs.map(v =>
      s"CASE WHEN c_mktsegment = '$v' THEN 1.0 ELSE 0.0 END AS c_mktsegment_$v") :+
      "CASE WHEN c_mktsegment IS NULL THEN 1.0 ELSE 0.0 END AS c_mktsegment__null"
    val comps = (0 until 30).map { k =>
      s"CAST(sig[${k + 1}] AS DOUBLE) AS c_name_minhash_$k"
    }.mkString(",\n  ")
    s"""WITH d AS (SELECT DISTINCT c_name FROM customer WHERE c_name IS NOT NULL),
       |sigs AS (
       |  SELECT c_name, list_transform(range(0, 30), k ->
       |    ('0x' || substr(list_min(list_transform(${SqlFragments.ngrams234Sql("c_name")},
       |      g -> md5(g || '#' || k))), 1, 8))::BIGINT) AS sig
       |  FROM d)
       |SELECT CAST(c.c_custkey AS DOUBLE) AS c_custkey,
       |  CAST(c.c_nationkey AS DOUBLE) AS c_nationkey,
       |  CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
       |  ${onehot.mkString(",\n  ")},
       |  $comps
       |FROM customer c LEFT JOIN sigs s ON c.c_name = s.c_name""".stripMargin
  }

  /** Oracle for q_column_assoc_all: mirrors ColumnAssociations.allPairs —
    * identical bin labels (stats CTE for min/max), per-pair contingency +
    * bias-corrected V, pearson for numeric pairs.
    */
  private val assocAllOracle: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    // numeric-like binning expressions (epoch seconds for the datetime)
    def numExpr(c: String) = c match {
      case "o_orderdate" => "epoch_us(o_orderdate) / 1000000.0"
      case other         => s"CAST($other AS DOUBLE)"
    }
    val numericBinned = Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val doubleCols = Set("o_totalprice") // NaN-able
    val statsSel = numericBinned.flatMap(c =>
      Seq(s"min(${numExpr(c)}) AS mn_$c", s"max(${numExpr(c)}) AS mx_$c"))
      .mkString(", ")
    val labelExprs = cols.map {
      case c if numericBinned.contains(c) =>
        val nullCond =
          if (doubleCols(c)) s"$c IS NULL OR isnan($c)" else s"$c IS NULL"
        s"""CASE WHEN $nullCond THEN '__null'
           | ELSE 'b' || CAST(CAST(least(floor((${numExpr(c)} - mn_$c)
           |   / (mx_$c - mn_$c) * 9), 8.0) AS INTEGER) AS VARCHAR) END AS $c""".stripMargin
      case c =>
        s"CASE WHEN $c IS NULL THEN '__null' ELSE $c END AS $c"
    }
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.length
    } yield (cols(i), cols(j))
    val numericSet = Set("o_orderkey", "o_custkey", "o_totalprice")
    val pairCtes = pairs.zipWithIndex.map { case ((a, b), i) =>
      s"""obs_$i AS (
         |  SELECT $a AS va, $b AS vb, CAST(count(*) AS DOUBLE) AS o
         |  FROM binned GROUP BY 1, 2),
         |m_$i AS (
         |  SELECT *, sum(o) OVER () AS n,
         |    sum(o) OVER (PARTITION BY va) AS rt,
         |    sum(o) OVER (PARTITION BY vb) AS ct,
         |    CAST(count(DISTINCT va) OVER () AS DOUBLE) AS r,
         |    CAST(count(DISTINCT vb) OVER () AS DOUBLE) AS c
         |  FROM obs_$i),
         |v_$i AS (
         |  SELECT '$a' AS left_column_name, '$b' AS right_column_name,
         |    round(sqrt(greatest(0.0, chi2/n - (r-1)*(c-1)/(n-1))
         |      / least(r - (r-1)*(r-1)/(n-1) - 1, c - (c-1)*(c-1)/(n-1) - 1)), 6)
         |      AS cramer_v
         |  FROM (
         |    SELECT sum((o - rt*ct/n) * (o - rt*ct/n) / (rt*ct/n) - rt*ct/n)
         |        + any_value(n) AS chi2,
         |      any_value(n) AS n, any_value(r) AS r, any_value(c) AS c
         |    FROM m_$i))""".stripMargin
    }
    val pearsonSel = pairs.collect {
      case (a, b) if numericSet(a) && numericSet(b) =>
        s"('$a', '$b', round(corr($a, $b), 6))"
    }
    s"""WITH stats AS (SELECT $statsSel FROM orders),
       |binned AS (
       |  SELECT ${labelExprs.mkString(",\n  ")}
       |  FROM orders, stats),
       |${pairCtes.mkString(",\n")},
       |vall AS (${pairs.indices.map(i => s"SELECT * FROM v_$i").mkString("\n  UNION ALL ")}),
       |pc AS (SELECT ${numericSet.toSeq.sorted.flatMap(a => numericSet.toSeq.sorted.collect {
            case b if a < b => s"round(corr($a, $b), 6) AS corr_${a}_$b" }).mkString(", ")}
       |  FROM orders)
       |SELECT v.left_column_name, v.right_column_name, v.cramer_v,
       |  CASE
       |${pairs.collect { case (a, b) if numericSet(a) && numericSet(b) =>
            val (x, y) = if (a < b) (a, b) else (b, a)
            s"    WHEN v.left_column_name = '$a' AND v.right_column_name = '$b' THEN (SELECT corr_${x}_$y FROM pc)"
          }.mkString("\n")}
       |  END AS pearson_corr
       |FROM vall v""".stripMargin
  }

  private val splineOracle: String = {
    // mirror of DatetimeEncoder.splineBasis / b3
    def b3(t: String) =
      s"""(CASE WHEN abs($t) < 1.0
         |  THEN (4.0 - 6.0 * abs($t) * abs($t) + 3.0 * abs($t) * abs($t) * abs($t)) / 6.0
         |  WHEN abs($t) < 2.0
         |  THEN (2.0 - abs($t)) * (2.0 - abs($t)) * (2.0 - abs($t)) / 6.0
         |  ELSE 0.0 END)""".stripMargin
    val n = 4
    val parts = Seq("day" -> ("dayofmonth(o_orderdate)", 30),
      "hour" -> ("hour(o_orderdate)", 24),
      "month" -> ("month(o_orderdate)", 12),
      "weekday" -> ("isodow(o_orderdate)", 7))
    val cols = parts.flatMap { case (p, (expr0, period)) =>
      (0 until n).map { j =>
        val y = s"(CAST($expr0 AS DOUBLE) * $n / $period.0)"
        val d = s"($y - $j)"
        val w = s"($d - round($d / $n.0, 0) * $n.0)"
        s"round(${b3(w)}, 6) + 0.0 AS o_orderdate_${p}_spline_$j"
      }
    }
    s"SELECT o_orderkey,\n  ${cols.mkString(",\n  ")}\nFROM orders"
  }

  /** Oracle for q_string_encoder: rebuild the TF-IDF vectors in SQL (same
    * md5 bucket hashing as NgramVec — bucket = first 4 md5 hex digits mod
    * 64; idf = sqrt((1+n)/(1+df)) over distinct values; l2-normalized) and
    * compute the rotation-invariant quantities directly — at full rank the
    * SVD projection preserves both exactly.
    */
  private val stringEncOracle: String = {
    val grams = SqlFragments.ngrams234Sql("c_name")
    s"""WITH d AS (SELECT DISTINCT c_name FROM customer WHERE c_name IS NOT NULL),
       |cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d),
       |gr AS (SELECT c_name, unnest($grams) AS gram FROM d),
       |tf AS (
       |  SELECT c_name, ('0x' || substr(md5(gram), 1, 4))::INT % 64 AS bkt,
       |    CAST(count(*) AS DOUBLE) AS tf
       |  FROM gr GROUP BY 1, 2),
       |dfq AS (SELECT bkt, CAST(count(DISTINCT c_name) AS DOUBLE) AS dfc
       |  FROM tf GROUP BY 1),
       |w AS (
       |  SELECT t.c_name, t.bkt, t.tf * sqrt((1.0 + n) / (1.0 + dfc)) AS wv
       |  FROM tf t JOIN dfq USING (bkt) CROSS JOIN cnt),
       |nrm AS (SELECT c_name, sqrt(sum(wv * wv)) AS nm FROM w GROUP BY 1),
       |nw AS (SELECT w.c_name, w.bkt, w.wv / nrm.nm AS x
       |  FROM w JOIN nrm USING (c_name)),
       |ref AS (SELECT bkt, x FROM nw WHERE c_name = (SELECT min(c_name) FROM d)),
       |dots AS (
       |  SELECT a.c_name, sum(a.x * r.x) AS dt
       |  FROM nw a JOIN ref r USING (bkt) GROUP BY 1),
       |norms AS (SELECT c_name, round(sqrt(sum(x * x)), 6) + 0.0 AS svd_norm
       |  FROM nw GROUP BY 1)
       |SELECT c.c_custkey, c.c_name,
       |  CASE WHEN c.c_name IS NULL THEN NULL ELSE norms.svd_norm END AS svd_norm,
       |  CASE WHEN c.c_name IS NULL THEN NULL
       |       ELSE round(coalesce(dots.dt, 0.0), 6) + 0.0 END AS svd_ref_dot
       |FROM customer c
       |LEFT JOIN norms ON c.c_name = norms.c_name
       |LEFT JOIN dots ON c.c_name = dots.c_name""".stripMargin
  }

  private val gapOracle: String = {
    val grams = SqlFragments.ngrams234Sql("s_name")
    s"""SELECT s_suppkey, s_name,
       |  CASE WHEN s_name IS NULL THEN NULL
       |       ELSE CAST(len($grams) AS BIGINT) END AS gram_total,
       |  CASE WHEN s_name IS NULL THEN NULL ELSE TRUE END AS row_sum_ok
       |FROM supplier""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_to_categorical" ->
      """SELECT c_custkey, c_mktsegment, TRUE AS is_categorical,
        |  'categorical' AS dtype FROM customer""".stripMargin,
    // replays the whole TextEncoder pipeline bit for bit: md5 hash
    // projection per DISTINCT value, per-column population variance over
    // exact micro-LONG sums (order-independent), sqrt + epsilon clip,
    // feature / scale — no rounding anywhere because every double op is
    // fixed-order on identical bits
    "q_text_encoder_shape" -> {
      val fs = (0 until 8).map { j =>
        s"""('0x' || substr(md5(md5(value) || '$j'), 1, 8))::BIGINT
           | / 2147483648.0 - 1.0 AS f_$j""".stripMargin
      }
      val vars = (0 until 8).map { j =>
        s"""((CAST(sum(CAST(round(f_$j * 1000000.0) AS BIGINT)
           |      * CAST(round(f_$j * 1000000.0) AS BIGINT)) AS DOUBLE) / 1e12
           |  - (CAST(sum(CAST(round(f_$j * 1000000.0) AS BIGINT)) AS DOUBLE) / 1e6)
           |    * (CAST(sum(CAST(round(f_$j * 1000000.0) AS BIGINT)) AS DOUBLE) / 1e6)
           |    / CAST(count(f_$j) AS DOUBLE))
           |  / CAST(count(f_$j) AS DOUBLE))""".stripMargin
      }
      s"""WITH base AS (SELECT c_custkey,
         |    coalesce(c_mktsegment, '') AS value FROM customer),
         |e AS (SELECT c_custkey, ${fs.mkString(",\n")} FROM base),
         |v AS (SELECT sqrt(${vars.mkString("\n + ")}) AS sf0 FROM e),
         |s AS (SELECT CASE WHEN sf0 < 1e-12 THEN 1.0 ELSE sf0 END AS sf FROM v)
         |SELECT c_custkey, ${(0 until 8).map(j => s"f_$j / sf AS f_$j")
           .mkString(", ")}
         |FROM e, s""".stripMargin
    },
    // the ONNX MLP replayed as literal SQL generated from the SAME
    // weight function the model bytes are built from — tokens -> word
    // bigrams (whole-text fallback, the Dsir/gramBuckets contract) ->
    // md5 buckets mod 8 -> integer counts -> relu layer -> linear layer
    // -> x 2^16 exact-integer features
    "q_onnx_embed" -> {
      val layers = graft.encoders.OnnxMini.demoWeights(8, 6, 4)
      val (w0, b0, _) = layers(0)
      val (w1, b1, _) = layers(1)
      def num(d: Double): String =
        if (d == d.toLong.toDouble) s"${d.toLong}.0" else d.toString
      val xs = (0 until 8).map(j =>
        s"CAST(count(*) FILTER (WHERE b = $j) AS DOUBLE) AS x$j")
      val hs = (0 until 6).map { k =>
        val terms = (0 until 8)
          .map(j => s"x$j * (${num(w0(j)(k))})").mkString(" + ")
        s"greatest(0.0, $terms + (${num(b0(k))})) AS h$k"
      }
      val ys = (0 until 4).map { m =>
        val terms = (0 until 6)
          .map(k => s"h$k * (${num(w1(k)(m))})").mkString(" + ")
        s"$terms + (${num(b1(m))}) AS y$m"
      }
      s"""WITH tk AS (SELECT doc_id, ${TextQueries.toksSql} AS toks
         |  FROM (SELECT doc_id, coalesce(text, '') AS text
         |        FROM documents)),
         |gr AS (SELECT doc_id, CASE WHEN len(toks) <= 1
         |    THEN [array_to_string(toks, ' ')]
         |    ELSE list_transform(range(1, len(toks)),
         |      i -> toks[i] || ' ' || toks[i + 1]) END AS grams FROM tk),
         |db AS (SELECT doc_id,
         |    ('0x' || substr(md5(g), 1, 8))::BIGINT % 8 AS b
         |  FROM (SELECT doc_id, unnest(grams) AS g FROM gr)),
         |x AS (SELECT doc_id, ${xs.mkString(", ")} FROM db GROUP BY doc_id),
         |h AS (SELECT doc_id, ${hs.mkString(", ")} FROM x),
         |y AS (SELECT doc_id, ${ys.mkString(", ")} FROM h)
         |SELECT doc_id, ${(0 until 4)
          .map(m => s"CAST(y$m * 65536.0 AS BIGINT) AS e_$m")
          .mkString(", ")}
         |FROM y""".stripMargin
    },
    "q_embed_pca" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |u AS (SELECT vec_id, pr.p AS p, pr.x AS x FROM (
        |  SELECT vec_id, unnest(list_transform(range(1, len(embedding) + 1),
        |    i -> struct_pack(p := i, x := CAST(embedding[i] AS DOUBLE)))) AS pr
        |  FROM e)),
        |mu AS (SELECT p, avg(x) AS m FROM u GROUP BY p),
        |cv AS (SELECT vec_id, p, x - m AS c FROM u JOIN mu USING (p)),
        |rf AS (SELECT p, c AS rc FROM cv
        |  WHERE vec_id = (SELECT min(vec_id) FROM e))
        |SELECT cv.vec_id,
        |  round(sqrt(sum(c * c)), 6) + 0.0 AS pca_norm,
        |  round(sum(c * rf.rc), 6) + 0.0 AS pca_ref_dot
        |FROM cv JOIN rf USING (p) GROUP BY cv.vec_id""".stripMargin,
    "q_kbins" ->
      """WITH q AS (SELECT quantile_cont(c_acctbal, 0.25) AS e1,
        |    quantile_cont(c_acctbal, 0.5) AS e2,
        |    quantile_cont(c_acctbal, 0.75) AS e3
        |  FROM customer)
        |SELECT c_custkey, c_acctbal,
        |  CASE WHEN c_acctbal IS NULL OR isnan(c_acctbal) THEN NULL
        |    ELSE (CASE WHEN c_acctbal >= q.e1 THEN 1 ELSE 0 END)
        |       + (CASE WHEN c_acctbal >= q.e2 THEN 1 ELSE 0 END)
        |       + (CASE WHEN c_acctbal >= q.e3 THEN 1 ELSE 0 END)
        |  END AS c_acctbal_bin
        |FROM customer, q""".stripMargin,

    "q_target_encoder" ->
      """WITH st AS (SELECT c_mktsegment AS cat, count(c_acctbal) AS n,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE) AS s
        |  FROM customer GROUP BY 1),
        |g AS (SELECT sum(s) AS bigs, sum(n) AS bign FROM st)
        |SELECT c.c_custkey, c.c_mktsegment,
        |  round((st.s + 10.0 * (g.bigs / g.bign)) / (st.n + 10.0), 6)
        |    AS target_enc
        |FROM customer c, g
        |JOIN st ON c.c_mktsegment IS NOT DISTINCT FROM st.cat""".stripMargin,

    "q_target_encoder_oof" ->
      """WITH wf AS (SELECT c_custkey, c_mktsegment, c_acctbal,
        |    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':' || '42'),
        |      1, 15))::BIGINT % 5 AS fold
        |  FROM customer),
        |cf AS (SELECT c_mktsegment AS cat, fold, count(c_acctbal) AS ncf,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE) AS scf
        |  FROM wf GROUP BY 1, 2),
        |ct AS (SELECT cat, sum(ncf) AS nc, sum(scf) AS sc FROM cf GROUP BY 1),
        |ft AS (SELECT fold, sum(ncf) AS nf, sum(scf) AS sf FROM cf GROUP BY 1),
        |g AS (SELECT sum(sf) AS bigs, sum(nf) AS bign FROM ft)
        |SELECT wf.c_custkey, wf.c_mktsegment, wf.fold,
        |  round((ct.sc - cf.scf + 10.0 * ((g.bigs - ft.sf) / (g.bign - ft.nf)))
        |    / (ct.nc - cf.ncf + 10.0), 6) AS target_enc
        |FROM wf, g
        |JOIN cf ON wf.c_mktsegment IS NOT DISTINCT FROM cf.cat
        |  AND wf.fold = cf.fold
        |JOIN ct ON cf.cat IS NOT DISTINCT FROM ct.cat
        |JOIN ft ON wf.fold = ft.fold""".stripMargin,

    "q_string_encoder" -> stringEncOracle,
    "q_gap_encoder" -> gapOracle,
    "q_minhash_encoder" -> minhashOracle,
    "q_datetime_spline" -> splineOracle,
    "q_tv_high_card" -> tvHighCardOracle,
    "q_column_assoc_all" -> assocAllOracle,
    "q_datetime_encoder" -> dtOracle,

    "q_squashing_scaler" -> squashSql,
    // interop wrapper is semantics-free: identical oracle by construction
    "q_sparkml_pipeline" -> squashSql,

    "q_apply_to_cols" ->
      """WITH qn AS (
        |  SELECT quantile_cont(c_nationkey, 0.25) AS q1,
        |    quantile_cont(c_nationkey, 0.5) AS q2,
        |    quantile_cont(c_nationkey, 0.75) AS q3
        |  FROM customer WHERE c_nationkey IS NOT NULL),
        |qa AS (
        |  SELECT quantile_cont(c_acctbal, 0.25) AS q1,
        |    quantile_cont(c_acctbal, 0.5) AS q2,
        |    quantile_cont(c_acctbal, 0.75) AS q3
        |  FROM customer WHERE c_acctbal IS NOT NULL),
        |z AS (
        |  SELECT c.*,
        |    (c_nationkey - qn.q2) /
        |      (CASE WHEN qn.q3 - qn.q1 = 0 THEN 1.0 ELSE qn.q3 - qn.q1 END) AS zn,
        |    (c_acctbal - qa.q2) /
        |      (CASE WHEN qa.q3 - qa.q1 = 0 THEN 1.0 ELSE qa.q3 - qa.q1 END) AS za
        |  FROM customer c, qn, qa)
        |SELECT c_custkey, c_name, c_mktsegment,
        |  CASE WHEN c_nationkey IS NULL THEN NULL
        |    ELSE round(zn / sqrt(1.0 + (zn / 3.0) * (zn / 3.0)), 6) END AS scaled_c_nationkey,
        |  CASE WHEN c_acctbal IS NULL OR isnan(c_acctbal) THEN NULL
        |    ELSE round(za / sqrt(1.0 + (za / 3.0) * (za / 3.0)), 6) END AS scaled_c_acctbal
        |FROM z""".stripMargin,

    "q_table_vectorizer" -> tvOracle,

    "q_drop_uninformative" ->
      "SELECT doc_id, lang, source, n_chars FROM documents",

    "q_pearson_corr" ->
      "SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price FROM lineitem",

    "q_column_assoc" -> {
      """WITH obs AS (
        |  SELECT o_orderstatus AS a, o_orderpriority AS b, CAST(count(*) AS DOUBLE) AS o
        |  FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT *, sum(o) OVER () AS n,
        |    sum(o) OVER (PARTITION BY a) AS rt,
        |    sum(o) OVER (PARTITION BY b) AS ct,
        |    CAST(count(DISTINCT a) OVER () AS DOUBLE) AS r,
        |    CAST(count(DISTINCT b) OVER () AS DOUBLE) AS c
        |  FROM obs),
        |agg AS (
        |  SELECT sum((o - rt*ct/n) * (o - rt*ct/n) / (rt*ct/n) - rt*ct/n)
        |      + any_value(n) AS chi2,
        |    any_value(n) AS n, any_value(r) AS r, any_value(c) AS c
        |  FROM m)
        |SELECT 'o_orderstatus' AS col_a, 'o_orderpriority' AS col_b,
        |  round(sqrt(greatest(0.0, chi2/n - (r-1)*(c-1)/(n-1))
        |    / least(r - (r-1)*(r-1)/(n-1) - 1, c - (c-1)*(c-1)/(n-1) - 1)), 6) AS cramers_v
        |FROM agg""".stripMargin
    },

    "q_num_profile" ->
      """WITH s AS (
        |  SELECT count(o_totalprice) AS n,
        |    min(o_totalprice) AS min_price,
        |    max(o_totalprice) AS max_price,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sd,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sq
        |  FROM orders)
        |SELECT n, min_price, max_price,
        |  sd / n AS mean_price,
        |  round(sqrt((sq - sd * sd / n) / (n - 1.0)), 6) AS std_price
        |FROM s""".stripMargin
  )
}
