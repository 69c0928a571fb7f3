package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.ops.Kernel
import graft.operators.{Classify, Dsir, TextSearch}

/** BM25 retrieval + DSIR importance-resampling queries, each mirrored
  * exactly in DuckDB (micro-integer score discipline — see
  * `operators/TextSearch.scala` / `operators/Dsir.scala` headers).
  */
object RetrievalQueries {

  private def t(s: SparkSession, dir: String, n: String) = Kernel.table(s, dir, n)

  private val toksSql = TextQueries.toksSql

  private val NQueries = 8
  private val QTerms = 6
  private val TopK = 5
  private val DsirBuckets = 10000
  private val DsirK = 20
  private val DsirKlK = 100
  private[queries] val RecipeMeanMicro = -1300000L
  private[queries] val RecipeBudgets = Map("src0" -> 400L, "src1" -> 250L)
  private[queries] val RecipeEpochs =
    Map("src0" -> 2.45, "src1" -> 0.6, "src3" -> 0.0)
  // the pipeline's tighter src0 budget: the eleven-stage survivor pool is
  // much smaller than the raw corpus, and the budget gate must BIND there
  private[queries] val PipelineBudgets = Map("src0" -> 150L, "src1" -> 250L)

  /** ONE fixed layout dir per index-building query, wiped before each
    * build (the q_lm_score_index pattern): repeated bench/warmup
    * invocations overwrite instead of accumulating orphaned
    * createTempDirectory layouts, and the fixed metastore table name
    * always points at the most recent layout. Single-session by design —
    * concurrent sessions sharing a metastore would race on the table
    * names either way (documented; Verify/Bench are single-session).
    */
  private[queries] def fixedLayoutDir(leaf: String): String = {
    val path = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), leaf)
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(); ()
    }
    if (path.toFile.exists()) wipe(path.toFile)
    path.toString
  }

  /** The indexed-fusion replay shared by q_rrf_fusion_index and its
    * standing twin q_rrf_probe (identical ranking — the standing form
    * only moves WHEN the index builds happen, never what they answer).
    */
  private def rrfIndexSql: String =
    s"""WITH $bm25Ctes,
       |rk AS (SELECT q_id, doc_id, score_micro,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY score_micro DESC, doc_id) AS rank FROM bm),
       |lex AS (SELECT q_id, doc_id, rank FROM rk WHERE rank <= $TopK),
       |ev AS (SELECT vec_id AS id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
       |      sqrt(list_sum(list_transform(embedding,
       |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
       |  FROM embeddings),
       |bb AS (SELECT id, unnest(${graft.functions.Planes
         .bucketTablesSql("nv", 16, 4)}) AS tb FROM ev),
       |bt AS (SELECT id, struct_extract(tb, 'tbl') AS tbl,
       |    struct_extract(tb, 'bkt') AS bkt FROM bb),
       |cand AS (SELECT DISTINCT q.id AS q_id, c.id AS doc_id
       |  FROM bt c JOIN bt q ON q.id IN (SELECT q_id FROM qd)
       |    AND q.id <> c.id AND c.tbl = q.tbl AND c.bkt = q.bkt),
       |semsc AS (SELECT cand.q_id, cand.doc_id,
       |    round(list_sum(list_transform(list_zip(c.nv, q.nv),
       |      p -> p[1] * p[2])), 6) AS cosine
       |  FROM cand JOIN ev c ON cand.doc_id = c.id
       |    JOIN ev q ON cand.q_id = q.id),
       |sem AS (SELECT q_id, doc_id, rank FROM (
       |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, doc_id ASC) AS rank FROM semsc)
       |  WHERE rank <= $TopK),
       |uni AS (SELECT q_id, doc_id,
       |    CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS contrib
       |  FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)),
       |fus AS (SELECT q_id, doc_id,
       |    CAST(sum(contrib) AS BIGINT) AS rrf_micro
       |  FROM uni GROUP BY q_id, doc_id)
       |SELECT q_id, doc_id, rrf_micro, rank FROM (
       |  SELECT q_id, doc_id, rrf_micro, row_number() OVER (
       |    PARTITION BY q_id ORDER BY rrf_micro DESC, doc_id) AS rank
       |  FROM fus) WHERE rank <= $TopK""".stripMargin

  /** Deterministic query workload: 8 md5-selected documents, each queried
    * by its first 6 normalized tokens (shared by q_bm25_scores/_topk).
    */
  private def queryDocs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
      .limit(NQueries)
      .select(col("doc_id").as("q_id"),
        array_join(slice(graft.functions.Text.tokens(col("text")), 1, QTerms), " ")
          .as("q_text"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bm25_scores" -> ((s, dir) =>
      TextSearch.scores(t(s, dir, "documents"), "text", "doc_id",
        queryDocs(s, dir), "q_text", "q_id")),

    "q_bm25_topk" -> ((s, dir) =>
      TextSearch.topk(t(s, dir, "documents"), "text", "doc_id",
        queryDocs(s, dir), "q_text", "q_id", k = TopK)),

    "q_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val target = docs.filter(col("source") ===
        docs.agg(min(col("source"))).head().getString(0))
      val model = Dsir.fit(docs, target, "text", DsirBuckets)
      Dsir.weights(docs, "text", "doc_id", model)
    }),

    "q_dsir_resample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val target = docs.filter(col("source") ===
        docs.agg(min(col("source"))).head().getString(0))
      val model = Dsir.fit(docs, target, "text", DsirBuckets)
      Dsir.resample(docs, "text", "doc_id", model, DsirK)
    }),

    // in-engine retrieval eval: the 8 self-queries judged against their
    // own documents (truth = (q, q)) over the BM25 top-5
    "q_retrieval_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val qd = queryDocs(s, dir)
      val results = TextSearch.topk(docs, "text", "doc_id",
        qd, "q_text", "q_id", k = TopK)
      val truth = qd.select(col("q_id"), col("q_id").as("doc_id"))
      graft.operators.Retrieval.evalRanking(results, truth, k = TopK)
    }),

    // the DSIR paper's selection diagnostic: KL(target || selected) must
    // drop below KL(target || raw) — two bounded-bucket KLs in pico-nats
    "q_dsir_kl" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val target = docs.filter(col("source") ===
        docs.agg(min(col("source"))).head().getString(0))
      // count each corpus ONCE and share the arrays across fit + both KLs
      val ct = Dsir.bucketCountsOf(target, "text", DsirBuckets)
      val cr = Dsir.bucketCountsOf(docs, "text", DsirBuckets)
      val model = Dsir.fitFromCounts(cr, ct)
      val sel = Dsir.resample(docs, "text", "doc_id", model, DsirKlK)
        .select(col("doc_id"))
      val cs = Dsir.bucketCountsOf(docs.join(sel, "doc_id"), "text",
        DsirBuckets)
      Seq(("raw", Dsir.klFromCounts(ct, cr)),
        ("selected", Dsir.klFromCounts(ct, cs))).toDF("which", "kl_pico")
    }),

    // persisted BM25 index through the INGEST RHYTHM: build on the even
    // half, append the odd half, probe — must hash-match the one-shot
    // oracle exactly (stats properties updated on append, postings land
    // in new per-bucket files)
    "q_bm25_index" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = fixedLayoutDir("graft_q_bm25_idx")
      TextSearch.buildIndex(docs.filter(col("doc_id") % 2 === 0),
        "text", "doc_id", "graft_q_bm25_idx", path)
      TextSearch.append(docs.filter(col("doc_id") % 2 === 1),
        "text", "doc_id", "graft_q_bm25_idx")
      TextSearch.probe(s, "graft_q_bm25_idx",
        queryDocs(s, dir), "q_text", "q_id", k = TopK)
    }),

    // the STANDING-INDEX probe — what a deployed retrieval system pays
    // per query batch against an accumulated corpus. `ensureIndex`
    // (r14: the reuse logic promoted from this registry to operator API)
    // builds once and REUSES across invocations behind a CONTENT-keyed
    // staleness guard (the corpus manifest + build params as a table
    // property — a corpus regenerated in place at the same path rebuilds
    // instead of silently serving stale postings; the r13 path-keyed
    // guard could not tell). Bench's untimed warmup absorbs the build;
    // the timed pass pays the manifest aggregate (the honest
    // cache-validity cost, measured in BASELINE.md) + the probe:
    // broadcast query terms against the term-bucketed postings scan,
    // zero corpus-side Exchange. Hash-pinned to the one-shot ranking
    // (probe ≡ topk — the same scorer).
    "q_bm25_probe" -> ((s, dir) => {
      TextSearch.ensureIndex(t(s, dir, "documents"), "text", "doc_id",
        "graft_q_bm25_probe", fixedLayoutDir("graft_q_bm25_probe_idx"))
      TextSearch.probe(s, "graft_q_bm25_probe", queryDocs(s, dir),
        "q_text", "q_id", k = TopK)
    }),

    // hybrid retrieval: RRF-fuse the BM25 lexical top-5 with the exact
    // cosine top-5 of the same 8-query workload (vec_id aligns with doc_id)
    "q_rrf_fusion" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val qd = queryDocs(s, dir)
      val lex = TextSearch.topk(docs, "text", "doc_id",
          qd, "q_text", "q_id", k = TopK)
        .select(col("q_id"), col("doc_id"), col("rank"))
      val qVecs = emb.join(broadcast(qd.select(col("q_id"))),
        emb("vec_id") === col("q_id"), "left_semi")
      val sem = graft.operators.SimilaritySearch.bruteForceTopK(
          emb, qVecs, "embedding", "vec_id", k = TopK)
        .select(col("query_id").as("q_id"), col("corpus_id").as("doc_id"),
          col("rank"))
      graft.operators.Retrieval.rrf(Seq(lex, sem), k = TopK)
    }),

    // hybrid retrieval over STANDING indexes — the 100 TB shape the
    // one-shot q_rrf_fusion only narrates: both legs probe persisted
    // bucketed layouts (BM25 postings by term, LSH postings by
    // (tbl, bkt)), so the corpus-sized work happened at index-build time
    // and the fusion runs on |queries|·k rows. Hash-verified against the
    // same naive SQL replay as the one-shot path (probe ≡ topk is pinned
    // per leg), plan-asserted exchange-free in RetrievalSpec.
    "q_rrf_fusion_index" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val qd = queryDocs(s, dir)
      val lexPath = fixedLayoutDir("graft_rrf_lex_idx")
      TextSearch.buildIndex(docs, "text", "doc_id", "graft_rrf_lex_idx",
        lexPath)
      val lex = TextSearch.probe(s, "graft_rrf_lex_idx",
          qd, "q_text", "q_id", k = TopK)
        .select(col("q_id"), col("doc_id"), col("rank"))
      val annPath = fixedLayoutDir("graft_rrf_ann_idx")
      graft.operators.AnnIndex.write(emb, "embedding", "vec_id",
        "graft_rrf_ann_idx", annPath, planesPerTable = 4, nTables = 16,
        numBuckets = 8)
      val qVecs = emb.join(broadcast(qd.select(col("q_id"))),
        emb("vec_id") === col("q_id"), "left_semi")
      val sem = graft.operators.AnnIndex.probe(qVecs, "embedding", "vec_id",
          "graft_rrf_ann_idx", k = TopK)
        .select(col("query_id").as("q_id"), col("corpus_id").as("doc_id"),
          col("rank"))
      graft.operators.Retrieval.rrf(Seq(lex, sem), k = TopK)
    }),

    // the STANDING twin of q_rrf_fusion_index (r13 — the q_bm25_probe
    // trick applied to the fusion family): BOTH indexes ride `ensure*`
    // (r14: content-keyed staleness, operator API), so Bench's untimed
    // warmup absorbs the two bucketed saveAsTable commits and the timed
    // pass pays the two manifest aggregates + two exchange-free probes +
    // the |queries|·k fusion — the cost a deployed hybrid retrieval
    // system sees per query batch. q_rrf_fusion_index stays the in-query
    // build+probe parity proof; this row decomposes its commit constant
    // away (r12 verdict: the family's medians drifted with saveAsTable
    // I/O, not scorer cost). Identical ranking, same oracle.
    "q_rrf_probe" -> ((s, dir) => {
      val lexName = "graft_rrf_probe_lex"
      val annName = "graft_rrf_probe_ann"
      TextSearch.ensureIndex(t(s, dir, "documents"), "text", "doc_id",
        lexName, fixedLayoutDir("graft_rrf_probe_lex_idx"))
      graft.operators.AnnIndex.ensure(t(s, dir, "embeddings"), "embedding",
        "vec_id", annName, fixedLayoutDir("graft_rrf_probe_ann_idx"),
        planesPerTable = 4, nTables = 16, numBuckets = 8)
      val qd = queryDocs(s, dir)
      val lex = TextSearch.probe(s, lexName, qd, "q_text", "q_id", k = TopK)
        .select(col("q_id"), col("doc_id"), col("rank"))
      val emb = t(s, dir, "embeddings")
      val qVecs = emb.join(broadcast(qd.select(col("q_id"))),
        emb("vec_id") === col("q_id"), "left_semi")
      val sem = graft.operators.AnnIndex.probe(qVecs, "embedding", "vec_id",
          annName, k = TopK)
        .select(col("query_id").as("q_id"), col("corpus_id").as("doc_id"),
          col("rank"))
      graft.operators.Retrieval.rrf(Seq(lex, sem), k = TopK)
    }),

    // GPT-3-style quality classifier: hashed-NB log-odds between the
    // min-source slice (positive seed) and its complement (negative
    // contrast), scored over the whole corpus — the decision is
    // all-integer so the verdict hashes
    "q_quality_classifier" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val minSrc = docs.agg(min(col("source"))).head().getString(0)
      Dsir.classifierFlag(docs, "text", "doc_id",
        pos = docs.filter(col("source") === minSrc),
        neg = docs.filter(col("source") =!= minSrc),
        nBuckets = DsirBuckets)
    }),

    // the end-to-end data recipe as ONE plan with per-stage verdicts:
    // classifier gate -> leakage-safe split -> per-source token budgets
    // -> fractional-epoch repetition -> packing (q_curation_full's
    // discipline applied to the selection family). One row per
    // (doc x repeat) for shipped docs, one null-packed row per drop.
    "q_recipe_full" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val minSrc = docs.agg(min(col("source"))).head().getString(0)
      graft.operators.Recipe.compose(docs, "text", "doc_id", "source",
        pos = docs.filter(col("source") === minSrc),
        neg = docs.filter(col("source") =!= minSrc),
        budgets = RecipeBudgets,
        epochs = RecipeEpochs,
        nBuckets = DsirBuckets,
        // the fixture's random 30-word vocabulary makes every NB score
        // negative (a 25-doc pos seed loses to smoothing everywhere), so
        // the gate is on the MEAN per-gram log-odds near the corpus
        // median — half the docs pass, and every later stage has real
        // work on both sides of its verdict
        minMeanMicro = RecipeMeanMicro)
    }),

    // the SAME recipe over string doc ids ('d' || id — URLs/UUIDs in
    // production corpora): every stage keys, orders, and packs on the
    // varchar directly (composite (id, repeat) pack order, bytewise id
    // comparison), no dense-id pre-mapping stage anywhere
    "q_recipe_string_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("doc_id", concat(lit("d"), col("doc_id").cast(StringType)))
      val minSrc = docs.agg(min(col("source"))).head().getString(0)
      graft.operators.Recipe.compose(docs, "text", "doc_id", "source",
        pos = docs.filter(col("source") === minSrc),
        neg = docs.filter(col("source") =!= minSrc),
        budgets = RecipeBudgets,
        epochs = RecipeEpochs,
        nBuckets = DsirBuckets,
        minMeanMicro = RecipeMeanMicro)
    }),

    // nearest-centroid domain tagging: fit on the vec_id % 5 == 0 labeled
    // seed, classify the whole embeddings table
    "q_classify_centroid" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = Classify.fitCentroids(
        emb.filter(col("vec_id") % 5 === 0), "embedding", "label")
      Classify.classify(emb, "embedding", "vec_id", model)
    })
  )

  /** Shared BM25 CTE chain: tokens → postings/df/lengths/stats → the
    * md5-selected query terms → per-(q, doc) DECIMAL(28,6) micro-scores.
    * Float parity: every double literal is written as the same arithmetic
    * Spark performs (1.2 + 1.0, 1.0 - 0.75 — not pre-folded constants), so
    * both engines fold the identical IEEE expression tree.
    */
  private def bm25Ctes: String =
    s"""tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tk),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(coalesce(sum(dl), 0) AS BIGINT) AS s FROM dl),
       |post AS (SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS w FROM tk) GROUP BY doc_id, w),
       |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term),
       |qd AS (SELECT doc_id AS q_id, toks FROM tk
       |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT $NQueries),
       |qt AS (SELECT DISTINCT q_id, unnest(toks[1:$QTerms]) AS term FROM qd),
       |sc AS (SELECT qt.q_id, p.doc_id,
       |    CAST(round(
       |      ln(1.0 + ((CAST(st.n AS DOUBLE) - CAST(dfq.df AS DOUBLE)) + 0.5)
       |        / (CAST(dfq.df AS DOUBLE) + 0.5))
       |      * ((CAST(p.tf AS DOUBLE) * (1.2 + 1.0))
       |        / (CAST(p.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
       |          + 0.75 * (CAST(d.dl AS DOUBLE)
       |            / (CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE)))))), 6)
       |      AS DECIMAL(28,6)) AS contrib
       |  FROM post p JOIN qt ON p.term = qt.term
       |  JOIN dfq ON p.term = dfq.term
       |  JOIN dl d ON p.doc_id = d.doc_id CROSS JOIN st),
       |ag AS (SELECT q_id, doc_id, sum(contrib) AS sc
       |  FROM sc GROUP BY q_id, doc_id),
       |bm AS (SELECT q_id, doc_id,
       |    CAST(sc * 1000000 AS BIGINT) AS score_micro FROM ag)""".stripMargin

  /** Shared DSIR CTE chain: word-bigram grams (whole-text fallback under 2
    * tokens) → md5 buckets mod B → target (min source) and raw bucket
    * counts → per-gram 6-dp log-ratios summed as DECIMAL(28,6) →
    * wm(doc_id, weight_micro).
    */
  private def dsirCtes: String =
    // coalesce(text, '') mirrors Dsir's null handling: a NULL-text doc
    // still contributes its whole-text-fallback gram and gets a weight row
    s"""tk AS (SELECT doc_id, source, $toksSql AS toks
       |  FROM (SELECT doc_id, source, coalesce(text, '') AS text
       |        FROM documents)),
       |gr AS (SELECT doc_id, source,
       |    CASE WHEN len(toks) <= 1 THEN [array_to_string(toks, ' ')]
       |         ELSE list_transform(range(1, len(toks)),
       |           i -> toks[i] || ' ' || toks[i + 1]) END AS grams
       |  FROM tk),
       |tb AS (SELECT ('0x' || substr(md5(g), 1, 8))::BIGINT % $DsirBuckets AS b
       |  FROM (SELECT unnest(grams) AS g FROM gr
       |        WHERE source = (SELECT min(source) FROM documents))),
       |ct AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM tb GROUP BY b),
       |rb AS (SELECT ('0x' || substr(md5(g), 1, 8))::BIGINT % $DsirBuckets AS b
       |  FROM (SELECT unnest(grams) AS g FROM gr)),
       |cr AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM rb GROUP BY b),
       |tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM tb) AS nt,
       |    (SELECT CAST(count(*) AS BIGINT) FROM rb) AS nr),
       |db AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT % $DsirBuckets AS b
       |  FROM (SELECT doc_id, unnest(grams) AS g FROM gr)),
       |lrs AS (SELECT db.doc_id,
       |    CAST(round(ln(
       |      ((CAST(coalesce(ct.c, 0) AS DOUBLE) + 0.5)
       |        / (CAST(tot.nt AS DOUBLE) + 0.5 * $DsirBuckets))
       |      / ((CAST(coalesce(cr.c, 0) AS DOUBLE) + 0.5)
       |        / (CAST(tot.nr AS DOUBLE) + 0.5 * $DsirBuckets))), 6)
       |      AS DECIMAL(28,6)) AS lr
       |  FROM db LEFT JOIN ct ON db.b = ct.b LEFT JOIN cr ON db.b = cr.b
       |  CROSS JOIN tot),
       |wm AS (SELECT doc_id, CAST(sum(lr) * 1000000 AS BIGINT) AS weight_micro
       |  FROM lrs GROUP BY doc_id)""".stripMargin

  /** dsirCtes' classifier twin: positive = the min-source slice, negative
    * = its complement (NOT the whole corpus), scored over every doc, with
    * per-doc gram counts for the integer decision. Parametric over the
    * corpus relation (a table or an earlier CTE with (doc_id, source,
    * text)) and a CTE-name prefix `p`, so two chains can share one WITH
    * clause (the pipeline oracle runs this AFTER the curation chain).
    */
  private[queries] def qcCtes(p: String, corpus: String): String =
    s"""${p}tk AS (SELECT doc_id, source, $toksSql AS toks
       |  FROM (SELECT doc_id, source, coalesce(text, '') AS text
       |        FROM $corpus)),
       |${p}gr AS (SELECT doc_id, source,
       |    CASE WHEN len(toks) <= 1 THEN [array_to_string(toks, ' ')]
       |         ELSE list_transform(range(1, len(toks)),
       |           i -> toks[i] || ' ' || toks[i + 1]) END AS grams
       |  FROM ${p}tk),
       |${p}pb AS (SELECT ('0x' || substr(md5(g), 1, 8))::BIGINT % $DsirBuckets AS b
       |  FROM (SELECT unnest(grams) AS g FROM ${p}gr
       |        WHERE source = (SELECT min(source) FROM $corpus))),
       |${p}nb AS (SELECT ('0x' || substr(md5(g), 1, 8))::BIGINT % $DsirBuckets AS b
       |  FROM (SELECT unnest(grams) AS g FROM ${p}gr
       |        WHERE source != (SELECT min(source) FROM $corpus))),
       |${p}cp AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM ${p}pb GROUP BY b),
       |${p}cn AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM ${p}nb GROUP BY b),
       |${p}tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM ${p}pb) AS np,
       |    (SELECT CAST(count(*) AS BIGINT) FROM ${p}nb) AS nn),
       |${p}db AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT % $DsirBuckets AS b
       |  FROM (SELECT doc_id, unnest(grams) AS g FROM ${p}gr)),
       |${p}lrs AS (SELECT ${p}db.doc_id,
       |    CAST(round(ln(
       |      ((CAST(coalesce(${p}cp.c, 0) AS DOUBLE) + 0.5)
       |        / (CAST(${p}tot.np AS DOUBLE) + 0.5 * $DsirBuckets))
       |      / ((CAST(coalesce(${p}cn.c, 0) AS DOUBLE) + 0.5)
       |        / (CAST(${p}tot.nn AS DOUBLE) + 0.5 * $DsirBuckets))), 6)
       |      AS DECIMAL(28,6)) AS lr
       |  FROM ${p}db LEFT JOIN ${p}cp ON ${p}db.b = ${p}cp.b
       |  LEFT JOIN ${p}cn ON ${p}db.b = ${p}cn.b
       |  CROSS JOIN ${p}tot),
       |${p}qm AS (SELECT doc_id, CAST(sum(lr) * 1000000 AS BIGINT) AS score_micro
       |  FROM ${p}lrs GROUP BY doc_id),
       |${p}ng AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams
       |  FROM ${p}gr)""".stripMargin

  /** The FULL recipe verdict chain over `corpus` (doc_id, source, text) —
    * qcCtes' classifier gate, the leakage-split bucket predicate (seed 7,
    * 30%), the per-source budget window (priority = classifier score, the
    * registered 400/250 budgets), the epoch thresholds (seed 42, the
    * registered 2.45/0.6/0.0 schedule), and the 256-token pack window in
    * (doc, repeat) composite order — ending at `${p}rv`: one verdict row
    * per (doc × repeat) for shipped docs, one null-packed row per drop.
    * Every CTE is the same replay its standalone oracle uses; id-type
    * agnostic (string doc ids order bytewise — DuckDB binary collation ==
    * Spark UTF8String order). The budget/epoch CASEs are GENERATED from
    * the same maps the Spark side passes, so the two sides cannot drift.
    */
  private[queries] def recipeChainCtes(p: String, corpus: String,
      budgets: Map[String, Long] = RecipeBudgets,
      epochs: Map[String, Double] = RecipeEpochs): String = {
    val budgetCase = budgets.toSeq.sorted
      .map { case (s, b) => s"WHEN '$s' THEN cum <= $b" }.mkString(" ")
    val epochCase = epochs.toSeq.sortBy(_._1)
      .map { case (s, e) => s"WHEN '$s' THEN $e" }.mkString(" ")
    s"""${qcCtes(p, corpus)},
       |${p}nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM ${p}tk),
       |${p}qc AS (SELECT ${p}qm.doc_id, ${p}qm.score_micro, ${p}nt.n_toks,
       |    ${p}nt.n_toks > 0
       |      AND ${p}qm.score_micro > $RecipeMeanMicro * ${p}ng.n_grams
       |      AS quality_ok
       |  FROM ${p}qm JOIN ${p}nt ON ${p}qm.doc_id = ${p}nt.doc_id
       |    JOIN ${p}ng ON ${p}qm.doc_id = ${p}ng.doc_id),
       |${p}sp AS (SELECT doc_id,
       |    CASE WHEN ('0x' || substr(md5(concat_ws(':',
       |        md5(${TextQueries.normSql}), '7')), 1, 4))::INTEGER
       |        % 1000 < 300
       |      THEN 'test' ELSE 'train' END AS split FROM $corpus),
       |${p}b0 AS (SELECT d.doc_id, d.source, ${p}qc.n_toks, ${p}qc.score_micro,
       |    ${p}qc.quality_ok, ${p}sp.split
       |  FROM $corpus d JOIN ${p}qc ON d.doc_id = ${p}qc.doc_id
       |    JOIN ${p}sp ON d.doc_id = ${p}sp.doc_id),
       |${p}bw AS (SELECT doc_id, source, n_toks,
       |    CAST(sum(n_toks) OVER (PARTITION BY source
       |      ORDER BY CAST(round(CAST(score_micro AS DOUBLE) * 1000000.0)
       |        AS BIGINT) DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM ${p}b0 WHERE quality_ok AND split = 'train'),
       |${p}bk AS (SELECT doc_id,
       |    CASE source $budgetCase ELSE TRUE END AS bkept
       |  FROM ${p}bw),
       |${p}sv AS (SELECT ${p}b0.doc_id, ${p}b0.source, ${p}b0.n_toks FROM ${p}b0
       |  JOIN ${p}bk ON ${p}b0.doc_id = ${p}bk.doc_id WHERE ${p}bk.bkept),
       |${p}e AS (SELECT doc_id, source, n_toks,
       |    CASE source $epochCase ELSE NULL END AS ep FROM ${p}sv),
       |${p}rn AS (SELECT doc_id, source, n_toks,
       |    CASE WHEN ep IS NULL THEN 1
       |      ELSE CAST(floor(ep) AS BIGINT)
       |        + CASE WHEN ep - floor(ep) > 0.0
       |            AND substr(md5(CAST(doc_id AS VARCHAR) || ':' || '42'),
       |                1, 15)
       |              < lpad(lower(to_hex(CAST(floor((ep - floor(ep))
       |                  * 1152921504606846976.0) AS BIGINT))), 15, '0')
       |          THEN 1 ELSE 0 END
       |    END AS nrep FROM ${p}e),
       |${p}r AS (SELECT doc_id, source, n_toks,
       |    CAST(unnest(range(0, nrep)) AS BIGINT) AS repeat_idx
       |  FROM ${p}rn WHERE nrep > 0),
       |${p}pc AS (SELECT doc_id, source, repeat_idx,
       |    least(n_toks, 256) AS pack_tokens,
       |    sum(least(n_toks, 256)) OVER (PARTITION BY source
       |      ORDER BY doc_id, repeat_idx) AS cum FROM ${p}r),
       |${p}pk AS (SELECT doc_id, repeat_idx,
       |    CAST(floor((cum - pack_tokens) / 256.0) AS BIGINT) AS pack_id,
       |    pack_tokens FROM ${p}pc),
       |${p}rv AS (SELECT ${p}b0.doc_id, ${p}b0.source, ${p}b0.n_toks,
       |    ${p}b0.score_micro, ${p}b0.quality_ok, ${p}b0.split,
       |    coalesce(${p}bk.bkept, FALSE) AS budget_kept,
       |    ${p}pk.repeat_idx, ${p}pk.pack_id, ${p}pk.pack_tokens,
       |    ${p}pk.repeat_idx IS NOT NULL AS kept
       |  FROM ${p}b0 LEFT JOIN ${p}bk ON ${p}b0.doc_id = ${p}bk.doc_id
       |    LEFT JOIN ${p}pk ON ${p}b0.doc_id = ${p}pk.doc_id)""".stripMargin
  }

  private def bm25TopkSql: String =
    s"""WITH $bm25Ctes,
       |rk AS (SELECT q_id, doc_id, score_micro,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY score_micro DESC, doc_id) AS rank FROM bm)
       |SELECT q_id, doc_id, score_micro, rank FROM rk WHERE rank <= $TopK""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_bm25_scores" ->
      s"""WITH $bm25Ctes
         |SELECT q_id, doc_id, score_micro FROM bm""".stripMargin,

    "q_bm25_topk" -> bm25TopkSql,

    // the build-half + append-half probe must equal the one-shot ranking
    "q_bm25_index" -> bm25TopkSql,

    // the standing-index probe must ALSO equal the one-shot ranking —
    // probe ≡ topk (same scorer), whatever layout serves the postings
    "q_bm25_probe" -> bm25TopkSql,

    "q_dsir_weights" ->
      s"""WITH $dsirCtes
         |SELECT doc_id, weight_micro FROM wm""".stripMargin,

    "q_quality_classifier" ->
      s"""WITH ${qcCtes("", "documents")},
         |nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM tk)
         |SELECT qm.doc_id, qm.score_micro, ng.n_grams,
         |  nt.n_toks > 0 AND qm.score_micro > 0 AS quality_pred
         |FROM qm JOIN ng ON qm.doc_id = ng.doc_id
         |  JOIN nt ON qm.doc_id = nt.doc_id""".stripMargin,

    // RRF hybrid fusion: bm25Ctes' top-5 (rk) unioned with the exact
    // cosine top-5 of the same qd workload, 1e6/(60+rank) integer
    // contributions summed per (q, doc), re-ranked deterministically
    "q_rrf_fusion" ->
      s"""WITH $bm25Ctes,
         |rk AS (SELECT q_id, doc_id, score_micro,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY score_micro DESC, doc_id) AS rank FROM bm),
         |lex AS (SELECT q_id, doc_id, rank FROM rk WHERE rank <= $TopK),
         |ev AS (SELECT vec_id AS id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
         |      sqrt(list_sum(list_transform(embedding,
         |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
         |  FROM embeddings),
         |scored AS (SELECT q.id AS q_id, c.id AS doc_id,
         |    round(list_sum(list_transform(list_zip(c.nv, q.nv),
         |      p -> p[1] * p[2])), 6) AS cosine
         |  FROM ev c JOIN ev q ON q.id IN (SELECT q_id FROM qd)
         |    AND q.id <> c.id),
         |sem AS (SELECT q_id, doc_id, rank FROM (
         |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY cosine DESC, doc_id ASC) AS rank FROM scored)
         |  WHERE rank <= $TopK),
         |uni AS (SELECT q_id, doc_id,
         |    CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS contrib
         |  FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)),
         |fus AS (SELECT q_id, doc_id,
         |    CAST(sum(contrib) AS BIGINT) AS rrf_micro
         |  FROM uni GROUP BY q_id, doc_id)
         |SELECT q_id, doc_id, rrf_micro, rank FROM (
         |  SELECT q_id, doc_id, rrf_micro, row_number() OVER (
         |    PARTITION BY q_id ORDER BY rrf_micro DESC, doc_id) AS rank
         |  FROM fus) WHERE rank <= $TopK""".stripMargin,

    // indexed hybrid fusion: lexical leg = the bm25 ranking (probe ≡ topk
    // is pinned), semantic leg = the md5-derived 16x4 LSH bucket
    // candidates of the SAME qd workload (AnnIndex.probe semantics —
    // candidates share a (tbl, bkt), self-hits excluded), fused with the
    // identical integer RRF tail as q_rrf_fusion
    "q_rrf_fusion_index" -> rrfIndexSql,

    // the standing twin pays the probes only; ranking identical
    "q_rrf_probe" -> rrfIndexSql,

    // retrieval eval: truth = each query's own doc; DCG base-2 log written
    // as ln(x)/ln(2.0) — the exact expression Spark's Logarithm evaluates
    // (DuckDB's log2 builtin is std::log2, a DIFFERENT libm call)
    "q_retrieval_eval" ->
      s"""WITH $bm25Ctes,
         |rk AS (SELECT q_id, doc_id, score_micro,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY score_micro DESC, doc_id) AS rank FROM bm),
         |top AS (SELECT q_id, doc_id, rank FROM rk WHERE rank <= $TopK),
         |rel AS (SELECT q_id, q_id AS doc_id FROM (SELECT DISTINCT q_id FROM qd)),
         |nrel AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_rel
         |  FROM rel GROUP BY q_id),
         |h AS (SELECT t.q_id, t.rank FROM top t
         |  JOIN rel r ON t.q_id = r.q_id AND t.doc_id = r.doc_id),
         |pq AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_hits,
         |    min(rank) AS best_rank,
         |    CAST(sum(CAST(round(1000000.0 / (ln(CAST(rank AS DOUBLE) + 1.0)
         |      / ln(2.0))) AS BIGINT)) AS BIGINT) AS dcg_micro
         |  FROM h GROUP BY q_id)
         |SELECT n.q_id, n.n_rel,
         |  CAST(coalesce(p.n_hits, 0) AS BIGINT) AS n_hits,
         |  CAST(round((CAST(coalesce(p.n_hits, 0) AS DOUBLE) * 1000000.0)
         |    / CAST(n.n_rel AS DOUBLE)) AS BIGINT) AS recall_micro,
         |  CAST(coalesce(CAST(round(1000000.0 / CAST(p.best_rank AS DOUBLE))
         |    AS BIGINT), 0) AS BIGINT) AS mrr_micro,
         |  CAST(coalesce(p.dcg_micro, 0) AS BIGINT) AS dcg_micro
         |FROM nrel n LEFT JOIN pq p USING (q_id)""".stripMargin,

    // KL diagnostic: the resample CTEs give the selected ids; a full
    // B-bucket spine (absent buckets still carry 0.5 smoothing mass) feeds
    // per-bucket pt*ln(pt/p) terms rounded on the *1e12 product — exactly
    // klDiagnostic's arithmetic shape
    "q_dsir_kl" ->
      s"""WITH $dsirCtes,
         |ky AS (SELECT doc_id, weight_micro,
         |    weight_micro + CAST(round(-ln(-ln(
         |      ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |        + 0.5) / 1152921504606846976.0))) * 1000000) AS BIGINT)
         |      AS key_micro FROM wm),
         |rk AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY key_micro DESC, doc_id) AS rank FROM ky),
         |sel AS (SELECT doc_id FROM rk WHERE rank <= $DsirKlK),
         |sb AS (SELECT b FROM db WHERE doc_id IN (SELECT doc_id FROM sel)),
         |cs AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM sb GROUP BY b),
         |tots AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM sb) AS ns),
         |spine AS (SELECT unnest(range(0, $DsirBuckets)) AS b),
         |terms AS (SELECT
         |    (CAST(coalesce(ct.c, 0) AS DOUBLE) + 0.5)
         |      / (CAST(tot.nt AS DOUBLE) + 0.5 * $DsirBuckets) AS pt,
         |    (CAST(coalesce(cr.c, 0) AS DOUBLE) + 0.5)
         |      / (CAST(tot.nr AS DOUBLE) + 0.5 * $DsirBuckets) AS pr,
         |    (CAST(coalesce(cs.c, 0) AS DOUBLE) + 0.5)
         |      / (CAST(tots.ns AS DOUBLE) + 0.5 * $DsirBuckets) AS ps
         |  FROM spine s LEFT JOIN ct ON s.b = ct.b
         |  LEFT JOIN cr ON s.b = cr.b LEFT JOIN cs ON s.b = cs.b
         |  CROSS JOIN tot CROSS JOIN tots),
         |kl AS (SELECT
         |    CAST(sum(CAST(round((pt * ln(pt / pr)) * 1000000000000.0)
         |      AS BIGINT)) AS BIGINT) AS kraw,
         |    CAST(sum(CAST(round((pt * ln(pt / ps)) * 1000000000000.0)
         |      AS BIGINT)) AS BIGINT) AS ksel
         |  FROM terms)
         |SELECT 'raw' AS which, kraw AS kl_pico FROM kl
         |UNION ALL SELECT 'selected' AS which, ksel AS kl_pico FROM kl""".stripMargin,

    // mirrors Classify.fitCentroids/classify bit for bit: the k-means
    // recenter/assign discipline (round-6 mean coordinates, round-6
    // L2-NORMALIZED centroid, round-6 L2 assignment with cid tie-break,
    // round-6 true cosine) over GIVEN labels
    "q_classify_centroid" ->
      s"""WITH v AS (SELECT vec_id AS id, CAST(label AS VARCHAR) AS lab,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
         |      sqrt(list_sum(list_transform(embedding,
         |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |centm AS (SELECT lab, list_transform(range(1, len(vs[1]) + 1),
         |      i -> round(list_sum(list_transform(vs, e -> e[i])) / len(vs), 6)) AS mv
         |  FROM (SELECT lab, list(nv) AS vs FROM v WHERE id % 5 = 0 GROUP BY lab)),
         |cent AS (SELECT lab, list_transform(mv, x -> round(x /
         |      (CASE WHEN sqrt(list_sum(list_transform(mv, y -> y * y))) < 1e-12
         |        THEN 1.0
         |        ELSE sqrt(list_sum(list_transform(mv, y -> y * y))) END), 6)) AS cv
         |  FROM centm),
         |cidt AS (SELECT lab, cv,
         |    row_number() OVER (ORDER BY lab) - 1 AS cid FROM cent),
         |asg AS (SELECT id, lab AS label_pred, cv, nv FROM (
         |    SELECT v.id, c.lab, c.cv, v.nv, row_number() OVER (PARTITION BY v.id
         |      ORDER BY round(list_sum(list_transform(list_zip(v.nv, c.cv),
         |        p -> (p[1] - p[2]) * (p[1] - p[2]))), 6), c.cid) AS rn
         |    FROM v CROSS JOIN cidt c) WHERE rn = 1)
         |SELECT id, label_pred,
         |  round(list_sum(list_transform(list_zip(nv, cv), p -> p[1] * p[2])), 6) AS cosine
         |FROM asg""".stripMargin,

    // recipe composition: qcCtes' classifier verdict, the leakage-split
    // bucket predicate (seed 7, 30%), the per-source budget window
    // (priority = classifier score), the epoch threshold (seed 42), and
    // the 256-token pack window in (doc, repeat) composite order — each
    // CTE the same replay its standalone oracle uses
    "q_recipe_full" ->
      s"""WITH ${recipeChainCtes("", "documents")}
         |SELECT doc_id, source, n_toks, score_micro, quality_ok, split,
         |  budget_kept, repeat_idx, pack_id, pack_tokens, kept
         |FROM rv""".stripMargin,

    // the same recipe chain over STRING doc ids ('d' || id — URLs/UUIDs
    // in production): every stage keys, orders, and hashes on the varchar
    // directly (bytewise order both engines; md5 thresholds on the raw
    // string), no dense-id pre-mapping anywhere
    "q_recipe_string_ids" ->
      s"""WITH docs_s AS (SELECT 'd' || CAST(doc_id AS VARCHAR) AS doc_id,
         |    source, text FROM documents),
         |${recipeChainCtes("", "docs_s")}
         |SELECT doc_id, source, n_toks, score_micro, quality_ok, split,
         |  budget_kept, repeat_idx, pack_id, pack_tokens, kept
         |FROM rv""".stripMargin,

    "q_dsir_resample" ->
      s"""WITH $dsirCtes,
         |ky AS (SELECT doc_id, weight_micro,
         |    weight_micro + CAST(round(-ln(-ln(
         |      ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |        + 0.5) / 1152921504606846976.0))) * 1000000) AS BIGINT)
         |      AS key_micro FROM wm),
         |rk AS (SELECT doc_id, weight_micro, key_micro,
         |    row_number() OVER (ORDER BY key_micro DESC, doc_id) AS rank FROM ky)
         |SELECT doc_id, weight_micro, key_micro, rank FROM rk
         |WHERE rank <= $DsirK""".stripMargin
  )
}
