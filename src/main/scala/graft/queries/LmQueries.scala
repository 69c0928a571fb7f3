package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Kernel
import graft.operators.{Curation, Mix, NgramLm}

/** LM-perplexity quality scoring, temperature source mixing, and the FULL
  * curation sweep (gates + dedup + decontamination + LM gate + mixing),
  * each mirrored exactly in DuckDB. The knobs of the registered queries are
  * chosen so the bounds BIND on the fixture (vocabSize 20 < the corpus's 31
  * distinct tokens -> real OOV traffic; maxBigrams 300 < the ~400 in-vocab
  * pairs -> the top-M cut is exercised, not decorative).
  */
object LmQueries {

  private def t(s: SparkSession, dir: String, n: String) = Kernel.table(s, dir, n)

  private val VocabSize = 20
  private val MinCount = 2L
  private val MaxBigrams = 300
  private val LmMaxNll = 7.0

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // self-scored LM perplexity: fit bounded unigram/bigram tables on the
    // corpus, stupid-backoff score every doc — decimal-exact log-prob sums
    "q_lm_score" -> ((s, dir) =>
      NgramLm.fitScore(t(s, dir, "documents"), "text", Seq("doc_id"),
          vocabSize = VocabSize, minCount = MinCount, maxBigrams = MaxBigrams)
        .select(col("doc_id"), col("n_tokens"), col("oov_frac"),
          col("avg_nll"), col("ppl"))),

    // temperature mixing audit: every doc + its source's sampling rate and
    // the deterministic md5-threshold verdict (T=2 flattens toward uniform,
    // targetFrac=0.5 halves the corpus)
    "q_mix_tokens" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("n_toks",
        size(graft.functions.Text.tokens(col("text")))
          .cast(org.apache.spark.sql.types.LongType))
      Mix.temperatureFlagBy(docs, "source", sum(col("n_toks")),
          Seq("doc_id"), temperature = 2.0, targetFrac = 0.5)
        .select(col("doc_id"), col("source"), col("rate"), col("sampled"))
    }),

    "q_mix_sources" -> ((s, dir) =>
      Mix.temperatureFlag(t(s, dir, "documents"), "source", Seq("doc_id"),
          temperature = 2.0, targetFrac = 0.5, seed = 42L)
        .select(col("doc_id"), col("source"), col("rate"), col("sampled"))),

    // the TRUE CCNet contract: fit the reference LM on a trusted slice
    // (doc_id % 3 == 0 plays "wikipedia"), score the WHOLE corpus against
    // it — self-scoring is the degenerate case of this
    "q_lm_cross" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val m = NgramLm.fit(docs.filter(col("doc_id") % 3 === 0), "text",
        vocabSize = VocabSize, minCount = MinCount, maxBigrams = MaxBigrams)
      NgramLm.score(m, docs, "text", Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("oov_frac"),
          col("avg_nll"), col("ppl"))
    }),

    // the persisted-model path: fit once -> write external parquet + table
    // properties -> read back -> score. MUST hash-match q_lm_score exactly
    // (shared oracle), proving the round-trip loses nothing
    "q_lm_score_index" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // ONE fixed layout dir, cleared before each build: repeated bench /
      // warmup invocations overwrite instead of accumulating orphaned temp
      // dirs (the model tables are lazily read at score time, so the dir
      // must outlive this builder — a per-call temp dir can never be
      // reclaimed from here)
      val path = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_lm_index_q").toString
      val root = new java.io.File(path)
      def wipe(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(wipe)
        f.delete(); ()
      }
      if (root.exists()) wipe(root)
      NgramLm.write(NgramLm.fit(docs, "text", vocabSize = VocabSize,
        minCount = MinCount, maxBigrams = MaxBigrams), "graft_lm_q", path)
      NgramLm.score(NgramLm.read(s, "graft_lm_q"), docs, "text", Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("oov_frac"),
          col("avg_nll"), col("ppl"))
    }),

    // the FULL sweep: q_curation's four stages + LM-perplexity gate +
    // temperature mixing over survivors, composed as ONE plan with
    // per-stage verdicts — every stage is separately hash-verified
    // elsewhere, this row proves the six-stage composition
    "q_curation_full" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.sweepFull(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 17 === 0),
        "text", "doc_id", "source", decontaminateN = 4,
        lmVocabSize = VocabSize, lmMinCount = MinCount,
        lmMaxBigrams = MaxBigrams, lmMaxNll = LmMaxNll,
        mixTemperature = 2.0, mixTargetFrac = 0.5, seed = 42L)
    }),

    // the ELEVEN-STAGE end-to-end: q_curation_full's six cleaning gates
    // feeding q_recipe_full's five selection stages as ONE plan — the
    // full raw-crawl -> training-packs path with every stage verdict
    // surviving to the output (previously proven only piecewise)
    "q_pipeline_full" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Recipe.pipelineFull(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 17 === 0),
        "text", "doc_id", "source",
        budgets = RetrievalQueries.PipelineBudgets,
        epochs = RetrievalQueries.RecipeEpochs,
        decontaminateN = 4, lmVocabSize = VocabSize, lmMinCount = MinCount,
        lmMaxBigrams = MaxBigrams, lmMaxNll = LmMaxNll,
        minMeanMicro = RetrievalQueries.RecipeMeanMicro)
    })
  )

  private val toksSql = TextQueries.toksSql

  /** The LM fit+score CTE chain: requires CTEs `fitTk(doc_id, toks)` (the
    * model's reference corpus) and `scoreTk(doc_id, toks)` (the corpus
    * being scored — the same relation for self-scoring); ends with
    * `lmm(doc_id, n_tokens, avgm, oovm)` — docs with no tokens are absent
    * (callers LEFT JOIN). Mirrors NgramLm.fit/score exactly: top-V vocab
    * (count desc, token asc), top-M bigrams (count desc, prev, w) with
    * minCount over the FIT corpus, stupid backoff over the scored one,
    * round6 log-probs summed as DECIMAL(28,6), micro-space final rounding.
    */
  private def lmCtes(fitTk: String, scoreTk: String): String =
    s"""u AS (SELECT unnest(toks) AS w FROM $fitTk),
       |uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY w),
       |tot AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n FROM uc),
       |voc AS (SELECT w, c FROM uc ORDER BY c DESC, w LIMIT $VocabSize),
       |vn AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
       |prf AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
       |    i -> struct_pack(pos := i, w := toks[i],
       |      prev := CASE WHEN i = 1 THEN NULL ELSE toks[i - 1] END))) AS p
       |  FROM $fitTk),
       |pef AS (SELECT doc_id, p.pos AS pos, p.w AS w, p.prev AS prev FROM prf),
       |bg AS (SELECT prev, w, CAST(count(*) AS BIGINT) AS c2 FROM pef
       |  WHERE prev IS NOT NULL
       |    AND prev IN (SELECT w FROM voc) AND w IN (SELECT w FROM voc)
       |  GROUP BY prev, w HAVING count(*) >= $MinCount
       |  ORDER BY c2 DESC, prev, w LIMIT $MaxBigrams),
       |pr AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
       |    i -> struct_pack(pos := i, w := toks[i],
       |      prev := CASE WHEN i = 1 THEN NULL ELSE toks[i - 1] END))) AS p
       |  FROM $scoreTk),
       |pe AS (SELECT doc_id, p.pos AS pos, p.w AS w, p.prev AS prev FROM pr),
       |sc AS (SELECT pe.doc_id,
       |    CASE WHEN pe.prev IS NOT NULL AND b.c2 IS NOT NULL
       |           THEN round(ln(CAST(b.c2 AS DOUBLE) / CAST(pv.c AS DOUBLE)), 6)
       |         WHEN pe.prev IS NULL
       |           THEN round(ln((CAST(coalesce(vw.c, 0) + 1 AS DOUBLE))
       |             / CAST(n + v + 1 AS DOUBLE)), 6)
       |         ELSE round(ln(0.4 * ((CAST(coalesce(vw.c, 0) + 1 AS DOUBLE))
       |             / CAST(n + v + 1 AS DOUBLE))), 6) END AS lp,
       |    CASE WHEN vw.c IS NULL THEN 1 ELSE 0 END AS oov
       |  FROM pe
       |  LEFT JOIN voc vw ON pe.w = vw.w
       |  LEFT JOIN voc pv ON pe.prev = pv.w
       |  LEFT JOIN bg b ON pe.prev = b.prev AND pe.w = b.w
       |  CROSS JOIN tot CROSS JOIN vn),
       |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    sum(CAST(lp AS DECIMAL(28,6))) AS slp,
       |    CAST(sum(oov) AS BIGINT) AS noov
       |  FROM sc GROUP BY doc_id),
       |lmm AS (SELECT doc_id, n_tokens,
       |    round(CAST(-(slp) * 1000000 AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS avgm,
       |    round(CAST(noov * 1000000 AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS oovm
       |  FROM ag)""".stripMargin

  /** Temperature-mixing rate CTEs: requires `mixc(source, n_docs)`; ends
    * with `mixth(source, rate, thr)`. Mirrors Mix.temperatureRates at T=2
    * (sqrt path) + the column-expression hexThreshold15.
    */
  private def mixRateCtes(targetFrac: String): String =
    s"""mixt AS (SELECT source, n_docs,
       |    CAST(round(sqrt(CAST(n_docs AS DOUBLE)), 6) AS DECIMAL(28,6)) AS srt
       |  FROM mixc),
       |mixs AS (SELECT *, sum(srt) OVER () AS ssum,
       |    CAST(sum(n_docs) OVER () AS BIGINT) AS total FROM mixt),
       |mixr AS (SELECT source,
       |    round(least(1.0, (CAST(srt AS DOUBLE) / CAST(ssum AS DOUBLE))
       |      * (CAST(total AS DOUBLE) * $targetFrac) / CAST(n_docs AS DOUBLE)), 6) AS rate
       |  FROM mixs),
       |mixth AS (SELECT source, rate,
       |    CASE WHEN rate >= 1.0 THEN 'g'
       |      ELSE lpad(lower(to_hex(CAST(floor(rate * 1152921504606846976.0) AS BIGINT))), 15, '0')
       |    END AS thr
       |  FROM mixr)""".stripMargin

  private val lmScoreSql =
    s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |${lmCtes("tk", "tk")}
       |SELECT d.doc_id, coalesce(m.n_tokens, 0) AS n_tokens,
       |  m.oovm / 1000000.0 AS oov_frac,
       |  m.avgm / 1000000.0 AS avg_nll,
       |  round(exp(m.avgm / 1000000.0), 6) AS ppl
       |FROM (SELECT doc_id FROM documents) d LEFT JOIN lmm m USING (doc_id)""".stripMargin

  private val mixTokensSql =
    s"""WITH tk AS (SELECT doc_id, source, len($toksSql) AS n FROM documents),
       |mixc AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs
       |  FROM tk GROUP BY source),
       |${mixRateCtes("0.5")}
       |SELECT d.doc_id, d.source, th.rate,
       |  substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || '42'), 1, 15) < th.thr AS sampled
       |FROM documents d JOIN mixth th ON d.source IS NOT DISTINCT FROM th.source""".stripMargin

  private val mixSourcesSql =
    s"""WITH mixc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY source),
       |${mixRateCtes("0.5")}
       |SELECT d.doc_id, d.source, th.rate,
       |  substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || '42'), 1, 15) < th.thr AS sampled
       |FROM documents d JOIN mixth th ON d.source IS NOT DISTINCT FROM th.source""".stripMargin

  /** The six-stage curation CTE chain over `tr` (docs with doc_id % 17
    * != 0; the %17 == 0 slice plays the decontamination benchmark) —
    * everything up to the per-doc `mix` verdict; shared by
    * q_curation_full and the eleven-stage q_pipeline_full.
    */
  private[queries] val curationChainCtes =
    s"""tr AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 17 <> 0),
       |tk AS (SELECT doc_id, $toksSql AS toks FROM tr),
       |${TextQueries.curationVerdictCtes()},
       |${lmCtes("tk", "tk")},
       |basev AS (SELECT qual.doc_id AS doc_id, qual.quality_ok, rep.repetition_ok,
       |    coalesce(lmm.avgm / 1000000.0 <= $LmMaxNll, false) AS lm_ok,
       |    lmm.avgm / 1000000.0 AS avg_nll,
       |    coalesce(fp.doc_id = k.keeper, false) AS exact_unique,
       |    cont.contaminated,
       |    (qual.quality_ok AND rep.repetition_ok
       |     AND coalesce(fp.doc_id = k.keeper, false)
       |     AND NOT cont.contaminated
       |     AND coalesce(lmm.avgm / 1000000.0 <= $LmMaxNll, false)) AS curated
       |  FROM qual JOIN rep USING (doc_id) JOIN fp USING (doc_id)
       |    JOIN cont USING (doc_id)
       |    LEFT JOIN keep k ON fp.fp = k.fp
       |    LEFT JOIN lmm USING (doc_id)),
       |mixc AS (SELECT tr.source AS source, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM basev JOIN tr USING (doc_id) WHERE basev.curated GROUP BY tr.source),
       |${mixRateCtes("0.5")},
       |mix AS (SELECT basev.doc_id AS doc_id, mixth.rate,
       |    substr(md5(CAST(basev.doc_id AS VARCHAR) || ':' || '42'), 1, 15) < mixth.thr AS sampled
       |  FROM basev JOIN tr USING (doc_id) JOIN mixth ON tr.source IS NOT DISTINCT FROM mixth.source
       |  WHERE basev.curated)""".stripMargin

  private val curationFullSql =
    s"""WITH $curationChainCtes
       |SELECT basev.doc_id, tr.source, basev.quality_ok, basev.repetition_ok,
       |  basev.lm_ok, basev.exact_unique, basev.contaminated, basev.avg_nll,
       |  mix.rate, coalesce(mix.sampled, false) AS mix_sampled,
       |  (basev.curated AND coalesce(mix.sampled, false)) AS kept
       |FROM basev JOIN tr USING (doc_id) LEFT JOIN mix USING (doc_id)""".stripMargin

  /** The eleven-stage replay: the curation chain's sweep verdict (sw),
    * its survivors (surv), then the full recipe chain — prefixed `r_` so
    * both chains share one WITH clause — LEFT JOINed back so sweep-dropped
    * docs carry null recipe columns.
    */
  private val pipelineFullSql =
    s"""WITH $curationChainCtes,
       |sw AS (SELECT basev.doc_id, tr.source, basev.quality_ok,
       |    basev.repetition_ok, basev.lm_ok, basev.exact_unique,
       |    basev.contaminated, basev.avg_nll, mix.rate,
       |    coalesce(mix.sampled, false) AS mix_sampled,
       |    (basev.curated AND coalesce(mix.sampled, false)) AS sweep_kept
       |  FROM basev JOIN tr USING (doc_id) LEFT JOIN mix USING (doc_id)),
       |surv AS (SELECT tr.doc_id, tr.source, tr.text
       |  FROM tr JOIN sw USING (doc_id) WHERE sw.sweep_kept),
       |${RetrievalQueries.recipeChainCtes("r_", "surv",
         RetrievalQueries.PipelineBudgets, RetrievalQueries.RecipeEpochs)}
       |SELECT sw.doc_id, sw.source, sw.quality_ok, sw.repetition_ok,
       |  sw.lm_ok, sw.exact_unique, sw.contaminated, sw.avg_nll, sw.rate,
       |  sw.mix_sampled, sw.sweep_kept,
       |  r_rv.n_toks, r_rv.score_micro, r_rv.quality_ok AS clf_ok,
       |  r_rv.split, r_rv.budget_kept, r_rv.repeat_idx, r_rv.pack_id,
       |  r_rv.pack_tokens,
       |  r_rv.repeat_idx IS NOT NULL AS kept
       |FROM sw LEFT JOIN r_rv ON sw.doc_id = r_rv.doc_id""".stripMargin

  private val lmCrossSql =
    s"""WITH tka AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |tkf AS (SELECT doc_id, toks FROM tka WHERE doc_id % 3 = 0),
       |${lmCtes("tkf", "tka")}
       |SELECT d.doc_id, coalesce(m.n_tokens, 0) AS n_tokens,
       |  m.oovm / 1000000.0 AS oov_frac,
       |  m.avgm / 1000000.0 AS avg_nll,
       |  round(exp(m.avgm / 1000000.0), 6) AS ppl
       |FROM (SELECT doc_id FROM documents) d LEFT JOIN lmm m USING (doc_id)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_lm_score" -> lmScoreSql,
    "q_lm_score_index" -> lmScoreSql,
    "q_lm_cross" -> lmCrossSql,
    "q_mix_sources" -> mixSourcesSql,
    "q_mix_tokens" -> mixTokensSql,
    "q_curation_full" -> curationFullSql,
    "q_pipeline_full" -> pipelineFullSql
  )
}
