package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Kernel
import graft.operators.{Mix, NgramLm}

/** LM-perplexity quality scoring + temperature source mixing, each mirrored
  * exactly in DuckDB. The knobs of the registered queries are chosen so the
  * bounds BIND on the fixture (vocabSize 20 < the corpus's 31 distinct
  * tokens -> real OOV traffic; maxBigrams 300 < the ~400 in-vocab pairs ->
  * the top-M cut is exercised, not decorative).
  */
object LmQueries {

  private def t(s: SparkSession, dir: String, n: String) = Kernel.table(s, dir, n)

  private val VocabSize = 20
  private val MinCount = 2L
  private val MaxBigrams = 300

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
    "q_mix_sources" -> ((s, dir) =>
      Mix.temperatureFlag(t(s, dir, "documents"), "source", Seq("doc_id"),
          temperature = 2.0, targetFrac = 0.5, seed = 42L)
        .select(col("doc_id"), col("source"), col("rate"), col("sampled")))
  )

  private val normSql = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
  private val toksSql = s"list_filter(string_split($normSql, ' '), x -> len(x) > 0)"

  private val lmScoreSql =
    s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |u AS (SELECT unnest(toks) AS w FROM tk),
       |uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY w),
       |tot AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n FROM uc),
       |voc AS (SELECT w, c FROM uc ORDER BY c DESC, w LIMIT $VocabSize),
       |vn AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
       |pr AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
       |    i -> struct_pack(pos := i, w := toks[i],
       |      prev := CASE WHEN i = 1 THEN NULL ELSE toks[i - 1] END))) AS p
       |  FROM tk),
       |pe AS (SELECT doc_id, p.pos AS pos, p.w AS w, p.prev AS prev FROM pr),
       |bg AS (SELECT prev, w, CAST(count(*) AS BIGINT) AS c2 FROM pe
       |  WHERE prev IS NOT NULL
       |    AND prev IN (SELECT w FROM voc) AND w IN (SELECT w FROM voc)
       |  GROUP BY prev, w HAVING count(*) >= $MinCount
       |  ORDER BY c2 DESC, prev, w LIMIT $MaxBigrams),
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
       |m AS (SELECT doc_id, n_tokens,
       |    round(CAST(-(slp) * 1000000 AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS avgm,
       |    round(CAST(noov * 1000000 AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS oovm
       |  FROM ag)
       |SELECT d.doc_id, coalesce(m.n_tokens, 0) AS n_tokens,
       |  m.oovm / 1000000.0 AS oov_frac,
       |  m.avgm / 1000000.0 AS avg_nll,
       |  round(exp(m.avgm / 1000000.0), 6) AS ppl
       |FROM (SELECT doc_id FROM documents) d LEFT JOIN m USING (doc_id)""".stripMargin

  private val mixSourcesSql =
    s"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY source),
       |t AS (SELECT source, n_docs,
       |    CAST(round(sqrt(CAST(n_docs AS DOUBLE)), 6) AS DECIMAL(28,6)) AS srt
       |  FROM c),
       |s AS (SELECT *, sum(srt) OVER () AS ssum,
       |    CAST(sum(n_docs) OVER () AS BIGINT) AS total FROM t),
       |r AS (SELECT source,
       |    round(least(1.0, (CAST(srt AS DOUBLE) / CAST(ssum AS DOUBLE))
       |      * (CAST(total AS DOUBLE) * 0.5) / CAST(n_docs AS DOUBLE)), 6) AS rate
       |  FROM s),
       |th AS (SELECT source, rate,
       |    CASE WHEN rate >= 1.0 THEN 'g'
       |      ELSE lpad(lower(to_hex(CAST(floor(rate * 1152921504606846976.0) AS BIGINT))), 15, '0')
       |    END AS thr
       |  FROM r)
       |SELECT d.doc_id, d.source, th.rate,
       |  substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || '42'), 1, 15) < th.thr AS sampled
       |FROM documents d JOIN th USING (source)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_lm_score" -> lmScoreSql,
    "q_mix_sources" -> mixSourcesSql
  )
}
