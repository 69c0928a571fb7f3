package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Kernel
import graft.operators.Bpe

/** BPE tokenizer training + encoding, mirrored in DuckDB by UNROLLING the
  * fit's merge iterations (the same trick as the k-means unrolled-Lloyd
  * oracle): iteration j is a (pairs -> argmax -> fold-merge) CTE triple
  * generated from one Scala loop, so the oracle and the engine cannot
  * drift on iteration count or tie-breaks. Knobs bind on the fixture:
  * maxWords 25 < the corpus's 31 distinct words (the cap is exercised,
  * and encoding still covers capped-out words — merges apply to ANY
  * word), 6 merges.
  */
object TokenizerQueries {

  private def t(s: SparkSession, dir: String, n: String) = Kernel.table(s, dir, n)

  private val NumMerges = 6
  private val MaxWords = 25

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the learned merge table itself — rank-ordered (left, right) rules
    // with the weighted pair count at selection time
    "q_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      val m = Bpe.fit(t(s, dir, "documents"), "text", NumMerges, MaxWords)
      m.merges.zipWithIndex.map { case ((l, r, c), i) => (i + 1, l, r, c) }
        .toDF("merge_rank", "merge_left", "merge_right", "pair_count")
    }),

    // the encoded corpus: per-doc subword count + an order-sensitive
    // fingerprint of the full subword stream (proves the greedy merge
    // application end to end, not just the counts)
    "q_bpe_tokens" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val m = Bpe.fit(docs, "text", NumMerges, MaxWords)
      Bpe.tokenize(docs, "text", Seq("doc_id"), m)
        .select(col("doc_id"),
          size(col("bpe_tokens")).cast("long").as("n_bpe_tokens"),
          md5(array_join(col("bpe_tokens"), " ")).as("subword_fp"))
    }),

    // the id-encoded corpus (r9): subwords mapped into the fitted
    // vocabulary (sorted alphabet of the capped word table, then merge
    // outputs in rank order, first occurrence wins; out-of-alphabet
    // symbols -1) — the oracle rebuilds the identical id space in SQL
    "q_bpe_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val m = Bpe.fit(docs, "text", NumMerges, MaxWords)
      Bpe.tokenizeIds(docs, "text", Seq("doc_id"), m)
        .select(col("doc_id"),
          size(col("token_ids")).cast("long").as("n_bpe_tokens"),
          md5(array_join(transform(col("token_ids"),
            x => x.cast("string")), " ")).as("ids_fp"))
    })
  )

  /** Greedy-merge fold under the one-row merge CTE's (ml, mr) columns —
    * the SQL mirror of graft.functions.BpeMerge.applyMerge.
    */
  private val foldSql =
    "list_reduce(list_transform(syms, s -> [s]), (acc, x) -> " +
      "CASE WHEN acc[-1] = ml AND x[1] = mr " +
      "THEN list_append(list_slice(acc, 1, len(acc) - 1), ml || mr) " +
      "ELSE list_append(acc, x[1]) END)"

  /** Fit CTE chain: requires `u(w)` (the corpus token stream); emits
    * w0..wK over the capped word table and b1..bK (ml, mr, c) merge picks.
    */
  private val fitCtes: String = {
    val sb = new StringBuilder
    sb ++=
      s"""w0 AS (SELECT word, cnt, regexp_extract_all(word, '.') AS syms FROM (
         |  SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt FROM u
         |  GROUP BY w ORDER BY cnt DESC, w LIMIT $MaxWords))""".stripMargin
    for (j <- 1 to NumMerges) {
      sb ++= ",\n"
      sb ++=
        s"""p$j AS (SELECT pr.l AS l, pr.r AS r, CAST(sum(cnt) AS BIGINT) AS c FROM (
           |  SELECT cnt, unnest(list_transform(range(1, len(syms)),
           |    i -> struct_pack(l := syms[i], r := syms[i + 1]))) AS pr
           |  FROM w${j - 1}) GROUP BY pr.l, pr.r),
           |b$j AS (SELECT l AS ml, r AS mr, c FROM p$j ORDER BY c DESC, l, r LIMIT 1),
           |w$j AS (SELECT word, cnt, $foldSql AS syms FROM w${j - 1} CROSS JOIN b$j)""".stripMargin
    }
    sb.toString
  }

  private val bpeMergesSql = {
    val rows = (1 to NumMerges).map(j =>
      s"SELECT CAST($j AS INT) AS merge_rank, ml AS merge_left, " +
        s"mr AS merge_right, c AS pair_count FROM b$j")
      .mkString("\n  UNION ALL ")
    s"""WITH tk AS (SELECT doc_id, ${TextQueries.toksSql} AS toks FROM documents),
       |u AS (SELECT unnest(toks) AS w FROM tk),
       |$fitCtes
       |$rows""".stripMargin
  }

  private val bpeTokensSql = {
    // encode EVERY distinct doc word (merges apply beyond the capped fit
    // table): e0..eK is the same fold chain over the doc vocabulary
    val encCtes = (1 to NumMerges).map(j =>
      s"e$j AS (SELECT word, $foldSql AS syms FROM e${j - 1} CROSS JOIN b$j)")
      .mkString(",\n")
    s"""WITH tk AS (SELECT doc_id, ${TextQueries.toksSql} AS toks FROM documents),
       |u AS (SELECT unnest(toks) AS w FROM tk),
       |$fitCtes,
       |dt AS (SELECT doc_id, pr.pos AS pos, pr.w AS w FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
       |    i -> struct_pack(pos := i, w := toks[i]))) AS pr FROM tk)),
       |dw AS (SELECT DISTINCT w AS word FROM dt),
       |e0 AS (SELECT word, regexp_extract_all(word, '.') AS syms FROM dw),
       |$encCtes,
       |ag AS (SELECT dt.doc_id AS doc_id,
       |    CAST(sum(len(e.syms)) AS BIGINT) AS n_bpe_tokens,
       |    md5(array_to_string(flatten(list(e.syms ORDER BY dt.pos)), ' ')) AS subword_fp
       |  FROM dt JOIN e$NumMerges e ON dt.w = e.word
       |  GROUP BY dt.doc_id)
       |SELECT d.doc_id, coalesce(ag.n_bpe_tokens, 0) AS n_bpe_tokens,
       |  CASE WHEN ag.doc_id IS NULL THEN md5('') ELSE ag.subword_fp END AS subword_fp
       |FROM (SELECT doc_id FROM documents) d LEFT JOIN ag USING (doc_id)""".stripMargin
  }

  private val bpeIdsSql = {
    val encCtes = (1 to NumMerges).map(j =>
      s"e$j AS (SELECT word, $foldSql AS syms FROM e${j - 1} CROSS JOIN b$j)")
      .mkString(",\n")
    val mergeEnts = (1 to NumMerges).map(j =>
      s"SELECT $j AS j, ml || mr AS s FROM b$j").mkString("\n  UNION ALL ")
    s"""WITH tk AS (SELECT doc_id, ${TextQueries.toksSql} AS toks FROM documents),
       |u AS (SELECT unnest(toks) AS w FROM tk),
       |$fitCtes,
       |dt AS (SELECT doc_id, pr.pos AS pos, pr.w AS w FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
       |    i -> struct_pack(pos := i, w := toks[i]))) AS pr FROM tk)),
       |dw AS (SELECT DISTINCT w AS word FROM dt),
       |e0 AS (SELECT word, regexp_extract_all(word, '.') AS syms FROM dw),
       |$encCtes,
       |al AS (SELECT DISTINCT unnest(regexp_extract_all(word, '.')) AS s FROM w0),
       |ae AS (SELECT s, row_number() OVER (ORDER BY s) - 1 AS seq FROM al),
       |acnt AS (SELECT count(*) AS a FROM ae),
       |me AS ($mergeEnts),
       |ent AS (SELECT s, seq FROM ae
       |  UNION ALL SELECT me.s, acnt.a + me.j - 1 FROM me, acnt),
       |vv AS (SELECT s, min(seq) AS seq FROM ent GROUP BY s),
       |vid AS (SELECT s,
       |    CAST(row_number() OVER (ORDER BY seq) - 1 AS INTEGER) AS id
       |  FROM vv),
       |sy AS (SELECT word, pr.i AS i, pr.s AS s FROM (
       |  SELECT word, unnest(list_transform(range(1, len(syms) + 1),
       |    i -> struct_pack(i := i, s := syms[i]))) AS pr FROM e$NumMerges)),
       |si AS (SELECT word, i, coalesce(vid.id, -1) AS id
       |  FROM sy LEFT JOIN vid ON sy.s = vid.s),
       |wi AS (SELECT word, list(CAST(id AS VARCHAR) ORDER BY i) AS idstrs
       |  FROM si GROUP BY word),
       |ag AS (SELECT dt.doc_id AS doc_id,
       |    CAST(sum(len(wi.idstrs)) AS BIGINT) AS n_bpe_tokens,
       |    md5(array_to_string(flatten(list(wi.idstrs ORDER BY dt.pos)), ' ')) AS ids_fp
       |  FROM dt JOIN wi ON dt.w = wi.word
       |  GROUP BY dt.doc_id)
       |SELECT d.doc_id, coalesce(ag.n_bpe_tokens, 0) AS n_bpe_tokens,
       |  CASE WHEN ag.doc_id IS NULL THEN md5('') ELSE ag.ids_fp END AS ids_fp
       |FROM (SELECT doc_id FROM documents) d LEFT JOIN ag USING (doc_id)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_bpe_merges" -> bpeMergesSql,
    "q_bpe_tokens" -> bpeTokensSql,
    "q_bpe_ids" -> bpeIdsSql
  )
}
