package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Kernel
import graft.operators.TextAnalysis

/** Text-analysis queries over `documents`, each mirrored exactly in DuckDB. */
object TextQueries {

  private def t(s: SparkSession, dir: String, n: String) = Kernel.table(s, dir, n)

  /** One definition of the registered packing configuration (ws-token
    * counts, 256-token budget, source shards) shared by q_pack and
    * q_pack_stats — the pair cannot drift.
    */
  private def packedDocs(s: SparkSession, dir: String) =
    graft.operators.Pack.sequences(
      t(s, dir, "documents").withColumn("n_toks",
        size(graft.functions.Text.tokens(col("text")))
          .cast(org.apache.spark.sql.types.LongType)),
      "n_toks", budget = 256L, groupCol = "source", idCol = "doc_id")

  private[queries] val normSql = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
  private[queries] val toksSql = s"list_filter(string_split($normSql, ' '), x -> len(x) > 0)"

  // n-token window fingerprints of the corpus CTE `tk(doc_id, toks)` —
  // the SQL twin of VecExprs.tokenWindowHashes
  private def windowHashCteSql(n: Int): String =
    s"""wd AS (SELECT doc_id, pr.pos AS pos, pr.h AS h FROM (
       |  SELECT doc_id, unnest(list_transform(range(0, greatest(len(toks) - ${n - 1}, 0)),
       |    i -> struct_pack(pos := i,
       |      h := md5(array_to_string(list_slice(toks, i + 1, i + $n), ' '))))) AS pr
       |  FROM tk))""".stripMargin

  // shared rebuild tail for the span-excision oracles: coverage union of
  // [pos, pos+n) over the removal CTE `rm(doc_id, pos)`, token-level
  // rebuild over `tk(doc_id, toks)` — string_agg of surviving tokens in
  // position order. ONE copy of this machinery so the rebuild rule (incl.
  // the null-text coalesce) cannot diverge between oracles.
  private def spanRebuildSql(n: Int): String =
    s"""cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + $n)) AS tokpos
       |  FROM rm),
       |tok AS (SELECT doc_id, pr.p AS p, pr.t AS t FROM (
       |  SELECT doc_id, unnest(list_transform(range(0, len(toks)),
       |    i -> struct_pack(p := i, t := toks[i + 1]))) AS pr FROM tk)),
       |fl AS (SELECT tok.doc_id AS doc_id, tok.p AS p, tok.t AS t,
       |    (cov.tokpos IS NOT NULL) AS rmv
       |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.tokpos),
       |rb AS (SELECT doc_id,
       |    CAST(sum(CASE WHEN rmv THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |    string_agg(CASE WHEN NOT rmv THEN t END, ' ' ORDER BY p) AS clean_text
       |  FROM fl GROUP BY doc_id)
       |SELECT tk.doc_id, CAST(len(tk.toks) AS BIGINT) AS n_tokens,
       |  coalesce(rb.n_removed, 0) AS n_removed,
       |  coalesce(rb.clean_text, '') AS clean_text
       |FROM tk LEFT JOIN rb USING (doc_id)""".stripMargin

  // DupSpans.remove oracle: window fingerprints, >=2-distinct-doc hashes,
  // a policy-dependent removal set, then the shared rebuild tail
  private def dupSpansRemoveSql(keepFirst: Boolean): String = {
    val rm =
      if (!keepFirst)
        "SELECT wd.doc_id AS doc_id, wd.pos AS pos FROM wd JOIN dh USING (h)"
      else
        """SELECT doc_id, pos FROM (
          |  SELECT wd.doc_id AS doc_id, wd.pos AS pos,
          |    row_number() OVER (PARTITION BY wd.h
          |      ORDER BY wd.doc_id, wd.pos) AS rn
          |  FROM wd JOIN dh USING (h)) WHERE rn > 1""".stripMargin
    s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |${windowHashCteSql(16)},
       |dh AS (SELECT h FROM (SELECT DISTINCT h, doc_id FROM wd)
       |  GROUP BY h HAVING count(*) >= 2),
       |rm AS ($rm),
       |${spanRebuildSql(16)}""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_langid" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"))),

    "q_text_quality" -> ((s, dir) =>
      TextAnalysis.qualityFeatures(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_chars"), col("n_words"), col("mean_word_len"),
          col("punct_ratio"), col("digit_ratio"), col("upper_ratio"),
          col("stopword_ratio"), col("quality_ok"))),

    "q_token_counts" -> ((s, dir) =>
      TextAnalysis.tokenCounts(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("ws_tokens"), col("bpe_ish_tokens"))),

    "q_fingerprints" -> ((s, dir) =>
      TextAnalysis.fingerprints(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("fp_exact"), col("fp_minshingle"))),

    // Gopher-style repetition signals: one O(tokens) NgramRepStats pass
    // per n, zero shuffles; the oracle recomputes the same counts with
    // O(tokens^2) list functions (fine at sf0.01 — the asymmetry is the
    // point of the custom expression)
    "q_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionFeatures(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("dup_word_frac"), col("dup_2gram_frac"),
          col("dup_3gram_frac"), col("top_2gram_frac"), col("top_3gram_frac"),
          col("repetition_ok"))),

    // benchmark decontamination: docs with doc_id % 17 == 0 play the
    // held-out eval set; every other doc is flagged iff it shares a word
    // 4-gram with it (4 chosen to give a non-trivial split on this corpus:
    // ~8% contaminated at sf0.01)
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Decontaminate.flag(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 17 === 0),
        "text", "doc_id", n = 4)
    }),

    // span-level decontamination (r12): excise 8-token windows shared
    // with the benchmark side of the same %17 split instead of dropping
    // the doc; clean_text rebuilt from surviving tokens
    "q_scrub_spans" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Decontaminate.scrubSpans(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 17 === 0),
        "text", "doc_id", n = 8)
    }),

    // attributed decontamination (r8): benchmark NAMES ride the gram set,
    // so every flagged doc reports WHICH eval sets it leaks (doc_id % 17
    // slice split into two named benchmarks by parity of doc_id / 17)
    "q_decontaminate_attr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 17 === 0)
        .withColumn("bench_name",
          concat(lit("eval_"),
            (expr("doc_id div 17") % 2).cast("string")))
      graft.operators.Decontaminate.attribute(
        docs.filter(col("doc_id") % 17 =!= 0), bench, "text", "doc_id",
        "bench_name", n = 4)
        .select(col("doc_id"), col("contaminated"), col("n_benchmarks"),
          array_join(col("benchmarks"), ",").as("benchmarks"))
    }),

    // content-addressed manifest: one row identifying the corpus — the
    // order-independent fingerprint sum must hash-match the SQL replay
    "q_manifest" -> ((s, dir) =>
      graft.operators.Curation.manifest(t(s, dir, "documents"), "text")),

    // leakage-safe split: the side is a predicate of the CONTENT
    // fingerprint, so duplicated texts can never straddle train/test
    "q_leakage_split" -> ((s, dir) =>
      graft.plans.Splits.withLeakageSafeLabel(
        t(s, dir, "documents"), "text", testFraction = 0.3, seed = 7L)
        .select(col("doc_id"), col("split"))),

    // fractional-epoch repetition schedule (LLaMA-style recipe): s0 x2.45,
    // s1 x0.6 (subsample), s2 x0 (dropped), s3 absent -> default 1.0
    "q_repeat_epochs" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("s"), (col("doc_id") % 4).cast("string")).as("src"))
      graft.operators.Mix.repeatEpochs(d, "src", Seq("doc_id"),
          Map("s0" -> 2.45, "s1" -> 0.6, "s2" -> 0.0))
        .select(col("doc_id"), col("src"), col("repeat_idx"))
    }),

    // budgeted selection: greedy token-budget fill by a deterministic
    // quality proxy (distinct-token ratio) — the operator's histogram +
    // boundary-bin plan must reproduce the naive global-window cumsum the
    // oracle replays, row for row
    "q_token_budget" -> ((s, dir) => {
      val toks = graft.functions.Text.tokens(coalesce(col("text"), lit("")))
      val scored = t(s, dir, "documents").select(col("doc_id"),
        size(toks).cast("long").as("cost"),
        (size(array_distinct(toks)).cast("double") /
          (size(toks).cast("double") + lit(1.0))).as("prio"))
      graft.operators.Budget.selectToBudget(scored, "cost", "prio",
          "doc_id", budget = 50000L)
        .select(col("doc_id"), col("cost"), col("prio"), col("kept"))
    }),

    // the r10 degenerate case made green: a BINARY priority (quality
    // flag) concentrates the corpus into two histogram bins, and
    // maxBoundaryRows=32 forces the recursive id-histogram descent —
    // the kept set must still equal the naive global-window greedy the
    // oracle replays, with no window ever seeing more than 32 rows
    "q_token_budget_tied" -> ((s, dir) => {
      val toks = graft.functions.Text.tokens(coalesce(col("text"), lit("")))
      val scored = t(s, dir, "documents").select(col("doc_id"),
        size(toks).cast("long").as("cost"),
        (col("doc_id") % 3 === 0).cast("double").as("prio"))
      graft.operators.Budget.selectToBudget(scored, "cost", "prio",
          "doc_id", budget = 20000L, maxBoundaryRows = 32L)
        .select(col("doc_id"), col("cost"), col("prio"), col("kept"))
    }),

    // per-group token budgets (the recipe form "at most N tokens of
    // source X"): one group-partitioned window, no global sort; absent
    // groups keep everything
    "q_budget_per_group" -> ((s, dir) => {
      val toks = graft.functions.Text.tokens(coalesce(col("text"), lit("")))
      val scored = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("s"), (col("doc_id") % 4).cast("string")).as("src"),
        size(toks).cast("long").as("cost"),
        (size(array_distinct(toks)).cast("double") /
          (size(toks).cast("double") + lit(1.0))).as("prio"))
      graft.operators.Budget.selectToBudgetPerGroup(scored, "src",
          "cost", "prio", "doc_id", Map("s0" -> 5000L, "s1" -> 2000L))
        .select(col("doc_id"), col("src"), col("cost"), col("prio"),
          col("kept"))
    }),

    // per-group caps: at most 20 best docs per source by the same quality
    // proxy — the minKBy form (k rows per (group, partition) reach the
    // shuffle), oracle = row_number window
    "q_cap_per_group" -> ((s, dir) => {
      val toks = graft.functions.Text.tokens(coalesce(col("text"), lit("")))
      val scored = t(s, dir, "documents").select(col("doc_id"), col("source"),
        (size(array_distinct(toks)).cast("double") /
          (size(toks).cast("double") + lit(1.0))).as("prio"))
      graft.operators.Budget.capPerGroup(scored, "source", "prio",
          "doc_id", k = 20)
        .select(col("doc_id"), col("source"), col("prio"), col("kept"))
    }),

    // the end-to-end curation sweep: quality gate -> repetition gate ->
    // exact dedup (min-id keeper among gate survivors) -> decontamination,
    // composed as ONE plan with per-stage verdict columns; each stage is
    // separately hash-verified elsewhere, this row proves the composition
    "q_curation" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Curation.sweep(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 17 === 0),
        "text", "doc_id", decontaminateN = 4)
        .select(col("doc_id"), col("quality_ok"), col("repetition_ok"),
          col("exact_unique"), col("contaminated"), col("kept"))
    }),

    // the sweep with the QUALITY-AWARE dedup keeper (r13): identical four
    // stages, but the exact-dedup stage keeps the best-scored copy per
    // content group (score = n_chars, ties -> smallest id) — the
    // FineWeb-standard policy composed into the sweep; same one-window
    // plan shape (min_by instead of min over the fingerprint window)
    "q_curation_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Curation.sweep(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 17 === 0),
        "text", "doc_id", decontaminateN = 4, scoreCol = "n_chars")
        .select(col("doc_id"), col("quality_ok"), col("repetition_ok"),
          col("exact_unique"), col("contaminated"), col("kept"))
    }),

    // sequence packing: boundary-aligned streaming packing of each source
    // shard into 256-token training packs (window partitioned by source —
    // parallel across shards, nothing globally ordered)
    "q_pack" -> ((s, dir) =>
      packedDocs(s, dir)
        .select(col("doc_id"), col("source"), col("pack_id"),
          col("pack_tokens"))),

    // tensor-ready pack rows (r9): per (shard, pack) the member token
    // arrays concatenated in pack order with start offsets, truncated at
    // the budget — what a cross-doc-masking loader consumes. Arrays are
    // fingerprinted (joined strings / md5) for the cross-engine compare.
    "q_pack_rows" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("toks", graft.functions.Text.tokens(col("text")))
        .withColumn("n_toks", size(col("toks"))
          .cast(org.apache.spark.sql.types.LongType))
      val packed = graft.operators.Pack.sequences(docs, "n_toks",
        budget = 256L, groupCol = "source", idCol = "doc_id")
      graft.operators.Pack.toTrainingRows(packed, "toks", "source",
          "doc_id", budget = 256L)
        .select(col("source"), col("pack_id"), col("n_docs"), col("n_tokens"),
          array_join(transform(col("doc_ids"),
            x => x.cast("string")), " ").as("doc_ids"),
          array_join(transform(col("doc_starts"),
            x => x.cast("string")), " ").as("doc_starts"),
          md5(array_join(col("input_ids"), " ")).as("seq_fp"))
    }),

    // the sub-sharded MEGA-SHARD variant: each source's stream split into
    // 4 deterministic md5 sub-shards packed independently (pack ids
    // namespaced local*4 + sub) — the policy that keeps one dominant
    // source from single-tasking the pack window
    "q_pack_sharded" -> ((s, dir) =>
      graft.operators.Pack.sequences(
        t(s, dir, "documents").withColumn("n_toks",
          size(graft.functions.Text.tokens(col("text")))
            .cast(org.apache.spark.sql.types.LongType)),
        "n_toks", budget = 256L, groupCol = "source", idCol = "doc_id",
        subShards = 4)
        .select(col("doc_id"), col("source"), col("pack_id"),
          col("pack_tokens"))),

    // the shuffled-pack variant: same window, md5(id:seed)-ordered stream
    // per shard — packs must not reproduce ingest adjacency
    "q_pack_shuffled" -> ((s, dir) =>
      graft.operators.Pack.sequences(
        t(s, dir, "documents").withColumn("n_toks",
          size(graft.functions.Text.tokens(col("text")))
            .cast(org.apache.spark.sql.types.LongType)),
        "n_toks", budget = 256L, groupCol = "source", idCol = "doc_id",
        shuffleSeed = Some(42L))
        .select(col("doc_id"), col("source"), col("pack_id"),
          col("pack_tokens"))),

    // pack-level utilization: docs per pack + token fill — the metric a
    // training pipeline watches (fill/budget = accelerator utilization)
    "q_pack_stats" -> ((s, dir) =>
      graft.operators.Pack.packStats(packedDocs(s, dir), "source")
        .select(col("source"), col("pack_id"), col("n_docs"), col("tokens"))),

    // document chunking: fixed 32-token windows with 8-token overlap
    // (stride 24) — sized so the fixture's ~54-token docs yield 2-3
    // chunks and the tail-window shorter-chunk path is exercised
    "q_chunk" -> ((s, dir) =>
      graft.operators.Chunk.split(t(s, dir, "documents"), "text",
        Seq("doc_id"), size = 32, overlap = 8)),

    // unicode NFC repair: a fifth of the docs get a decomposed
    // combining-sequence suffix (e + U+0301); the normalizer must
    // compose exactly those and flag them — byte-identical across the
    // JDK's Normalizer and the oracle's utf8proc
    "q_nfc" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" cafe\u0301 visite\u0301")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.normalizeUnicode(d, "text")
        .select(col("doc_id"), col("nfc_changed"), col("nfc_text"))
    }),

    // cross-doc duplicated-span signal (Lee et al. 2022 shape): 16-token
    // windows shared by >= 2 distinct docs, per-doc coverage fraction —
    // 835 dup windows across 45 docs on this fixture, so the join/
    // coverage paths carry real traffic
    "q_dup_spans" -> ((s, dir) =>
      graft.operators.DupSpans.stats(t(s, dir, "documents"), "text",
        "doc_id", n = 16)),

    // span REMOVAL (the Lee et al. ExactSubstr apply step): every
    // occurrence of a >=2-distinct-doc 16-token window is excised and
    // clean_text rebuilt from the surviving normalized tokens in one
    // codegen merge walk — the same 835 dup windows as q_dup_spans
    "q_dup_spans_remove" -> ((s, dir) =>
      graft.operators.DupSpans.remove(t(s, dir, "documents"), "text",
        "doc_id", n = 16)),

    // keep-first policy: the globally-smallest (id, pos) occurrence of
    // each duplicated window survives; overlap resolves removal-wins
    "q_dup_spans_keepfirst" -> ((s, dir) =>
      graft.operators.DupSpans.remove(t(s, dir, "documents"), "text",
        "doc_id", n = 16, keepFirst = true)),

    // snapshot diff: "old" = the corpus; "new" = corpus with every 17th
    // doc dropped (removed), every 13th survivor's text edited (changed),
    // and a disjoint id range appended (added) — statuses must label
    // exactly those constructions, content-fingerprint matched
    "q_snapshot_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val neu = docs.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" edited")))
            .otherwise(col("text")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 19 === 0)
          .select((col("doc_id") + lit(10000000L)).as("doc_id"),
            concat(col("text"), lit(" fresh")).as("text")))
      graft.operators.Curation.snapshotDiff(docs, neu, "doc_id", "text")
    }),

    // line-level boilerplate removal: the corpus is single-line, so the
    // query manufactures line structure (8-token windows joined by \n)
    // and injects a per-source header line into EVERY doc — the operator
    // must strip exactly the injected template chrome (>= 5 docs of the
    // same source share it) while keeping the prose windows
    "q_boilerplate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lines8 = transform(
        graft.functions.VecExprs.tokenChunks(col("text"), 8, 8),
        c => c.getField("chunk_text"))
      val multi = docs.select(col("doc_id"), col("source"),
        concat(lit("subscribe to "), col("source"), lit(" today"),
          lit("\n"), array_join(lines8, "\n")).as("text2"))
      graft.operators.Boilerplate.removeFrequentLines(
        multi, "text2", "doc_id", "source", minDocs = 5)
    }),

    // C4-style heuristic cleaning (Raffel et al. 2020 rules): the corpus
    // has no line structure, so the fixture synthesizes it — 8-token lines
    // with deterministically varied terminal punctuation, a "javascript"
    // token on every 7th line, and a "lorem ipsum" page marker on every
    // 13th doc — and the full line/page verdict set is hash-verified
    "q_c4_filter" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val chunks = graft.functions.VecExprs.tokenChunks(col("text"), 8, 8)
      val lines = transform(chunks, c => {
        val k = col("doc_id") + c.getField("chunk_id")
        concat(
          when(k % 7 === 0, lit("javascript ")).otherwise(lit("")),
          c.getField("chunk_text"),
          when(k % 3 === 0, lit(".")).when(k % 3 === 1, lit("!"))
            .otherwise(lit("")))
      })
      val fixture = docs.select(col("doc_id"),
        concat(array_join(lines, "\n"),
          when(col("doc_id") % 13 === 0, lit("\nnotice: lorem ipsum text."))
            .otherwise(lit(""))).as("text2"))
      TextAnalysis.c4Filter(fixture, "text2", Seq("doc_id"))
    }),

    // PII/link scrubbing: a third of the docs get a deterministic
    // PII-bearing suffix (the corpus itself has none), then the scrub's
    // byte-identical-output contract is hash-verified across engines
    "q_scrub_pii" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(PiiSuffix)))
          .otherwise(col("text")).as("text"))
      TextAnalysis.scrubPii(d, "text")
        .select(col("doc_id"), col("n_url"), col("n_email"), col("n_phone"),
          col("scrubbed"))
    })
  )

  private val PiiSuffix = " contact a.user@mail.example.org or visit " +
    "https://example.org/path?q=1 or call +1 (555) 123-4567"

  private def markerList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")

  private def langidSql: String = {
    val scores = TextAnalysis.LangMarkers.filter(_._2.nonEmpty).map { case (lang, ms) =>
      s"len(list_filter(toks, t -> list_contains(${markerList(ms)}, t))) AS s_$lang"
    }.mkString(",\n    ")
    val langs = TextAnalysis.LangMarkers.filter(_._2.nonEmpty).map(_._1)
    val m = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l => s"WHEN s_$l = m AND m > 0 THEN '$l'").mkString("\n    ")
    s"""WITH tk AS (
       |  SELECT doc_id, text, $toksSql AS toks FROM documents),
       |sc AS (
       |  SELECT doc_id, text,
       |    $scores
       |  FROM tk),
       |mx AS (SELECT *, $m AS m FROM sc)
       |SELECT doc_id,
       |  CASE WHEN len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) > 0 THEN 'zh'
       |    $cases
       |    ELSE 'und' END AS lang_pred
       |FROM mx""".stripMargin
  }

  private val stopSql = markerList(Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"))

  /** N-grams as space-joined token windows (n >= 2); empty when the doc has
    * fewer than n tokens.
    */
  private def ngramsSql(n: Int): String =
    s"list_transform(range(0, greatest(len(toks) - ${n - 1}, 0)), " +
      s"i -> array_to_string(list_slice(toks, i + 1, i + $n), ' '))"

  /** TokenShingles semantics: distinct n-grams, whole text when shorter. */
  private[queries] def shingleSetSql(n: Int): String =
    s"list_distinct(CASE WHEN len(toks) <= ${n - 1} " +
      s"THEN [array_to_string(toks, ' ')] ELSE ${ngramsSql(n)} END)"

  private def statsSql(g: String, pfx: String) =
    s"""len($g) AS t_$pfx, len(list_distinct($g)) AS d_$pfx,
       |    coalesce(list_max(list_transform(list_distinct($g),
       |      u -> len(list_filter($g, x -> x = u)))), 0) AS p_$pfx""".stripMargin

  private def fracSql(num: String, den: String) =
    s"round(CAST($num AS DOUBLE) / greatest($den, 1), 6)"

  /** The repetition-fraction CTE chain over a (doc_id, toks) relation named
    * `tk`; ends with CTE `repf` carrying doc_id, t_1, the five fractions.
    */
  private[queries] val repetitionCtes =
    s"""g AS (SELECT doc_id, toks, ${ngramsSql(2)} AS g2, ${ngramsSql(3)} AS g3 FROM tk),
       |st AS (SELECT doc_id,
       |    len(toks) AS t_1, len(list_distinct(toks)) AS d_1,
       |    ${statsSql("g2", "2")},
       |    ${statsSql("g3", "3")}
       |  FROM g),
       |repf AS (SELECT doc_id, t_1,
       |    ${fracSql("t_1 - d_1", "t_1")} AS dup_word_frac,
       |    ${fracSql("t_2 - d_2", "t_2")} AS dup_2gram_frac,
       |    ${fracSql("t_3 - d_3", "t_3")} AS dup_3gram_frac,
       |    ${fracSql("p_2 * 2", "t_1")} AS top_2gram_frac,
       |    ${fracSql("p_3 * 3", "t_1")} AS top_3gram_frac
       |  FROM st)""".stripMargin

  private[queries] val repetitionOkSql =
    """(t_1 < 10 OR (dup_word_frac <= 0.65 AND dup_2gram_frac <= 0.10
      | AND top_2gram_frac <= 0.20 AND top_3gram_frac <= 0.18))""".stripMargin

  private val repetitionSql =
    s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |$repetitionCtes
       |SELECT doc_id, dup_word_frac, dup_2gram_frac, dup_3gram_frac,
       |  top_2gram_frac, top_3gram_frac,
       |  $repetitionOkSql AS repetition_ok
       |FROM repf""".stripMargin

  private val decontaminateAttrSql =
    s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id, ${shingleSetSql(4)} AS g FROM tk),
       |bench AS (SELECT DISTINCT 'eval_' || CAST((doc_id // 17) % 2 AS VARCHAR) AS bn,
       |    unnest(g) AS gram
       |  FROM sh WHERE doc_id % 17 = 0),
       |tr AS (SELECT doc_id, unnest(g) AS gram FROM sh WHERE doc_id % 17 <> 0),
       |hits AS (SELECT tr.doc_id AS doc_id, b.bn AS bn
       |  FROM tr LEFT JOIN bench b USING (gram)),
       |ag AS (SELECT doc_id,
       |    list_sort(list_distinct(list_filter(list(bn), x -> x IS NOT NULL))) AS bs
       |  FROM hits GROUP BY doc_id)
       |SELECT doc_id, len(bs) > 0 AS contaminated,
       |  CAST(len(bs) AS BIGINT) AS n_benchmarks,
       |  coalesce(array_to_string(bs, ','), '') AS benchmarks
       |FROM ag""".stripMargin

  private val decontaminateSql =
    s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id, ${shingleSetSql(4)} AS g FROM tk),
       |bench AS (SELECT DISTINCT unnest(g) AS gram FROM sh WHERE doc_id % 17 = 0),
       |tr AS (SELECT doc_id, unnest(g) AS gram FROM sh WHERE doc_id % 17 <> 0)
       |SELECT tr.doc_id AS doc_id, max(coalesce(b.hit, false)) AS contaminated
       |FROM tr LEFT JOIN (SELECT gram, true AS hit FROM bench) b USING (gram)
       |GROUP BY tr.doc_id""".stripMargin

  /** The min-id keeper (the sweep default): smallest gate-surviving id
    * per content fingerprint.
    */
  private[queries] val minIdKeepCte =
    """keep AS (
      |  SELECT fp.fp, min(fp.doc_id) AS keeper
      |  FROM fp JOIN qual USING (doc_id) JOIN rep USING (doc_id)
      |  WHERE quality_ok AND repetition_ok GROUP BY fp.fp)""".stripMargin

  /** The keep-BEST keeper (sweep scoreCol = n_chars): best-scored
    * gate-surviving doc per fingerprint, ties -> smallest id — the exact
    * ordering Spark's min_by((-score, id)) window uses.
    */
  private[queries] val bestKeepCte =
    """keep AS (
      |  SELECT fp, keeper FROM (
      |    SELECT fp.fp AS fp, fp.doc_id AS keeper,
      |      row_number() OVER (PARTITION BY fp.fp
      |        ORDER BY tr.n_chars DESC, fp.doc_id) AS rn
      |    FROM fp JOIN qual USING (doc_id) JOIN rep USING (doc_id)
      |      JOIN tr ON fp.doc_id = tr.doc_id
      |    WHERE quality_ok AND repetition_ok)
      |  WHERE rn = 1)""".stripMargin

  /** The four-stage verdict CTE chain shared by q_curation,
    * q_curation_best and q_curation_full (LmQueries): requires CTEs
    * `tr(doc_id, text, ...)` and `tk(doc_id, toks)`; ends with `qual`,
    * `rep`, `fp`, `keep`, `cont`. The dedup keeper policy is pluggable
    * (`keepCte`) — min-id default, keep-best for the scored sweep.
    */
  private[queries] def curationVerdictCtes(
      keepCte: String = minIdKeepCte): String =
    s"""$repetitionCtes,
       |qual AS (SELECT doc_id,
       |    (CAST(len(toks) AS BIGINT) >= 5 AND CAST(len(toks) AS BIGINT) <= 100000
       |     AND round(CAST(list_sum(list_append(list_transform(toks, w -> len(w)), 0)) AS DOUBLE)
       |       / greatest(len(toks), 1), 6) BETWEEN 2.0 AND 15.0) AS quality_ok
       |  FROM tk),
       |rep AS (SELECT doc_id, $repetitionOkSql AS repetition_ok FROM repf),
       |fp AS (SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp FROM tk),
       |$keepCte,
       |sh AS (SELECT doc_id, ${shingleSetSql(4)} AS g FROM tk),
       |btk AS (SELECT doc_id, $toksSql AS toks FROM documents WHERE doc_id % 17 = 0),
       |bsh AS (SELECT doc_id, ${shingleSetSql(4)} AS g FROM btk),
       |bench AS (SELECT DISTINCT unnest(g) AS gram FROM bsh),
       |trg AS (SELECT doc_id, unnest(g) AS gram FROM sh),
       |cont AS (
       |  SELECT trg.doc_id AS doc_id, max(coalesce(b.hit, false)) AS contaminated
       |  FROM trg LEFT JOIN (SELECT gram, true AS hit FROM bench) b USING (gram)
       |  GROUP BY trg.doc_id)""".stripMargin

  private def curationSqlWith(keepCte: String, trCols: String) =
    s"""WITH tr AS (SELECT $trCols FROM documents WHERE doc_id % 17 <> 0),
       |tk AS (SELECT doc_id, $toksSql AS toks FROM tr),
       |${curationVerdictCtes(keepCte)}
       |SELECT qual.doc_id AS doc_id, qual.quality_ok, rep.repetition_ok,
       |  coalesce(fp.doc_id = k.keeper, false) AS exact_unique,
       |  cont.contaminated,
       |  (qual.quality_ok AND rep.repetition_ok
       |   AND coalesce(fp.doc_id = k.keeper, false)
       |   AND NOT cont.contaminated) AS kept
       |FROM qual JOIN rep USING (doc_id) JOIN fp USING (doc_id)
       |  JOIN cont USING (doc_id)
       |  LEFT JOIN keep k ON fp.fp = k.fp""".stripMargin

  private val curationSql = curationSqlWith(minIdKeepCte, "doc_id, text")

  private val curationBestSql =
    curationSqlWith(bestKeepCte, "doc_id, text, n_chars")

  /** Shared packing CTEs (q_pack / q_pack_stats): tokenize, clamp to the
    * 256 budget, shard-windowed cumsum, pack assignment — ending in
    * relation `p(doc_id, source, pack_id, pack_tokens)`.
    */
  private val packCtes =
    s"""tk AS (
       |  SELECT doc_id, source, CAST(len($toksSql) AS BIGINT) AS n_toks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source, least(n_toks, 256) AS pack_tokens,
       |    sum(least(n_toks, 256)) OVER (
       |      PARTITION BY source ORDER BY doc_id) AS cum
       |  FROM tk),
       |p AS (
       |  SELECT doc_id, source,
       |    CAST(floor((cum - pack_tokens) / 256.0) AS BIGINT) AS pack_id,
       |    pack_tokens
       |  FROM c)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_manifest" ->
      s"""WITH base AS (SELECT coalesce(text, '') AS text FROM documents),
         |f AS (SELECT $toksSql AS toks,
         |    ('0x' || substr(md5($normSql), 1, 15))::BIGINT AS fp60
         |  FROM base)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(coalesce(sum(len(toks)), 0) AS BIGINT) AS n_tokens,
         |  lpad(lower(to_hex(CAST(coalesce(sum(fp60), 0)
         |    % 1152921504606846976 AS BIGINT))), 15, '0') AS content_hash
         |FROM f""".stripMargin,

    "q_leakage_split" ->
      s"""SELECT doc_id,
         |  CASE WHEN ('0x' || substr(md5(concat_ws(':', md5($normSql), '7')),
         |      1, 4))::INTEGER % 1000 < 300
         |    THEN 'test' ELSE 'train' END AS split
         |FROM documents""".stripMargin,

    // the epoch arithmetic is written as the SAME expressions Spark folds
    // (ep - floor(ep), never a pre-folded 0.45 literal) so the 2^60
    // threshold floors the identical double
    "q_repeat_epochs" ->
      s"""WITH d AS (SELECT doc_id,
         |    's' || CAST(doc_id % 4 AS VARCHAR) AS src FROM documents),
         |e AS (SELECT doc_id, src,
         |    CASE src WHEN 's0' THEN 2.45 WHEN 's1' THEN 0.6
         |      WHEN 's2' THEN 0.0 ELSE NULL END AS ep FROM d),
         |n AS (SELECT doc_id, src,
         |    CASE WHEN ep IS NULL THEN 1
         |      ELSE CAST(floor(ep) AS BIGINT)
         |        + CASE WHEN ep - floor(ep) > 0.0
         |            AND substr(md5(CAST(doc_id AS VARCHAR) || ':' || '42'), 1, 15)
         |              < lpad(lower(to_hex(CAST(floor((ep - floor(ep))
         |                  * 1152921504606846976.0) AS BIGINT))), 15, '0')
         |          THEN 1 ELSE 0 END
         |    END AS nrep FROM e)
         |SELECT doc_id, src,
         |  CAST(unnest(range(0, nrep)) AS BIGINT) AS repeat_idx
         |FROM n WHERE nrep > 0""".stripMargin,

    // naive global-window greedy: cumulative cost in (quantized-priority
    // desc, id) order, kept while <= budget — costs are non-negative so
    // the prefix form and the cumsum filter coincide. The ORDER uses the
    // same 6 dp micro quantization as the operator's histogram, so bin
    // membership and ordering agree bit for bit.
    "q_token_budget" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sc AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS cost,
         |    CAST(len(list_distinct(toks)) AS DOUBLE)
         |      / (CAST(len(toks) AS DOUBLE) + 1.0) AS prio FROM tk),
         |w AS (SELECT doc_id, cost, prio,
         |    CAST(sum(cost) OVER (
         |      ORDER BY CAST(round(prio * 1000000.0) AS BIGINT) DESC, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM sc)
         |SELECT doc_id, cost, prio, cum <= 50000 AS kept FROM w""".stripMargin,

    // binary priority: same window replay — the operator's recursive
    // descent is an implementation detail the semantics must hide
    "q_token_budget_tied" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sc AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS cost,
         |    CAST(doc_id % 3 = 0 AS DOUBLE) AS prio FROM tk),
         |w AS (SELECT doc_id, cost, prio,
         |    CAST(sum(cost) OVER (
         |      ORDER BY CAST(round(prio * 1000000.0) AS BIGINT) DESC, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM sc)
         |SELECT doc_id, cost, prio, cum <= 20000 AS kept FROM w""".stripMargin,

    "q_budget_per_group" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sc AS (SELECT doc_id,
         |    's' || CAST(doc_id % 4 AS VARCHAR) AS src,
         |    CAST(len(toks) AS BIGINT) AS cost,
         |    CAST(len(list_distinct(toks)) AS DOUBLE)
         |      / (CAST(len(toks) AS DOUBLE) + 1.0) AS prio FROM tk),
         |w AS (SELECT doc_id, src, cost, prio,
         |    CAST(sum(cost) OVER (PARTITION BY src
         |      ORDER BY CAST(round(prio * 1000000.0) AS BIGINT) DESC, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM sc)
         |SELECT doc_id, src, cost, prio,
         |  CASE src WHEN 's0' THEN cum <= 5000
         |    WHEN 's1' THEN cum <= 2000 ELSE TRUE END AS kept
         |FROM w""".stripMargin,

    "q_cap_per_group" ->
      s"""WITH tk AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
         |sc AS (SELECT doc_id, source,
         |    CAST(len(list_distinct(toks)) AS DOUBLE)
         |      / (CAST(len(toks) AS DOUBLE) + 1.0) AS prio FROM tk),
         |rk AS (SELECT doc_id, source, prio,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY CAST(round(prio * 1000000.0) AS BIGINT) DESC, doc_id)
         |      AS rn FROM sc)
         |SELECT doc_id, source, prio, rn <= 20 AS kept FROM rk""".stripMargin,

    "q_langid" -> langidSql,

    // same decomposed suffix built with chr(769) = U+0301
    "q_nfc" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0
        |      THEN text || ' cafe' || chr(769) || ' visite' || chr(769)
        |      ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  text <> nfc_normalize(text) AS nfc_changed,
        |  nfc_normalize(text) AS nfc_text
        |FROM d""".stripMargin,

    // window fingerprints -> >=2-distinct-doc hashes -> coverage = union
    // of [pos, pos+16) over duplicated windows
    "q_dup_spans" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |wd AS (SELECT doc_id, pr.pos AS pos, pr.h AS h FROM (
         |  SELECT doc_id, unnest(list_transform(range(0, greatest(len(toks) - 15, 0)),
         |    i -> struct_pack(pos := i,
         |      h := md5(array_to_string(list_slice(toks, i + 1, i + 16), ' '))))) AS pr
         |  FROM tk)),
         |dh AS (SELECT h FROM (SELECT DISTINCT h, doc_id FROM wd)
         |  GROUP BY h HAVING count(*) >= 2),
         |dw AS (SELECT wd.doc_id AS doc_id, wd.pos AS pos FROM wd JOIN dh USING (h)),
         |cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS covered FROM (
         |    SELECT DISTINCT doc_id, unnest(range(pos, pos + 16)) AS tokpos FROM dw)
         |  GROUP BY doc_id),
         |ndw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows
         |  FROM dw GROUP BY doc_id)
         |SELECT tk.doc_id, CAST(len(tk.toks) AS BIGINT) AS n_tokens,
         |  coalesce(ndw.n_dup_windows, 0) AS n_dup_windows,
         |  coalesce(cov.covered, 0) AS covered_tokens,
         |  round(CAST(coalesce(cov.covered, 0) AS DOUBLE)
         |    / CAST(greatest(len(tk.toks), 1) AS DOUBLE), 6) AS dup_span_frac
         |FROM tk LEFT JOIN ndw USING (doc_id) LEFT JOIN cov USING (doc_id)""".stripMargin,

    // remove-all policy: rm = every dup-window occurrence; keep-first:
    // rm = occurrences past the (doc_id, pos)-smallest one per hash
    "q_dup_spans_remove" -> dupSpansRemoveSql(keepFirst = false),
    "q_dup_spans_keepfirst" -> dupSpansRemoveSql(keepFirst = true),

    // train-side 8-token windows matching ANY benchmark window hash ->
    // removal set -> the SAME rebuild tail as the dup-span oracles
    "q_scrub_spans" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents
         |  WHERE doc_id % 17 <> 0),
         |be AS (SELECT $toksSql AS toks FROM documents WHERE doc_id % 17 = 0),
         |bh AS (SELECT DISTINCT unnest(list_transform(
         |    range(0, greatest(len(toks) - 7, 0)),
         |    i -> md5(array_to_string(list_slice(toks, i + 1, i + 8), ' ')))) AS h
         |  FROM be),
         |${windowHashCteSql(8)},
         |rm AS (SELECT wd.doc_id AS doc_id, wd.pos AS pos FROM wd JOIN bh USING (h)),
         |${spanRebuildSql(8)}""".stripMargin,

    // same corpus constructions as the Spark side, then a fingerprint
    // full outer join — the status CASE is the operator's contract
    "q_snapshot_diff" -> {
      def fpSql(c: String) =
        s"md5(trim(regexp_replace(lower(coalesce($c, '')), '[^a-z0-9]+', ' ', 'g')))"
      s"""WITH neu AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 13 = 0 THEN text || ' edited' ELSE text END AS text
         |  FROM documents WHERE doc_id % 17 <> 0
         |  UNION ALL
         |  SELECT doc_id + 10000000, text || ' fresh'
         |  FROM documents WHERE doc_id % 19 = 0),
         |o AS (SELECT doc_id, ${fpSql("text")} AS old_fp FROM documents),
         |nw AS (SELECT doc_id, ${fpSql("text")} AS new_fp FROM neu)
         |SELECT coalesce(o.doc_id, nw.doc_id) AS doc_id,
         |  CASE WHEN o.old_fp IS NULL THEN 'added'
         |       WHEN nw.new_fp IS NULL THEN 'removed'
         |       WHEN o.old_fp = nw.new_fp THEN 'unchanged'
         |       ELSE 'changed' END AS status,
         |  o.old_fp, nw.new_fp
         |FROM o FULL OUTER JOIN nw ON o.doc_id = nw.doc_id""".stripMargin
    },

    // same multiline construction (8-token windows, injected per-source
    // header), then the frequent-line rule: drop lines in >= 5 distinct
    // docs of the source, rebuild text in order
    "q_boilerplate" ->
      s"""WITH tk AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
         |la AS (SELECT doc_id, source,
         |    CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
         |      ELSE list_transform(range(0, 1 + CAST(ceil(greatest(len(toks) - 8, 0) / 8.0) AS INT)),
         |        i -> array_to_string(list_slice(toks, i * 8 + 1, least(i * 8 + 8, len(toks))), ' '))
         |    END AS ls
         |  FROM tk),
         |t2 AS (SELECT doc_id, source,
         |    'subscribe to ' || source || ' today' || chr(10) || array_to_string(ls, chr(10)) AS text2
         |  FROM la),
         |ln AS (SELECT doc_id, source, pr.pos AS pos, pr.line AS line FROM (
         |    SELECT doc_id, source, unnest(list_transform(range(1, len(ls2) + 1),
         |      i -> struct_pack(pos := i, line := ls2[i]))) AS pr
         |    FROM (SELECT doc_id, source, string_split(text2, chr(10)) AS ls2 FROM t2))
         |  WHERE len(trim(line)) > 0),
         |pd AS (SELECT source, line, doc_id FROM ln GROUP BY source, line, doc_id),
         |bo AS (SELECT source, line FROM pd GROUP BY source, line HAVING count(*) >= 5),
         |fl AS (SELECT ln.doc_id, ln.pos, ln.line,
         |    (bo.line IS NOT NULL) AS dropd
         |  FROM ln LEFT JOIN bo ON ln.source = bo.source AND ln.line = bo.line),
         |rb AS (SELECT doc_id,
         |    CAST(sum(CASE WHEN dropd THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_removed,
         |    CAST(sum(CASE WHEN dropd THEN 0 ELSE 1 END) AS BIGINT) AS n_lines_kept,
         |    string_agg(CASE WHEN NOT dropd THEN line END, chr(10) ORDER BY pos) AS clean_text
         |  FROM fl GROUP BY doc_id)
         |SELECT d.doc_id, d.source,
         |  coalesce(rb.clean_text, '') AS clean_text,
         |  coalesce(rb.n_lines_kept, 0) AS n_lines_kept,
         |  coalesce(rb.n_lines_removed, 0) AS n_lines_removed
         |FROM documents d LEFT JOIN rb USING (doc_id)""".stripMargin,

    // chunk i covers tokens [i*stride, i*stride+size); tail kept; docs
    // with no tokens produce no chunks
    "q_chunk" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |ch AS (SELECT doc_id, len(toks) AS n, toks,
         |    unnest(range(0, CASE WHEN len(toks) = 0 THEN 0
         |      ELSE 1 + CAST(ceil(greatest(len(toks) - 32, 0) / 24.0) AS INT) END)) AS cid
         |  FROM tk)
         |SELECT doc_id, CAST(cid AS INT) AS chunk_id,
         |  array_to_string(list_slice(toks, cid * 24 + 1, least(cid * 24 + 32, n)), ' ') AS chunk_text,
         |  CAST(least(cid * 24 + 32, n) - cid * 24 AS BIGINT) AS n_chunk_tokens
         |FROM ch""".stripMargin,
    "q_repetition" -> repetitionSql,

    "q_c4_filter" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |la AS (SELECT doc_id,
         |    CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
         |      ELSE list_transform(range(0, 1 + CAST(ceil(greatest(len(toks) - 8, 0) / 8.0) AS INT)),
         |        i -> array_to_string(list_slice(toks, i * 8 + 1, least(i * 8 + 8, len(toks))), ' '))
         |    END AS ls
         |  FROM tk),
         |lx AS (SELECT doc_id, list_transform(range(0, len(ls)), i ->
         |      (CASE WHEN (doc_id + i) % 7 = 0 THEN 'javascript ' ELSE '' END)
         |      || ls[i + 1]
         |      || (CASE WHEN (doc_id + i) % 3 = 0 THEN '.'
         |          WHEN (doc_id + i) % 3 = 1 THEN '!' ELSE '' END)) AS lines
         |  FROM la),
         |t2 AS (SELECT doc_id, array_to_string(lines, chr(10))
         |      || (CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'notice: lorem ipsum text.'
         |          ELSE '' END) AS text2
         |  FROM lx),
         |sp AS (SELECT doc_id, text2,
         |    list_filter(string_split(text2, chr(10)), l -> len(trim(l)) > 0) AS ls
         |  FROM t2),
         |kp AS (SELECT doc_id, text2, ls, list_filter(ls, l ->
         |      right(trim(l), 1) IN ('.', '!', '?', '"')
         |      AND len(string_split_regex(trim(l), '\\s+')) >= 5
         |      AND NOT contains(lower(l), 'javascript')) AS kept
         |  FROM sp)
         |SELECT doc_id, coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
         |  CAST(len(ls) AS BIGINT) AS n_lines_total,
         |  CAST(len(kept) AS BIGINT) AS n_lines_kept,
         |  (len(kept) >= 3 AND NOT contains(lower(text2), 'lorem ipsum')
         |    AND NOT contains(text2, '{')) AS page_ok
         |FROM kp""".stripMargin,
    "q_decontaminate" -> decontaminateSql,
    "q_decontaminate_attr" -> decontaminateAttrSql,
    "q_curation" -> curationSql,
    "q_curation_best" -> curationBestSql,

    "q_pack" ->
      s"""WITH $packCtes
         |SELECT doc_id, source, pack_id, pack_tokens
         |FROM p""".stripMargin,

    "q_pack_stats" ->
      s"""WITH $packCtes
         |SELECT source, pack_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(pack_tokens) AS BIGINT) AS tokens
         |FROM p GROUP BY source, pack_id""".stripMargin,

    // pack assignment from the CLAMPED counts (packCtes), start offsets
    // and the concatenation from the ACTUAL token arrays — the Spark
    // side's exact policy for budget-straddling and oversized docs
    "q_pack_rows" ->
      s"""WITH tk2 AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
         |$packCtes,
         |m AS (SELECT p.source AS source, p.pack_id AS pack_id,
         |    p.doc_id AS doc_id, tk2.toks AS toks,
         |    sum(len(tk2.toks)) OVER (PARTITION BY p.source, p.pack_id
         |      ORDER BY p.doc_id ROWS UNBOUNDED PRECEDING) - len(tk2.toks)
         |      AS start
         |  FROM p JOIN tk2 ON p.doc_id = tk2.doc_id),
         |g AS (SELECT source, pack_id,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id), ' ')
         |      AS doc_ids,
         |    array_to_string(list(CAST(start AS VARCHAR) ORDER BY doc_id), ' ')
         |      AS doc_starts,
         |    flatten(list(toks ORDER BY doc_id)) AS seq
         |  FROM m GROUP BY source, pack_id)
         |SELECT source, pack_id, n_docs,
         |  CAST(least(len(seq), 256) AS BIGINT) AS n_tokens,
         |  doc_ids, doc_starts,
         |  md5(array_to_string(seq[1:256], ' ')) AS seq_fp
         |FROM g""".stripMargin,

    // same packing math per (source, md5-sub-shard) stream; pack ids
    // namespaced local * 4 + sub
    "q_pack_sharded" ->
      s"""WITH tk AS (
         |  SELECT doc_id, source, CAST(len($toksSql) AS BIGINT) AS n_toks,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || 'shard'),
         |      1, 15))::BIGINT % 4 AS sub
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, sub, least(n_toks, 256) AS pack_tokens,
         |    sum(least(n_toks, 256)) OVER (
         |      PARTITION BY source, sub ORDER BY doc_id) AS cum
         |  FROM tk)
         |SELECT doc_id, source,
         |  CAST(floor((cum - pack_tokens) / 256.0) AS BIGINT) * 4 + sub
         |    AS pack_id,
         |  pack_tokens
         |FROM c""".stripMargin,

    // same packing math, md5(id:42)-ordered stream per shard
    "q_pack_shuffled" ->
      s"""WITH tk AS (
         |  SELECT doc_id, source, CAST(len($toksSql) AS BIGINT) AS n_toks
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, least(n_toks, 256) AS pack_tokens,
         |    sum(least(n_toks, 256)) OVER (
         |      PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || '42'), doc_id) AS cum
         |  FROM tk)
         |SELECT doc_id, source,
         |  CAST(floor((cum - pack_tokens) / 256.0) AS BIGINT) AS pack_id,
         |  pack_tokens
         |FROM c""".stripMargin,

    // counts + nested replacements are GENERATED from TextAnalysis.
    // ScrubRules so the two sides cannot drift; DuckDB regexp_replace
    // needs the explicit 'g' flag to match Spark's replace-all default
    "q_scrub_pii" -> {
      val counts = graft.operators.TextAnalysis.ScrubRules.map {
        case (name, pat, _) =>
          s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$name"
      }.mkString(",\n  ")
      val scrubbed = graft.operators.TextAnalysis.ScrubRules.foldLeft("text") {
        case (acc, (_, pat, token)) => s"regexp_replace($acc, '$pat', '$token', 'g')"
      }
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN text || '$PiiSuffix'
         |         ELSE text END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  $counts,
         |  $scrubbed AS scrubbed
         |FROM d""".stripMargin
    },

    "q_text_quality" ->
      s"""WITH tk AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    CAST(len(text) AS BIGINT) AS n_chars,
         |    CAST(len(toks) AS BIGINT) AS n_words,
         |    round(CAST(list_sum(list_append(list_transform(toks, w -> len(w)), 0)) AS DOUBLE)
         |      / greatest(len(toks), 1), 6) AS mean_word_len,
         |    round(CAST(len(regexp_extract_all(text, '[\\.,;:!\\?]')) AS DOUBLE)
         |      / greatest(len(text), 1), 6) AS punct_ratio,
         |    round(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
         |      / greatest(len(text), 1), 6) AS digit_ratio,
         |    round(CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE)
         |      / greatest(len(text), 1), 6) AS upper_ratio,
         |    round(CAST(len(list_filter(toks, w -> list_contains($stopSql, w))) AS DOUBLE)
         |      / greatest(len(toks), 1), 6) AS stopword_ratio
         |  FROM tk)
         |SELECT doc_id, n_chars, n_words, mean_word_len, punct_ratio, digit_ratio,
         |  upper_ratio, stopword_ratio,
         |  (n_words >= 5 AND n_words <= 100000
         |   AND mean_word_len BETWEEN 2.0 AND 15.0) AS quality_ok
         |FROM f""".stripMargin,

    "q_token_counts" ->
      s"""SELECT doc_id,
         |  CAST(len($toksSql) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
         |    AS bpe_ish_tokens
         |FROM documents""".stripMargin,

    "q_fingerprints" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (
         |  SELECT doc_id, toks,
         |    list_distinct(CASE WHEN len(toks) <= 4 THEN [array_to_string(toks, ' ')]
         |      ELSE list_transform(range(0, len(toks) - 4),
         |        i -> array_to_string(list_slice(toks, i + 1, i + 5), ' ')) END) AS s5
         |  FROM tk)
         |SELECT doc_id,
         |  md5(array_to_string(toks, ' ')) AS fp_exact,
         |  list_min(list_transform(s5, s -> md5(s))) AS fp_minshingle
         |FROM sh""".stripMargin
  )
}
