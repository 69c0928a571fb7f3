package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BM25 full-text retrieval over a document corpus — the lexical half of
  * the retrieval story next to the ANN family (`SimilaritySearch`,
  * `AnnIndex` cover the embedding half). The reference ecosystem reaches
  * for this through external search engines; here it is a first-class
  * Spark operator so corpus curation (dedup → quality gates → retrieval
  * eval) runs in one engine.
  *
  * Scoring is Lucene-flavored BM25:
  *   idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   tfn(t, d) = tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
  *   score     = Σ_t idf(t) * tfn(t, d)  over the DISTINCT query terms
  * with the library's oracle-parity float discipline: each per-term
  * contribution is rounded to 6 dp, summed as DECIMAL(28,6) (exact,
  * order-independent), and reported as an integer micro-score
  * (`score_micro = round(score * 1e6)`), so ranking ties break
  * deterministically and the whole operator hash-matches a SQL oracle.
  * ONE scorer (`scoreMicro`) feeds every surface — in-memory, persisted
  * index, streaming — so the formula and the rounding discipline cannot
  * drift between paths (TextSearchSpec pins probe ≡ topk bit-identically).
  *
  * 100 TB shape: the postings build is ONE corpus-token shuffle
  * (groupBy (doc, term)) plus a vocab-bounded df aggregate; the probe
  * broadcast-joins the (small) query-term set to postings, so only
  * candidate postings — rows whose term appears in some query — move into
  * the (query, doc) score aggregation, and the top-k is a bounded minKBy
  * aggregate (k rows per (query, partition) reach the shuffle — never a
  * per-query window sort of every candidate). For a standing corpus,
  * persist the postings with `buildIndex` (bucketed by term,
  * `graft.sources.Bucketize`) and probe with zero corpus-side Exchange
  * like `DedupIndex`/`AnnIndex`.
  */
object TextSearch {

  /** Tokenized corpus: (id, toks, dl). Empty/null texts keep dl = 0. */
  private def tokenized(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        graft.functions.Text.tokens(coalesce(col(textCol), lit(""))).as("toks"))
      .withColumn("dl", size(col("toks")).cast(LongType))

  /** Postings (term, doc_id, tf) + per-doc lengths (doc_id, dl) from a
    * corpus, for the INDEX BUILDERS. One corpus-token shuffle; tf
    * combines map-side. The lens frame comes back PERSISTED (two thin
    * columns) because the builders consume it twice (stats job + bucketed
    * write) and OWN the handle: they unpersist it before returning. The
    * lens frame here includes EMPTY docs (dl = 0) — the persisted lens
    * table is the nDocs ground truth `repair`/`probe` consistency checks
    * rely on, so it must carry one row per corpus doc. (The one-shot
    * `scores` path instead derives candidate lens from the postings and
    * never persists — see there.)
    */
  def postings(df: DataFrame, textCol: String,
               idCol: String): (DataFrame, DataFrame) = {
    val tk = tokenized(df, textCol, idCol)
    val docLens = tk.select(col("doc_id"), col("dl")).persist()
    val post = tk.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    (post, docLens)
  }

  /** (nDocs, sumDl) from a lens frame — N counts every document row
    * (empty docs included; they are real corpus members for idf).
    */
  private def corpusStats(docLens: DataFrame): (Long, Long) = {
    val stats = docLens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .head()
    val nDocs = stats.getLong(0)
    // nDocs first: an empty corpus has a NULL sum and getLong would NPE
    require(nDocs > 0, "TextSearch: empty corpus")
    (nDocs, stats.getLong(1))
  }

  /** THE scorer — every public surface goes through here. BM25 micro-
    * scores of `queries` against (post, docLens) under the given corpus
    * stats: (q_id, doc_id, score_micro). Document frequency attaches to
    * the query-term-filtered postings in one of two plan shapes — the
    * VALUES are identical either way (postings are unique per (term, doc)
    * and df is counted before the q_id fan-out), only the physical plan
    * differs:
    *
    *  - `dfViaWindow = true` (persisted-index probes): a term-window over
    *    the bucketed postings scan. The scan's hash partitioning on `term`
    *    satisfies the window, so the probe touches NO corpus-side Exchange
    *    — and a term's postings already live in one bucket by layout, so
    *    the window adds no funnel the layout didn't have.
    *  - `dfViaWindow = false` (one-shot): the same window over unbucketed
    *    postings would EXCHANGE the candidates by bare `term` and push a
    *    hot query term's ENTIRE posting list through one task (guide-§2.2
    *    skew: a stopword-ish query term at corpus scale is a single-task
    *    sort). Instead df is a map-side-combined aggregate of the filtered
    *    postings down to one (term, df) row per query term — no single-
    *    task funnel at any skew — broadcast-joined back. The aggregate
    *    references the filtered postings a second time, but both consumers
    *    share the identical (term, doc_id) tf-aggregation exchange, which
    *    AQE stage reuse computes ONCE — the corpus is still tokenized and
    *    scanned exactly once (TextSearchSpec pins the executed plan), and
    *    this shape drops the window's whole Exchange+Sort of candidates.
    */
  private def scoreMicro(post: DataFrame, docLens: Option[DataFrame],
                         nDocs: Long, avgdl: Double,
                         queries: DataFrame, qTextCol: String, qIdCol: String,
                         k1: Double, b: Double,
                         dfViaWindow: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qTerms = queries.select(col(qIdCol).as("q_id"),
        explode(array_distinct(graft.functions.Text.tokens(
          coalesce(col(qTextCol), lit(""))))).as("term"))
      .distinct()
    val semi = post
      .join(broadcast(qTerms.select("term").distinct()), Seq("term"), "left_semi")
    val filtered =
      if (dfViaWindow)
        semi.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      else {
        // Skew-safe df for the one-shot path. The `tf >= 1 AND dl >= 0`
        // guard is ALWAYS true (tf is a group count, dl a non-null array
        // size) and changes nothing the aggregate counts; it exists so this
        // branch consumes the same columns as the scoring branch — column
        // pruning would otherwise specialize this branch's copy of the
        // (term, doc_id) aggregation (dropping first(dl)) into a DIFFERENT
        // exchange and silently break the stage reuse that keeps the
        // corpus single-scanned. Pinned by TextSearchSpec's executed-plan
        // scan count.
        val dfByTerm = semi
          .groupBy(col("term"))
          .agg(count(when(col("tf") >= 1 && col("dl") >= 0, 1)).as("df"))
        semi.join(broadcast(dfByTerm), Seq("term"))
      }
    val idf = log(lit(1.0) + (lit(nDocs.toDouble) - col("df").cast(DoubleType) + lit(0.5))
      / (col("df").cast(DoubleType) + lit(0.5)))

    val tfD = col("tf").cast(DoubleType)
    val dlD = col("dl").cast(DoubleType)
    val tfn = tfD * lit(k1 + 1.0) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (dlD / lit(avgdl))))

    val candidates = filtered
      .join(broadcast(qTerms), Seq("term"))
      .withColumn("idf", idf).drop("df")
    // Some(lens): the persisted-index path joins its bucketed lens table.
    // None: `post` already CARRIES dl on every row — the one-shot path
    // rides dl through the single postings exchange instead of paying a
    // second lens branch and a join.
    docLens.fold(candidates)(l => candidates.join(l, Seq("doc_id")))
      .withColumn("contrib", round(col("idf") * tfn, 6).cast(DecimalType(28, 6)))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("s"))
      .select(col("q_id"), col("doc_id"),
        (col("s") * lit(1000000)).cast(LongType).as("score_micro"))
  }

  /** Deterministic bounded top-k of a scored frame: rank 1..k by
    * (score_micro desc, doc_id asc) via the minKBy aggregate — only k rows
    * per (query, partition) reach the shuffle, never a per-query window
    * sort of every candidate (the `SimilaritySearch.topK` discipline).
    */
  private def topkOf(sc: DataFrame, k: Int): DataFrame =
    sc.groupBy(col("q_id"))
      .agg(graft.functions.AggExprs.minKBy(
        struct((-col("score_micro")).as("ns"), col("doc_id").as("doc_id"),
          col("score_micro").as("score_micro")), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), col("t.doc_id").as("doc_id"),
        col("t.score_micro").as("score_micro"),
        (col("pos") + 1).cast(LongType).as("rank"))

  /** BM25 scores for every (query, candidate) pair that shares ≥1 term.
    * Output: (q_id, doc_id, score_micro: bigint). `queries` is expected to
    * be small (it is broadcast); the corpus side is `df`.
    */
  def scores(df: DataFrame, textCol: String, idCol: String,
             queries: DataFrame, qTextCol: String, qIdCol: String,
             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // One-shot plan shape (r11): dl RIDES the postings rows through the
    // one corpus-token exchange (+8 bytes per posting), so there is no
    // lens branch and no lens join at all — the scorer reads dl off the
    // candidate rows. Empty docs have no postings — and can never be
    // candidates (no shared term) — so nothing the scorer reads is lost;
    // they still count in nDocs/avgdl via the stats pass below (one eager
    // aggregate, the only other corpus scan). No persist anywhere:
    // nothing outlives the call (the Drift.withRefCounts one-shot
    // discipline).
    val tk = tokenized(df, textCol, idCol)
    val st = tk.agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).head()
    val nDocs = st.getLong(0)
    require(nDocs > 0, "TextSearch: empty corpus")
    val sumDl = st.getLong(1)
    val post = tk
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    scoreMicro(post, None, nDocs, sumDl.toDouble / nDocs.toDouble,
      queries, qTextCol, qIdCol, k1, b, dfViaWindow = false)
  }

  /** Top-k BM25 hits per query with a fully deterministic rank:
    * (score_micro desc, doc_id asc). Output adds `rank` (1-based).
    */
  def topk(df: DataFrame, textCol: String, idCol: String,
           queries: DataFrame, qTextCol: String, qIdCol: String,
           k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    topkOf(scores(df, textCol, idCol, queries, qTextCol, qIdCol, k1, b), k)

  def postingsTable(name: String): String = s"${name}_postings"
  def lensTable(name: String): String = s"${name}_lens"

  private val PendingKey = "graft.bm25.pendingBatch"

  private def tblProps(spark: SparkSession, name: String): Map[String, String] =
    spark.sql(s"SHOW TBLPROPERTIES `${postingsTable(name)}`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  /** Loud guard against the half-applied-append window: `append` stamps a
    * pending-batch marker before it mutates anything and clears it only
    * after both data appends commit, so any crash inside the window is
    * DETECTED by the next MUTATION instead of silently double-counting
    * stats on a blind retry. Deliberately NOT checked by `probe`: a
    * pending marker is also what a healthy in-flight append looks like,
    * and reads must stay available during ingest (search-as-you-ingest) —
    * a probe under the window sees at worst the documented monotone-
    * degraded state (batch docs registered in the stats but not yet
    * retrievable). Only run `repair` when no append is in flight.
    */
  private def requireClean(props: Map[String, String], name: String,
                           what: String): Unit =
    props.get(PendingKey).filter(_.nonEmpty).foreach { b =>
      throw new IllegalStateException(
        s"TextSearch.$what: index '$name' has a pending append " +
          s"(batch '$b'). If an append is RUNNING, wait for it; if it " +
          "CRASHED, do NOT retry it — run " +
          s"TextSearch.repair(spark, \"$name\") to resync the stats " +
          "from the lens table, or rebuild the index from source.")
    }

  /** Persist the corpus as a standing BM25 index: postings bucketed by
    * term, doc lengths bucketed by doc id, corpus stats as table
    * properties. `probe` then touches no corpus-side Exchange: the query
    * terms broadcast against the bucketed postings scan. The tokenize
    * happens twice (postings write, lens write) — the stats come from the
    * already-cached lens frame, not a third pass.
    */
  def buildIndex(df: DataFrame, textCol: String, idCol: String,
                 name: String, path: String, numBuckets: Int = 32): Unit = {
    val (post, docLens) = postings(df, textCol, idCol)
    // the two bucketed writes are independent jobs (postings never reads
    // docLens) — overlap them from two driver threads. Measured honestly:
    // at local[32] this is wall-neutral (both jobs saturate the same
    // cores); the overlap pays off where the write cost is COMMIT LATENCY
    // rather than CPU — object-store multipart commits and metastore
    // round-trips at cluster scale — which is exactly the regime the r9
    // bench flagged this builder's constants in
    graft.ops.Jobs.overlapAll(df.sparkSession.sparkContext)(Seq(
      () => graft.sources.Bucketize.writeBucketed(docLens, lensTable(name),
        s"$path/lens", Seq("doc_id"), numBuckets),
      () => graft.sources.Bucketize.writeBucketed(post, postingsTable(name),
        s"$path/postings", Seq("term"), numBuckets)))
    val (nDocs, sumDl) = corpusStats(docLens)
    docLens.unpersist()
    df.sparkSession.sql(
      s"ALTER TABLE `${postingsTable(name)}` SET TBLPROPERTIES (" +
        s"'graft.bm25.nDocs' = '$nDocs', " +
        s"'graft.bm25.sumDl' = '$sumDl')")
  }

  /** The STANDING-INDEX lifecycle in one call (r14 — the bench
    * registries' reuse pattern promoted to operator API): make sure a
    * probe-ready BM25 index named `name` exists for EXACTLY this corpus
    * content and build geometry, building/rebuilding only when it does
    * not. Returns true when it (re)built, false when the standing index
    * was reused — the caller probes either way.
    *
    * Staleness is CONTENT-keyed, not path-keyed, at one of two
    * granularities (see `IndexManifest`'s scaladoc for the full
    * contract):
    *  - dir-backed corpora (`df` is a plain file scan, modulo
    *    Project/Filter — the common shape) default to the O(files)
    *    LISTING key since r15: file names + lengths + the plan's own
    *    filter fingerprint, so a corpus regenerated in place (new part
    *    files) rebuilds, an unchanged listing reuses, and the per-call
    *    reuse cost is one directory listing — NOT a corpus scan. Blind
    *    spot (documented, no standard writer hits it): an in-place
    *    mutation preserving file name AND length;
    *  - everything else (and the precise opt-in, via
    *    `precomputedKey = Some(IndexManifest.textKey(df, textCol,
    *    "bm25:b<n>"))`) keys on the corpus manifest — n_docs, n_tokens,
    *    content hash, one bounded tokenize aggregate over `df`.
    * An ingest loop that already tracks its corpus manifest additively
    * (`IndexManifest.combine` per batch) passes it as `precomputedKey`
    * and skips both the scan and the listing — the 100 TB shape.
    *
    * Composes with `append`: appends through `TextSearch.append` keep a
    * manifest-scan key LIVE by combining the batch's manifest (additive);
    * a listing-derived key cannot absorb out-of-band rows, so `append`
    * DROPS it and the next `ensure` rebuilds — wasteful, never stale.
    *
    * `path` is BY-NAME: evaluated only when a (re)build actually happens,
    * so callers may pass an expression that provisions/wipes the layout
    * directory (the bench registries do) without invalidating a standing
    * index they are about to reuse.
    *
    * Concurrency: `ensure*` is SINGLE-WRITER per index name — it is
    * check-then-act over a metastore with last-write-wins property
    * updates and no CAS, so two sessions ensuring the same `name` can
    * race DROP TABLE/overwrite on the layout path, and a concurrent
    * probe can observe a half-rebuilt index. The post-stamp read-back
    * (`IndexManifest.stampVerified`) detects the common interleaving and
    * fails the loser loudly, but the hard guarantee is the contract:
    * one ensuring driver per standing index, probes quiesced across a
    * rebuild (mirrors `append`'s single-writer note).
    */
  def ensureIndex(df: DataFrame, textCol: String, idCol: String,
                  name: String, path: => String, numBuckets: Int = 32,
                  precomputedKey: Option[String] = None): Boolean = {
    val spark = df.sparkSession
    val params = s"bm25:b$numBuckets"
    val key = precomputedKey.getOrElse(
      IndexManifest.filesKeyOf(df, params, Seq(textCol, idCol))
        .getOrElse(IndexManifest.textKey(df, textCol, params)))
    val pt = postingsTable(name)
    val fresh = spark.catalog.tableExists(pt) &&
      IndexManifest.stored(spark, pt).contains(key)
    if (!fresh) {
      buildIndex(df, textCol, idCol, name, path, numBuckets)
      IndexManifest.stampVerified(spark, pt, key)
    }
    !fresh
  }

  /** Append an ingest batch to a standing index — the accumulate-over-
    * months half of the story (probe the batch, route dups away, append
    * the survivors — the `DedupIndex.append` rhythm). Postings and lens
    * rows land in new per-bucket files (probes stay exchange-free); the
    * corpus stats in the table properties are UPDATED from the batch's
    * own lens aggregate, so idf/avgdl keep tracking the true corpus. An
    * empty batch is a no-op (a routing stage may legitimately drop every
    * doc). The caller is responsible for id uniqueness across ingests.
    *
    * Crash ordering: stats are computed FIRST and the properties updated
    * BEFORE the data appends, so every intermediate crash state is
    * monotone-degraded (batch docs registered in N but not yet
    * retrievable — like empty docs) rather than silently mis-scored in
    * both directions. The window is additionally STAMPED: a pending-batch
    * marker is set before the stats mutation and cleared only after both
    * data appends commit, so a crashed append is detected loudly by the
    * next append/probe instead of silently double-counting on a blind
    * retry. Recovery: `repair` (resync stats from the lens table) or a
    * rebuild from source.
    *
    * Concurrency: appends are SINGLE-WRITER. Metastore property updates
    * are last-write-wins, so two interleaved appends could double-count
    * nDocs/sumDl without either marker firing; the stamp-then-verify
    * check below detects the common interleaving (both passed the clean
    * check, one stamp overwrote the other) and aborts the loser before
    * any data lands, but a fully adversarial schedule can still slip
    * through — serialize appends (one ingest driver per index) for the
    * hard guarantee.
    */
  def append(df: DataFrame, textCol: String, idCol: String,
             name: String): Unit = {
    val (post, docLens) = postings(df, textCol, idCol)
    val bN = docLens.count()
    if (bN == 0) { docLens.unpersist(); return }
    val (_, bSum) = corpusStats(docLens)
    val spark = df.sparkSession
    val props = tblProps(spark, name)
    requireClean(props, name, "append")
    val batchTag = java.util.UUID.randomUUID().toString
    spark.sql(
      s"ALTER TABLE `${postingsTable(name)}` SET TBLPROPERTIES (" +
        s"'$PendingKey' = '$batchTag', " +
        s"'graft.bm25.nDocs' = '${props("graft.bm25.nDocs").toLong + bN}', " +
        s"'graft.bm25.sumDl' = '${props("graft.bm25.sumDl").toLong + bSum}')")
    // stamp-then-verify: appends are SINGLE-WRITER by contract (metastore
    // property updates are last-write-wins, not CAS), but two appends that
    // both passed requireClean are best-effort DETECTED here — whichever
    // stamp lost re-reads a foreign batch tag and aborts BEFORE writing
    // any data. NOTE the surviving stats are NOT guaranteed consistent in
    // either direction: depending on which ALTER landed first, the
    // winner's properties may or may not include the aborted batch's
    // counts (probe's lens-count check catches the mismatch once the
    // marker clears). This shrinks (not closes — see scaladoc) the
    // interleaving window; serialize appends for a hard guarantee.
    val won = tblProps(spark, name).get(PendingKey).contains(batchTag)
    if (!won) {
      docLens.unpersist()
      throw new IllegalStateException(
        s"TextSearch.append: concurrent append detected on '$name' — " +
          "another batch stamped the pending marker between this append's " +
          "clean-check and its stamp. This append aborted before writing " +
          "data, but the surviving stats may be inconsistent EITHER way " +
          "(last-write-wins property updates): after the in-flight append " +
          s"completes, run TextSearch.repair(spark, \"$name\") to resync " +
          "the stats from the lens table, then retry this batch. Appends " +
          "are single-writer by contract.")
    }
    graft.sources.Bucketize.appendBucketed(docLens, lensTable(name),
      Seq("doc_id"))
    graft.sources.Bucketize.appendBucketed(post, postingsTable(name),
      Seq("term"))
    spark.sql(s"ALTER TABLE `${postingsTable(name)}` " +
      s"UNSET TBLPROPERTIES ('$PendingKey')")
    // ensure-managed indexes keep their content key LIVE across appends:
    // manifest-scan keys are additive over disjoint batches, so combining
    // the batch's manifest (one batch-sized aggregate) lets a later
    // `ensureIndex` over the accumulated corpus recognize it and reuse
    // instead of rebuilding. A LISTING-derived key (the r15 default)
    // cannot absorb out-of-band rows — they are not files of the corpus
    // dir — so it is DROPPED instead: the next ensure rebuilds, wasteful
    // but never stale. Ordered AFTER the marker clears: a crash anywhere
    // in the append window leaves the OLD (or dropped) key, which
    // mismatches the (now part-appended) corpus and forces a rebuild —
    // the safe direction. Indexes built via bare `buildIndex` carry no
    // key and skip this (no extra scan).
    IndexManifest.stored(spark, postingsTable(name)).foreach { k =>
      if (IndexManifest.isFilesKey(k))
        IndexManifest.unset(spark, postingsTable(name))
      else {
        val bk = IndexManifest.textKey(df, textCol, IndexManifest.paramsOf(k))
        IndexManifest.stamp(spark, postingsTable(name),
          IndexManifest.combine(k, bk))
      }
    }
    docLens.unpersist()
  }

  /** Recover from a detected half-applied append: recompute nDocs/sumDl
    * from the lens table (the ground truth for both — every committed doc
    * has exactly one lens row) and clear the pending marker. Postings of
    * the crashed batch may be absent (those docs score as empty — the
    * monotone-degraded state `append` documents) but never double-counted
    * in the stats; a `compact`-then-rebuild is the full-fidelity path.
    */
  def repair(spark: SparkSession, name: String): Unit = {
    val lens = spark.table(lensTable(name))
    val (nDocs, sumDl) = corpusStats(lens)
    spark.sql(
      s"ALTER TABLE `${postingsTable(name)}` SET TBLPROPERTIES (" +
        s"'graft.bm25.nDocs' = '$nDocs', " +
        s"'graft.bm25.sumDl' = '$sumDl')")
    spark.sql(s"ALTER TABLE `${postingsTable(name)}` " +
      s"UNSET TBLPROPERTIES IF EXISTS ('$PendingKey')")
  }

  /** Compact an append-accumulated index into a fresh layout at `newPath`
    * (one sorted file per bucket again); the stats properties carry over,
    * so probes are plan- and result-identical — the ingest → compact
    * rhythm shared with `DedupIndex`/`AnnIndex`.
    */
  def compact(spark: SparkSession, name: String, newPath: String): Unit = {
    graft.sources.Bucketize.compact(spark, postingsTable(name),
      s"$newPath/postings")
    graft.sources.Bucketize.compact(spark, lensTable(name), s"$newPath/lens")
  }

  // stats tuples already lens-verified this JVM (see probe's scaladoc)
  private[graft] val verifiedStats =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Probe a persisted index built by `buildIndex` — the same scorer as
    * `topk`, with corpus stats from the index's own table properties, so a
    * probe cannot desynchronize from the layout it scores against.
    *
    * Consistency check (`verifyStats = true`): when NO append is in
    * flight (pending marker clear), the lens-table row count must equal
    * the `nDocs` property — every committed doc writes exactly one lens
    * row, so a mismatch means a torn append whose marker was cleared
    * without `repair` (or a corrupted layout), and the probe refuses with
    * the recovery path instead of silently mis-scoring idf/avgdl. A SET
    * marker skips the check: registered-but-not-yet-retrievable batch
    * docs are the documented monotone in-flight state, and reads stay
    * available during ingest. The count is one metadata-bounded job over
    * the two-column lens table, MEMOIZED per verified (name, nDocs,
    * sumDl) tuple per JVM (r15) — a standing index probed per query
    * batch pays it once, not per probe (at 100 TB the count is an
    * O(files) footer pass). Sound: every mutation that could invalidate
    * a verified tuple also CHANGES it — `append` rewrites nDocs/sumDl
    * (stamping the pending marker first; a torn append leaves the marker
    * or the mutated stats), `repair` rewrites them, a rebuild recreates
    * the table. Out-of-band layout corruption from ANOTHER process is
    * outside any per-call check's reach anyway (the count would race
    * it). Pass `verifyStats = false` on hot probe loops that accept the
    * torn-append risk entirely.
    */
  def probe(spark: SparkSession, name: String,
            queries: DataFrame, qTextCol: String, qIdCol: String,
            k: Int, k1: Double = 1.2, b: Double = 0.75,
            verifyStats: Boolean = true): DataFrame = {
    val props = tblProps(spark, name)
    val nDocs = props("graft.bm25.nDocs").toLong
    val avgdl = props("graft.bm25.sumDl").toDouble / nDocs.toDouble
    val statsKey = s"$name:$nDocs:${props("graft.bm25.sumDl")}"
    if (verifyStats && !props.get(PendingKey).exists(_.nonEmpty) &&
        !verifiedStats.contains(statsKey)) {
      val lensN = spark.table(lensTable(name)).count()
      if (lensN != nDocs) throw new IllegalStateException(
        s"TextSearch.probe: index '$name' is INCONSISTENT — lens table " +
          s"has $lensN rows but the nDocs property says $nDocs, with no " +
          "append in flight. This is a torn append whose pending marker " +
          "was cleared without resyncing (or a corrupted layout): run " +
          s"TextSearch.repair(spark, \"$name\") to resync the stats from " +
          "the lens table, or rebuild the index from source.")
      verifiedStats.add(statsKey)
    }
    topkOf(scoreMicro(spark.table(postingsTable(name)),
      Some(spark.table(lensTable(name))), nDocs, avgdl,
      queries, qTextCol, qIdCol, k1, b, dfViaWindow = true), k)
  }

  /** Probe a persisted index with a live query stream: each micro-batch of
    * queries runs the same batch `probe` (same plan, exchange-free df over
    * the bucketed postings); all state lives in the index layout, not in
    * stream memory — the search-as-you-ingest twin of
    * `DedupIndex.probeStream` / `AnnIndex.probeStream`.
    */
  def probeStream(stream: DataFrame, qTextCol: String, qIdCol: String,
                  name: String, k: Int)(
      sink: (DataFrame, Long) => Unit):
      org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(probe(batch.sparkSession, name, batch, qTextCol, qIdCol, k),
          batchId)
      }
      .start()
}
