package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-document duplicated-span measurement — the exact-substring dedup
  * signal of Lee et al. 2022 ("Deduplicating Training Data Makes Language
  * Models Better"): a token is span-duplicated if it sits inside an
  * n-token window whose exact content also occurs in ANOTHER document.
  * The per-doc `dup_span_frac` is the signal the paper's pipeline cuts
  * on; docs below the window length are this operator's blind spot by
  * construction (whole-doc duplication at that length is exact-dedup
  * territory, `Dedup.exact`).
  *
  * Suffix arrays are the single-machine tool for this; the Spark-shaped
  * equivalent is window fingerprints: every n-token window hashes to one
  * md5 row (loop-codegen `TokenWindowHashes`, position-ordered), a
  * hash-keyed aggregate finds windows in >= 2 DISTINCT docs, and coverage
  * expands only the DUPLICATED windows back to token positions (cost
  * proportional to the duplication actually present, not the corpus) and
  * counts distinct covered positions per doc.
  *
  * Scale shape: the corpus is fingerprint-scanned twice (once feeding the
  * dup-hash aggregate, once as the semi-join probe side — the window
  * frame is corpus x positions, too wide to be worth materializing) plus
  * one narrow token-count scan; (hash, id) pre-collapse then hash
  * aggregate (map-side combined — the shuffle carries one row per
  * DISTINCT window per partition); a semi-join back on the hash; the
  * coverage explode (x n on duplicated windows only) with a
  * (id, position) distinct and a doc-keyed count. Hot-window skew is
  * bounded by the pre-collapse: a window repeated a million times in one
  * doc still ships one row per partition.
  */
object DupSpans {

  def stats(df: DataFrame, textCol: String, idCol: String,
            n: Int = 32): DataFrame = {
    val windows = df.select(col(idCol).as("__id"),
        posexplode(graft.functions.VecExprs.tokenWindowHashes(col(textCol), n))
          .as(Seq("__pos", "__h")))
    // windows duplicated across >= 2 distinct docs: collapse in-doc
    // repeats first so the doc-count aggregate is skew-proof
    val dupHashes = windows.select(col("__h"), col("__id")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= 2).select(col("__h"))
    val dupWindows = windows.join(dupHashes, Seq("__h"), "leftsemi")
    // covered token positions = union of [pos, pos+n) over dup windows
    val covered = dupWindows
      .select(col("__id"), explode(sequence(col("__pos"),
        col("__pos") + lit(n - 1))).as("__tok"))
      .distinct()
      .groupBy(col("__id")).agg(count(lit(1)).as("covered_tokens"))
    val dupCounts = dupWindows.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_dup_windows"))
    val base = df.select(col(idCol),
      size(graft.functions.Text.tokens(col(textCol))).cast(LongType)
        .as("n_tokens"))
    base
      .join(dupCounts.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .join(covered.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        round(coalesce(col("covered_tokens"), lit(0L)).cast(DoubleType) /
          greatest(col("n_tokens"), lit(1L)).cast(DoubleType), 6)
          .as("dup_span_frac"))
  }

  /** Excise cross-document duplicated spans — the REMOVAL step of Lee et
    * al. 2022's ExactSubstr dedup (the paper cuts on the signal `stats`
    * measures, then removes the duplicated substrings), composed from the
    * same window fingerprints. Policies:
    *
    *   - `keepFirst = false` (default): EVERY occurrence of an n-token
    *     window shared by >= 2 distinct docs is removed — the paper's
    *     "drop all copies" variant.
    *   - `keepFirst = true`: the globally-first occurrence of each
    *     duplicated window (smallest (id, pos) — ids must be orderable)
    *     survives; all other occurrences are removed. A token covered by
    *     BOTH a surviving canonical window and some other removed window
    *     is removed (removal wins) — the deterministic overlap rule the
    *     oracle replays.
    *
    * Output per input doc: (idCol, n_tokens, n_removed, clean_text) —
    * the NORMALIZED token stream (the same `NgramVec.normalize` stream
    * the fingerprints hash; removal is defined on tokens, so the rebuilt
    * text is token-joined by construction) with removed positions
    * excised.
    *
    * Scale shape: `stats`'s plan (two fingerprint scans, skew-proof
    * pre-collapsed dup-hash aggregate) plus ONE duplication-bounded
    * `collect_set` of removed WINDOW STARTS per AFFECTED doc (state <=
    * windows per doc, rows <= docs with any duplication) and an id-keyed
    * join back that AQE broadcasts when duplication is sparse. The
    * rebuild itself is one whole-stage-codegen scan
    * (`VecExprs.removeTokenSpans`, an interval-merge walk over the
    * sorted start array) — no corpus-token-level shuffle anywhere. The
    * keepFirst canonical aggregate is per-hash min — bounded state,
    * map-side combined, same skew bound as the dup-hash count.
    */
  def remove(df: DataFrame, textCol: String, idCol: String,
             n: Int = 32, keepFirst: Boolean = false): DataFrame = {
    val windows = df.select(col(idCol).as("__id"),
        posexplode(graft.functions.VecExprs.tokenWindowHashes(col(textCol), n))
          .as(Seq("__pos", "__h")))
    val dupHashes = windows.select(col("__h"), col("__id")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= 2).select(col("__h"))
    val dupWindows = windows.join(dupHashes, Seq("__h"), "leftsemi")
    val removalWindows =
      if (!keepFirst) dupWindows
      else {
        val canon = dupWindows.groupBy(col("__h"))
          .agg(min(struct(col("__id"), col("__pos"))).as("__c"))
        dupWindows.join(canon, Seq("__h"))
          .filter(!(col("__c.__id") === col("__id") &&
            col("__c.__pos") === col("__pos")))
          .select(col("__id"), col("__pos"))
      }
    rebuildWithout(df, textCol, idCol, removalWindows, n)
  }

  /** Shared rebuild tail for span-excision operators (`remove`,
    * `Decontaminate.scrubSpans`): (__id, __pos) removal windows ->
    * per-doc WINDOW-START set (duplication-bounded `collect_set`, one
    * element per removed window — expanding to covered positions before
    * the aggregate cost 71 s vs 10 s at the 10x whole-corpus-duplicated
    * rehearsal; the remaining shuffle is the dup-hash aggregate's,
    * window-count-linear by construction) -> id-keyed
    * join back (AQE-broadcastable when removal is sparse) -> one codegen
    * scan that merges the [start, start+n) intervals while rebuilding
    * (`VecExprs.removeTokenSpans`). `n_removed` (distinct covered
    * positions) falls out as n_tokens minus the rebuilt token count —
    * the rebuilt text is space-joined tokens, so a plain split counts it.
    * Output: (idCol, n_tokens, n_removed, clean_text).
    */
  private[operators] def rebuildWithout(df: DataFrame, textCol: String,
      idCol: String, removalWindows: DataFrame, n: Int): DataFrame = {
    val removed = removalWindows
      .groupBy(col("__id")).agg(collect_set(col("__pos")).as("__rm"))
    val emptyPos = array().cast(ArrayType(IntegerType, containsNull = false))
    // null text: n_tokens stays null (size of a null token array) but the
    // rebuild columns coalesce to the no-op verdict (0 removed, empty
    // text) — the rule the DuckDB oracles' coalesce already encodes, so a
    // null-text fixture row cannot break parity
    val clean = coalesce(graft.functions.VecExprs.removeTokenSpans(
      col(textCol), coalesce(col("__rm"), emptyPos), n), lit(""))
    val cleanCount = when(length(col("clean_text")) === 0, lit(0))
      .otherwise(size(split(col("clean_text"), " ")))
    df.select(col(idCol), col(textCol))
      .join(removed.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        size(graft.functions.Text.tokens(col(textCol))).cast(LongType)
          .as("n_tokens"),
        clean.as("clean_text"))
      .select(col(idCol), col("n_tokens"),
        coalesce((col("n_tokens") - cleanCount).cast(LongType), lit(0L))
          .as("n_removed"),
        col("clean_text"))
  }
}
