package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — the QUERY side is broadcast (queries
  * are few), the corpus is scanned once; per-partition the work is a dense
  * dot-product loop, and the global top-k is a single shuffle of k rows per
  * query. This shape survives 100 TB: no corpus self-join, no global sort.
  *
  * Scale path: `ivfTopK` — k-means-style coarse quantizer (here: deterministic
  * hyperplane buckets, same as Dedup.embeddingLshPairs) restricts each query
  * to matching buckets before the exact re-rank.
  */
object SimilaritySearch {

  /** Hard cap on the brute-force query side: beyond this the broadcast
    * cross product is a scale bug, not a baseline — `ivfTopK` is the path.
    */
  val MaxBruteForceQueries = 10000L

  /** Exact top-k by cosine for each query vector. `queries` must be small
    * (broadcast; enforced via `MaxBruteForceQueries` — one count job):
    * this is the quadratic VERIFICATION baseline, large query sides must
    * route to `ivfTopK`. Ties broken by corpus id ascending for
    * determinism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
                     idCol: String, k: Int): DataFrame = {
    val nQ = queries.count()
    require(nQ <= MaxBruteForceQueries,
      s"bruteForceTopK: $nQ query rows > $MaxBruteForceQueries — the " +
        "broadcast cross product is quadratic; use ivfTopK for large query sides")
    // repartition with an explicit count so the scoring loop is spread over
    // every core — the corpus usually arrives as one parquet split, and the
    // whole O(corpus x queries) dot-product loop would otherwise run inside
    // the scan's single task
    val raw = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__v"))
    val c = raw.repartition(graft.ops.Partitions.cpuSpread(raw), col("corpus_id"))
      .select(col("corpus_id"), Dedup.normalized(col("__v")).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), Dedup.normalized(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine",
        round(graft.functions.VecExprs.arrayDot(col("cv"), col("qv")), 6))
    topK(scored, k)
  }

  /** Global top-k per query WITHOUT a window: the window form range-
    * shuffles EVERY candidate score to sort it, while minKBy keeps a
    * bounded k-element buffer per query with map-side partial aggregation,
    * so only k rows per (query, partition) ever reach the shuffle. Rank
    * order (cosine desc, corpus_id asc) matches the previous window
    * ordering exactly via the (negated-cosine, corpus_id) sort key.
    */
  private[operators] def topK(scored: DataFrame, k: Int): DataFrame =
    // null cosines (null corpus vectors) are dropped, never ranked: the
    // struct sort key would order null fields FIRST, so without the filter a
    // null-vector corpus row would occupy ranks 1..k instead of being
    // excluded (the replaced window form sorted cosine DESC = NULLS LAST)
    scored.filter(col("cosine").isNotNull)
      .groupBy(col("query_id"))
      .agg(graft.functions.AggExprs.minKBy(
        struct(negate(col("cosine")).as("nc"), col("corpus_id").as("corpus_id"),
          col("cosine").as("cosine")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast(LongType).as("rank"),
        col("t.corpus_id").as("corpus_id"), col("t.cosine").as("cosine"))

  /** IVF/LSH ANN: corpus vectors are indexed under `nTables` independent
    * hyperplane-sign bucket keys (multi-table LSH — single-bucket probe=1
    * recall was ~0.2 on the fixture, banding amplifies it to ~0.9+,
    * measured by q_ann_recall); each query probes its own bucket in every
    * table, candidates are deduplicated and exactly re-ranked. Cost per
    * query ~ nTables * |corpus| / 2^planesPerTable candidate rows — the
    * scan reduction vs brute force survives because candidates, not the
    * corpus, are scored. Same output schema as brute force.
    */
  /** Query sides above this row count are never broadcast: a million-query
    * batch (the realistic training-data shape — query set ≈ corpus) blows
    * the broadcast limit, so the candidate join falls back to a shuffle
    * equi-join on (tbl, bkt), which scales to any query count.
    */
  val MaxBroadcastQueries = 100000L

  def ivfTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, k: Int, planesPerTable: Int = 4,
              nTables: Int = 16,
              maxBroadcastQueries: Long = MaxBroadcastQueries): DataFrame = {
    import graft.functions.VecExprs
    // bucket ids via the custom loop-codegen expression (see VecExprs); no
    // persists — each posting frame has exactly ONE consumer (the scored
    // join / its broadcast build)
    val raw = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__v"))
    val c = raw
      // explicit-count repartition: spread the normalize + bucket hashing
      // over every core instead of the scan's single split (CPU, not
      // bytes); size-gated so small corpora don't pay full-width overhead
      .repartition(graft.ops.Partitions.cpuSpread(raw), col("corpus_id"))
      .select(col("corpus_id"), Dedup.normalized(col("__v")).as("cv"))
      .select(col("corpus_id"), col("cv"),
        posexplode(VecExprs.hyperplaneBuckets(col("cv"), nTables, planesPerTable)))
      .select(col("corpus_id"), col("cv"),
        col("pos").as("tbl"), col("col").as("bkt"))
    val q = queries.select(col(idCol).as("query_id"), Dedup.normalized(col(vecCol)).as("qv"))
      .select(col("query_id"), col("qv"),
        posexplode(VecExprs.hyperplaneBuckets(col("qv"), nTables, planesPerTable)))
      .select(col("query_id"), col("qv"),
        col("pos").as("tbl"), col("col").as("bkt"))
    // score BEFORE deduplicating the multi-table candidate hits: the dot
    // product is codegen'd and cheap, and once scored the vectors drop out
    // of the row — the dedup shuffle then carries (ids, cosine) instead of
    // two full vectors per row, with map-side combine collapsing the up-to-
    // nTables duplicate hits per pair before they ever hit the wire
    // (a distinct() here shuffled and hash-compared whole arrays)
    // small query sides broadcast (one count job to decide — honest row
    // count, not a plan-stats guess: filter estimates don't shrink
    // sizeInBytes without CBO); large ones shuffle-join on (tbl, bkt) —
    // both sides are already keyed by bucket, so the join stays an equi
    // shuffle with per-bucket locality and no driver-side materialization
    val nQ = queries.count()
    val qSide = if (nQ <= maxBroadcastQueries) broadcast(q) else q
    val scored = c.join(qSide, Seq("tbl", "bkt"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", round(VecExprs.arrayDot(col("cv"), col("qv")), 6))
      .groupBy(col("query_id"), col("corpus_id"))
      .agg(first(col("cosine")).as("cosine"))
    topK(scored, k)
  }
}
