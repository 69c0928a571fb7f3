package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VecExprs

/** Benchmark decontamination: flag (or drop) training documents that share
  * any word n-gram with a held-out benchmark/evaluation corpus — the
  * standard "test-set contamination" sweep every large-scale training-data
  * pipeline runs before training (GPT-3 appendix C / PaLM-style 8-13-gram
  * overlap rules; the reference library has no distributed analogue — this
  * is part of graft's beyond-reference training-data surface, like
  * `Dedup`/`SimilaritySearch`).
  *
  * Shape at 100 TB: the benchmark side is SMALL by construction (eval sets
  * are MBs, not TBs), so its distinct n-gram set broadcasts; the training
  * side is one shingle scan + a map-side broadcast-hash join (no shuffle of
  * the corpus) and ONE groupBy(doc) aggregation whose input is bounded by
  * the corpus' shingle count. Nothing in the plan is quadratic and the
  * only wide exchange is keyed by doc id. If the benchmark ever outgrew
  * the broadcast limit, the same plan degrades gracefully to a shuffled
  * equi-join on the gram key — semantics unchanged.
  *
  * N-gram semantics are `Text.shingleSet` / `VecExprs.TokenShingles`
  * (normalized tokens, per-doc distinct, whole-text shingle for docs
  * shorter than n tokens) so a short benchmark line still contaminates its
  * exact copies.
  */
object Decontaminate {

  /** `(idCol, contaminated)` for every training row: true iff the doc
    * shares >= 1 word n-gram with `bench`.
    */
  def flag(train: DataFrame, bench: DataFrame, textCol: String,
           idCol: String, n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(explode(VecExprs.tokenShingles(col(textCol), n)).as("gram"))
      .distinct()
      .withColumn("__hit", lit(true))
    // TokenShingles emits >= 1 shingle for every non-null text, so the
    // explode cannot drop docs; null text -> no shingles -> explode_outer
    // keeps the row with a null gram (joins to nothing, contaminated=false)
    train
      .select(col(idCol),
        explode_outer(VecExprs.tokenShingles(col(textCol), n)).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(max(coalesce(col("__hit"), lit(false))).as("contaminated"))
  }

  /** Training rows with every contaminated doc removed. */
  def clean(train: DataFrame, bench: DataFrame, textCol: String,
            idCol: String, n: Int = 8): DataFrame =
    train.join(
      flag(train, bench, textCol, idCol, n).filter(col("contaminated"))
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
