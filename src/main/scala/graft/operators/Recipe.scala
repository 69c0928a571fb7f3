package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The end-to-end data-recipe composition — the selection family
  * (classifier gate → leakage-safe split → per-source token budgets →
  * fractional-epoch repetition → sequence packing) as ONE composed plan
  * with per-stage verdict columns, the `Curation.sweep` discipline
  * applied to the stages a training run's RECIPE states (which docs
  * ship, how often, and in which packed sequence) rather than the
  * cleaning stages `sweepFull` covers (quality/repetition/dedup/decon).
  * A user runs the cleaning sweep first, then this recipe on the
  * survivors; both emit one verdict row per input doc so every drop is
  * attributable.
  *
  * Stages and their verdict columns:
  *   1. GPT-3-style quality classifier (`Dsir.classifierFlag`) —
  *      `score_micro`, `quality_ok`. Fit on bounded pos/neg seeds; the
  *      verdict is a pure codegen scan (zero shuffle).
  *   2. Leakage-safe split (`Splits.withLeakageSafeLabel`) — `split`.
  *      A content-fingerprint predicate: duplicated pages cannot
  *      straddle train/test, and the filter pushes down.
  *   3. Per-source token budgets (`Budget.selectToBudgetPerGroup`) over
  *      the quality-passing train pool, priority = classifier score —
  *      `budget_kept`. One group-partitioned window.
  *   4. Fractional-epoch repetition (`Mix.repeatEpochs`) on the budget
  *      survivors — `repeat_idx` (docs from sources with epochs > 1
  *      appear once per epoch; epoch 0 sources drop). Broadcast epoch
  *      table + md5 threshold + explode: zero shuffle.
  *   5. Sequence packing (`Pack.sequences`) of the repeated stream,
  *      per-source shards in (doc, repeat) order — `pack_id`,
  *      `pack_tokens`. One group-partitioned window.
  *
  * Output: one row per (input doc × repeat) for shipped docs — dropped
  * docs keep exactly one row with null `repeat_idx`/`pack_id` — with
  * all verdict columns and `kept = repeat_idx IS NOT NULL`.
  *
  * 100 TB shape: stages 1, 2, 4 are pure scans (bounded fit state
  * broadcast); stages 3 and 5 are one source-partitioned window each —
  * and BOTH are mega-source-proof: stage 3 auto-routes any source above
  * `maxGroupRows` through the global histogram descent scoped to that
  * source (identical greedy semantics, no single-task sort at any skew —
  * `Budget.selectToBudgetPerGroup`'s routing), and stage 5 accepts
  * `packSubShards > 1` to split each source's pack stream into
  * deterministic sub-shards (`Pack.sequences` policy variant; pack ids
  * namespaced per sub-shard) — and GUARDS the default: when any source's
  * repeated per-task stream (its repeated rows / `packSubShards`) would
  * exceed `maxGroupRows` — i.e. the source holds more than
  * `maxGroupRows * packSubShards` repeated rows in total — packing fails
  * loudly with the `packSubShards` value that restores the bound (pack
  * grouping is policy, so it must not silently auto-route the way the
  * budget stage does). The verdict frame feeds two consumers (the
  * survivor path and the output join), so it materializes ONCE — to
  * parquet under `checkpointDir` (the recoverable phase discipline) or
  * via localCheckpoint as the single-session fallback — exactly the
  * `Curation.sweepFull` rhythm. Retention: the per-run
  * `recipe_verdicts_*` leaf under `checkpointDir` must outlive every
  * consumer of the RETURNED frame (reads are lazy), so it is never
  * auto-deleted — call `Curation.pruneCheckpoints(spark, dir, keepLast)`
  * between runs (prunes per leaf family, so one pipelineFull run's
  * curation + recipe leaf pair survives together).
  *
  * Reference shape: skrub has no training-recipe surface; the stage
  * list follows the published recipes this family already mirrors
  * piecewise (GPT-3 quality filtering, LLaMA fractional epochs).
  */
object Recipe {

  def compose(docs: DataFrame, textCol: String, idCol: String,
              sourceCol: String, pos: DataFrame, neg: DataFrame,
              budgets: Map[String, Long], epochs: Map[String, Double],
              nBuckets: Int = 10000, minMeanMicro: Long = 0L,
              testFraction: Double = 0.3,
              splitSeed: Long = 7L, epochSeed: Long = 42L,
              packBudget: Long = 256L,
              checkpointDir: String = "",
              maxGroupRows: Long = 1L << 22,
              packSubShards: Int = 1): DataFrame = {
    val reserved = Seq("score_micro", "quality_ok", "split", "n_toks",
      "budget_kept", "repeat_idx", "pack_id", "pack_tokens", "kept")
    val clash = docs.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"Recipe.compose: input already has ${clash.mkString(", ")} — rename first")

    // stage 1+2: classifier verdict and split label — two scan-shaped
    // stages joined on the id (the classifier's fit state is bounded).
    // `base` (one narrow row per doc) feeds THREE actions before the
    // verdict materializes (the budget selector's probe aggregate, its
    // window, and the checkpoint write), so it is persisted for the span
    // of this call — without it every action re-runs the classifier
    // scoring scan + tokenize + join (measured: the r12 10x recipe ratio
    // dropped from ~2.2 to well inside 2x with this persist).
    val qc = Dsir.classifierFlag(docs, textCol, idCol, pos, neg, nBuckets,
        minMeanMicro)
      .withColumnRenamed("doc_id", idCol)
      .select(col(idCol), col("score_micro"),
        col("quality_pred").as("quality_ok"))
    val base = graft.plans.Splits.withLeakageSafeLabel(
        docs.select(col(idCol), col(sourceCol), col(textCol)),
        textCol, testFraction, splitSeed)
      .withColumn("n_toks", size(graft.functions.Text.tokens(
        coalesce(col(textCol), lit("")))).cast(LongType))
      .drop(textCol)
      .join(qc, Seq(idCol))
      .persist()

    // stage 3: per-source token budgets over the quality-passing train
    // pool, best classifier scores first
    val trainPool = base
      .filter(col("quality_ok") && col("split") === "train")
      .select(col(idCol), col(sourceCol), col("n_toks"), col("score_micro"))
    val budgeted = Budget.selectToBudgetPerGroup(trainPool, sourceCol,
      "n_toks", "score_micro", idCol, budgets, maxGroupRows)
    val verdictPlan = base
      .join(budgeted.filter(col("kept")).select(col(idCol))
        .withColumn("__bk", lit(true)), Seq(idCol), "left")
      .withColumn("budget_kept", coalesce(col("__bk"), lit(false)))
      .drop("__bk")

    // the verdict frame feeds the survivor path AND the output join —
    // materialize once (sweepFull's checkpoint discipline)
    val verdict =
      if (checkpointDir.nonEmpty) {
        // per-run unique leaf: two composes sharing a checkpointDir must
        // not clobber each other's verdict parquet mid-read
        val path = s"${checkpointDir.stripSuffix("/")}/" +
          Curation.verdictLeaf("recipe")
        verdictPlan.write.mode("overwrite").parquet(path)
        docs.sparkSession.read.parquet(path)
      } else verdictPlan.localCheckpoint(true)
    // the verdict checkpoint was base's last consumer
    base.unpersist()

    // stage 4+5: repeat the survivors per the epoch schedule, then pack
    // per-source shards in (doc, repeat) composite order — id-type
    // agnostic (string URLs/UUIDs pack as naturally as dense numerics;
    // ids compare bytewise)
    val survivors = verdict.filter(col("budget_kept"))
      .select(col(idCol), col(sourceCol), col("n_toks"))
    val repeated = Mix.repeatEpochs(survivors, sourceCol, Seq(idCol),
      epochs, epochSeed)
    // maxGroupRows doubles as the pack guard bound: stage 3 ROUTES an
    // oversized source (semantics-identical descent), stage 5 cannot
    // (pack grouping is policy) so it REFUSES loudly with the
    // packSubShards value that restores the bound — the r12 verdict's
    // un-guarded default-path edge, closed. `repeated` derives from the
    // verdict checkpoint, so the probe's extra action re-reads one narrow
    // parquet, not the pipeline.
    val packed = Pack.sequencesBy(repeated, "n_toks", packBudget, sourceCol,
        Seq(idCol, "repeat_idx"), subShards = packSubShards,
        maxShardRows = maxGroupRows)
      .select(col(idCol), col("repeat_idx"), col("pack_id"),
        col("pack_tokens"))

    verdict.join(packed, Seq(idCol), "left")
      .withColumn("kept", col("repeat_idx").isNotNull)
      .select(col(idCol), col(sourceCol), col("n_toks"), col("score_micro"),
        col("quality_ok"), col("split"), col("budget_kept"),
        col("repeat_idx"), col("pack_id"), col("pack_tokens"), col("kept"))
  }

  /** The ELEVEN-STAGE end-to-end: `Curation.sweepFull`'s six cleaning
    * gates (quality → repetition → LM-perplexity → exact dedup →
    * decontamination → temperature mixing) feeding `compose`'s five
    * selection stages (classifier → leakage split → per-source budgets →
    * epochs → packing) as ONE composed plan — the full raw-crawl →
    * training-packs path with EVERY stage verdict surviving to the
    * output. One row per input doc; docs the sweep drops carry null
    * recipe columns; docs the recipe ships multiply per repeat.
    *
    * The recipe's classifier seeds come from the SURVIVOR pool itself
    * (positive = the survivors' minimum source, negative = the rest) so
    * the second half is self-contained on its input, exactly like a
    * standalone `compose` call.
    *
    * Columns: the sweep verdicts (`quality_ok repetition_ok lm_ok
    * exact_unique contaminated avg_nll rate mix_sampled sweep_kept`) +
    * the recipe verdicts (`n_toks score_micro clf_ok split budget_kept
    * repeat_idx pack_id pack_tokens`) + final `kept`
    * (= shipped in some pack).
    *
    * Checkpoint discipline: exactly TWO materializations — `sweepFull`'s
    * verdict frame and `compose`'s — each feeding its own two consumers;
    * everything between is narrow joins over those checkpoints plus
    * re-scans of the raw input (the same class of cost a standalone
    * `compose` pays on its input table). Same `checkpointDir` retention
    * note as `compose`: per-run leaves persist, prune between runs.
    */
  def pipelineFull(docs: DataFrame, bench: DataFrame, textCol: String,
                   idCol: String, sourceCol: String,
                   budgets: Map[String, Long], epochs: Map[String, Double],
                   decontaminateN: Int = 8, lmVocabSize: Int = 20000,
                   lmMinCount: Long = 2L, lmMaxBigrams: Int = 1000000,
                   lmMaxNll: Double = 7.0, mixTemperature: Double = 2.0,
                   mixTargetFrac: Double = 0.5, mixSeed: Long = 42L,
                   nBuckets: Int = 10000, minMeanMicro: Long = 0L,
                   testFraction: Double = 0.3, splitSeed: Long = 7L,
                   epochSeed: Long = 42L, packBudget: Long = 256L,
                   checkpointDir: String = "",
                   maxGroupRows: Long = 1L << 22,
                   packSubShards: Int = 1,
                   sweepScoreCol: String = ""): DataFrame = {
    val sweepV = Curation.sweepFull(docs, bench, textCol, idCol, sourceCol,
        decontaminateN, lmVocabSize, lmMinCount, lmMaxBigrams, lmMaxNll,
        mixTemperature, mixTargetFrac, mixSeed, checkpointDir, sweepScoreCol)
      .withColumnRenamed("kept", "sweep_kept")
    val survivors = docs.select(col(idCol), col(sourceCol), col(textCol))
      .join(sweepV.filter(col("sweep_kept")).select(col(idCol)), Seq(idCol))
    val minSrcRow = survivors.agg(min(col(sourceCol))).head()
    require(!minSrcRow.isNullAt(0),
      "Recipe.pipelineFull: the curation sweep kept no documents — " +
        "nothing to seed the recipe classifier with; relax the sweep gates")
    val minSrc = minSrcRow.getString(0)
    val recipeV = compose(survivors, textCol, idCol, sourceCol,
        pos = survivors.filter(col(sourceCol) === minSrc),
        neg = survivors.filter(col(sourceCol) =!= minSrc),
        budgets, epochs, nBuckets, minMeanMicro, testFraction, splitSeed,
        epochSeed, packBudget, checkpointDir, maxGroupRows, packSubShards)
      .withColumnRenamed("quality_ok", "clf_ok")
      .drop(sourceCol, "kept")
    sweepV.join(recipeV, Seq(idCol), "left")
      .withColumn("kept", col("repeat_idx").isNotNull)
  }
}
