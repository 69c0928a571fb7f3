package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** The end-to-end training-data curation sweep — the composition every
  * large-scale pipeline runs before training, as ONE declarative plan:
  *
  *   1. quality gate     (`TextAnalysis.qualityFeatures.quality_ok`)
  *   2. repetition gate  (`TextAnalysis.repetitionFeatures.repetition_ok`)
  *   3. exact dedup      (keep the minimum id per content fingerprint)
  *   4. decontamination  (drop docs sharing a word n-gram with `bench`)
  *
  * Each stage is individually hash-verified by its own registered query;
  * this operator proves they COMPOSE — the stages share one scan of the
  * corpus (both gates and the fingerprint are column expressions on the
  * same pass), the dedup verdict is ONE fingerprint-partitioned window
  * over that pass (keeper = min id among gate survivors in the
  * fingerprint group — a conditional min, so no second scan and no
  * survivor-aggregate-plus-join-back), and decontamination adds its one
  * gram probe + doc-keyed aggregate. Nothing quadratic, nothing
  * driver-side: two corpus scans (gates/fingerprint branch, gram probe)
  * and three corpus-keyed shuffles — the fingerprint window, the
  * decontamination doc aggregate, and the id equi-join that aligns the
  * two branches (AQE broadcasts it on small verdict frames; at full
  * scale it is an honest sort-merge join on the id).
  *
  * Output: one row per INPUT doc with the per-stage verdicts and the
  * final `kept` flag — the auditable form (a pipeline that only returns
  * survivors cannot answer "why did doc X disappear?"). Filter on `kept`
  * for the survivor frame.
  *
  * `decontaminateN` follows `Decontaminate.flag`'s default (8, the
  * published GPT-3/PaLM-style window) — one knob, one default; the
  * registered query passes 4 explicitly for this short-doc corpus.
  */
object Curation {

  def sweep(docs: DataFrame, bench: DataFrame, textCol: String,
            idCol: String, decontaminateN: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gated = TextAnalysis.repetitionFeatures(
        TextAnalysis.qualityFeatures(docs, textCol), textCol)
      .withColumn("__fp", Text.contentFingerprint(col(textCol)))
      .select(col(idCol), col("quality_ok"), col("repetition_ok"), col("__fp"))
    // exact dedup among docs that survive both gates: min id per
    // fingerprint wins; gated-out docs are not dedup candidates (they are
    // already gone) and must not claim a fingerprint from a kept doc.
    // Conditional min over the fingerprint window: groups whose every doc
    // failed a gate get a null keeper -> exact_unique false via coalesce
    val keeper = min(when(col("quality_ok") && col("repetition_ok"),
      col(idCol))).over(Window.partitionBy(col("__fp")))
    val deduped = gated
      .withColumn("exact_unique", coalesce(col(idCol) === keeper, lit(false)))
      .select(col(idCol), col("quality_ok"), col("repetition_ok"),
        col("exact_unique"))
    val contaminated = Decontaminate.flag(docs, bench, textCol, idCol,
      n = decontaminateN)
    deduped.join(contaminated, Seq(idCol))
      .withColumn("kept",
        col("quality_ok") && col("repetition_ok") && col("exact_unique") &&
          !col("contaminated"))
  }
}
