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
  * same pass), then the plan pays one fingerprint-keyed aggregate + join
  * for dedup and one broadcast probe + doc-keyed aggregate for
  * decontamination. Nothing quadratic, nothing driver-side; Catalyst
  * pipelines the gates into the dedup shuffle's map side, so at 100 TB
  * the filters run where the data is read, and everything the gates drop
  * never reaches a shuffle.
  *
  * Output: one row per INPUT doc with the per-stage verdicts and the
  * final `kept` flag — the auditable form (a pipeline that only returns
  * survivors cannot answer "why did doc X disappear?"). Filter on `kept`
  * for the survivor frame.
  */
object Curation {

  def sweep(docs: DataFrame, bench: DataFrame, textCol: String,
            idCol: String, decontaminateN: Int = 4): DataFrame = {
    val gated = TextAnalysis.repetitionFeatures(
        TextAnalysis.qualityFeatures(docs, textCol), textCol)
      .withColumn("__fp", Text.contentFingerprint(col(textCol)))
      .select(col(idCol), col("quality_ok"), col("repetition_ok"), col("__fp"))
    // exact dedup among docs that survive both gates: min id per
    // fingerprint wins; gated-out docs are not dedup candidates (they are
    // already gone) and must not claim a fingerprint from a kept doc
    val keepers = gated.filter(col("quality_ok") && col("repetition_ok"))
      .groupBy(col("__fp")).agg(min(col(idCol)).as("__keeper"))
    val deduped = gated
      .join(keepers, Seq("__fp"), "left")
      .withColumn("exact_unique", col(idCol) === col("__keeper"))
      .select(col(idCol), col("quality_ok"), col("repetition_ok"),
        coalesce(col("exact_unique"), lit(false)).as("exact_unique"))
    val contaminated = Decontaminate.flag(docs, bench, textCol, idCol,
      n = decontaminateN)
    deduped.join(contaminated, Seq(idCol))
      .withColumn("kept",
        col("quality_ok") && col("repetition_ok") && col("exact_unique") &&
          !col("contaminated"))
  }
}
