package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Line-level boilerplate removal (the RefinedWeb/CCNet curation stage the
  * document-level dedups cannot express): a line that recurs verbatim
  * across many documents of the SAME source is almost surely template
  * chrome — headers, footers, cookie banners, "subscribe" calls — and is
  * stripped from every doc while the surrounding prose is kept. Scoping
  * the frequency count to the source is what makes the rule safe: a
  * sentence popular across unrelated sources is content, the same sentence
  * in 80% of one domain's pages is template.
  *
  * Rule: drop a (non-empty) line occurring in >= `minDocs` DISTINCT docs
  * of its source. Output: one row per input doc — idCol, sourceCol,
  * `clean_text` (surviving lines re-joined in order), `n_lines_kept`,
  * `n_lines_removed`. Docs whose every line is boilerplate survive with
  * empty clean_text (the census form — a downstream min-length gate
  * decides their fate, not this operator).
  *
  * Scale shape: one posexplode scan; the per-doc line multiset collapses
  * FIRST on (source, line, id) — map-side combine bounds any
  * hyper-repeated line within a doc — then on (source, line) for the
  * distinct-doc count; the boilerplate verdict equi-joins back on
  * (source, line); one doc-keyed aggregate rebuilds the text (sort_array
  * over in-doc positions — bounded by doc length, never a window over the
  * corpus). Three corpus-keyed shuffles, all with partial aggregation;
  * nothing driver-side.
  */
object Boilerplate {

  def removeFrequentLines(df: DataFrame, textCol: String, idCol: String,
                          sourceCol: String, minDocs: Int,
                          sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol), col(sourceCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__line")))
      .filter(length(trim(col("__line"))) > 0)
    // distinct-doc count per (source, line): collapse in-doc repeats first
    val perDoc = lines.groupBy(col(sourceCol), col("__line"), col(idCol))
      .agg(count(lit(1)).as("__in_doc"))
    val boiler = perDoc.groupBy(col(sourceCol), col("__line"))
      .agg(count(lit(1)).as("__n_docs"))
      .filter(col("__n_docs") >= minDocs)
      .select(col(sourceCol), col("__line"), lit(true).as("__boiler"))
    val flagged = lines.join(boiler, Seq(sourceCol, "__line"), "left")
      .withColumn("__drop", coalesce(col("__boiler"), lit(false)))
    val rebuilt = flagged.groupBy(col(idCol))
      .agg(
        sum(when(col("__drop"), 1L).otherwise(0L)).as("n_lines_removed"),
        sum(when(col("__drop"), 0L).otherwise(1L)).as("n_lines_kept"),
        array_join(transform(
          sort_array(collect_list(when(!col("__drop"),
            struct(col("__pos"), col("__line"))))),
          x => x.getField("__line")), sep).as("clean_text"))
    df.select(col(idCol), col(sourceCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col(sourceCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        coalesce(col("n_lines_removed"), lit(0L)).as("n_lines_removed"))
  }
}
