package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distribution drift between two corpus snapshots (beyond reference —
  * the monitoring station of a recurring training-data pipeline: did this
  * crawl's feature distributions move against the last one?). Per column,
  * the Population Stability Index
  *   PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b)
  * over the REFERENCE frame's discretization (ColumnAssociations.fitBins:
  * equal-width bins for numerics/datetimes, top-category lumping for
  * strings, nulls their own bin) applied to BOTH frames — fitting bins on
  * the reference and transferring them is what makes the comparison
  * well-defined. Empty-bin proportions floor at `eps` (the standard PSI
  * smoothing). Rule of thumb: < 0.1 stable, 0.1–0.25 moderate, > 0.25
  * action.
  *
  * Scale shape: ONE melted label aggregate per frame (map-side combined,
  * output bounded by Σ bin vocabularies) + the fitBins stats jobs on the
  * reference; the PSI arithmetic runs on the tiny per-bin frame. Nothing
  * corpus-sized moves.
  */
object Drift {

  def psi(ref: DataFrame, cur: DataFrame, cols: Seq[String],
          nBins: Int = 10, maxCats: Int = 10,
          eps: Double = 1e-6): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    cols.foreach { c =>
      require(ref.columns.contains(c) && cur.columns.contains(c),
        s"column $c must exist in both frames")
    }
    val plans = ColumnAssociations.fitBins(ref, cols, nBins = nBins,
      maxCats = maxCats)
    def binned(df: DataFrame, side: String) = df
      .select(explode(array(plans.labels.map { case (c, e) =>
        struct(lit(c).as("c"), e.cast(StringType).as("b"))
      }: _*)).as("kv"))
      .groupBy(col("kv.c").as("column_name"), col("kv.b").as("bin"))
      .agg(count(lit(1)).as(s"n_$side"))
    val p = binned(ref, "ref")
    val q = binned(cur, "cur")
    // Frame totals derived FROM the melted aggregates (each row lands in
    // exactly one bin per column, so Σ bin counts within a column = frame
    // row count) — no extra corpus scan, keeping the "one melted aggregate
    // per frame, nothing corpus-sized moves" contract literal. The totals
    // frames are |cols| rows; the joins below are tiny-on-tiny.
    def totalsOf(b: DataFrame, side: String) = b
      .groupBy(col("column_name"))
      .agg(sum(col(s"n_$side")).cast(DoubleType).as(s"tot_$side"))
    // full outer per (column, bin): a bin present in only one frame floors
    // the other side at eps
    val joined = p.join(q, Seq("column_name", "bin"), "full_outer")
      .join(totalsOf(p, "ref"), Seq("column_name"))
      .join(totalsOf(q, "cur"), Seq("column_name"))
    val pFrac = greatest(coalesce(col("n_ref"), lit(0L)).cast(DoubleType) /
      col("tot_ref"), lit(eps))
    val qFrac = greatest(coalesce(col("n_cur"), lit(0L)).cast(DoubleType) /
      col("tot_cur"), lit(eps))
    joined
      .withColumn("__term", (pFrac - qFrac) * log(pFrac / qFrac))
      .groupBy(col("column_name"))
      .agg(round(sum(col("__term")), 6).as("psi"),
        count(lit(1)).cast(LongType).as("n_bins"))
      .orderBy(col("psi").desc, col("column_name"))
  }
}
