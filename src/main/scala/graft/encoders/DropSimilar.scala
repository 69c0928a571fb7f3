package graft.encoders

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.ColumnAssociations

/** DropSimilar (reference skrub/_drop_similar.py:25-169): for every column
  * pair whose Cramér's V association is >= `threshold` (reference default 1),
  * drop one of the two — the later one in schema order, keeping the first
  * surviving column of each near-duplicate group.
  *
  * Cost = one ColumnAssociations.allPairs job (single contingency pass);
  * the greedy resolution runs on the (tiny) pair list on the driver.
  */
object DropSimilar {

  /** Columns to drop (fit). */
  def fit(df: DataFrame, threshold: Double = 1.0): Seq[String] = {
    val pairs = ColumnAssociations.allPairs(df)
      .filter(col("cramer_v") >= threshold)
      .select(col("left_column_name"), col("right_column_name"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val order = df.columns.zipWithIndex.toMap
    val dropped = scala.collection.mutable.LinkedHashSet[String]()
    pairs.sortBy { case (a, b) => (order(a), order(b)) }.foreach { case (a, b) =>
      if (!dropped(a) && !dropped(b)) dropped += (if (order(a) <= order(b)) b else a)
    }
    dropped.toSeq
  }

  def transform(df: DataFrame, threshold: Double = 1.0): DataFrame =
    df.drop(fit(df, threshold): _*)
}
