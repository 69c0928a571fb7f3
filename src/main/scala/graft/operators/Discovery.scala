package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Join-key discovery (beyond reference, in the reference ecosystem's
  * data-integration direction): score every (left column, right column)
  * pair by distinct-value INCLUSION — |A ∩ B| / |A|, the
  * foreign-key-candidate signal (a true FK has inclusion ≈ 1 into its
  * dimension) — and Jaccard overlap, so "which columns join these
  * tables?" is one query instead of manual inspection.
  *
  * Scale shape: each table is melted ONCE to distinct (column, value)
  * pairs (map-side combined aggregate, output bounded by Σ per-column
  * distinct counts), the two pair sets equi-join on value (a value
  * matches at most |colsA| × |colsB| ways, so fan-out is schema- not
  * data-bounded), and one tiny (colA, colB) count aggregate finishes.
  * Values compare as strings (cross-type joins like int keys vs string
  * codes still surface); nulls are excluded on both sides.
  */
object Discovery {

  private def comparable(dt: DataType): Boolean = dt match {
    case StringType | _: NumericType | BooleanType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def melted(df: DataFrame, cols: Seq[String], side: String) =
    df.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast(StringType).as("v"))): _*)).as("kv"))
      .select(col("kv.c").as(s"${side}_column"), col("kv.v").as("v"))
      .filter(col("v").isNotNull)
      .distinct()

  /** All pairs with `inclusion` (of the LEFT column's values in the right)
    * and `jaccard`, sorted best-first. `minInclusion` prunes the output,
    * not the computation.
    */
  def joinKeys(left: DataFrame, right: DataFrame,
               minInclusion: Double = 0.0): DataFrame = {
    val lc = left.schema.fields.filter(f => comparable(f.dataType)).map(_.name)
    val rc = right.schema.fields.filter(f => comparable(f.dataType)).map(_.name)
    require(lc.nonEmpty && rc.nonEmpty, "no comparable columns to match")
    val va = melted(left, lc.toSeq, "left")
    val vb = melted(right, rc.toSeq, "right")
    val na = va.groupBy(col("left_column")).agg(count(lit(1)).as("__na"))
    val nb = vb.groupBy(col("right_column")).agg(count(lit(1)).as("__nb"))
    val inter = va.join(vb, "v")
      .groupBy(col("left_column"), col("right_column"))
      .agg(count(lit(1)).as("__ni"))
    inter.join(na, "left_column").join(nb, "right_column")
      .select(col("left_column"), col("right_column"),
        round(col("__ni").cast(DoubleType) / col("__na"), 6).as("inclusion"),
        round(col("__ni").cast(DoubleType) /
          (col("__na") + col("__nb") - col("__ni")), 6).as("jaccard"))
      .filter(col("inclusion") >= minInclusion)
      .orderBy(col("inclusion").desc, col("jaccard").desc,
        col("left_column"), col("right_column"))
  }
}
