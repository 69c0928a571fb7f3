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

  /** KMV (k-minimum-values) sketch estimate of the same scores — the
    * 100 TB path: instead of the exact value-level equi-join (whose
    * shuffle carries every distinct value), each column is reduced to its
    * k smallest 60-bit md5 hashes (one bounded MinKBy aggregate — k longs
    * per column leave the executors) plus its exact distinct count, and
    * the pair estimates are computed driver-side from the sketches:
    * jaccard ≈ |U ∩ A ∩ B| / |U| with U = the k smallest of the merged
    * sketches (Beyer et al. 2007), and |A∩B| ≈ j(na+nb)/(1+j) gives
    * inclusion. Deterministic (md5), so the estimates themselves are
    * engine-reproducible and hash-verifiable.
    */
  def joinKeysSketch(left: DataFrame, right: DataFrame,
                     k: Int = 256): DataFrame = {
    require(k >= 16, s"need k >= 16 sketch slots, got $k")
    val lc = left.schema.fields.filter(f => comparable(f.dataType)).map(_.name)
    val rc = right.schema.fields.filter(f => comparable(f.dataType)).map(_.name)
    require(lc.nonEmpty && rc.nonEmpty, "no comparable columns to match")
    def hashed(df: DataFrame, cols: Seq[String], side: String) =
      melted(df, cols, side)
        .select(col(s"${side}_column").as("c"),
          conv(substring(md5(col("v")), 1, 15), 16, 10)
            .cast(LongType).as("h"))
        .distinct()
    def sketchOf(df: DataFrame, cols: Seq[String], side: String)
        : Map[String, (Seq[Long], Long)] =
      hashed(df, cols, side).groupBy(col("c"))
        .agg(graft.functions.AggExprs.minKBy(col("h"), k).as("sk"),
          count(lit(1)).as("nd"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getSeq[Long](1).toSeq, r.getLong(2))).toMap
    val (skL, skR) = (sketchOf(left, lc.toSeq, "left"),
      sketchOf(right, rc.toSeq, "right"))
    val rows: Seq[org.apache.spark.sql.Row] = (for {
      a <- lc.toSeq; b <- rc.toSeq
      (sa, na) = skL(a); (sb, nb) = skR(b)
    } yield {
      val u = (sa ++ sb).distinct.sorted.take(k)
      val aSet = sa.toSet; val bSet = sb.toSet
      val inter = u.count(h => aSet(h) && bSet(h))
      val j = if (u.isEmpty) 0.0 else inter.toDouble / u.length
      val interEst = j * (na + nb) / (1.0 + j)
      val incl = if (na == 0) 0.0 else math.min(1.0, interEst / na)
      def r6(v: Double) = java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      org.apache.spark.sql.Row(a, b, r6(incl), r6(j))
    }).filter(_.getDouble(3) > 0.0)
    import scala.jdk.CollectionConverters._
    left.sparkSession.createDataFrame(rows.asJava, StructType(Seq(
        StructField("left_column", StringType, nullable = false),
        StructField("right_column", StringType, nullable = false),
        StructField("inclusion_est", DoubleType, nullable = false),
        StructField("jaccard_est", DoubleType, nullable = false))))
      .orderBy(col("inclusion_est").desc, col("jaccard_est").desc,
        col("left_column"), col("right_column"))
  }

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
