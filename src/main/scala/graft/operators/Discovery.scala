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

  /** Hash space of the 60-bit md5-prefix hashes (15 hex chars). */
  private val HashSpace: Double = 1152921504606846976.0 // 2^60, exact

  /** KMV (k-minimum-values) sketch estimate of the same scores — the
    * 100 TB path: each column is reduced to its k smallest DISTINCT 60-bit
    * md5 hashes in ONE melted aggregate whose partial state is k-bounded
    * (map-side combine: only k longs per partition per column ever
    * shuffle — measured flat shufW at any Nx, where the exact path's
    * value-keyed join grows linearly). The md5/conv hashing runs in a
    * codegen projection BEFORE the imperative aggregate, so the
    * corpus-sized pass stays compiled. Distinct counts come from the
    * sketch itself (the KMV estimator, Beyer et al. 2007: n̂ = (k−1)·M /
    * h_(k) with M = 2^60; exact when fewer than k distinct hashes exist),
    * so NOTHING value-sized ever leaves the scan. Pair estimates driver-
    * side: jaccard ≈ |U ∩ A ∩ B| / |U| with U = the k smallest of the
    * merged sketches, and |A∩B| ≈ j(n̂a+n̂b)/(1+j) gives inclusion.
    * Deterministic (md5), so the estimates are engine-reproducible and
    * hash-verifiable.
    */
  def joinKeysSketch(left: DataFrame, right: DataFrame,
                     k: Int = 256): DataFrame = {
    require(k >= 16, s"need k >= 16 sketch slots, got $k")
    val lc = left.schema.fields.filter(f => comparable(f.dataType)).map(_.name)
    val rc = right.schema.fields.filter(f => comparable(f.dataType)).map(_.name)
    require(lc.nonEmpty && rc.nonEmpty, "no comparable columns to match")
    def sketchPlan(df: DataFrame, cols: Seq[String], side: String): DataFrame =
      df.select(explode(array(cols.map(c =>
          struct(lit(c).as("c"), col(c).cast(StringType).as("v"))): _*)).as("kv"))
        .filter(col("kv.v").isNotNull)
        // codegen'd hash projection; the imperative aggregate's child is a
        // bare column read (the ColumnAssociations packed-key discipline)
        .select(col("kv.c").as("c"),
          conv(substring(md5(col("kv.v")), 1, 15), 16, 10)
            .cast(LongType).as("h"))
        .groupBy(col("c"))
        .agg(graft.functions.AggExprs.minKDistinctBy(col("h"), k).as("sk"))
        .select(lit(side).as("side"), col("c"), col("sk"))
    def decode(rows: Array[org.apache.spark.sql.Row])
        : Map[String, (Seq[Long], Double)] =
      rows.map { r =>
        val sk = r.getSeq[Long](2).toSeq
        // KMV distinct estimate: sketch not full -> it IS the distinct
        // hash set; full -> (k-1)*M / k-th smallest
        val nd = if (sk.length < k) sk.length.toDouble
                 else (k - 1).toDouble * HashSpace / sk.last.toDouble
        r.getString(1) -> (sk, nd)
      }.toMap
    // ONE action for both sides: the two table scans are independent, and
    // a union lets the scheduler overlap them inside a single job instead
    // of paying two sequential job round-trips (guide §2.6) — at scale the
    // second table's scan starts while the first's tail finishes
    val both = sketchPlan(left, lc.toSeq, "L")
      .unionAll(sketchPlan(right, rc.toSeq, "R")).collect()
    val (skL, skR) = (decode(both.filter(_.getString(0) == "L")),
      decode(both.filter(_.getString(0) == "R")))
    // an entirely-null column (or an empty frame) produces no group and is
    // absent from its sketch map — it can match nothing, so it simply
    // contributes no pairs (the exact path's melt drops it the same way)
    val rows: Seq[org.apache.spark.sql.Row] = (for {
      a <- lc.toSeq if skL.contains(a)
      b <- rc.toSeq if skR.contains(b)
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

  /** Default distinct-pair budget for the exact path: past ~2M distinct
    * (column, value) pairs the value-level equi-join's shuffle starts to
    * dominate; the sketch path answers the same question moving only
    * k longs per column.
    */
  val DefaultMaxExactDistinct: Long = 2000000L

  /** Σ per-column distinct-count estimate in ONE approximate aggregate per
    * table (HLL over the melted (column, value) struct — map-side combined,
    * one scan, no distinct shuffle): the routing probe for `joinKeys` auto
    * mode. ±~2% accuracy is plenty for a routing threshold.
    */
  private def approxDistinctPairsPlan(df: DataFrame,
                                      cols: Seq[String]): DataFrame =
    df.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast(StringType).as("v"))): _*)).as("kv"))
      .filter(col("kv.v").isNotNull)
      .agg(approx_count_distinct(col("kv")).cast(LongType).as("n"))

  /** All pairs with `inclusion` (of the LEFT column's values in the right)
    * and `jaccard`, sorted best-first. `minInclusion` prunes the output,
    * not the computation.
    *
    * `mode` routes between the exact value-level equi-join and the KMV
    * sketch (the `deduplicate` auto-minhash discipline):
    *  - "exact":  always the exact join (columns `inclusion`/`jaccard`).
    *  - "sketch": always `joinKeysSketch` (columns `inclusion_est`/
    *    `jaccard_est` — the schema says which path ran).
    *  - "auto" (default): one approximate distinct-count probe per table
    *    (a single HLL scan each, no shuffle of values); above
    *    `maxExactDistinct` total distinct (column, value) pairs the exact
    *    join's shuffle would carry every distinct value, so it routes to
    *    the sketch. `minInclusion` prunes the sketch output too.
    */
  def joinKeys(left: DataFrame, right: DataFrame,
               minInclusion: Double = 0.0,
               mode: String = "auto",
               maxExactDistinct: Long = DefaultMaxExactDistinct,
               sketchK: Int = 256): DataFrame = {
    require(Set("auto", "exact", "sketch")(mode),
      s"mode must be auto|exact|sketch, got '$mode'")
    val lc = left.schema.fields.filter(f => comparable(f.dataType)).map(_.name)
    val rc = right.schema.fields.filter(f => comparable(f.dataType)).map(_.name)
    require(lc.nonEmpty && rc.nonEmpty, "no comparable columns to match")
    val useSketch = mode == "sketch" || (mode == "auto" && {
      // both probes in ONE action (union of two 1-row aggregates): the two
      // table scans are independent stages of one job, so they overlap
      // instead of running as two sequential driver round-trips
      val est = approxDistinctPairsPlan(left, lc.toSeq)
        .unionAll(approxDistinctPairsPlan(right, rc.toSeq))
        .agg(sum(col("n"))).head().getLong(0)
      est > maxExactDistinct
    })
    if (useSketch)
      return joinKeysSketch(left, right, k = sketchK)
        .filter(col("inclusion_est") >= minInclusion)
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
