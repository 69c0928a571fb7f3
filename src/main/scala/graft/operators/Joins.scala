package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Join family of the reference re-expressed Spark-first.
  *
  *  - `leftJoin`: the reference's only exact join (skrub/_join_utils.py:195-260)
  *    — equi left join with collision-free renaming of right columns.
  *  - `AggJoiner` / `MultiAggJoiner` / `AggTarget`: aggregate-then-join
  *    (skrub/_agg_joiner.py). The aggregation is a plain hash aggregate
  *    (partial + final, map-side combine for free). Join strategy is left to
  *    AQE by default: an aggregate keyed on a high-cardinality key (user_id,
  *    url) is billions of rows at 100 TB, so an unconditional broadcast hint
  *    would OOM the driver — AQE still auto-broadcasts genuinely small sides
  *    at runtime, and `broadcastRight = true` stays available for sides known
  *    small at plan time.
  *
  * `mode` tie-breaking: the reference is backend-divergent (pandas sorts,
  * polars takes first — _agg_joiner.py:99-131); we define mode = SMALLEST of
  * the modal values, which is deterministic and SQL-expressible for the
  * oracle (see SURVEY §7.4.6).
  */
object Joins {

  /** Rename right-side columns that would collide with left (keys excluded),
    * mirroring `pick_column_names` (skrub/_join_utils.py:101).
    */
  def leftJoin(left: DataFrame, right: DataFrame, leftOn: Seq[String],
               rightOn: Seq[String], suffix: String = "_aux",
               broadcastRight: Boolean = false): DataFrame = {
    require(leftOn.length == rightOn.length, "key arity mismatch")
    val collisions = right.columns.toSet.intersect(left.columns.toSet) -- rightOn.toSet
    val renamedCols = collisions.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + suffix))
    // rename right keys to reserved temp names so identical key names never
    // produce ambiguous references after the join
    val tmpKeys = rightOn.indices.map(i => s"__graft_rk_$i")
    val renamed = rightOn.zip(tmpKeys).foldLeft(renamedCols) {
      case (d, (k, tmp)) => d.withColumnRenamed(k, tmp)
    }
    val r = if (broadcastRight) broadcast(renamed) else renamed
    val cond = leftOn.zip(tmpKeys).map { case (l, rr) => left(l) === r(rr) }.reduce(_ && _)
    left.join(r, cond, "left").drop(tmpKeys: _*)
  }

  val SupportedOps: Set[String] =
    Set("count", "mode", "min", "max", "sum", "median", "mean", "std")
  val NumOnlyOps: Set[String] = Set("sum", "median", "mean", "std")

  /** One aggregate expression per (col, op); output named `<col>_<op>`. */
  private def aggExpr(df: DataFrame, c: String, op: String): Column = {
    val out = s"${c}_$op"
    op match {
      case "count"  => count(col(c)).as(out)
      case "min"    => min(col(c)).as(out)
      case "max"    => max(col(c)).as(out)
      case "sum"    => sum(col(c)).as(out)
      case "mean"   => avg(col(c)).as(out)
      case "std"    => stddev_samp(col(c)).as(out)
      case "median" => expr(s"percentile($c, 0.5)").as(out)
      case other    => throw new IllegalArgumentException(s"unsupported op $other")
    }
  }

  /** groupBy + agg over the cross product cols x ops. Plain ops are one hash
    * aggregate; `mode` columns share one melted two-level aggregation per
    * dtype (see `aggregatePerCol`), so the shuffle count is constant in the
    * number of mode columns.
    */
  def aggregate(aux: DataFrame, key: Seq[String], cols: Seq[String],
                ops: Seq[String]): DataFrame =
    aggregatePerCol(aux, key, cols.map(c => c -> ops))

  /** Per-column op lists (`colOps`), so string columns can take mode/count
    * while numeric columns take the numeric ops — same surface as the
    * reference, which validates num-only ops per column (_agg_joiner.py:31).
    */
  def aggregatePerCol(aux: DataFrame, key: Seq[String],
                      colOps: Seq[(String, Seq[String])]): DataFrame = {
    val bad = colOps.flatMap(_._2).filterNot(SupportedOps)
    require(bad.isEmpty, s"unsupported ops: ${bad.mkString(",")}")
    val keyCols = key.map(col)

    val plainExprs = for {
      (c, ops) <- colOps
      op <- ops if op != "mode"
    } yield aggExpr(aux, c, op)
    val plain: Option[DataFrame] =
      if (plainExprs.isEmpty) None
      else Some(aux.groupBy(keyCols: _*).agg(plainExprs.head, plainExprs.tail: _*))

    val modeCols = colOps.collect { case (c, ops) if ops.contains("mode") => c }
    val mode: Option[DataFrame] =
      if (modeCols.isEmpty) None
      else {
        // mode = smallest among most-frequent values: two-level aggregation,
        // value counts then arg-min over (-count, value). ALL mode columns of
        // one dtype are computed in a single MELTED aggregate — explode each
        // row into (key, colIdx, value), count per (key, colIdx, value),
        // arg-min per (key, colIdx), pivot back to wide — so the shuffle
        // count is constant in the number of mode columns (it was linear:
        // one two-level aggregate + one reassembly join per column).
        // Grouping by EXACT dtype keeps each value in its native type, so
        // the "smallest value" tie-break uses native ordering and outputs
        // keep their input dtype (a single all-columns melt would force a
        // common string type and corrupt both).
        val byType = modeCols.groupBy(c => aux.schema(c).dataType).toSeq
          .sortBy(_._1.simpleString)
        val frames = byType.map {
          case (_, Seq(c)) =>
            // a lone mode column skips the melt: the direct two-level
            // aggregate is one explode and one aggregate cheaper (the melt
            // only amortizes when >= 2 columns share it)
            aux.groupBy((keyCols :+ col(c)): _*)
              .agg(count(col(c)).as("__cnt"))
              .groupBy(keyCols: _*)
              .agg(min_by(col(c), struct(negate(col("__cnt")), col(c))).as(s"${c}_mode"))
          case (_, cols) =>
          val entries = cols.zipWithIndex.map { case (c, i) =>
            struct(lit(i).as("ci"), col(c).as("v"))
          }
          val melted = aux
            .select((keyCols :+ explode(array(entries: _*)).as("__e")): _*)
            .select((keyCols :+ col("__e.ci").as("__ci") :+ col("__e.v").as("__v")): _*)
          val counted = melted
            .groupBy((keyCols :+ col("__ci") :+ col("__v")): _*)
            .agg(count(col("__v")).as("__cnt"))
            .groupBy((keyCols :+ col("__ci")): _*)
            .agg(min_by(col("__v"), struct(negate(col("__cnt")), col("__v"))).as("__mode"))
          // pivot (key, colIdx, mode) back to one wide row per key; max
          // ignores the nulls of the other colIdx slots
          val wide = cols.zipWithIndex.map { case (c, i) =>
            max(when(col("__ci") === i, col("__mode"))).as(s"${c}_mode")
          }
          counted.groupBy(keyCols: _*).agg(wide.head, wide.tail: _*)
        }
        Some(frames.reduce((a, b) => a.join(b, key, "full")))
      }

    (plain, mode) match {
      case (Some(p), Some(m)) => p.join(m, key, "full")
      case (Some(p), None)    => p
      case (None, Some(m))    => m
      case _ => throw new IllegalArgumentException("no ops")
    }
  }

  /** AggJoiner: aggregate `aux` on `auxKey` with `ops` over `cols`, then left
    * join onto `main` on mainKey=auxKey. Join strategy AQE-decided (see class
    * doc).
    */
  def aggJoin(main: DataFrame, aux: DataFrame, mainKey: Seq[String],
              auxKey: Seq[String], cols: Seq[String], ops: Seq[String]): DataFrame =
    leftJoin(main, aggregate(aux, auxKey, cols, ops), mainKey, auxKey)

  /** AggJoiner with per-column ops. */
  def aggJoinPerCol(main: DataFrame, aux: DataFrame, mainKey: Seq[String],
                    auxKey: Seq[String], colOps: Seq[(String, Seq[String])]): DataFrame =
    leftJoin(main, aggregatePerCol(aux, auxKey, colOps), mainKey, auxKey)

  final case class AuxSpec(aux: DataFrame, auxKey: Seq[String],
                           cols: Seq[String], ops: Seq[String])

  /** MultiAggJoiner (skrub/_multi_agg_joiner.py): fold of AggJoiners. */
  def multiAggJoin(main: DataFrame, mainKey: Seq[String], specs: Seq[AuxSpec]): DataFrame =
    specs.foldLeft(main)((m, s) => aggJoin(m, s.aux, mainKey, s.auxKey, s.cols, s.ops))

  /** AggTarget (skrub/_agg_joiner.py:411): aggregate the main table's target
    * column by key and join the stats back as features.
    */
  def aggTarget(main: DataFrame, key: Seq[String], target: String,
                ops: Seq[String]): DataFrame =
    aggJoin(main, main.select((key :+ target).map(col): _*), key, key, Seq(target), ops)
}
