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
    *
    * ONE hash aggregate for everything, mode included: `mode` uses the
    * count-map ModeAgg aggregate (graft.functions.AggExprs), so there is a
    * single exchange on the key and NO reassembly joins. (The previous shape
    * — a two-level count/arg-min aggregation melted across mode columns,
    * full-joined back onto the plain aggregate — cost three exchanges plus a
    * join; the count-map partial buffers carry the same bytes the first-level
    * aggregation's shuffle rows did.)
    */
  def aggregatePerCol(aux: DataFrame, key: Seq[String],
                      colOps: Seq[(String, Seq[String])]): DataFrame = {
    val bad = colOps.flatMap(_._2).filterNot(SupportedOps)
    require(bad.isEmpty, s"unsupported ops: ${bad.mkString(",")}")
    val exprs = for {
      (c, ops) <- colOps
      op <- ops
    } yield
      if (op == "mode") graft.functions.AggExprs.modeAgg(col(c)).as(s"${c}_mode")
      else aggExpr(aux, c, op)
    require(exprs.nonEmpty, "no ops")
    aux.groupBy(key.map(col): _*).agg(exprs.head, exprs.tail: _*)
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
