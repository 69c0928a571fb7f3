package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — enrich each left row with the LATEST right row whose
  * timestamp is <= the left row's, within the same keys (the time-series
  * join behind feature backfills, point-in-time-correct training joins,
  * and "state at event time" lookups; kdb/pandas `merge_asof` and
  * DuckDB's native ASOF JOIN are the single-machine forms — Spark has no
  * built-in).
  *
  * Spark-shaped as the ONE-PASS union-window form, not a range join: tag
  * both sides, union by name, and within each key partition sort by
  * (ts, side, tie) — right rows sort BEFORE left rows at equal
  * timestamps, making the match inclusive — then every left row reads its
  * payload with `last(_, ignoreNulls) OVER (unbounded preceding .. current
  * row)`. ONE shuffle on the join keys (the window), no per-row range
  * probing, no time-bucketing parameter to mistune; skew bound = the
  * largest single key, the same bound every per-key window op carries.
  *
  * Determinism: ties among right rows at identical (keys, ts) are broken
  * by `rightTie` (pass the right side's unique id) — without it the
  * picked payload is sort-order-dependent, exactly the ambiguity a
  * hash-verified operator cannot carry.
  *
  * Output: every left row (left join semantics) + one column per
  * `payload` entry (rightCol -> outputName), null where no right row
  * precedes.
  */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame, on: Seq[String], tsCol: String,
           payload: Seq[(String, String)],
           rightTie: Seq[String] = Nil,
           direction: String = "backward",
           toleranceUs: Option[Long] = None): DataFrame = {
    require(payload.nonEmpty, "asof: need at least one payload column")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asof: direction must be backward|forward|nearest, got $direction")
    val leftCols = left.columns.toSeq
    payload.foreach { case (_, out) =>
      require(!leftCols.contains(out),
        s"asof: left already has output column $out")
    }
    val reserved = leftCols.filter(c =>
      c == "__side" || c == "__p" || c == "__latest" || c == "__b" ||
        c == "__f" || c.startsWith("__tie_"))
    require(reserved.isEmpty, // a silent overwrite would corrupt the match
      s"asof: left uses reserved column name(s) ${reserved.mkString(", ")}")
    val l2 = left.withColumn("__side", lit(1))
    // the whole payload rides ONE struct, non-null on every right row:
    // last(ignoreNulls) must pick the latest right ROW — per-column
    // last(ignoreNulls) would skip a null payload VALUE and silently
    // reach back to an older row
    // the struct also carries the matched right timestamp for the
    // tolerance check
    val r2 = right.select(
      on.map(col) ++ Seq(col(tsCol)) ++
        rightTie.zipWithIndex.map { case (c, i) => col(c).as(s"__tie_$i") } :+
        struct(col(tsCol).as("__r_ts") +:
          payload.map { case (c, out) => col(c).as(out) }: _*).as("__p"): _*)
      .withColumn("__side", lit(0))
    // left-only columns null on right rows, payload/tie null on left rows
    val all = l2.unionByName(r2, allowMissingColumns = true)

    // nearest (pandas merge_asof direction="nearest"): SAME one-shuffle
    // union sort read by TWO window frames — the latest at-or-before via
    // last(ignoreNulls) over the preceding frame, the earliest strictly-
    // after via first(ignoreNulls) over the following frame — then the
    // closer side wins, ties toward backward. An equal-timestamp right
    // row lives only in the backward frame (it sorts before the left
    // row), which is exactly right: its gap is 0 and backward wins ties,
    // so both reads agree with the two-sided oracle composition. Among
    // tied right rows the backward read keeps the MAX rightTie and the
    // forward read the MIN — each frame's deterministic end.
    if (direction == "nearest") {
      val order: Seq[Column] = col(tsCol).asc +: col("__side").asc +:
        rightTie.indices.map(i => col(s"__tie_$i").asc)
      val part = Window.partitionBy(on.map(col): _*).orderBy(order: _*)
      val wB = part.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = part.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val gapB = unix_micros(col(tsCol)) - unix_micros(col("__b.__r_ts"))
      val gapF = unix_micros(col("__f.__r_ts")) - unix_micros(col(tsCol))
      val inTol = (g: Column) => toleranceUs.fold(lit(true))(t => g <= t)
      val validB = col("__b").isNotNull && inTol(gapB)
      val validF = col("__f").isNotNull && inTol(gapF)
      return all
        .withColumn("__b", last(col("__p"), ignoreNulls = true).over(wB))
        .withColumn("__f", first(col("__p"), ignoreNulls = true).over(wF))
        .filter(col("__side") === 1)
        .select(leftCols.map(col) ++ payload.map { case (_, out) =>
          when(validB && (!coalesce(validF, lit(false)) || gapB <= gapF),
            col(s"__b.$out"))
            .when(validF, col(s"__f.$out")).as(out)
        }: _*)
    }

    // backward walks ascending timestamps; forward walks DESCENDING ones,
    // so "last right row seen" is the nearest at-or-after. Right sorts
    // before left at equal timestamps either way (side asc) — inclusive.
    val tsOrder = if (direction == "backward") col(tsCol).asc else col(tsCol).desc
    val order: Seq[Column] = tsOrder +: col("__side").asc +:
      rightTie.indices.map(i => col(s"__tie_$i").asc)
    val w = Window.partitionBy(on.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap =
      if (direction == "backward")
        unix_micros(col(tsCol)) - unix_micros(col("__latest.__r_ts"))
      else unix_micros(col("__latest.__r_ts")) - unix_micros(col(tsCol))
    val valid = toleranceUs.fold(lit(true))(t => gap <= t)
    all.withColumn("__latest", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map { case (_, out) =>
          when(valid, col(s"__latest.$out")).as(out)
        }: _*)
  }
}
