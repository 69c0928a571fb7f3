package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sessionization (reference: skrub/_session_encoder.py:41-634).
  *
  * Batch form: one window pass per entity —
  *   `w = partitionBy(splitBy).orderBy(ts)`;
  *   boundary = first row of entity OR gap to previous row > gapSeconds;
  *   session index within entity = running count of boundaries - 1.
  *
  * Rows with a null timestamp or null split key get session -1 (reference
  * behavior). Output keeps every input column and appends `session_id`
  * (per-entity index) — at 100 TB a single global dense id would force a
  * total sort; the composite (splitBy, session_id) is the scalable identity,
  * exactly like the reference's per-entity cumsum before its global offset.
  * `globalSessionId` materializes the reference's global numbering when the
  * caller genuinely needs it, without a single-task global window: session
  * START rows (one per session, free from the window pass) are range-sorted
  * and densely numbered via monotonically_increasing_id + per-partition
  * prefix-sum offsets, then joined back.
  */
object SessionEncoder {

  def transform(df: DataFrame, splitBy: Seq[String], tsCol: String,
                gapSeconds: Double, out: String = "session_id"): DataFrame =
    transformWithBoundary(df, splitBy, tsCol, gapSeconds, out).drop("__start")

  /** transform + a `__start` flag marking the first row of each session —
    * session-start rows are exactly one row per session key, which lets
    * `globalSessionId` enumerate sessions without a distinct aggregation.
    */
  private def transformWithBoundary(df: DataFrame, splitBy: Seq[String],
                                    tsCol: String, gapSeconds: Double,
                                    out: String): DataFrame = {
    val ts = col(tsCol)
    val keyNull = splitBy.map(col(_).isNull).reduceOption(_ || _).getOrElse(lit(false))
    val invalid = ts.isNull || keyNull
    val w = Window.partitionBy(splitBy.map(col): _*).orderBy(ts)
    // epoch in microseconds keeps integer arithmetic (oracle: epoch_us)
    val us = unix_micros(ts)
    val prev = lag(us, 1).over(w)
    val boundary = when(prev.isNull || (us - prev) > lit((gapSeconds * 1e6).toLong), 1L)
      .otherwise(0L)
    val cum = sum(when(invalid, 0L).otherwise(boundary))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("__start", when(invalid, 0L).otherwise(boundary))
      .withColumn(out, when(invalid, lit(-1L)).otherwise(cum - 1L))
  }

  /** Reference-style globally unique session ids, scale-safe AND
    * Dataset-native: equivalent to `dense_rank() over (order by splitBy,
    * localSession)` but no row ever passes through a single-task global
    * window and nothing drops out of codegen into RDD land (the previous
    * `zipWithIndex` ran an extra partition-count job outside Tungsten).
    *
    * Shape: distinct session keys -> range-repartition on the key order
    * (each partition holds a contiguous key range) -> eager localCheckpoint
    * (one materialization; the two downstream jobs must not recompute the
    * distinct, and checkpoint blocks are reclaimed when the frame is GC'd)
    * -> per-partition counts to the driver (one tiny row per partition) ->
    * global id = partition-local `row_number` + broadcast prefix-sum offset
    * of all preceding partitions. The numbered key set is |sessions| rows;
    * the join back is AQE-decided.
    */
  def globalSessionId(df: DataFrame, splitBy: Seq[String], tsCol: String,
                      gapSeconds: Double, out: String = "session_id"): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // the windowed frame feeds THREE consumers (the session enumeration, the
    // valid join side, the invalid union side) — persist it or the window
    // shuffle over the full input runs three times
    val local = transformWithBoundary(df, splitBy, tsCol, gapSeconds,
        "__local_session")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val keyNames = splitBy :+ "__local_session"
    val keyCols = keyNames.map(col)
    val valid = local.filter(col("__local_session") =!= -1L).drop("__start")
    // session-START rows are already exactly one row per session key — no
    // distinct aggregation exchange needed, straight to the range sort.
    // orderBy = range exchange + sort-within: partition i's keys all precede
    // partition i+1's. monotonically_increasing_id on the SORTED cached frame
    // is (partitionId << 33) | row-index-in-partition — a pure projection, so
    // both the partition id and the dense within-partition index come out
    // with ZERO extra shuffle (a window partitioned by pid would re-shuffle
    // the whole key set on pid; zipWithIndex would leave codegen for RDDs).
    val parts = local.filter(col("__start") === 1L).select(keyCols: _*)
      .orderBy(keyCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33).cast(IntegerType))
      .withColumn("__rid", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
      .persist()
    // per-partition counts -> driver prefix sums: one tiny row per partition
    val counts = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getAs[Int]("__pid") -> r.getAs[Long]("__n")).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.keys.toSeq.sorted.map { p =>
        val o = acc; acc += counts(p); p -> o
      }.toMap
    }
    val numbered = parts
      .withColumn(out, col("__rid") + element_at(typedLit(offsets), col("__pid")))
      .drop("__mid", "__pid", "__rid")
    val invalid = local.filter(col("__local_session") === -1L).drop("__start")
      .withColumn(out, lit(-1L))
    valid.join(numbered, keyNames)
      .unionByName(invalid)
      .drop("__local_session")
  }
}
