package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Budgeted selection — "take the best documents until the token budget
  * is full", the last gate of every training-data pipeline (after the
  * quality/dedup/decontamination sweep scores everything, SOMETHING must
  * pick which survivors actually ship). Two selectors:
  *
  *   - `selectToBudget`: greedy fill by priority — keep rows in
  *     (priority desc, id asc) order while the running cost total stays
  *     within `budget`. Semantics are EXACTLY the naive global-window
  *     cumulative sum (the oracle replays it as one), but the plan never
  *     builds one: a global window is a single-task sort of the corpus.
  *   - `capPerGroup`: at most `k` best rows per group (domain/source
  *     caps) via the bounded `minKBy` aggregate — k rows per (group,
  *     partition) reach the shuffle, never a per-group window sort.
  *
  * Scale shape of `selectToBudget`: a RECURSIVE histogram descent. Each
  * level runs ONE melted aggregate over power-of-two-width key bins
  * (<= `bins` rows of driver state), a driver cumulative walk finds the
  * boundary bin (bins strictly before it in walk order keep
  * unconditionally via a codegen'd predicate; bins after drop), and the
  * walk recurses INTO the boundary bin with the leftover budget — first
  * on ever-finer priority ranges, then (when a single priority value
  * still holds more than `maxBoundaryRows` rows — a binary quality flag,
  * a coarsely quantized score) on the id tie-break order itself, which
  * is the exact order the greedy walk uses within a priority tie. Only
  * when the boundary scope is at most `maxBoundaryRows` rows does the
  * exact ordered-prefix window run, over that bounded scope, and only
  * its kept ids (<= `maxBoundaryRows`) are broadcast. Levels are
  * O(log_bins(key range)) — 3-5 corpus scans worst case — so no global
  * sort, no single-task window, and no corpus-sized broadcast exist at
  * ANY priority distribution, including all-tied. Bounded driver state
  * throughout: `bins` histogram rows per level.
  *
  * Determinism: ties in priority break by ascending id (total order), so
  * the kept set is unique and hash-verifiable. Cost is integer
  * (token/byte counts); priorities are quantized to 6 dp micro-LONGs for
  * binning, which preserves their order exactly at the oracle's own
  * rounding discipline.
  *
  * Preconditions (both selectors): `idCol` must be UNIQUE and NON-NULL
  * (selectToBudget asserts non-null in its first aggregate) — the kept-id
  * sets join back on it, so a duplicated id would duplicate rows through
  * the left join and cross-mark `kept` onto unrelated rows. String ids
  * compare bytewise (Spark UTF8String order == DuckDB binary collation);
  * the id-histogram descent bins on byte prefixes, preserving exactly
  * that order.
  */
object Budget {

  /** Sentinel micro-priority for NULL priorities ("sorts last"): a FINITE
    * value, because the selection arithmetic subtracts and negates
    * priorities — Long.MinValue would overflow `prio - lo` (ANSI throw)
    * and `-prio` (silent wrap). ±2^50 micro = ±~1.1e9 raw priority; real
    * priorities are range-checked against it.
    */
  val NullPrioMicro: Long = -(1L << 50)

  /** Numeric-id descent bound: ids must fit ±2^61 so `id - lo` cannot
    * overflow a Long during binning.
    */
  private val MaxAbsNumericId: Long = 1L << 61

  private def prioMicroOf(priorityCol: String): Column = coalesce(
    round(col(priorityCol).cast(DoubleType) * lit(1000000.0), 0)
      .cast(LongType), lit(NullPrioMicro))

  /** Order-preserving signed-Long key for a 7-byte window of the id's
    * UTF-8 bytes starting at `offset` (0-based). Lexicographic byte order
    * == unsigned numeric order of the left-aligned zero-padded window ==
    * signed order here (7 bytes = 56 bits, always non-negative), so
    * binning on this key bins on the string order itself. Shorter ids
    * pad with 0x00 and sort first — matching bytewise comparison, where
    * a proper prefix precedes its extensions.
    */
  private def stringPrefixKey(idCol: String, offset: Int): Column =
    conv(rpad(hex(substring(encode(coalesce(col(idCol), lit("")), "UTF-8"),
      offset + 1, 7)), 14, "0"), 16, 10).cast(LongType)

  private def requireFree(df: DataFrame, names: String*): Unit = names.foreach { n =>
    require(!df.columns.contains(n),
      s"reserved working column '$n' already exists on the input — rename it first")
  }

  /** Diagnostics from one `selectToBudget` run (test/rehearsal surface):
    * how many histogram levels the descent took and how many rows the
    * final exact-prefix window actually saw (0 when no window ran).
    */
  private[graft] final case class BudgetDiag(levels: Int, windowRows: Long)

  /** Rows kept by greedy priority fill: all columns plus `kept` (the
    * curation-sweep flag convention — callers filter or carry it).
    * Semantics are the PREFIX form: walk rows in (priority desc, id asc)
    * order and keep while the cumulative cost stays <= `budget`; the
    * first row that would overflow stops the walk, and nothing after it
    * is kept — exactly what a SQL window `sum(cost) over (order by ...)
    * <= budget` replays. (No skip-and-continue knapsack behavior: an
    * oversized row ends the walk.)
    *
    * `maxBoundaryRows` bounds the final exact-prefix window and the
    * kept-id broadcast; the histogram descent recurses until the
    * boundary scope fits it (see object doc for the scale shape).
    */
  def selectToBudget(df: DataFrame, costCol: String, priorityCol: String,
                     idCol: String, budget: Long,
                     bins: Int = 100000,
                     maxBoundaryRows: Long = 1L << 20): DataFrame =
    selectToBudgetDiag(df, costCol, priorityCol, idCol, budget, bins,
      maxBoundaryRows)._1

  private[graft] def selectToBudgetDiag(
      df: DataFrame, costCol: String, priorityCol: String,
      idCol: String, budget: Long, bins: Int = 100000,
      maxBoundaryRows: Long = 1L << 20): (DataFrame, BudgetDiag) = {
    require(budget >= 0, "budget must be non-negative")
    require(bins >= 2, "need at least 2 bins")
    require(maxBoundaryRows >= 1, "maxBoundaryRows must be positive")
    requireFree(df, "kept", "__kept_boundary")
    // quantized priority (micro-LONG, 6 dp) — the total order the greedy
    // walk uses; null priority sorts last (lowest), null cost = 0
    val prioMicro = prioMicroOf(priorityCol)
    val cost = coalesce(col(costCol).cast(LongType), lit(0L))

    // 1. observed priority range + cost sign + id nullability, ONE cheap
    //    aggregate (a null id would silently drop its kept flag at the
    //    boundary join-back — null never equi-joins — while its cost
    //    still consumed budget: neither the window replay nor any prefix)
    val mm = df.agg(min(prioMicro).as("lo"), max(prioMicro).as("hi"),
      min(cost).as("minc"), count(lit(1)).as("n"),
      count(col(idCol)).as("nid")).head()
    if (mm.isNullAt(0))
      return (df.withColumn("kept", lit(false)), BudgetDiag(0, 0L))
    require(mm.getLong(3) == mm.getLong(4),
      s"selectToBudget: idCol '$idCol' has ${mm.getLong(3) - mm.getLong(4)} " +
        "null ids — ids must be non-null (and unique) for the kept-id " +
        "join-back")
    require(mm.getLong(0) >= NullPrioMicro && mm.getLong(1) <= -NullPrioMicro,
      s"selectToBudget: priorities must lie within ±${-NullPrioMicro / 1000000L} " +
        "(micro-quantized ±2^50) — rescale the priority column")
    // monotone cumsum is what makes prefix == filter; a negative cost
    // breaks the greedy semantics themselves, not just this plan
    require(mm.getLong(2) >= 0L,
      s"selectToBudget: costs must be non-negative, found ${mm.getLong(2)}")

    // 2. recursive histogram descent. Level state: the current bin key
    //    (priority first, then the id tie-break), its observed [lo, hi]
    //    range, walk direction (priority desc, id asc), the accumulated
    //    unconditional-keep predicate, and the boundary-scope predicate.
    val idType = df.schema(idCol).dataType
    var keyExpr: Column = prioMicro
    var desc = true
    var lo = mm.getLong(0)
    var hi = mm.getLong(1)
    // -1 = still descending on priority; >= 0 = byte offset of the
    // string-id window (numeric ids use a single id level, marked 0)
    var idOffset = -1
    var keep: Column = lit(false)
    var scope: Column = lit(true)
    var remaining = budget
    var levels = 0
    var result: DataFrame = null
    var windowRows = 0L

    // observed key range of the CURRENT scope for a fresh key expression
    def scopedRange(key: Column): (Long, Long) = {
      val r = df.filter(scope).agg(min(key), max(key)).head()
      (r.getLong(0), r.getLong(1))
    }

    while (result == null) {
      levels += 1
      require(levels <= 64,
        "selectToBudget: histogram descent exceeded 64 levels — ids share " +
          "pathologically long prefixes; ensure idCol is unique")
      // power-of-two bin width: exact integer binning via a right shift,
      // no float division anywhere near the 2^50+ key range
      val span = hi - lo // >= 0; priority range <= 2^51, ids guarded <= 2^62
      var shift = 0
      while ((span >> shift) + 1L > bins) shift += 1
      val binOf = shiftright(keyExpr - lit(lo), shift)

      // per-bin cost totals + row counts — <= bins rows to the driver
      val hist = df.filter(scope)
        .groupBy(binOf.as("__b"))
        .agg(sum(cost).as("__s"), count(lit(1)).as("__n"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => if (desc) -t._1 else t._1)

      // driver walk in greedy order: bins fully inside the budget keep
      // unconditionally; the first bin that overflows is the boundary
      // (prefix semantics: everything after it drops)
      var boundary = -1L
      var boundaryRows = 0L
      var exhausted = false
      hist.foreach { case (b, s, n) =>
        if (!exhausted) {
          if (s <= remaining) remaining -= s
          else { boundary = b; boundaryRows = n; exhausted = true }
        }
      }

      if (!exhausted) {
        // everything in the current scope fits
        result = df.withColumn("kept", keep || scope)
      } else {
        keep = keep ||
          (scope && (if (desc) binOf > lit(boundary) else binOf < lit(boundary)))
        scope = scope && (binOf === lit(boundary))
        val newLo = lo + (boundary << shift)
        hi = math.min(hi, newLo + (1L << shift) - 1L)
        lo = newLo

        if (boundaryRows <= maxBoundaryRows) {
          // 3. bounded exact greedy prefix in (priority desc, id asc)
          //    over the boundary scope only
          windowRows = boundaryRows
          val w = org.apache.spark.sql.expressions.Window
            .orderBy(col("__p").desc, col("__id").asc)
            .rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
          val boundaryIds = df.filter(scope)
            .select(col(idCol).as("__id"), prioMicro.as("__p"), cost.as("__c"))
            .withColumn("__cum", sum(col("__c")).over(w))
            .filter(col("__cum") <= lit(remaining))
            .select(col("__id"))
          result = df
            .join(broadcast(boundaryIds.withColumnRenamed("__id", idCol)
              .withColumn("__kept_boundary", lit(true))), Seq(idCol), "left")
            .withColumn("kept",
              keep || coalesce(col("__kept_boundary"), lit(false)))
            .drop("__kept_boundary")
        } else if (shift == 0) {
          // a single key value holds more rows than the window bound:
          // descend to the next component of the greedy sort order
          if (idOffset < 0) {
            // priority fully pinned — tie-break order is id ASC
            desc = false
            idOffset = 0
            idType match {
              case LongType | IntegerType | ShortType | ByteType =>
                keyExpr = col(idCol).cast(LongType)
                val (l, h) = scopedRange(keyExpr)
                require(l >= -MaxAbsNumericId && h <= MaxAbsNumericId,
                  "selectToBudget: numeric ids must lie within ±2^61 for " +
                    "the tie-break histogram")
                lo = l; hi = h
              case StringType =>
                keyExpr = stringPrefixKey(idCol, 0)
                val (l, h) = scopedRange(keyExpr)
                lo = l; hi = h
              case other => throw new IllegalArgumentException(
                s"selectToBudget: ${boundaryRows} rows tie on one priority and " +
                  s"idCol '$idCol' has unsupported type $other for the " +
                  "tie-break histogram (need integral or string) — raise " +
                  "maxBoundaryRows or pre-map the id to a sortable key")
            }
          } else if (idType == StringType) {
            // ids share this 7-byte window exactly — advance to the next
            idOffset += 7
            keyExpr = stringPrefixKey(idCol, idOffset)
            val (l, h) = scopedRange(keyExpr)
            lo = l; hi = h
          } else {
            throw new IllegalArgumentException(
              s"selectToBudget: ${boundaryRows} rows share BOTH priority and " +
                s"id — idCol '$idCol' must be unique")
          }
        }
        // else: loop — finer histogram over the narrowed [lo, hi]
      }
    }
    (result, BudgetDiag(levels, windowRows))
  }

  /** Per-group greedy fill — the form data recipes actually state ("at
    * most 2B tokens of source X"): within each group, keep rows in
    * (priority desc, id asc) order while the group's running cost stays
    * within `budgets(group)`; groups absent from the map keep everything.
    * Null-keyed groups match a null... there is no null map key — null
    * groups keep everything (no budget named them).
    *
    * Plan: ONE window partitioned by the group — already parallel across
    * groups, no global sort anywhere; the partition is a single group's
    * rows, not the corpus. The realistic failure mode is the MEGA-GROUP:
    * the dominant source of a web-crawl corpus (60-90% of the rows) would
    * concentrate its window sort on one task. So the selector AUTO-ROUTES:
    * one bounded probe aggregate (<= |budgets| driver rows) measures each
    * budgeted group, and any group above `maxGroupRows` runs the global
    * histogram descent (`selectToBudget`) scoped to that group — identical
    * greedy semantics (both are the monotone-cumsum prefix in
    * (priority desc, id asc) order; BudgetSpec pins the equivalence), no
    * single-task sort at ANY skew. Groups at or under the bound keep the
    * one-window plan (cheaper constants; the probe is the only extra
    * cost). The descent path inherits `selectToBudget`'s stricter
    * preconditions (non-null unique ids, ±2^50 priorities) — which the
    * kept-id join-back already required of every caller (object doc).
    * Output: all columns plus `kept`.
    */
  def selectToBudgetPerGroup(df: DataFrame, groupCol: String,
                             costCol: String, priorityCol: String,
                             idCol: String,
                             budgets: Map[String, Long],
                             maxGroupRows: Long = 1L << 22): DataFrame =
    selectToBudgetPerGroupDiag(df, groupCol, costCol, priorityCol, idCol,
      budgets, maxGroupRows)._1

  /** Diag twin (test/rehearsal surface): also returns the per-group
    * descent diagnostics of every group that routed away from the window
    * (empty map = the pure one-window plan ran).
    */
  private[graft] def selectToBudgetPerGroupDiag(
      df: DataFrame, groupCol: String, costCol: String, priorityCol: String,
      idCol: String, budgets: Map[String, Long],
      maxGroupRows: Long = 1L << 22): (DataFrame, Map[String, BudgetDiag]) = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    require(maxGroupRows >= 1, "maxGroupRows must be positive")
    requireFree(df, "kept", "__cum", "__bg_grp", "__bg_budget")
    val spark = df.sparkSession
    import spark.implicits._
    val prioMicro = prioMicroOf(priorityCol)
    val cost = coalesce(col(costCol).cast(LongType), lit(0L))
    // ONE probe aggregate does both pre-checks (the input plan may be an
    // expensive uncached pipeline — every extra action re-runs it): the
    // cost-sign check (a negative cost would let a lower-priority row
    // sneak back under the budget after an overflow — the monotone-cumsum
    // contract, refused loudly) and the mega-group sizes of the BUDGETED
    // groups (unbudgeted groups never enter a window). Driver state
    // <= |budgets| + 1 rows.
    val budgeted = budgets.keys.toSeq
    val groupKey =
      if (budgeted.isEmpty) lit(null).cast(org.apache.spark.sql.types.StringType)
      else when(col(groupCol).isin(budgeted: _*),
        col(groupCol).cast(org.apache.spark.sql.types.StringType))
    val probe = df.groupBy(groupKey.as("__g"))
      .agg(min(cost).as("__minc"), count(lit(1)).as("__n")).collect()
    probe.foreach { r =>
      require(r.isNullAt(1) || r.getLong(1) >= 0L,
        s"selectToBudgetPerGroup: costs must be non-negative, found ${r.get(1)}")
    }
    val oversized: Seq[String] = probe
      .filter(r => !r.isNullAt(0) && r.getLong(2) > maxGroupRows)
      .map(_.getString(0)).toSeq
    def windowPlan(in: DataFrame): DataFrame = {
      val bTable = broadcast(budgets.toSeq.toDF("__bg_grp", "__bg_budget"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol))
        .orderBy(prioMicro.desc, col(idCol).asc)
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      in.join(bTable, col(groupCol) === col("__bg_grp"), "left")
        .withColumn("__cum", sum(cost).over(w))
        .withColumn("kept",
          col("__bg_budget").isNull || col("__cum") <= col("__bg_budget"))
        .drop("__bg_grp", "__bg_budget", "__cum")
    }
    if (oversized.isEmpty) (windowPlan(df), Map.empty)
    else {
      // null-safe carve-out: isin is NULL on null groups, and null groups
      // belong on the window side (they keep everything there)
      val isOver = coalesce(col(groupCol).isin(oversized: _*), lit(false))
      val routed = oversized.map { g =>
        val (res, diag) = selectToBudgetDiag(df.filter(col(groupCol) === g),
          costCol, priorityCol, idCol, budgets(g))
        (res, g -> diag)
      }
      (routed.map(_._1).foldLeft(windowPlan(df.filter(!isOver)))(
        _ unionByName _), routed.map(_._2).toMap)
    }
  }

  /** At most `k` rows per group, best-first by (priority desc, id asc) —
    * per-domain/source caps. Bounded: the `minKBy` aggregate carries k
    * struct rows per (group, partition); the join back is on the kept
    * ids, so `idCol` must be UNIQUE AND NON-NULL (object-doc
    * precondition — a duplicated id would mark extra rows kept, and a
    * null id can win a slot but never joins its flag back). Output: all
    * columns plus `kept`.
    */
  def capPerGroup(df: DataFrame, groupCol: String, priorityCol: String,
                  idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    requireFree(df, "kept", "__cap_kept")
    // finite null sentinel: the struct key NEGATES the priority, and
    // -Long.MinValue silently wraps
    val prioMicro = prioMicroOf(priorityCol)
    val keptIds = df
      .select(col(groupCol).as("__g"),
        struct((-prioMicro).as("np"), col(idCol).as("id")).as("__s"))
      .groupBy(col("__g"))
      .agg(graft.functions.AggExprs.minKBy(col("__s"), k).as("__top"))
      .select(explode(col("__top.id")).as(idCol))
      .withColumn("__cap_kept", lit(true))
    df.join(keptIds, Seq(idCol), "left")
      .withColumn("kept", coalesce(col("__cap_kept"), lit(false)))
      .drop("__cap_kept")
  }
}
