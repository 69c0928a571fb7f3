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
  * Scale shape of `selectToBudget`: ONE melted aggregate over
  * priority-histogram bins (`bins` rows of driver state), a driver
  * cumulative walk to find the boundary bin, then one codegen'd filter
  * scan: rows strictly above the boundary keep unconditionally, rows
  * strictly below drop, and only the BOUNDARY BIN's rows (corpus/bins
  * of them, by construction of an equi-width histogram over the observed
  * priority range) pay an ordered prefix — computed with a window over
  * that one bin, whose partition is 1/bins of the corpus, not all of it.
  * Result: exact greedy semantics, no global sort, bounded driver state —
  * the same percentile-threshold discipline as `Dsir.selectFraction`.
  *
  * Determinism: ties in priority break by ascending id (total order), so
  * the kept set is unique and hash-verifiable. Cost is integer
  * (token/byte counts); priorities are quantized to 6 dp micro-LONGs for
  * binning, which preserves their order exactly at the oracle's own
  * rounding discipline.
  */
object Budget {

  /** Sentinel micro-priority for NULL priorities ("sorts last"): a FINITE
    * value, because the selection arithmetic subtracts and negates
    * priorities — Long.MinValue would overflow `prio - lo` (ANSI throw)
    * and `-prio` (silent wrap). ±2^50 micro = ±~1.1e9 raw priority; real
    * priorities are range-checked against it.
    */
  val NullPrioMicro: Long = -(1L << 50)

  private def prioMicroOf(priorityCol: String): Column = coalesce(
    round(col(priorityCol).cast(DoubleType) * lit(1000000.0), 0)
      .cast(LongType), lit(NullPrioMicro))

  /** Rows kept by greedy priority fill: all columns plus `kept` (the
    * curation-sweep flag convention — callers filter or carry it).
    * A single row larger than the remaining budget is SKIPPED and the
    * walk continues (classic greedy knapsack fill, matching the window
    * formulation "cumsum - cost <= budget - cost" per-row: every row
    * whose own inclusion fits the remaining budget after all
    * higher-priority kept rows... see note below), i.e. semantics are
    * the PREFIX form: keep while cumulative cost <= budget, stop at the
    * first overflow — the form a SQL window replays exactly.
    */
  def selectToBudget(df: DataFrame, costCol: String, priorityCol: String,
                     idCol: String, budget: Long,
                     bins: Int = 100000): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(bins >= 2, "need at least 2 bins")
    // quantized priority (micro-LONG, 6 dp) — the total order the greedy
    // walk uses; null priority sorts last (lowest), null cost = 0
    val prioMicro = prioMicroOf(priorityCol)
    val cost = coalesce(col(costCol).cast(LongType), lit(0L))

    // 1. observed priority range + cost sign (one cheap aggregate)
    val mm = df.agg(min(prioMicro).as("lo"), max(prioMicro).as("hi"),
      min(cost).as("minc")).head()
    if (mm.isNullAt(0)) return df.withColumn("kept", lit(false))
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    require(lo >= NullPrioMicro && hi <= -NullPrioMicro,
      s"selectToBudget: priorities must lie within ±${-NullPrioMicro / 1000000L} " +
        "(micro-quantized ±2^50) — rescale the priority column")
    // monotone cumsum is what makes prefix == filter; a negative cost
    // breaks the greedy semantics themselves, not just this plan
    require(mm.getLong(2) >= 0L,
      s"selectToBudget: costs must be non-negative, found ${mm.getLong(2)}")
    // equi-width bin over [lo, hi]; one bin if degenerate
    val width = math.max(1L, (hi - lo) / bins + 1L)
    val binOf = ((prioMicro - lit(lo)) / lit(width)).cast(LongType)

    // 2. per-bin cost totals — <= bins rows to the driver
    val hist = df.select(binOf.as("__bin"), cost.as("__c"))
      .groupBy(col("__bin")).agg(sum(col("__c")).as("__sum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(-_._1)

    // 3. driver walk, highest bin first: bins fully inside the budget
    //    keep unconditionally; the first bin that overflows is the
    //    boundary (its rows pay the exact ordered prefix); below it drop
    var remaining = budget
    var boundary = Long.MinValue
    var boundaryBudget = 0L
    var exhausted = false
    hist.foreach { case (b, s) =>
      if (!exhausted) {
        if (s <= remaining) remaining -= s
        else { boundary = b; boundaryBudget = remaining; exhausted = true }
      }
    }

    if (!exhausted)
      // everything fits
      df.withColumn("kept", lit(true))
    else {
      // 4. boundary bin: exact greedy prefix in (priority desc, id asc)
      //    over ~corpus/bins rows — window partitioned BY THE BIN literal
      //    via a filtered self-union, so no global sort appears anywhere
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("__p").desc, col("__id").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val boundaryIds = df
        .filter(binOf === lit(boundary))
        .select(col(idCol).as("__id"), prioMicro.as("__p"), cost.as("__c"))
        .withColumn("__cum", sum(col("__c")).over(w))
        .filter(col("__cum") <= lit(boundaryBudget))
        .select(col("__id"))
      df.withColumn("__bin", binOf)
        .join(broadcast(boundaryIds.withColumnRenamed("__id", idCol)
          .withColumn("__kept_boundary", lit(true))), Seq(idCol), "left")
        .withColumn("kept",
          (col("__bin") > lit(boundary)) ||
            coalesce(col("__kept_boundary"), lit(false)))
        .drop("__bin", "__kept_boundary")
    }
  }

  /** Per-group greedy fill — the form data recipes actually state ("at
    * most 2B tokens of source X"): within each group, keep rows in
    * (priority desc, id asc) order while the group's running cost stays
    * within `budgets(group)`; groups absent from the map keep everything.
    * Null-keyed groups match a null... there is no null map key — null
    * groups keep everything (no budget named them).
    *
    * Plan: ONE window partitioned by the group — already parallel across
    * groups, no global sort anywhere; unlike the global `selectToBudget`
    * no histogram trick is needed, because the partition is a single
    * group's rows, not the corpus. The capPerGroup caveat applies: one
    * mega-group concentrates its window on one task — if a single group
    * IS the corpus, use the global form on that group's slice instead.
    * Output: all columns plus `kept`.
    */
  def selectToBudgetPerGroup(df: DataFrame, groupCol: String,
                             costCol: String, priorityCol: String,
                             idCol: String,
                             budgets: Map[String, Long]): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val prioMicro = prioMicroOf(priorityCol)
    val cost = coalesce(col(costCol).cast(LongType), lit(0L))
    // same monotone-cumsum contract as the global form: a negative cost
    // would let a lower-priority row sneak back under the budget after an
    // overflow — refuse loudly (one cheap aggregate)
    val minc = df.agg(min(cost)).head()
    require(minc.isNullAt(0) || minc.getLong(0) >= 0L,
      s"selectToBudgetPerGroup: costs must be non-negative, found ${minc.get(0)}")
    val bTable = broadcast(budgets.toSeq.toDF("__bg_grp", "__bg_budget"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(prioMicro.desc, col(idCol).asc)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.join(bTable, col(groupCol) === col("__bg_grp"), "left")
      .withColumn("__cum", sum(cost).over(w))
      .withColumn("kept",
        col("__bg_budget").isNull || col("__cum") <= col("__bg_budget"))
      .drop("__bg_grp", "__bg_budget", "__cum")
  }

  /** At most `k` rows per group, best-first by (priority desc, id asc) —
    * per-domain/source caps. Bounded: the `minKBy` aggregate carries k
    * struct rows per (group, partition); the join back is on the kept
    * ids. Output: all columns plus `kept`.
    */
  def capPerGroup(df: DataFrame, groupCol: String, priorityCol: String,
                  idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
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
