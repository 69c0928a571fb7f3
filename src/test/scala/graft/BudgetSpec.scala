package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Budget

/** Budgeted selection: the histogram + boundary-bin plan must reproduce
  * the naive global-window greedy EXACTLY (that equivalence is the whole
  * point — the oracle replays the window), including ties, boundary
  * overflow, and degenerate inputs.
  */
class BudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naiveGreedy(rows: Seq[(Long, Long, Double)],
                          budget: Long): Set[Long] = {
    // (id, cost, prio): keep while cumulative cost <= budget in
    // (quantized prio desc, id asc) order
    var cum = 0L
    rows.sortBy { case (id, _, p) => (-math.round(p * 1e6), id) }
      .takeWhile { case (_, c, _) => { cum += c; cum <= budget } }
      .map(_._1).toSet
  }

  test("selectToBudget == naive global greedy on ties, boundary overflow, " +
    "and zero-cost rows") {
    val rows = Seq(
      (1L, 10L, 0.9), (2L, 10L, 0.9), // tie: id order decides
      (3L, 0L, 0.8),                  // zero cost always fits if reached
      (4L, 25L, 0.7),
      (5L, 5L, 0.6), (6L, 100L, 0.5), (7L, 1L, 0.4))
    val df = rows.toDF("id", "cost", "prio")
    for (budget <- Seq(0L, 10L, 20L, 21L, 45L, 50L, 151L, 1000L)) {
      val got = Budget.selectToBudget(df, "cost", "prio", "id", budget)
        .filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
      assert(got === naiveGreedy(rows, budget),
        s"budget=$budget: got $got, want ${naiveGreedy(rows, budget)}")
    }
  }

  test("selectToBudget matches the naive greedy on a randomized-ish corpus " +
    "with few bins (boundary bin holds many rows)") {
    // deterministic pseudo-random: md5-derived costs/priorities, 500 rows,
    // bins=8 so the boundary bin is ~60 rows — the exact-prefix path runs
    val rows = (1L to 500L).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString
      val cost = java.lang.Long.parseLong(h.substring(0, 2), 16) + 1L
      val prio = java.lang.Long.parseLong(h.substring(2, 6), 16) / 65536.0
      (i, cost, prio)
    }
    val df = rows.toDF("id", "cost", "prio")
    for (budget <- Seq(1000L, 10000L, 30000L)) {
      val got = Budget.selectToBudget(df, "cost", "prio", "id", budget,
          bins = 8)
        .filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
      assert(got === naiveGreedy(rows, budget), s"budget=$budget mismatch")
    }
  }

  test("selectToBudget degenerate inputs: empty frame, single priority, " +
    "everything fits") {
    val empty = Seq.empty[(Long, Long, Double)].toDF("id", "cost", "prio")
    assert(Budget.selectToBudget(empty, "cost", "prio", "id", 10L)
      .filter(col("kept")).count() === 0)
    // all rows share one priority (one bin): ids break the tie
    val flat = (1L to 10L).map(i => (i, 10L, 0.5)).toDF("id", "cost", "prio")
    val kept = Budget.selectToBudget(flat, "cost", "prio", "id", 35L)
      .filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 3L))
    // budget above total: keep everything, and the plan needs no window
    val all = Budget.selectToBudget(flat, "cost", "prio", "id", 1000L)
    assert(all.filter(col("kept")).count() === 10)
    assert(!all.queryExecution.executedPlan.toString.contains("Window"),
      "the everything-fits path must not plan any window")
  }

  test("tied priorities (binary flag) descend to the id histogram: no " +
    "window larger than maxBoundaryRows, exact greedy result") {
    // the r10 degenerate case: a binary quality flag concentrates half the
    // corpus in ONE priority bin. maxBoundaryRows=32 forces the descent —
    // the final window must see <= 32 rows, never the 600-row tie.
    val rows = (1L to 1000L).map { i =>
      val prio = if (i % 5 == 0) 1.0 else 0.0 // 200 hi / 800 lo
      (i, (i % 7) + 1L, prio)
    }
    val df = rows.toDF("id", "cost", "prio")
    for (budget <- Seq(100L, 700L, 900L, 2500L)) {
      val (res, diag) = Budget.selectToBudgetDiag(df, "cost", "prio", "id",
        budget, bins = 100000, maxBoundaryRows = 32L)
      val got = res.filter(col("kept")).select("id")
        .collect().map(_.getLong(0)).toSet
      assert(got === naiveGreedy(rows, budget), s"budget=$budget mismatch")
      assert(diag.windowRows <= 32L,
        s"budget=$budget: window saw ${diag.windowRows} rows — the tie " +
          "descent must bound the exact-prefix window")
      assert(diag.levels >= 2,
        s"budget=$budget: expected a multi-level descent, got ${diag.levels}")
    }
  }

  test("string-id tie-break descends on byte-prefix histograms and matches " +
    "bytewise id order") {
    // ALL rows share one priority; ids are strings with a long shared
    // prefix so the descent must advance the byte window at least once
    val rows = (1L to 300L).map { i =>
      (f"doc_prefix_shared_$i%05d", 10L, 0.5)
    }
    val df = rows.toDF("id", "cost", "prio")
    val (res, diag) = Budget.selectToBudgetDiag(df, "cost", "prio", "id",
      budget = 250L, bins = 100000, maxBoundaryRows = 16L)
    val got = res.filter(col("kept")).select("id")
      .collect().map(_.getString(0)).toSet
    // bytewise asc order == the zero-padded numeric suffix order here
    val want = rows.map(_._1).sorted.take(25).toSet
    assert(got === want)
    assert(diag.windowRows <= 16L, s"window saw ${diag.windowRows} rows")
  }

  test("duplicate ids beyond maxBoundaryRows refuse loudly; reserved " +
    "output columns refuse loudly") {
    val dup = (1L to 20L).map(_ => (7L, 1L, 0.5)).toDF("id", "cost", "prio")
    val e = intercept[IllegalArgumentException] {
      Budget.selectToBudget(dup, "cost", "prio", "id", 5L,
        maxBoundaryRows = 4L)
    }
    assert(e.getMessage.contains("unique"))
    // a null id would silently lose its kept flag at the join-back while
    // its cost still consumed budget — refuse loudly instead
    val nullId = Seq((Some(1L), 1L, 0.5), (Option.empty[Long], 1L, 0.5))
      .toDF("id", "cost", "prio")
    val eNull = intercept[IllegalArgumentException] {
      Budget.selectToBudget(nullId, "cost", "prio", "id", 5L)
    }
    assert(eNull.getMessage.contains("null ids"))
    val hasKept = Seq((1L, 1L, 0.5, true)).toDF("id", "cost", "prio", "kept")
    intercept[IllegalArgumentException] {
      Budget.selectToBudget(hasKept, "cost", "prio", "id", 5L)
    }
    intercept[IllegalArgumentException] {
      Budget.capPerGroup(hasKept, "prio", "prio", "id", 2)
    }
    intercept[IllegalArgumentException] {
      Budget.selectToBudgetPerGroup(
        hasKept.withColumn("g", lit("x")), "g", "cost", "prio", "id",
        Map("x" -> 1L))
    }
  }

  test("null priorities sort last without overflowing; negative costs and " +
    "out-of-range priorities refuse loudly") {
    // null priority: previously a Long.MinValue sentinel that overflowed
    // (prio - lo in ANSI mode; -prio in capPerGroup's struct key)
    val df = Seq(
      (1L, 10L, Some(0.9)), (2L, 10L, Some(0.5)), (3L, 10L, Option.empty[Double])
    ).toDF("id", "cost", "prio")
    val kept = Budget.selectToBudget(df, "cost", "prio", "id", 20L)
      .filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L), "the null-priority row must sort last")
    val capped = Budget.capPerGroup(
        df.withColumn("g", lit("x")), "g", "prio", "id", k = 2)
      .filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    assert(capped === Set(1L, 2L))
    intercept[IllegalArgumentException] {
      Budget.selectToBudget(
        Seq((1L, -5L, 0.5)).toDF("id", "cost", "prio"),
        "cost", "prio", "id", 10L)
    }
    intercept[IllegalArgumentException] {
      Budget.selectToBudget(
        Seq((1L, 5L, 2.0e9)).toDF("id", "cost", "prio"),
        "cost", "prio", "id", 10L)
    }
  }

  test("selectToBudgetPerGroup: independent greedy per group; absent and " +
    "null groups keep everything") {
    val df = Seq(
      ("a", 1L, 10L, 0.9), ("a", 2L, 10L, 0.8), ("a", 3L, 10L, 0.7),
      ("b", 4L, 5L, 0.9), ("b", 5L, 5L, 0.1),
      ("c", 6L, 100L, 0.5),       // no budget for c -> kept
      (null, 7L, 100L, 0.5)       // null group: no budget can name it
    ).toDF("g", "id", "cost", "prio")
    val kept = Budget.selectToBudgetPerGroup(df, "g", "cost", "prio", "id",
        Map("a" -> 20L, "b" -> 5L))
      .filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 4L, 6L, 7L),
      s"a keeps its best 2 (20/10), b its best 1 (5/5), c+null all: got $kept")
  }

  test("selectToBudgetPerGroup auto-routes a mega-group through the " +
    "histogram descent: identical kept set, bounded window, small and " +
    "unbudgeted groups untouched") {
    // 90%-one-source skew: group "big" holds 900 of 1000 rows — the
    // realistic dominant-web-crawl shape the one-window plan single-tasks
    val rows = (1L to 1000L).map { i =>
      val g = if (i <= 900L) "big" else if (i <= 950L) "small" else "free"
      (g, i, (i % 7) + 1L, (i % 13).toDouble)
    }
    val df = rows.toDF("g", "id", "cost", "prio")
    val budgets = Map("big" -> 1500L, "small" -> 60L)
    // reference semantics: the pure one-window plan (bound high enough
    // that nothing routes)
    val want = Budget.selectToBudgetPerGroup(df, "g", "cost", "prio", "id",
        budgets, maxGroupRows = 1L << 22)
      .filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    // forced routing: "big" (900 rows) exceeds 128, "small" (50) does not
    val (res, diags) = Budget.selectToBudgetPerGroupDiag(df, "g", "cost",
      "prio", "id", budgets, maxGroupRows = 128L)
    val got = res.filter(col("kept")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got === want, "routing must not change the kept set")
    assert(diags.keySet === Set("big"), s"only the mega-group routes: $diags")
    assert(diags("big").windowRows <= (1L << 20),
      "the descent bounds the boundary window")
    // the free group (no budget) keeps everything on both plans
    assert((951L to 1000L).forall(got.contains))
  }

  test("capPerGroup keeps the k best per group with deterministic ties") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.9), ("a", 3L, 0.5), ("a", 4L, 0.1),
      ("b", 5L, 0.3), ("b", 6L, 0.8),
      ("c", 7L, 0.2)).toDF("g", "id", "prio")
    val kept = Budget.capPerGroup(df, "g", "prio", "id", k = 2)
      .filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 5L, 6L, 7L),
      "a keeps its 2 ties by id, b keeps both, c keeps its only row")
    val one = Budget.capPerGroup(df, "g", "prio", "id", k = 1)
      .filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    assert(one === Set(1L, 6L, 7L))
  }
}
