package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans._

/** Plan/learner layer: environment binding, fit-once/replay-frozen Apply
  * semantics, per-node memoization (shared nodes compute once), multi-table
  * Merge.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learner fits stages once and replays them frozen on new data") {
    val fitDf = Seq("a", "a", "b", "c").toDF("v")
    val newDf = Seq("a", "a", "a").toDF("v") // categories b, c absent
    val plan = Var("x").apply(Stages.tableVectorizer())
    val learner = Plan.makeLearner(plan)
    val fitOut = learner.fitTransform(Map("x" -> fitDf))
    val newOut = learner.transform(Map("x" -> newDf))
    // frozen vocabulary: the transform output keeps ALL fitted one-hot
    // columns even though b and c never appear in the new data
    assert(fitOut.columns.toSeq === newOut.columns.toSeq)
    assert(newOut.columns.contains("v_b"))
    assert(newOut.agg(sum($"v_b")).head().getDouble(0) === 0.0)
  }

  test("transform before fit fails; unbound variables fail") {
    val plan = Var("x").apply(Stages.tableVectorizer())
    val learner = Plan.makeLearner(plan)
    intercept[IllegalArgumentException] {
      learner.fitTransform(Map("wrong" -> Seq(1).toDF("a")))
    }
    intercept[IllegalStateException] {
      new Learner(plan).transform(Map("x" -> Seq(1).toDF("a")))
    }
  }

  test("a node shared by two branches evaluates once per pass") {
    val evals = new java.util.concurrent.atomic.AtomicInteger(0)
    val counted = Var("x").transform { df => evals.incrementAndGet(); df }
    val branchA = counted.transform(_.select(col("a")))
    val branchB = counted.transform(_.select((col("a") * 2).as("a2")))
    val plan = Merge(Seq(branchA, branchB), dfs =>
      graft.ops.Kernel.concatHorizontal(
        Seq(dfs(0) -> Seq("a"), dfs(1) -> Seq("a2"))))
    val out = Plan.makeLearner(plan).fitTransform(
      Map("x" -> Seq(1, 2, 3).toDF("a")))
    assert(out.count() === 3)
    assert(evals.get() === 1)
  }

  test("plan evaluation releases its fan-out caches (no CacheManager leak)") {
    val counted = Var("x").transform(df => df)
    val plan = Merge(
      Seq(counted.transform(_.select(col("a"))),
        counted.transform(_.select((col("a") * 2).as("a2")))),
      dfs => graft.ops.Kernel.concatHorizontal(
        Seq(dfs(0) -> Seq("a"), dfs(1) -> Seq("a2"))))
    val env = Map("x" -> Seq(1, 2, 3).toDF("a"))
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    val learner = Plan.makeLearner(plan)
    learner.fit(env)
    learner.fitTransform(env).count()
    learner.transform(env).count()
    learner.preview(env).count()
    assert(cm.isEmpty, "plan evaluation left CacheManager entries behind")
  }

  test("multi-table plan: aggJoin merge + vectorizer end to end") {
    val plan = Merge(
      Seq(Var("orders"), Var("lineitem")),
      Stages.aggJoin(Seq("o_orderkey"), Seq("l_orderkey"),
        Seq("l_quantity"), Seq("count", "sum"))
    ).transform(_.select(col("o_orderkey"), col("o_orderstatus"),
      col("l_quantity_count"), col("l_quantity_sum")))
      .apply(Stages.tableVectorizer())
    val env = Map(
      "orders" -> TestSpark.table("orders"),
      "lineitem" -> TestSpark.table("lineitem"))
    val out = Plan.makeLearner(plan).fitTransform(env)
    assert(out.count() === TestSpark.table("orders").count())
    assert(out.columns.exists(_.startsWith("o_orderstatus_")))
  }

  test("describeSteps numbers children before parents and marks shared nodes") {
    val shared = Var("x").transform(identity).named("cleaned", "null-free input")
    val a = shared.transform(_.select(col("a")))
    val b = shared.transform(_.select(col("a")))
    val plan = Merge(Seq(a, b), dfs => dfs(0).unionAll(dfs(1)))
    val steps = Plan.describeSteps(plan)
    val lines = steps.linesIterator.toSeq
    assert(lines.head === "0. var 'x'")
    assert(lines.exists(_.contains("'cleaned' — null-free input (shared)")))
    assert(lines.last.contains("merge of 2 inputs"))
    // children always numbered before the parents consuming them
    val varIdx = lines.indexWhere(_.contains("var 'x'"))
    val mergeIdx = lines.indexWhere(_.contains("merge"))
    assert(varIdx < mergeIdx)
  }

  test("drawGraph emits a DOT digraph with one edge per consumer") {
    val shared = Var("x").transform(identity)
    val plan = Merge(
      Seq(shared.transform(identity), shared.transform(identity)),
      dfs => dfs(0).unionAll(dfs(1)))
    val dot = Plan.drawGraph(plan)
    assert(dot.startsWith("digraph plan {"))
    assert(dot.endsWith("}"))
    assert(dot.contains("var 'x'"))
    // 5 distinct nodes (var, shared transform, 2 branch transforms, merge),
    // 4 edges (var->shared, shared->a, shared->b, a->merge, b->merge) = 5
    assert(dot.linesIterator.count(_.contains("->")) === 5)
  }

  test("vars lists distinct environment variables in first-use order") {
    val plan = Merge(
      Seq(Var("orders"), Var("lineitem").transform(identity), Var("orders")),
      dfs => dfs.head)
    assert(Plan.vars(plan) === Seq("orders", "lineitem"))
  }

  test("findNode retrieves the node labeled by .named") {
    val inner = Var("x").transform(identity)
    val plan = inner.named("mid").transform(identity)
    assert(Plan.findNode(plan, "mid").contains(inner))
    assert(Plan.findNode(plan, "absent").isEmpty)
  }

  test("describeParamGrid lists outcomes and the combination count") {
    val grid = Choices.describeParamGrid(Seq(
      Choices.chooseFrom("encoder", Seq("minhash", "gap")),
      Choices.chooseInt("dims", 10, 30, 3)))
    assert(grid.contains("- encoder: [minhash, gap]"))
    assert(grid.contains("- dims: [10, 20, 30]"))
    assert(grid.contains("total combinations: 6"))
  }

  test("fullReport renders steps, graph, schema and preview rows") {
    val plan = Var("x").transform(_.select((col("a") * 2).as("a2")))
      .subsample(2, "head")
    val learner = Plan.makeLearner(plan)
    val html = learner.fullReport(Map("x" -> Seq(1, 2, 3, 4).toDF("a")))
    assert(html.contains("<h2>Steps</h2>"))
    assert(html.contains("digraph plan {"))
    assert(html.contains("<code>a2</code>"))
    // subsample active in preview: only 2 rows rendered
    assert(html.contains("Preview rows (first 2)"))
    // the learner itself stays unfitted: preview fits throwaway state
    intercept[IllegalStateException] {
      learner.transform(Map("x" -> Seq(1).toDF("a")))
    }
  }
}
