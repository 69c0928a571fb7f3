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
}
