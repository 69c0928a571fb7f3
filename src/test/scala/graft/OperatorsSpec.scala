package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Joins, SessionEncoder}
import graft.selectors.Selectors

/** Joins (mode tie-break, collision rename), sessionization boundaries, and
  * selector algebra.
  */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- joins ---------------------------------------------------------------

  test("mode aggregation ties break to the smallest value") {
    val aux = Seq((1, "b"), (1, "b"), (1, "a"), (1, "a"), (1, "c"))
      .toDF("k", "v")
    val out = Joins.aggregatePerCol(aux, Seq("k"), Seq("v" -> Seq("mode")))
    assert(out.head().getString(1) === "a")
  }

  test("leftJoin renames colliding right columns with the suffix") {
    val left = Seq((1, "L")).toDF("k", "v")
    val right = Seq((1, "R")).toDF("rk", "v")
    val out = Joins.leftJoin(left, right, Seq("k"), Seq("rk"))
    assert(out.columns.toSeq === Seq("k", "v", "v_aux"))
    assert(out.head().getString(2) === "R")
  }

  test("aggJoin attaches per-key aggregates; missing keys stay null") {
    val main = Seq(1, 2).toDF("k")
    val aux = Seq((1, 10.0), (1, 20.0)).toDF("ak", "x")
    val out = Joins.aggJoin(main, aux, Seq("k"), Seq("ak"), Seq("x"),
      Seq("count", "sum", "mean"))
    val rows = out.orderBy($"k").collect()
    assert(rows(0).getLong(1) === 2L)          // x_count
    assert(rows(0).getDouble(2) === 30.0)      // x_sum
    assert(rows(1).isNullAt(2))                // key 2 unmatched
  }

  // --- sessionization ------------------------------------------------------

  private def eventsDf = Seq(
    ("u1", "2021-01-01 00:00:00"),
    ("u1", "2021-01-01 00:02:00"),  // within 300s gap -> same session
    ("u1", "2021-01-01 01:00:00"),  // > gap -> new session
    ("u2", "2021-01-01 00:00:00"),
    (null, "2021-01-01 00:00:00")   // null key -> -1
  ).toDF("user", "ts_s").withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")

  test("sessionize: gap boundary starts a new session; null keys get -1") {
    val out = SessionEncoder.transform(eventsDf, Seq("user"), "ts", 300.0)
    val byUser = out.collect().map(r =>
      (Option(r.getString(0)).getOrElse("null"), r.getLong(2))).toSeq.sorted
    assert(byUser === Seq(("null", -1L), ("u1", 0L), ("u1", 0L), ("u1", 1L),
      ("u2", 0L)))
  }

  test("globalSessionId distributed fallback agrees with the driver fast path") {
    // maxDriverEntities = -1 forces the take-probe over the guard, so the
    // range-sort + checkpoint numbering path runs; outputs must be identical
    val fast = SessionEncoder.globalSessionId(eventsDf, Seq("user"), "ts", 300.0)
      .select("user", "ts", "session_id").collect()
      .map(r => (String.valueOf(r.getString(0)), String.valueOf(r.get(1)), r.getLong(2))).sorted
    val dist = SessionEncoder.globalSessionId(eventsDf, Seq("user"), "ts", 300.0,
        maxDriverEntities = -1)
      .select("user", "ts", "session_id").collect()
      .map(r => (String.valueOf(r.getString(0)), String.valueOf(r.get(1)), r.getLong(2))).sorted
    assert(fast.nonEmpty)
    assert(fast.toSeq === dist.toSeq)
  }

  test("globalSessionId densely numbers sessions across entities") {
    val out = SessionEncoder.globalSessionId(eventsDf, Seq("user"), "ts", 300.0)
    val ids = out.filter($"session_id" =!= -1L)
      .select("session_id").as[Long].collect().toSet
    assert(ids === Set(0L, 1L, 2L))
    assert(out.filter($"session_id" === -1L).count() === 1)
  }

  test("null timestamp gets session -1") {
    val df = Seq(("u1", Some("2021-01-01 00:00:00")), ("u1", None))
      .toDF("user", "ts_s").withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val out = SessionEncoder.transform(df, Seq("user"), "ts", 300.0)
    assert(out.filter($"ts".isNull).head().getLong(2) === -1L)
  }

  // --- selectors -----------------------------------------------------------

  private lazy val orders = TestSpark.table("orders")

  test("selector boolean algebra: or/and/sub/xor/inv") {
    import Selectors._
    val num = expand(orders, numeric)
    val str = expand(orders, string)
    assert(expand(orders, numeric | string).toSet === (num ++ str).toSet)
    assert(expand(orders, numeric & cols("o_orderkey")) === Seq("o_orderkey"))
    assert(expand(orders, numeric - cols("o_orderkey")).toSet ===
      num.toSet - "o_orderkey")
    assert(expand(orders, numeric ^ cols("o_orderkey", "o_orderstatus")).toSet ===
      (num.toSet - "o_orderkey") + "o_orderstatus")
    assert(expand(orders, ~numeric).toSet === orders.columns.toSet -- num)
  }

  test("glob and regex selectors match by name") {
    import Selectors._
    assert(expand(orders, glob("o_order*")).toSet ===
      Set("o_orderkey", "o_orderstatus", "o_orderdate", "o_orderpriority"))
    assert(expand(orders, regex("key$")).toSet ===
      Set("o_orderkey", "o_custkey"))
  }

  test("cardinalityBelow selects low-cardinality non-numeric columns") {
    import Selectors._
    assert(expand(orders, cardinalityBelow(10)).toSet ===
      Set("o_orderstatus", "o_orderpriority"))
  }

  test("hasNulls selects columns with NaN-aware null fraction above prop") {
    import Selectors._
    val df = Seq((1.0, Some("x")), (Double.NaN, None)).toDF("a", "b")
    assert(expand(df, hasNulls(0.0)).toSet === Set("a", "b"))
    assert(expand(df, hasNulls(0.6)).isEmpty)
  }

  test("nameFilter applies arbitrary name predicates") {
    import Selectors._
    assert(expand(orders, nameFilter(_.endsWith("date"))) === Seq("o_orderdate"))
  }

  test("content filter evaluates aggregate predicates in one job") {
    import Selectors._
    import org.apache.spark.sql.types.NumericType
    // numeric columns whose max exceeds 1000 (o_orderkey and o_totalprice)
    val sel = filter { n =>
      if (orders.schema(n).dataType.isInstanceOf[NumericType])
        max(col(n)) > 1000 else lit(false)
    }
    assert(expand(orders, sel).toSet === Set("o_orderkey", "o_totalprice"))
  }
}
