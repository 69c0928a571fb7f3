package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.selectors.{Selector, Selectors}

/** Boolean-algebra laws of the selector AST (reference selectors/_base.py
  * 81-163: `expand` must behave as set algebra over the column list).
  * Scalacheck generators with fixed seeds build random selector trees over
  * one fixture frame; every law is checked against plain Scala set algebra
  * on the expanded column sets — driver-pure after one schema read.
  */
class SelectorLawsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // static-only selector leaves (no stats jobs) over the orders schema
  private lazy val df = TestSpark.table("orders")
  private lazy val allCols = df.columns.toSeq

  private val leaf: Gen[Selector] = Gen.oneOf(
    Gen.const(Selectors.all),
    Gen.someOf(Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
      .map(ns => Selectors.cols(ns.toSeq: _*)),
    Gen.const(Selectors.glob("o_order*")),
    Gen.const(Selectors.regex("^o_.*(key|price)$")),
    Gen.const(Selectors.numeric),
    Gen.const(Selectors.string))

  private def tree(depth: Int): Gen[Selector] =
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      1 -> Gen.zip(tree(depth - 1), tree(depth - 1)).map { case (a, b) => a | b },
      1 -> Gen.zip(tree(depth - 1), tree(depth - 1)).map { case (a, b) => a & b },
      1 -> Gen.zip(tree(depth - 1), tree(depth - 1)).map { case (a, b) => a - b },
      1 -> Gen.zip(tree(depth - 1), tree(depth - 1)).map { case (a, b) => a ^ b },
      1 -> tree(depth - 1).map(~_))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def ex(s: Selector): Set[String] = Selectors.expand(df, s).toSet

  test("expand implements set algebra: or/and/sub/xor/complement") {
    samples(Gen.zip(tree(2), tree(2)), 60).foreach { case (a, b) =>
      val (sa, sb) = (ex(a), ex(b))
      assert(ex(a | b) === (sa union sb))
      assert(ex(a & b) === (sa intersect sb))
      assert(ex(a - b) === (sa diff sb))
      assert(ex(a ^ b) === ((sa union sb) diff (sa intersect sb)))
      assert(ex(~a) === (allCols.toSet diff sa))
    }
  }

  test("expand preserves schema column order and never invents columns") {
    samples(tree(3), 60).foreach { s =>
      val e = Selectors.expand(df, s)
      assert(e.distinct === e, s"duplicates from $s")
      assert(e.forall(allCols.contains), s"unknown column from $s")
      assert(e === allCols.filter(e.contains), s"schema order broken by $s")
    }
  }

  test("cols() rejects names missing from the schema") {
    intercept[IllegalArgumentException] {
      Selectors.expand(df, Selectors.cols("o_orderkey", "missing_col"))
    }
  }

  test("algebra laws: involution, De Morgan, idempotence") {
    samples(Gen.zip(tree(2), tree(2)), 40).foreach { case (a, b) =>
      assert(ex(~(~a)) === ex(a))
      assert(ex(~(a | b)) === ex(~a & ~b))
      assert(ex(~(a & b)) === ex(~a | ~b))
      assert(ex(a | a) === ex(a))
      assert(ex(a & a) === ex(a))
    }
  }
}
