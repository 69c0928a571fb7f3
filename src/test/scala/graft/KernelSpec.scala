package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Kernel

/** Kernel conformance: null/NaN semantics, relaxed concat widening, exact
  * sampling determinism, locale float parse — the invariants of the
  * reference's dataframe kernel (skrub/_dataframe/tests/test_common.py).
  */
class KernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("isNullLike / fillNulls / dropNulls treat float NaN as null") {
    val df = Seq(Some(1.0), Some(Double.NaN), None).toDF("x")
    assert(Kernel.dropNulls(df, Seq("x")).count() === 1)
    val filled = df.select(Kernel.fillNulls(df, "x", lit(0.0)).as("x"))
      .as[Double].collect().sorted
    assert(filled === Array(0.0, 0.0, 1.0))
  }

  test("concatDiagonal widens dtypes and nulls missing columns") {
    val a = Seq(1, 2).toDF("x")                       // int
    val b = Seq((1.5, "p")).toDF("x", "y")            // double + extra col
    val out = Kernel.concatDiagonal(Seq(a, b))
    assert(out.schema("x").dataType === DoubleType)
    assert(out.schema("y").dataType === StringType)
    assert(out.count() === 3)
    assert(out.filter(col("y").isNull).count() === 2)
  }

  test("concatDiagonal widens date + timestamp to timestamp") {
    val a = Seq("2021-01-01").toDF("s").select(to_date($"s").as("d"))
    val b = Seq("2021-01-02 10:00:00").toDF("s").select(to_timestamp($"s").as("d"))
    val out = Kernel.concatDiagonal(Seq(a, b))
    assert(out.schema("d").dataType === TimestampType)
    assert(out.count() === 2)
  }

  test("sampleExact is deterministic and exact-n") {
    val df = TestSpark.table("orders")
    val s1 = Kernel.sampleExact(df, 17, seed = 42).collect()
    val s2 = Kernel.sampleExact(df.repartition(7), 17, seed = 42).collect()
    assert(s1.length === 17)
    assert(s1.map(_.toString).sorted === s2.map(_.toString).sorted)
  }

  test("isSorted detects order, ignoring nulls") {
    val sorted = Seq((1, Some(1.0)), (2, Some(2.0)), (3, None), (4, Some(2.5)))
      .toDF("id", "v")
    assert(Kernel.isSorted(sorted, "v", Seq("id")).head().getBoolean(0))
    val unsorted = Seq((1, 5.0), (2, 1.0)).toDF("id", "v")
    assert(!Kernel.isSorted(unsorted, "v", Seq("id")).head().getBoolean(0))
  }

  test("toFloatLocale parses separators and accounting negatives") {
    val df = Seq("(1 234,56)", "99,5", "garbage", "10").toDF("s")
    val out = df.select(Kernel.toFloatLocale($"s", thousandSep = " ",
      decimalSep = ",").as("v")).as[Option[Double]].collect()
    assert(out(0) === Some(-1234.56))
    assert(out(1) === Some(99.5))
    assert(out(2) === None)
    assert(out(3) === Some(10.0))
  }

  test("cleanNullStrings trims and maps marker strings to null") {
    val df = Seq(" N/A ", "  ok  ", "", "null").toDF("s")
    val out = df.select(Kernel.cleanNullStrings($"s").as("s"))
      .as[Option[String]].collect()
    assert(out === Array(None, Some("ok"), None, None))
  }

  test("slice returns the requested positional window") {
    val df = TestSpark.table("orders")
    val out = Kernel.slice(df, Seq("o_orderkey"), 5, 10)
    val keys = out.select("o_orderkey").as[Long].collect().sorted
    val expected = df.orderBy($"o_orderkey").limit(10)
      .select("o_orderkey").as[Long].collect().slice(5, 10)
    assert(keys === expected)
  }

  test("concatHorizontal zips frames by explicit row order") {
    val a = Seq((3, "c"), (1, "a"), (2, "b")).toDF("k", "v")
    val b = Seq((30, "C"), (10, "A"), (20, "B")).toDF("k2", "w")
    val out = Kernel.concatHorizontal(Seq(a -> Seq("k"), b -> Seq("k2")))
      .orderBy($"k").collect()
    assert(out.map(r => (r.getInt(0), r.getInt(2))).toSeq ===
      Seq((1, 10), (2, 20), (3, 30)))
  }

  test("withGlobalRowNumber keeps a null-key row and leaves no persisted blocks") {
    val sc = spark.sparkContext
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val df = Seq(Some(2), None, Some(1)).toDF("k")
    val out = Kernel.withGlobalRowNumber(df, Seq("k")).collect()
    assert(out.length === 3)
    // nulls sort first: null -> 1, 1 -> 2, 2 -> 3
    val byKey = out.map(r =>
      (if (r.isNullAt(0)) None else Some(r.getInt(0))) -> r.getLong(1)).toMap
    assert(byKey(None) === 1L)
    assert(byKey(Some(1)) === 2L)
    assert(byKey(Some(2)) === 3L)
    // the sorted keys persist is released before returning; only the narrow
    // number table's checkpoint (backing the returned plan) may remain
    assert(sc.getPersistentRDDs.size <= 1)
  }

  test("concatHorizontal same-lineage fast path: no join, same result") {
    val parent = Seq((3, "c", 30.0), (1, "a", 10.0), (2, "b", 20.0))
      .toDF("k", "v", "x")
    val a = parent.select($"k", $"v")
    val b = parent.select($"k".as("k2"), $"x")
    val fast = Kernel.concatHorizontal(Seq(a -> Seq("k"), b -> Seq("k2")))
    // the combined projection must contain NO join (identity pairing over
    // the shared parent), unlike the general numbering path
    assert(!fast.queryExecution.optimizedPlan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isDefined, fast.queryExecution.optimizedPlan.toString)
    assert(fast.columns.toSeq === Seq("k", "v", "k2", "x"))
    val rows = fast.orderBy($"k").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    assert(rows.toSeq === Seq((1, "a", 1, 10.0), (2, "b", 2, 20.0),
      (3, "c", 3, 30.0)))
  }

  test("concatHorizontal falls back when orderings differ over one parent") {
    val parent = Seq((1, 30.0), (2, 20.0), (3, 10.0)).toDF("k", "x")
    val a = parent.select($"k")
    val b = parent.select($"x")
    // a orders by k ascending, b by x ascending -> REVERSED pairing; the
    // fast path must not claim identity, so position 1 pairs k=1 with x=10
    val out = Kernel.concatHorizontal(Seq(a -> Seq("k"), b -> Seq("x")))
      .orderBy($"k").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(out.toSeq === Seq((1, 10.0), (2, 20.0), (3, 30.0)))
  }

  test("concatHorizontal rejects duplicate ordering keys") {
    val a = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val b = Seq((10, "A"), (20, "B"), (30, "C")).toDF("k2", "w")
    val ex = intercept[IllegalArgumentException] {
      Kernel.concatHorizontal(Seq(a -> Seq("k"), b -> Seq("k2"))).collect()
    }
    assert(ex.getMessage.contains("duplicate"))
  }

  test("scalingFactor clips a constant column to 1.0") {
    val df = Seq(5.0, 5.0, 5.0).toDF("x")
    assert(Kernel.scalingFactor(df, Seq("x")).head().getDouble(0) === 1.0)
  }

  test("allNullLike preserves schema with all nulls") {
    val out = Kernel.allNullLike(Seq((1, "a")).toDF("i", "s"), 3)
    assert(out.count() === 3)
    assert(out.filter($"i".isNull && $"s".isNull).count() === 3)
  }

  test("sampleStratifiedFraction: deterministic, shuffle-free, drops unlisted strata") {
    val df = (1 to 4000).map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "label")
    val fr = Map("a" -> 0.5, "b" -> 0.05)
    val s1 = Kernel.sampleStratifiedFraction(df, "label", fr, 7, Seq("id"))
    // one codegen'd filter over the scan — zero exchanges is the whole
    // point of the hash-threshold design
    assert(graft.sources.Bucketize.shuffleExchanges(s1) === 0,
      s1.queryExecution.executedPlan.toString)
    val rows1 = s1.collect().map(_.getInt(0)).toSet
    val rows2 = Kernel.sampleStratifiedFraction(df, "label", fr, 7, Seq("id"))
      .collect().map(_.getInt(0)).toSet
    assert(rows1 === rows2) // same seed -> identical subset
    assert(s1.filter($"label" === "c").count() === 0) // unlisted -> dropped
    val na = s1.filter($"label" === "a").count().toDouble / (4000 / 3)
    val nb = s1.filter($"label" === "b").count().toDouble / (4000 / 3)
    assert(math.abs(na - 0.5) < 0.08, s"a keep-rate $na")
    assert(math.abs(nb - 0.05) < 0.04, s"b keep-rate $nb")
    // a different seed picks a different subset
    val other = Kernel.sampleStratifiedFraction(df, "label", fr, 8, Seq("id"))
      .collect().map(_.getInt(0)).toSet
    assert(other !== rows1)
  }

  test("sampleStratifiedExact: k rows per stratum, skew-proof aggregate shape") {
    val df = ((1 to 900).map(i => (i, "big")) ++ (901 to 905).map(i => (i, "small")))
      .toDF("id", "label")
    val out = Kernel.sampleStratifiedExact(df, "label", 10, 7, Seq("id"))
    assert(out.columns.toSeq === Seq("id", "label"))
    val byLabel = out.groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel("big") === 10)
    assert(byLabel("small") === 5) // min(k, stratum size)
    // deterministic across runs
    assert(out.collect().map(_.getInt(0)).toSet ===
      Kernel.sampleStratifiedExact(df, "label", 10, 7, Seq("id"))
        .collect().map(_.getInt(0)).toSet)
  }
}
