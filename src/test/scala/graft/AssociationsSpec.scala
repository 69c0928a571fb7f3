package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ColumnAssociations
import graft.encoders.DropSimilar

/** Cramér's V correctness (incl. the zero-cell chi2 correction), binning /
  * lumping rules, DropSimilar greediness.
  */
class AssociationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical columns score V = 1 (zero cells counted in chi2)") {
    val df = Seq.tabulate(300)(i => ("s" + i % 3, "s" + i % 3)).toDF("a", "b")
    val v = ColumnAssociations.cramersV(df, "a", "b").head().getDouble(2)
    assert(v === 1.0)
  }

  test("independent columns score V near 0") {
    val df = Seq.tabulate(900)(i => ("a" + i % 3, "b" + (i / 3) % 3))
      .toDF("a", "b")
    val v = ColumnAssociations.cramersV(df, "a", "b").head().getDouble(2)
    assert(v < 0.05, s"independent V was $v")
  }

  test("allPairs returns every pair once with pearson on numeric pairs") {
    val df = Seq.tabulate(200)(i =>
      (i.toDouble, i.toDouble * 2, "c" + i % 4)).toDF("x", "y", "c")
    val out = ColumnAssociations.allPairs(df).collect()
    assert(out.length === 3) // (x,y) (x,c) (y,c)
    val xy = out.find(r => r.getString(0) == "x" && r.getString(1) == "y").get
    assert(xy.getAs[Double]("pearson_corr") === 1.0)   // perfectly linear
    assert(xy.getAs[Double]("cramer_v") > 0.9)         // same bins
    val xc = out.find(r => r.getString(0) == "x" && r.getString(1) == "c").get
    assert(xc.isNullAt(3)) // pearson null for non-numeric pair
  }

  test("categorical columns beyond maxCats lump into __other") {
    val df = Seq.tabulate(400)(i => ("v" + i % 20, "w" + i % 20))
      .toDF("a", "b")
    val plans = ColumnAssociations.fitBins(df, Seq("a", "b"))
    val binned = df.select(plans.labels.map(_._2): _*)
    val labels = binned.select("a").distinct().as[String].collect().toSet
    assert(labels.contains("__other"))
    assert(labels.size === 10) // 9 kept + __other
  }

  test("allPairs packed and direct contingency paths agree") {
    // 7 binned numeric columns make the joint code space 10^7 > PackedSpaceCap
    // (direct flat-buffer path); the first-6 projection stays packed. Shared
    // pairs must score identically.
    val df = TestSpark.spark.range(0, 2000).selectExpr(
      "cast(id as double) as c1", "cast(id * 3 % 997 as double) as c2",
      "cast(id * 7 % 997 as double) as c3", "cast(id * 11 % 997 as double) as c4",
      "cast(id * 13 % 997 as double) as c5", "cast(id * 17 % 997 as double) as c6",
      "cast(id * 19 % 997 as double) as c7")
    val narrow = ColumnAssociations.allPairs(df.select("c1", "c2", "c3", "c4", "c5", "c6"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val wide = ColumnAssociations.allPairs(df)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(narrow.size === 15 && wide.size === 21)
    narrow.foreach { case (pair, v) => assert(wide(pair) === v, s"pair $pair") }
  }

  test("cramersV fails loudly on an unbinned high-cardinality pair") {
    val df = TestSpark.spark.range(0, 5000)
      .selectExpr("cast(id as string) as a", "cast(id * 31 as string) as b")
    val e = intercept[Exception] {
      ColumnAssociations.cramersV(df, "a", "b", maxCells = 100).head()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("fitBins")),
      s"expected a bin-your-inputs error, got: ${messages(e).mkString(" | ")}")
  }

  test("distinctAtMost saturates exactly at the cap") {
    val df = TestSpark.spark.range(0, 1000).selectExpr(
      "cast(id % 7 as string) as low", "cast(id as string) as high",
      "cast(null as string) as none")
    val r = df.agg(
      graft.functions.Contingency.distinctAtMost(col("low"), 30).as("l"),
      graft.functions.Contingency.distinctAtMost(col("high"), 30).as("h"),
      graft.functions.Contingency.distinctAtMost(col("none"), 30).as("n")).head()
    assert(r.getLong(0) === 7L)
    assert(r.getLong(1) === 31L) // cap + 1 == "more than cap"
    assert(r.getLong(2) === 0L)
  }

  test("DropSimilar drops the later of a duplicated column pair") {
    val df = Seq.tabulate(300)(i => ("s" + i % 3, i.toDouble, "s" + i % 3))
      .toDF("first", "x", "copy")
    val out = DropSimilar.transform(df, threshold = 1.0)
    assert(out.columns.toSeq === Seq("first", "x"))
  }
}
