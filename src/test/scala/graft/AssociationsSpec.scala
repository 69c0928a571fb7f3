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

  test("DropSimilar drops the later of a duplicated column pair") {
    val df = Seq.tabulate(300)(i => ("s" + i % 3, i.toDouble, "s" + i % 3))
      .toDF("first", "x", "copy")
    val out = DropSimilar.transform(df, threshold = 1.0)
    assert(out.columns.toSeq === Seq("first", "x"))
  }
}
