package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TableReport

/** TableReport completion (VERDICT r4 task 9): extended stats columns,
  * sample slices, and the HTML string sink (reference
  * skrub/_reporting/_table_report.py:98 `TableReport.html()`).
  */
class TableReportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame = Seq(
    (1L, "a", Some(10.0)), (2L, "b", Some(20.0)), (3L, "a", Some(30.0)),
    (4L, "c", Some(40.0)), (5L, "a", Option.empty[Double])
  ).toDF("k", "cat", "x")

  test("summarize emits extended stats: proportions, flags, std, quartiles, modes") {
    val s = TableReport.summarize(frame).collect()
      .map(r => r.getString(0) -> r).toMap
    val x = s("x")
    assert(x.getAs[Double]("null_proportion") === 0.2)
    assert(!x.getAs[Boolean]("is_high_cardinality"))
    assert(!x.getAs[Boolean]("value_is_constant"))
    // x non-null values 10,20,30,40: mean 25, sample std sqrt(500/3)
    assert(x.getAs[Double]("mean") === 25.0)
    assert(math.abs(x.getAs[Double]("std") - math.sqrt(500.0 / 3.0)) < 1e-4)
    assert(x.getAs[Double]("q25") === 17.5)
    assert(x.getAs[Double]("q50") === 25.0)
    assert(x.getAs[Double]("q75") === 32.5)
    val cat = s("cat")
    assert(cat.getAs[String]("mode_value") === "a")
    assert(cat.getAs[Long]("mode_count") === 3L)
    assert(s("k").isNullAt(s("k").fieldIndex("mode_value")))
  }

  test("sampleSlices returns labeled top and bottom rows by the given key") {
    val out = TableReport.sampleSlices(frame, Seq("k"), topN = 2, bottomN = 2)
      .select(col("k"), col("slice")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set((1L, "top"), (2L, "top"), (5L, "bottom"), (4L, "bottom")))
  }

  test("toHtml renders a self-contained report with all three sections") {
    val html = TableReport.toHtml(frame, Seq("k"), title = "t<est>")
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("t&lt;est&gt;"))  // title is escaped
    assert(html.contains("<h2>Sample</h2>"))
    assert(html.contains("<h2>Column statistics</h2>"))
    assert(html.contains("<h2>Top associations</h2>"))
    // every column name appears in the stats table
    frame.columns.foreach(c => assert(html.contains(s"<td>$c</td>")))
  }
}
