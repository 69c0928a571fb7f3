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

  test("valueCounts ranks per-column values, most frequent first") {
    val vc = TableReport.valueCounts(frame, topK = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    // only `cat` is string: a x3 then b (smallest of the count-1 ties)
    assert(vc.toSeq.sorted === Seq(("cat", "a", 3L, 1), ("cat", "b", 1L, 2)))
  }

  test("numericHistograms bins every numeric column; max lands in last bin") {
    val h = TableReport.numericHistograms(frame, nBins = 3).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    // x: 10..40 over 3 bins of width 10: [10,20) 1, [20,30) 1, [30,40] 2
    assert(h(("x", 0)) === ((10.0, 20.0, 1L)))
    assert(h(("x", 1)) === ((20.0, 30.0, 1L)))
    assert(h(("x", 2)) === ((30.0, 40.0, 2L)))
    // k: 1..5 over 3 bins — 5 rows present, max closed into last bin
    assert((0 to 2).map(b => h(("k", b))._3).sum === 5L)
    assert(h(("k", 2))._3 >= 1L)
    // constant column: single-width bins, all rows in bin 0
    val const = TableReport.numericHistograms(
      spark.range(4).select(lit(7.5).as("c")), nBins = 3)
      .collect().map(r => (r.getInt(1), r.getLong(4)))
    assert(const.toSeq === Seq((0, 4L)))
  }

  test("toHtml filterCols renders only the named columns") {
    val html = TableReport.toHtml(frame, Seq("k"), filterCols = Seq("cat"))
    assert(html.contains("<td>cat</td>"))
    // the order key stays (sample slices need it) but other columns are gone
    assert(html.contains("<td>k</td>"))
    assert(!html.contains("<td>x</td>"), "filtered column still rendered")
    val e = intercept[IllegalArgumentException] {
      TableReport.toHtml(frame, Seq("k"), filterCols = Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("toHtml renders a self-contained report with all sections") {
    val html = TableReport.toHtml(frame, Seq("k"), title = "t<est>")
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("t&lt;est&gt;"))  // title is escaped
    assert(html.contains("<h2>Sample</h2>"))
    assert(html.contains("<h2>Column statistics</h2>"))
    assert(html.contains("<h2>Value counts</h2>"))
    assert(html.contains("<h2>Histograms</h2>"))
    assert(html.contains("<h2>Top associations</h2>"))
    // every column name appears in the stats table
    frame.columns.foreach(c => assert(html.contains(s"<td>$c</td>")))
    // per-column distribution charts render as inline SVG (value-count bars
    // for the string column, histogram bars for the numerics) with bars
    assert(html.contains("<h3>cat</h3><svg"))
    assert(html.contains("<h3>x</h3><svg"))
    assert(html.contains("<rect "))
    // the most frequent cat value labels its bar
    assert(html.contains(">a</text>"))
  }

  test("toHtmlInteractive embeds a JSON payload matching summarize output") {
    val html = TableReport.toHtmlInteractive(frame, Seq("k"), title = "t<est>")
    assert(html.startsWith("<!DOCTYPE html>"))
    // no external assets: no src=/href= references anywhere
    assert(!html.contains("src=") && !html.contains("href="))
    // the interactive controls and their JS are inline
    assert(html.contains("id=\"colfilter\"") && html.contains("function sortBy"))
    // parse the data island back and check it against summarize
    val island = html.split("<script id=\"graft-data\" type=\"application/json\">")(1)
      .split("</script>")(0).replace("<\\/", "</")
    val data = graft.plans.Json.parse(island).asInstanceOf[Map[String, Any]]
    assert(data("title") === "t<est>")
    assert(data("n_columns") === frame.columns.length.toLong)
    val stats = data("stats").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    val expect = TableReport.summarize(frame)
      .orderBy(org.apache.spark.sql.functions.col("column_name")).collect()
    assert(stats.length === expect.length)
    stats.zip(expect).foreach { case (j, r) =>
      assert(j("column_name") === r.getAs[String]("column_name"))
      assert(j("count") === r.getAs[Long]("count"))
      assert(j("null_count") === r.getAs[Long]("null_count"))
    }
    // every section key is present for the JS renderer
    Seq("sample", "value_counts", "histograms", "associations", "stats_columns")
      .foreach(k => assert(data.contains(k), s"missing payload section $k"))
  }

  test("compareHtml renders the drift report: PSI/KS tables, alerts, dual charts") {
    val ref = (1 to 200).map(i =>
      (i.toDouble, if (i % 3 == 0) "a" else "b")).toDF("x", "cat")
    val cur = (1 to 200).map(i =>
      (i.toDouble + 100, if (i % 5 == 0) "z" else "b")).toDF("x", "cat")
    val html = TableReport.compareHtml(ref, cur, Seq("x", "cat"),
      title = "d<rift>")
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("d&lt;rift&gt;"))
    Seq("Schema changes", "PSI per column", "KS per numeric/datetime column",
      "New categories", "Distributions").foreach(h =>
      assert(html.contains(s"<h2>$h"), s"missing section $h"))
    assert(html.contains("(identical schemas)")) // same columns here
    // the numbers in the tables ARE the Drift family's outputs
    val psi = graft.operators.Drift.psi(ref, cur, Seq("x", "cat"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    psi.values.foreach(v => assert(html.contains(s"<td>$v</td>"), s"psi $v"))
    val ks = graft.operators.Drift.ks(ref, cur, Seq("x"))
      .head().getDouble(1)
    assert(html.contains(s"<td>$ks</td>"), s"ks $ks")
    // 'z' is unseen in ref -> it must appear in the alert feed
    assert(html.contains("<td>z</td>"))
    // dual charts: one <h3> block per compared column, two bars per bin
    assert(html.contains("<h3>x</h3><svg"))
    assert(html.contains("<h3>cat</h3><svg"))
    assert(html.contains("fill=\"#5b7fa6\"") && html.contains("fill=\"#d08a3e\""))
    // self-contained: no external assets
    assert(!html.contains("src=") && !html.contains("href="))
  }
}
