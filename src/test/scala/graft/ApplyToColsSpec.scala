package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{ApplyToCols, CheckInput}
import graft.selectors.Selectors

/** ApplyToCols framework semantics (reference _apply_to_cols.py contract)
  * and CheckInputDataFrame conformance.
  */
class ApplyToColsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame = Seq(
    (1, 10.0, "a", 100.0),
    (2, 20.0, "b", 200.0),
    (3, 30.0, "c", 300.0),
    (4, 40.0, "d", 400.0)
  ).toDF("id", "x", "s", "y")

  test("drop removes selector-chosen columns, keeping the rest in order") {
    val out = ApplyToCols.fitTransform(frame, ApplyToCols.drop,
      cols = Selectors.numeric)
    assert(out.columns.toSeq === Seq("s"))
    // composes like any ColEstimator: exclusion respected
    val out2 = ApplyToCols.fitTransform(frame, ApplyToCols.drop,
      cols = Selectors.numeric, excludeCols = Some(Selectors.cols("x")))
    assert(out2.columns.toSeq === Seq("x", "s"))
  }

  test("rejected columns pass through with allowReject; selection respected") {
    val out = ApplyToCols.fitTransform(frame, ApplyToCols.squashingScaler(),
      cols = Selectors.all, excludeCols = Some(Selectors.cols("id")),
      allowReject = true)
    assert(out.columns.toSeq === Seq("id", "x", "s", "y"))
    // id excluded and s rejected: both unchanged
    assert(out.select("id").as[Int].collect().sorted === Array(1, 2, 3, 4))
    assert(out.select("s").as[String].collect().sorted === Array("a", "b", "c", "d"))
    // x and y scaled into (-3, 3)
    val xs = out.select("x").as[Double].collect()
    assert(xs.forall(v => math.abs(v) < 3.0))
  }

  test("without allowReject a rejection propagates with the column name") {
    val e = intercept[IllegalArgumentException] {
      ApplyToCols.fit(frame, ApplyToCols.squashingScaler())
    }
    assert(e.getMessage.contains("'s'"))
  }

  test("keepOriginal + renameColumns emit both columns, renamed in place") {
    val out = ApplyToCols.fitTransform(frame, ApplyToCols.squashingScaler(),
      cols = Selectors.cols("x"), keepOriginal = true,
      renameColumns = "scaled_{}")
    assert(out.columns.toSeq === Seq("id", "x", "scaled_x", "s", "y"))
  }

  test("keepOriginal with identity rename disambiguates the output name") {
    val out = ApplyToCols.fitTransform(frame, ApplyToCols.squashingScaler(),
      cols = Selectors.cols("x"), keepOriginal = true)
    assert(out.columns.toSeq === Seq("id", "x", "x_out", "s", "y"))
  }

  test("model exposes transformers, rejections, and input->output mapping") {
    val m = ApplyToCols.fit(frame, ApplyToCols.squashingScaler(),
      excludeCols = Some(Selectors.cols("id")),
      allowReject = true, renameColumns = "sq_{}")
    assert(m.transformers.map(_._1).toSet === Set("x", "y"))
    assert(m.rejected === Seq("s"))
    assert(m.inputToOutputs("x") === Seq("sq_x"))
  }

  test("datetimeEncoder estimator expands datetime columns, rejects others") {
    val df = Seq(("2024-03-05 10:30:00", 1)).toDF("ts", "k")
      .withColumn("ts", to_timestamp($"ts"))
    val out = ApplyToCols.fitTransform(df,
      ApplyToCols.datetimeEncoder(resolution = "hour"), allowReject = true)
    assert(out.columns.contains("ts_hour") && out.columns.contains("ts_weekday"))
    assert(out.columns.contains("k")) // rejected int passes through
    val r = out.select("ts_year", "ts_month", "ts_day", "ts_hour").collect()(0)
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) === ((2024, 3, 5, 10)))
  }

  test("toDatetime/toFloat estimators accept by sample, reject the rest") {
    val df = Seq(
      ("2024-01-05", "1.5", "hello", 1),
      ("2024-02-10", "2.25", "world", 2)
    ).toDF("d", "f", "s", "k")
    val out = ApplyToCols.fitTransform(df, ApplyToCols.toDatetime(),
      allowReject = true)
    assert(out.schema("d").dataType === TimestampType)
    assert(out.schema("f").dataType === StringType) // numbers are not dates
    assert(out.schema("s").dataType === StringType)
    assert(out.schema("k").dataType === IntegerType)
    val out2 = ApplyToCols.fitTransform(df, ApplyToCols.toFloat(),
      allowReject = true)
    assert(out2.schema("f").dataType === DoubleType)
    assert(out2.schema("d").dataType === StringType) // dates are not numbers
    assert(out2.select(sum("f")).head().getDouble(0) === 3.75)
  }

  test("fitSubFrame fits on the selected subset, passthrough untouched") {
    val est = new ApplyToCols.SubFrameEstimator {
      def fitFrame(subset: org.apache.spark.sql.DataFrame, cols: Seq[String]) = {
        // fit: record per-column means of the SUBSET only
        val means = subset.groupBy().mean(cols: _*).collect()(0)
        val byCol = cols.zipWithIndex.map { case (c, i) => c -> means.getDouble(i) }
        d => byCol.foldLeft(d) { case (acc, (c, m)) => acc.withColumn(c, col(c) - m) }
      }
    }
    val m = ApplyToCols.fitSubFrame(frame, est,
      cols = Selectors.numeric, excludeCols = Some(Selectors.cols("id")))
    assert(m.cols === Seq("x", "y"))
    val out = m.transform(frame)
    assert(out.agg(sum("x"), sum("y")).head().getDouble(0) === 0.0)
    assert(out.select("s").as[String].collect().sorted === Array("a", "b", "c", "d"))
    assert(out.select("id").as[Int].collect().sorted === Array(1, 2, 3, 4))
  }

  test("CheckInput deduplicates names deterministically and records schema") {
    val dup = frame.select($"id", $"x".as("v"), $"y".as("v"))
    val (m, cleaned) = CheckInput.fitTransform(dup)
    assert(cleaned.columns.toSeq === Seq("id", "v", "v__1"))
    assert(m.featureNamesOut === Seq("id", "v", "v__1"))
    // transform accepts a conforming frame unchanged
    assert(CheckInput.fit(frame).transform(frame).columns.toSeq === frame.columns.toSeq)
  }

  test("checkInput + applyToCols compose as frozen plan stages") {
    import graft.plans.{Plan => _, _}
    val plan = Var("x")
      .apply(Stages.checkInput())
      .apply(Stages.applyToCols(ApplyToCols.squashingScaler(),
        cols = Selectors.cols("x", "y"), renameColumns = "sq_{}"))
    val learner = graft.plans.Plan.makeLearner(plan)
    val out = learner.fitTransform(Map("x" -> frame))
    assert(out.columns.toSeq === Seq("id", "sq_x", "s", "sq_y"))
    // schema contract enforced at transform time
    intercept[IllegalArgumentException] {
      learner.transform(Map("x" -> frame.drop("y")))
    }
    // frozen quantiles: transforming a shifted frame reuses fit-time stats
    val shifted = frame.withColumn("x", $"x" + 1000.0)
    val v = learner.transform(Map("x" -> shifted))
      .agg(min("sq_x")).head().getDouble(0)
    assert(v > 2.0) // far in the squashed tail under fit-time quantiles
  }

  test("CheckInput raises on missing, extra, reordered, or retyped columns") {
    val m = CheckInput.fit(frame)
    val missing = intercept[IllegalArgumentException] {
      m.transform(frame.drop("y"))
    }
    assert(missing.getMessage.contains("Missing: y"))
    val extra = intercept[IllegalArgumentException] {
      m.transform(frame.withColumn("z", lit(1)))
    }
    assert(extra.getMessage.contains("Extra: z"))
    val reorder = intercept[IllegalArgumentException] {
      m.transform(frame.select("x", "id", "s", "y"))
    }
    assert(reorder.getMessage.contains("order"))
    val retyped = intercept[IllegalArgumentException] {
      m.transform(frame.withColumn("x", $"x".cast(StringType)))
    }
    assert(retyped.getMessage.contains("x: double -> string"))
  }
}
