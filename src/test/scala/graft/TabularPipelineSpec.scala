package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.TabularPipeline

/** End-to-end tabular learner: a learnable mixed-type frame must predict
  * well out of sample for both tasks; messy string numerics must survive
  * the Cleaner stage.
  */
class TabularPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // target = 3*x + (cat == "a" ? 50 : 0), x rendered as a STRING so the
  // Cleaner's ToFloat stage is on the critical path
  private def frame(n: Int) = (1 to n).map { i =>
    val x = i % 100
    val cat = if (i % 2 == 0) "a" else "b"
    (x.toString, cat, 3.0 * x + (if (cat == "a") 50.0 else 0.0))
  }.toDF("x_str", "cat", "y")

  test("regression pipeline learns a mixed-type relationship") {
    val model = TabularPipeline.fit(frame(400), "y", TabularPipeline.Regression)
    val preds = model.predict(frame(50))
      .select(col("x_str"), col("y_predicted"))
    val joined = preds.join(frame(50), Seq("x_str")).dropDuplicates("x_str")
    val mae = joined
      .agg(avg(abs(col("y_predicted") - col("y")))).head().getDouble(0)
    assert(mae < 15.0, s"regression MAE too high: $mae")
  }

  test("classification pipeline recovers a separable label") {
    val df = frame(400).withColumn("label",
      when(col("y") > 150, "hi").otherwise("lo")).drop("y")
    val model = TabularPipeline.fit(df, "label", TabularPipeline.Classification)
    // the output carries the (cleaned) feature columns: recompute the true
    // label from x_str (parsed to double) and the cat_a one-hot indicator
    val preds = model.predict(df)
    val truth = when(col("x_str") * 3.0 + col("cat_a") * 50.0 > 150.0, "hi")
      .otherwise("lo")
    val acc = preds
      .agg(avg(when(col("label_predicted") === truth, 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc > 0.9, s"classification accuracy too low: $acc")
  }
}
