package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.functions._
import graft.plans.{SparkMl, Stages}

/** spark.ml interop: graft stages compose with MLlib estimators inside a
  * native ml.Pipeline.
  *
  * Two composition patterns, mirroring the schema notes in SparkMl:
  *  - schema-preserving graft estimators (Cleaner) sit UNFITTED in one
  *    Pipeline with MLlib stages — identity transformSchema validates;
  *  - data-dependent-schema estimators (TableVectorizer — its output
  *    columns depend on the data, as in the reference) are fitted first,
  *    and the FITTED GraftTransformer composes, with transformSchema
  *    computed exactly via empty-frame Catalyst analysis.
  */
class SparkMlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val train = Seq(
    ("a", 1.0, 10.0), ("b", 2.0, 22.0), ("a", 3.0, 30.0),
    ("c", 4.0, 44.0), ("b", 5.0, 52.0), ("c", 6.0, 64.0)
  ).toDF("cat", "x", "y")

  test("unfitted schema-preserving graft stage composes in one ml.Pipeline") {
    val pipeline = new Pipeline().setStages(Array(
      SparkMl.stage(Stages.cleaner()),
      new VectorAssembler().setInputCols(Array("x")).setOutputCol("features"),
      new LinearRegression().setFeaturesCol("features").setLabelCol("y")))
    val model = pipeline.fit(train)
    val out = model.transform(Seq(("a", 7.0, 0.0)).toDF("cat", "x", "y"))
    assert(out.count() === 1)
    assert(out.select(col("prediction")).collect()
      .forall(r => !r.isNullAt(0) && !r.getDouble(0).isNaN))
  }

  test("fitted graft vectorizer + MLlib regressor replay in one ml.Pipeline") {
    val fittedTv = SparkMl.stage(Stages.tableVectorizer().fit(train))
    // fitted stage: transformSchema is exact, so the assembler's static
    // column list validates BEFORE any fitting happens
    val outSchema = fittedTv.transformSchema(train.schema)
    assert(outSchema.fieldNames.contains("cat_c"))
    val pipeline = new Pipeline().setStages(Array(
      fittedTv,
      new VectorAssembler().setInputCols(Array("cat_a", "cat_b", "cat_c", "x"))
        .setOutputCol("features").setHandleInvalid("keep"),
      new LinearRegression().setFeaturesCol("features").setLabelCol("y")))
    val model = pipeline.fit(train)
    // frozen vocabulary: category 'c' is absent from the new data but its
    // fitted one-hot column must still exist for the assembler
    val fresh = Seq(("a", 7.0, 0.0), ("b", 8.0, 0.0)).toDF("cat", "x", "y")
    val out = model.transform(fresh)
    assert(out.columns.contains("cat_c"))
    assert(out.count() === 2)
    assert(out.select(col("prediction")).collect()
      .forall(r => !r.isNullAt(0) && !r.getDouble(0).isNaN))
  }

  test("fitted graft stage computes transformSchema without a job") {
    val df = Seq(("x", 1.0), ("y", 2.0)).toDF("s", "v")
    val fitted = SparkMl.stage(Stages.cleaner().fit(df))
    val outSchema = fitted.transformSchema(df.schema)
    assert(outSchema.fieldNames.toSeq === Seq("s", "v"))
  }
}
