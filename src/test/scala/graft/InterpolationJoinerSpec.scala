package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.InterpolationJoiner

/** InterpolationJoiner: predictions approximate a learnable key->payload
  * relationship; string payloads classify; failing payloads pass through.
  */
class InterpolationJoinerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("numeric payloads are regression-predicted from the keys") {
    val aux = (1 to 200).map(i => (i.toDouble, i * 2.0)).toDF("k", "y")
    val main = Seq(50.5, 150.5).toDF("mk")
    val out = InterpolationJoiner.interpolationJoin(
      main, aux, Seq("mk" -> "k"), Seq("y"))
    val preds = out.orderBy($"mk").select("y_predicted").as[Double].collect()
    assert(math.abs(preds(0) - 101.0) < 10.0)
    assert(math.abs(preds(1) - 301.0) < 10.0)
  }

  test("string payloads are classification-predicted") {
    val aux = (1 to 200).map(i =>
      (i.toDouble, if (i <= 100) "low" else "high")).toDF("k", "cls")
    val main = Seq(10.0, 190.0).toDF("mk")
    val out = InterpolationJoiner.interpolationJoin(
      main, aux, Seq("mk" -> "k"), Seq("cls"))
    val preds = out.orderBy($"mk").select("cls_predicted").as[String].collect()
    assert(preds === Array("low", "high"))
  }

  test("a failing payload column is skipped with passOnError") {
    val aux = Seq((1.0, Seq(1))).toDF("k", "bad") // unsupported payload dtype
    val main = Seq(1.0).toDF("mk")
    val out = InterpolationJoiner.interpolationJoin(
      main, aux, Seq("mk" -> "k"), Seq("bad"))
    assert(out.columns.toSeq === Seq("mk"))
  }
}
