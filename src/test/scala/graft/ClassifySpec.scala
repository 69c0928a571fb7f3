package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Classify

/** Nearest-centroid domain tagging: clear-cut geometry must classify
  * perfectly, the model must round-trip through persistence with
  * bit-identical predictions, and tie-breaks must be deterministic.
  */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two orthogonal directions with small within-class jitter on the OTHER
  // axis — nearest centroid must recover the generating label exactly
  private lazy val clearCut = Seq(
    (1L, "x", Seq(1.0f, 0.1f, 0.0f)),
    (2L, "x", Seq(1.0f, -0.1f, 0.0f)),
    (3L, "y", Seq(0.1f, 1.0f, 0.0f)),
    (4L, "y", Seq(-0.1f, 1.0f, 0.0f)),
    (5L, "x", Seq(0.9f, 0.0f, 0.1f)),
    (6L, "y", Seq(0.0f, 0.9f, 0.1f))).toDF("id", "lab", "vec")

  test("clear-cut geometry classifies perfectly with high cosine") {
    val model = Classify.fitCentroids(clearCut, "vec", "lab")
    assert(model.labels === Seq("x", "y"))
    val got = Classify.classify(clearCut, "vec", "id", model)
      .join(clearCut.select(col("id"), col("lab")), Seq("id"))
    assert(got.filter(col("label_pred") =!= col("lab")).count() === 0L)
    assert(got.filter(col("cosine") < 0.9).count() === 0L)
  }

  test("save/load round-trips with bit-identical predictions") {
    val emb = TestSpark.table("embeddings")
    val model = Classify.fitCentroids(
      emb.filter(col("vec_id") % 5 === 0), "embedding", "label")
    val p = java.nio.file.Files.createTempDirectory("graft_cls")
      .resolve("model.json").toString
    model.save(p)
    val back = Classify.CentroidModel.load(p)
    assert(back.labels === model.labels)
    assert(back.centroids === model.centroids)
    val a = Classify.classify(emb, "embedding", "vec_id", model)
      .orderBy("id").collect().map(_.toSeq)
    val b = Classify.classify(emb, "embedding", "vec_id", back)
      .orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("fitted centroids are unit vectors, so 'cosine' is the true cosine") {
    // a mean of non-identical unit vectors has norm < 1; the fit must
    // re-normalize it so the reported dot product IS the cosine to the
    // centroid direction, and nearest-by-L2 agrees with nearest-by-cosine
    val model = Classify.fitCentroids(clearCut, "vec", "lab")
    model.labels.zip(model.centroids).foreach { case (l, c) =>
      val norm = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5 * c.length,
        s"centroid for '$l' has norm $norm, expected 1 within round-6 slack")
    }
    // a vector EXACTLY on a centroid direction must score cosine ≈ 1
    val onAxis = Seq((42L, Seq(1.0f, 0.0f, 0.0f))).toDF("id", "vec")
    val m2 = Classify.fitCentroids(
      Seq((1L, "x", Seq(1.0f, 0.0f, 0.0f)),
        (2L, "y", Seq(0.0f, 1.0f, 0.0f))).toDF("id", "lab", "vec"),
      "vec", "lab")
    val cos = Classify.classify(onAxis, "vec", "id", m2).head().getDouble(2)
    assert(math.abs(cos - 1.0) < 1e-5,
      s"on-centroid vector must read cosine ~1.0, got $cos")
  }

  test("equidistant ties break toward the first label") {
    val seed = Seq(
      (1L, "a", Seq(1.0f, 0.0f)),
      (2L, "b", Seq(0.0f, 1.0f))).toDF("id", "lab", "vec")
    val model = Classify.fitCentroids(seed, "vec", "lab")
    val mid = Seq((9L, Seq(1.0f, 1.0f))).toDF("id", "vec")
    val got = Classify.classify(mid, "vec", "id", model).head()
    assert(got.getString(1) === "a", "tie must go to the first sorted label")
  }

  test("fit refuses an unbounded label space and empty seeds loudly") {
    intercept[IllegalArgumentException] {
      Classify.fitCentroids(clearCut, "vec", "id", maxLabels = 2)
    }
    intercept[IllegalArgumentException] {
      Classify.fitCentroids(clearCut.filter(col("id") < 0), "vec", "lab")
    }
  }
}
