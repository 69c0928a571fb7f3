package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Nearest-centroid classification over an embedding column — the
  * domain/taxonomy tagging stage of a curation pipeline (label every crawl
  * document with the domain of its nearest labeled-seed centroid, then mix
  * or filter by domain). The supervised twin of the trained k-means
  * quantizer (`SimilaritySearch.kmeansCentroids`): means come from GIVEN
  * labels instead of Lloyd iterations, and assignment reuses the identical
  * loop-codegen `NearestCells` expression with the identical round-6
  * discipline — on L2-normalized vectors argmin L2 ≡ argmax cosine, so the
  * reported score is the cosine to the winning centroid.
  *
  * 100 TB shape: fit is ONE bounded aggregate over the (small) labeled
  * seed — |labels|·dim rows collect to the driver behind a loud cap — and
  * classify is a pure zero-shuffle scan (centroids ride as a reference
  * object inside `NearestCells`, the cosine via codegen `arrayDot` against
  * an int-indexed array-of-arrays literal).
  */
object Classify {

  /** Fitted per-label mean of the normalized seed vectors, labels sorted
    * ascending (cid i = labels(i) — assignment ties break toward the
    * lexicographically first label, deterministically).
    */
  case class CentroidModel(labels: Seq[String], centroids: Seq[Seq[Double]]) {
    require(labels.nonEmpty && labels.length == centroids.length,
      s"CentroidModel: ${labels.length} labels vs ${centroids.length} centroids")

    def save(path: String): Unit = {
      import graft.plans.Json
      val p = java.nio.file.Paths.get(path)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(p, Json.obj(Seq(
        "type" -> Json.str("graft.Classify.CentroidModel"),
        "labels" -> Json.arr(labels.map(Json.str)),
        "centroids" -> Json.arr(centroids.map(c =>
          Json.arr(c.map(Json.num)))))))
      ()
    }
  }

  object CentroidModel {
    def load(path: String): CentroidModel = {
      import graft.plans.Json
      val o = Json.parse(java.nio.file.Files.readString(
        java.nio.file.Paths.get(path))).asInstanceOf[Map[String, Any]]
      def d(x: Any): Double = x match {
        case v: Double => v
        case v: Long   => v.toDouble
        case v         => v.toString.toDouble
      }
      CentroidModel(
        o("labels").asInstanceOf[List[Any]].map(_.asInstanceOf[String]),
        o("centroids").asInstanceOf[List[Any]].map(
          _.asInstanceOf[List[Any]].map(d)))
    }
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Fit per-label centroids from a labeled seed frame: normalized
    * vectors, per-(label, component) mean — |labels|·dim bounded rows to
    * the driver, each coordinate rounded to 6 dp (the k-means recenter
    * discipline, oracle-reproducible) — then the centroid itself is
    * L2-NORMALIZED (and re-rounded to 6 dp). A mean of unit vectors has
    * norm < 1 for any non-degenerate class, so without this step the
    * reported "cosine" would be a systematically understated dot product
    * with the unnormalized mean, and nearest-by-L2 assignment would not
    * agree with nearest-by-cosine; over unit centroids the two rankings
    * coincide and `classify`'s cosine is the true cosine to the winning
    * centroid direction. Null vectors/labels are dropped.
    */
  def fitCentroids(seed: DataFrame, vecCol: String, labelCol: String,
                   maxLabels: Int = 10000): CentroidModel = {
    val nv = seed
      .filter(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).cast(StringType).as("lab"),
        Dedup.normalized(col(vecCol)).as("nv"))
    // bound the label space BEFORE the |labels|*dim collect — a guard that
    // runs after the collect cannot prevent the driver blow-up it exists
    // to prevent (one cheap distinct-count probe, the NgramLm discipline)
    val nLabels = nv.select(col("lab")).distinct().count()
    require(nLabels <= maxLabels,
      s"Classify.fitCentroids: $nLabels labels exceed maxLabels=" +
        s"$maxLabels — centroid state must stay driver-bounded; raise the " +
        "cap explicitly if the label space is genuinely this wide")
    val rows = nv
      .select(col("lab"), posexplode(col("nv")).as(Seq("pos", "x")))
      .groupBy(col("lab"), col("pos")).agg(avg(col("x")).as("m"))
      .collect()
    require(rows.nonEmpty, "Classify.fitCentroids: empty labeled seed")
    val byLab = rows.groupBy(_.getString(0))
    val labs = byLab.keys.toSeq.sorted
    val cents = labs.map { l =>
      val mean = byLab(l).sortBy(_.getInt(1)).map(r => round6(r.getDouble(2)))
      // norm over the ROUNDED means, summed in index order (the oracle
      // replays list_sum over the same rounded list bit for bit). A class
      // whose members cancel to the zero vector (opposite unit vectors)
      // has no direction to normalize — epsilon-clip to 1 and keep the
      // zero centroid instead of dividing 0/0 into NaN
      val norm0 = math.sqrt(mean.map(x => x * x).sum)
      val norm = if (norm0 < 1e-12) 1.0 else norm0
      mean.map(x => round6(x / norm)).toSeq
    }
    CentroidModel(labs, cents)
  }

  /** Label every row with its nearest centroid: (id, label_pred, cosine).
    * Pure scan — `NearestCells` carries the centroid matrix as one
    * reference object (round-6 L2, ties to the first label), the cosine is
    * codegen `arrayDot` against the winner.
    */
  def classify(df: DataFrame, vecCol: String, idCol: String,
               model: CentroidModel): DataFrame = {
    val centsLit = typedLit(model.centroids)
    val labLit = typedLit(model.labels)
    val nv = Dedup.normalized(col(vecCol))
    val cid = element_at(graft.functions.VecExprs.nearestCells(
      nv, model.labels.indices, model.centroids, 1), 1)
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), nv.as("__nv"), cid.as("__cid"))
      .select(col("id"),
        element_at(labLit, col("__cid") + 1).as("label_pred"),
        round(graft.functions.VecExprs.arrayDot(col("__nv"),
          element_at(centsLit, col("__cid") + 1)), 6).as("cosine"))
  }
}
