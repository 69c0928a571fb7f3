package graft.operators

import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding PCA — the projection/whitening stage an ANN pipeline runs
  * before indexing (IVF cell geometry and SQ8 quantization both improve on
  * decorrelated axes; FAISS's OPQ/PCA pretransforms are this operator's
  * single-machine counterparts).
  *
  * Fit (all distributed, driver state bounded by the embedding dimension):
  * per-dimension mean via one posexplode aggregate (d rows collected),
  * covariance Gram = sum over centered vectors of x xᵀ via ONE RowMatrix
  * pass (d x d), local breeze eigSym (O(d³) driver — d is the embedding
  * width, a model constant), top-k eigenvectors with the max-abs-positive
  * sign fix (the same canonicalization as StringEncoder's SVD basis, so
  * the basis is deterministic up to eigenvalue ties).
  *
  * Transform: the fitted (mean, basis) ride a loop-codegen `CenterProject`
  * expression — one pure scan, zero shuffles, at any corpus size.
  *
  * Oracle strategy (q_embed_pca): at FULL RANK the projection is an
  * orthonormal change of basis, so centered norms and centered dot
  * products are preserved exactly — the SQL oracle computes them in the
  * ORIGINAL space with no eigendecomposition (the q_string_encoder
  * trick); truncation behavior is spec-covered (variance ordering, norm
  * shrinkage).
  */
object Embed {

  final case class PcaModel(mean: Array[Double],
                            basis: Array[Array[Double]], // k rows x d
                            eigenvalues: Array[Double])

  def fitPca(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val spark = df.sparkSession
    val vecs = df.select(col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull)
    // per-dimension mean: one melted aggregate, d rows back
    val meanRows = vecs.select(posexplode(col("__v")).as(Seq("__p", "__x")))
      .groupBy(col("__p")).agg(avg(col("__x")).as("__m"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    require(meanRows.nonEmpty, s"fitPca: no non-null vectors in $vecCol")
    val d = meanRows.map(_._1).max + 1
    val mean = new Array[Double](d)
    meanRows.foreach { case (p, m) => mean(p) = m }
    val meanB = spark.sparkContext.broadcast(mean)
    // covariance Gram over centered vectors: one RowMatrix pass
    val centered = vecs.rdd.map { r =>
      val a = r.getSeq[Double](0)
      val m = meanB.value
      OldVectors.dense(Array.tabulate(a.length)(i => a(i) - m(i)))
    }
    val gram = new RowMatrix(centered).computeGramianMatrix()
    val g = breeze.linalg.DenseMatrix.tabulate(d, d)((i, j) => gram(i, j))
    val eig = breeze.linalg.eigSym(g)
    val kk = math.min(k, d)
    val order = eig.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).take(kk)
    val basis: Array[Array[Double]] = order.map { case (_, idx) =>
      val colVec = Array.tabulate(d)(i => eig.eigenvectors(i, idx))
      val m = colVec.maxBy(math.abs)
      if (m < 0) colVec.map(-_) else colVec
    }
    PcaModel(mean, basis, order.map(_._1))
  }

  /** idCols + `pca` (array<double>, length k) — one codegen'd scan. */
  def transformPca(df: DataFrame, vecCol: String, idCols: Seq[String],
                   model: PcaModel): DataFrame =
    df.select(idCols.map(col) :+
      graft.functions.VecExprs.centerProject(
        col(vecCol).cast("array<double>"), model.mean, model.basis)
        .as("pca"): _*)

  def pca(df: DataFrame, vecCol: String, idCols: Seq[String],
          k: Int): DataFrame =
    transformPca(df, vecCol, idCols, fitPca(df, vecCol, k))

  /** Whitened variant: basis rows scaled by 1/sqrt(eigenvalue/(n-1)) so
    * every projected component has unit sample variance — the PCA-W
    * pretransform (distance computations then weight all directions
    * equally; SQ8's per-vector scale also quantizes better on equalized
    * axes). Components with (near-)zero variance are left unscaled
    * rather than amplifying noise by 1/0.
    */
  def whitened(model: PcaModel, n: Long): PcaModel = {
    require(n > 1, s"need n > 1 rows to whiten, got $n")
    val basis = model.basis.zip(model.eigenvalues).map { case (row, ev) =>
      val variance = ev / (n - 1).toDouble
      if (variance <= 1e-12) row else row.map(_ / math.sqrt(variance))
    }
    model.copy(basis = basis)
  }
}
