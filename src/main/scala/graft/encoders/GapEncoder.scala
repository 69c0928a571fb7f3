package graft.encoders

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.NgramVec

/** GapEncoder (reference skrub/_gap_encoder.py:26-943): Gamma-Poisson
  * matrix factorization of the char-n-gram count matrix — V ~ H W with
  * KL-divergence multiplicative updates; output = per-value topic
  * activations (H row), which read as interpretable "gaps" between latent
  * string prototypes.
  *
  * Spark-first shape, using the reference's own key optimization: it fits on
  * UNIQUE STRINGS only (`unique_strings`, _gap_encoder.py:23) — so the
  * factorization runs on the driver over the distinct-value count matrix
  * (distinct values of a categorical column are orders of magnitude fewer
  * than rows; the hashed vocabulary is a fixed nBuckets), and the fitted
  * activations broadcast-join back onto the frame. Deterministic init
  * (md5-derived, Planes.coef-style) instead of random — reproducible runs,
  * no seed plumbing. Multiplicative updates follow Lee-Seung for KL NMF:
  *   H <- H * (V/(HW) Wt) / (1 Wt),  W <- W * (Ht V/(HW)) / (Ht 1).
  */
object GapEncoder {

  /** Deterministic strictly-positive init value for cell (i, j). */
  private def initCell(tag: String, i: Int, j: Int): Double =
    0.1 + (java.lang.Long.parseLong(
      NgramVec.md5Hex(s"$tag:$i:$j").substring(0, 8), 16).toDouble /
      math.pow(2, 32)) // in (0.1, 1.1)

  /** Driver-side KL-NMF via multiplicative updates. V: n x m (rows = values,
    * cols = ngram buckets). Returns (H: n x k, W: k x m).
    */
  def nmf(v: Array[Array[Double]], k: Int, maxIter: Int = 30,
          eps: Double = 1e-10): (Array[Array[Double]], Array[Array[Double]]) = {
    val n = v.length
    val m = v.head.length
    val h = Array.tabulate(n, k)((i, j) => initCell("h", i, j))
    val w = Array.tabulate(k, m)((i, j) => initCell("w", i, j))
    var iter = 0
    while (iter < maxIter) {
      // R = V / (HW) computed cell-wise on demand
      val hw = Array.tabulate(n, m)((i, j) => {
        var s = 0.0; var t = 0
        while (t < k) { s += h(i)(t) * w(t)(j); t += 1 }
        math.max(s, eps)
      })
      // H update
      for (i <- 0 until n; t <- 0 until k) {
        var num = 0.0; var den = 0.0; var j = 0
        while (j < m) {
          num += w(t)(j) * v(i)(j) / hw(i)(j); den += w(t)(j); j += 1
        }
        h(i)(t) = math.max(h(i)(t) * num / math.max(den, eps), eps)
      }
      // recompute HW with the new H for the W update
      val hw2 = Array.tabulate(n, m)((i, j) => {
        var s = 0.0; var t = 0
        while (t < k) { s += h(i)(t) * w(t)(j); t += 1 }
        math.max(s, eps)
      })
      for (t <- 0 until k; j <- 0 until m) {
        var num = 0.0; var den = 0.0; var i = 0
        while (i < n) {
          num += h(i)(t) * v(i)(j) / hw2(i)(j); den += h(i)(t); i += 1
        }
        w(t)(j) = math.max(w(t)(j) * num / math.max(den, eps), eps)
      }
      iter += 1
    }
    (h, w)
  }

  /** KL divergence D(V || HW) — decreases monotonically under the updates
    * (asserted in GapEncoderSpec).
    */
  def klDivergence(v: Array[Array[Double]], h: Array[Array[Double]],
                   w: Array[Array[Double]], eps: Double = 1e-10): Double = {
    var d = 0.0
    for (i <- v.indices; j <- v.head.indices) {
      var s = 0.0; var t = 0
      while (t < h.head.length) { s += h(i)(t) * w(t)(j); t += 1 }
      s = math.max(s, eps)
      val x = v(i)(j)
      d += (if (x > 0) x * math.log(x / s) - x + s else s)
    }
    d
  }

  /** Encode string column `c` into `nComponents` topic-activation columns
    * `{c}_gap_{i}`. Fit on distinct values (driver NMF — reference fits on
    * unique strings too); per-value activations join back (AQE-decided).
    * `maxDistinct` caps driver memory: beyond it, the most frequent values
    * are fitted and the rest transform against the fitted topics with an
    * H-only update (here: frequency cap enforced; rare overflow values get
    * null activations, the reject contract).
    */
  def encode(df: DataFrame, c: String, nComponents: Int = 10,
             nBuckets: Int = 128, maxIter: Int = 30,
             maxDistinct: Int = 50000): DataFrame = {
    val spark = df.sparkSession
    val top = df.filter(col(c).isNotNull).groupBy(col(c)).count()
      .orderBy(col("count").desc, col(c)).limit(maxDistinct)
      .select(col(c)).collect().map(_.getString(0))
    val v = top.map(NgramVec.tf(_, nBuckets))
    val (h, _) = nmf(v, nComponents, maxIter)
    val rows = top.zip(h).map { case (value, act) =>
      Row.fromSeq(value +: act.toSeq)
    }
    val schema = StructType(StructField(c, StringType) +:
      (0 until nComponents).map(i => StructField(s"${c}_gap_$i", DoubleType)))
    val encoded = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), schema)
    df.join(encoded, Seq(c), "left")
  }
}
