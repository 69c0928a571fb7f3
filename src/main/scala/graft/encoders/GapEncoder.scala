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
    *
    * Parallelized over DETERMINISTIC axes only: HW and H rows are
    * cell-independent (parallel over i), and the W update parallelizes over
    * components t while each cell's reduction over i stays sequential in i
    * order — so every float addition happens in the same order as the
    * sequential form and the result is bit-identical (the oracle's
    * convergence gate and GapEncoderSpec's monotonicity assertion depend on
    * exact reproducibility). At the 50k-value `maxDistinct` cap the
    * sequential form is ~6B multiply-adds (tens of seconds on one core);
    * this brings the fit back to driver-core-count speedup.
    */
  def nmf(v: Array[Array[Double]], k: Int, maxIter: Int = 30,
          eps: Double = 1e-10): (Array[Array[Double]], Array[Array[Double]]) = {
    import scala.collection.parallel.CollectionConverters._
    val n = v.length
    val m = v.head.length
    val h = Array.tabulate(n, k)((i, j) => initCell("h", i, j))
    val w = Array.tabulate(k, m)((i, j) => initCell("w", i, j))
    val hw = Array.ofDim[Double](n, m)
    // R = V / (HW) computed cell-wise on demand
    def recomputeHw(): Unit = (0 until n).par.foreach { i =>
      val hi = h(i); val row = hw(i)
      var j = 0
      while (j < m) {
        var s = 0.0; var t = 0
        while (t < k) { s += hi(t) * w(t)(j); t += 1 }
        row(j) = math.max(s, eps); j += 1
      }
    }
    var iter = 0
    while (iter < maxIter) {
      recomputeHw()
      // H update — each row i writes only h(i)
      (0 until n).par.foreach { i =>
        val hi = h(i); val vi = v(i); val hwi = hw(i)
        var t = 0
        while (t < k) {
          val wt = w(t)
          var num = 0.0; var den = 0.0; var j = 0
          while (j < m) { num += wt(j) * vi(j) / hwi(j); den += wt(j); j += 1 }
          hi(t) = math.max(hi(t) * num / math.max(den, eps), eps)
          t += 1
        }
      }
      // recompute HW with the new H for the W update
      recomputeHw()
      (0 until k).par.foreach { t =>
        val wt = w(t)
        var j = 0
        while (j < m) {
          var num = 0.0; var den = 0.0; var i = 0
          while (i < n) {
            num += h(i)(t) * v(i)(j) / hw(i)(j); den += h(i)(t); i += 1
          }
          wt(j) = math.max(wt(j) * num / math.max(den, eps), eps)
          j += 1
        }
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

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** H-only multiplicative update against a FROZEN topic matrix `w`: the
    * transform step for values not seen at fit time (reference
    * GapEncoder.transform runs the same H-step with W fixed,
    * _gap_encoder.py:88). Pure function of (value-counts row, w) — safe to
    * run inside executors with `w` broadcast.
    */
  def hStep(v: Array[Double], w: Array[Array[Double]], iters: Int = 10,
            eps: Double = 1e-10): Array[Double] = {
    val k = w.length
    val m = v.length
    val h = Array.tabulate(k)(t => initCell("ht", 0, t))
    var iter = 0
    while (iter < iters) {
      val hw = Array.tabulate(m) { j =>
        var s = 0.0; var t = 0
        while (t < k) { s += h(t) * w(t)(j); t += 1 }
        math.max(s, eps)
      }
      var t = 0
      while (t < k) {
        var num = 0.0; var den = 0.0; var j = 0
        while (j < m) { num += w(t)(j) * v(j) / hw(j); den += w(t)(j); j += 1 }
        h(t) = math.max(h(t) * num / math.max(den, eps), eps)
        t += 1
      }
      iter += 1
    }
    h
  }

  // ---- online (minibatch) learning --------------------------------------

  /** Online GapEncoder state (reference partial_fit, _gap_encoder.py:620-713;
    * update math _multiplicative_update_w:819-844): topics `w` with the
    * sufficient statistics `a`/`b` (W = A/B after each batch, with decay
    * `rho` forgetting old batches) and the per-seen-value activations
    * `hDict` (the reference's H_dict_).
    */
  final case class OnlineModel(c: String, nComponents: Int, nBuckets: Int,
                               rho: Double,
                               w: Array[Array[Double]],
                               a: Array[Array[Double]],
                               b: Array[Double],
                               hDict: Map[String, Array[Double]]) {

    /** Activations for every value of `df`'s column: seen values replay
      * their fitted H row, unseen values run the frozen-W H-step in the
      * executors (w broadcast) — streaming-friendly transform.
      */
    def transform(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      val schema = StructType(StructField(c, StringType) +:
        (0 until nComponents).map(i => StructField(s"${c}_gap_$i", DoubleType)))
      val seenRows = hDict.toSeq.sortBy(_._1).map { case (v, h) =>
        Row.fromSeq(v +: h.toSeq)
      }
      val seen = spark.createDataFrame(
        java.util.Arrays.asList(seenRows: _*), schema)
      val wB = spark.sparkContext.broadcast(w)
      val seenSet = spark.sparkContext.broadcast(hDict.keySet)
      val nb = nBuckets
      val unseen = spark.createDataFrame(
        df.filter(col(c).isNotNull).select(col(c)).distinct()
          .rdd.map(_.getString(0))
          .filter(v => !seenSet.value.contains(v))
          .map(v => Row.fromSeq(v +: hStep(NgramVec.tf(v, nb), wB.value).toSeq)),
        schema)
      df.join(seen.unionByName(unseen), Seq(c), "left")
    }
  }

  /** OnlineModel <-> JSON (the learner-persistence contract: fit on one
    * session, save, keep partial-fitting or transforming in another).
    */
  def saveOnline(m: OnlineModel): String = {
    import graft.plans.Json
    def mat(x: Array[Array[Double]]) =
      Json.arr(x.toSeq.map(r => Json.arr(r.toSeq.map(Json.num))))
    Json.obj(Seq(
      "type" -> Json.str("graft.GapEncoder.OnlineModel"),
      "c" -> Json.str(m.c),
      "nComponents" -> Json.num(m.nComponents.toLong),
      "nBuckets" -> Json.num(m.nBuckets.toLong),
      "rho" -> Json.num(m.rho),
      "w" -> mat(m.w), "a" -> mat(m.a),
      "b" -> Json.arr(m.b.toSeq.map(Json.num)),
      "h" -> Json.obj(m.hDict.toSeq.sortBy(_._1).map { case (k, v) =>
        k -> Json.arr(v.toSeq.map(Json.num))
      })))
  }

  def loadOnline(json: String): OnlineModel = {
    import graft.plans.Json
    val o = Json.parse(json).asInstanceOf[Map[String, Any]]
    require(o("type") == "graft.GapEncoder.OnlineModel", "not an OnlineModel")
    def dbl(x: Any): Double = x match {
      case d: Double => d
      case l: Long   => l.toDouble
    }
    def mat(x: Any): Array[Array[Double]] =
      x.asInstanceOf[List[Any]].map(_.asInstanceOf[List[Any]]
        .map(dbl).toArray).toArray
    OnlineModel(
      c = o("c").asInstanceOf[String],
      nComponents = o("nComponents").asInstanceOf[Long].toInt,
      nBuckets = o("nBuckets").asInstanceOf[Long].toInt,
      rho = dbl(o("rho")),
      w = mat(o("w")), a = mat(o("a")),
      b = o("b").asInstanceOf[List[Any]].map(dbl).toArray,
      // VectorMap in sorted-key order: the JSON object is saved key-sorted,
      // so load is deterministic — LRU recency restarts from that order
      hDict = scala.collection.immutable.VectorMap.from(
        o("h").asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1).map {
          case (k, v) => k -> v.asInstanceOf[List[Any]].map(dbl).toArray
        }))
  }

  /** Fresh online model with the deterministic init. */
  def initOnline(c: String, nComponents: Int = 10, nBuckets: Int = 128,
                 rho: Double = 0.95): OnlineModel =
    OnlineModel(c, nComponents, nBuckets, rho,
      w = Array.tabulate(nComponents, nBuckets)((i, j) => initCell("w", i, j)),
      a = Array.tabulate(nComponents, nBuckets)((i, j) =>
        initCell("w", i, j) * 0.1),
      b = Array.fill(nComponents)(0.1),
      hDict = scala.collection.immutable.VectorMap.empty)

  /** One partial_fit step over a batch frame (reference contract: batches
    * arrive one by one; each call folds the batch's UNIQUE values in). The
    * batch's distinct values come to the driver — bounded by `maxBatchDistinct`
    * (loud failure beyond, matching the fit-on-driver contract of `encode`).
    *
    * Per batch: H rows for the batch's values (warm-started for seen
    * values), then the reference's online W update
    *   A <- rho*A + W .* (Ht (V / HW));  B <- rho*B + Ht 1;  W = A / B.
    */
  /** Cap on the cached per-value activations carried across batches: on an
    * unbounded stream the distinct-value count grows without bound, and an
    * uncapped `hDict` is a driver-memory leak (the reference caps its own
    * per-value cache with an LRU, _minhash_encoder.py:116). Least-recently-
    * SEEN values are evicted first; an evicted value that reappears simply
    * re-derives its activation from the frozen topics W (the same cold-start
    * H-step every unseen value takes), so eviction affects warm-start speed,
    * never correctness.
    */
  val MaxHDict = 100000

  def partialFit(m: OnlineModel, df: DataFrame,
                 maxBatchDistinct: Int = 50000,
                 eps: Double = 1e-10,
                 maxHDict: Int = MaxHDict): OnlineModel = {
    val vals = df.filter(col(m.c).isNotNull).select(col(m.c)).distinct()
      .limit(maxBatchDistinct + 1).collect().map(_.getString(0)).sorted
    require(vals.length <= maxBatchDistinct,
      s"partialFit batch has more than $maxBatchDistinct distinct values. " +
        "Split the distinct stream into bounded batches and fold them in " +
        "sequentially — e.g. partition the distinct values by a hash of " +
        "the value (df.filter(hash(col) % nBatches === b)) and call " +
        "partialFit once per slice; driver state stays bounded by " +
        "maxBatchDistinct per step and maxHDict overall")
    if (vals.isEmpty) return m
    val k = m.nComponents
    val nbk = m.nBuckets
    val v = vals.map(NgramVec.tf(_, nbk))
    // E-step: batch activations against the current topics (warm-start)
    val h = vals.zipWithIndex.map { case (value, i) =>
      m.hDict.getOrElse(value, hStep(v(i), m.w))
    }
    // refine with the frozen-W H-step from the warm start, like the
    // reference's max_iter_e_step refinement
    val hRef = vals.indices.map(i => hStepFrom(v(i), m.w, h(i))).toArray
    // online W update via sufficient statistics
    val a = Array.tabulate(k, nbk)((t, j) => m.a(t)(j) * m.rho)
    val b = Array.tabulate(k)(t => m.b(t) * m.rho)
    val n = vals.length
    // HW, R = V/HW
    val r = Array.tabulate(n, nbk) { (i, j) =>
      var s = 0.0; var t = 0
      while (t < k) { s += hRef(i)(t) * m.w(t)(j); t += 1 }
      v(i)(j) / math.max(s, eps)
    }
    for (t <- 0 until k) {
      var hSum = 0.0
      for (i <- 0 until n) hSum += hRef(i)(t)
      b(t) += hSum
      for (j <- 0 until nbk) {
        var htr = 0.0
        for (i <- 0 until n) htr += hRef(i)(t) * r(i)(j)
        a(t)(j) += m.w(t)(j) * htr
      }
    }
    val w = Array.tabulate(k, nbk)((t, j) =>
      math.max(a(t)(j) / math.max(b(t), eps), eps))
    // LRU update: this batch's values are the most recently seen — remove
    // then re-append so they move to the back of the insertion order
    // (hDict is a VectorMap: iteration order == insertion order), then
    // evict from the FRONT (least recently seen) down to the cap.
    val merged = (m.hDict -- vals) ++ vals.zip(hRef)
    val capped =
      if (merged.size <= maxHDict) merged
      else merged.drop(merged.size - maxHDict)
    m.copy(w = w, a = a, b = b, hDict = capped)
  }

  /** hStep warm-started from an existing activation row. */
  private def hStepFrom(v: Array[Double], w: Array[Array[Double]],
                        h0: Array[Double], iters: Int = 10,
                        eps: Double = 1e-10): Array[Double] = {
    val k = w.length
    val m = v.length
    val h = h0.clone()
    var iter = 0
    while (iter < iters) {
      val hw = Array.tabulate(m) { j =>
        var s = 0.0; var t = 0
        while (t < k) { s += h(t) * w(t)(j); t += 1 }
        math.max(s, eps)
      }
      var t = 0
      while (t < k) {
        var num = 0.0; var den = 0.0; var j = 0
        while (j < m) { num += w(t)(j) * v(j) / hw(j); den += w(t)(j); j += 1 }
        h(t) = math.max(h(t) * num / math.max(den, eps), eps)
        t += 1
      }
      iter += 1
    }
    h
  }

  /** Encode string column `c` into `nComponents` topic-activation columns
    * `{c}_gap_{i}`. Fit on distinct values (driver NMF — reference fits on
    * unique strings too); per-value activations join back (AQE-decided).
    *
    * `maxDistinct` caps driver memory: the NMF fits on the `maxDistinct`
    * most frequent values only. Overflow values (rarer than the cap) are NOT
    * silently nulled: their distinct values get activations from a
    * distributed H-step against the fitted (broadcast) topic matrix — the
    * reference's own transform path for unseen categories — and a loud
    * warning records that the fit was truncated.
    *
    * `diagnostics = true` appends two oracle-checkable columns:
    * `{c}_gap_gram_total` — the exact count-matrix row sum (= the value's
    * char-2-4-gram count), and `{c}_gap_row_sum_ok` — whether the fitted
    * reconstruction preserves that row sum within `rowSumTol` relative error
    * (KL-NMF preserves row sums at stationarity, so this gates convergence).
    */
  def encode(df: DataFrame, c: String, nComponents: Int = 10,
             nBuckets: Int = 128, maxIter: Int = 30,
             maxDistinct: Int = 50000, diagnostics: Boolean = false,
             rowSumTol: Double = 0.01): DataFrame = {
    val spark = df.sparkSession
    val topAndProbe = df.filter(col(c).isNotNull).groupBy(col(c)).count()
      .orderBy(col("count").desc, col(c)).limit(maxDistinct + 1)
      .select(col(c)).collect().map(_.getString(0))
    val overflowed = topAndProbe.length > maxDistinct
    val top = topAndProbe.take(maxDistinct)
    val v = top.map(NgramVec.tf(_, nBuckets))
    val (h, w) = nmf(v, nComponents, maxIter)

    def rowOf(value: String, act: Array[Double]): Row = {
      if (!diagnostics) Row.fromSeq(value +: act.toSeq)
      else {
        val counts = NgramVec.tf(value, nBuckets)
        val vSum = counts.sum
        var hwSum = 0.0
        var t = 0
        while (t < w.length) {
          var ws = 0.0; var j = 0
          while (j < counts.length) { ws += w(t)(j); j += 1 }
          hwSum += act(t) * ws
          t += 1
        }
        val ok = vSum > 0 && math.abs(hwSum - vSum) / vSum < rowSumTol
        Row.fromSeq(value +: act.toSeq :+ vSum.toLong :+ ok)
      }
    }

    val baseFields = StructField(c, StringType) +:
      (0 until nComponents).map(i => StructField(s"${c}_gap_$i", DoubleType))
    val schema = StructType(
      if (diagnostics)
        baseFields :+ StructField(s"${c}_gap_gram_total", LongType) :+
          StructField(s"${c}_gap_row_sum_ok", BooleanType)
      else baseFields)

    val fittedRows = top.zip(h).map { case (value, act) => rowOf(value, act) }
    val fitted = spark.createDataFrame(
      spark.sparkContext.parallelize(fittedRows.toSeq), schema)

    val encoded =
      if (!overflowed) fitted
      else {
        log.warn(s"GapEncoder: column '$c' has more than $maxDistinct distinct " +
          s"values; NMF fitted on the $maxDistinct most frequent — the rest " +
          "transform via a distributed H-step against the fitted topics. " +
          "To fit on EVERY distinct value with bounded driver state, use " +
          "initOnline + partialFit over hash-partitioned slices of the " +
          "distinct stream (see GapEncoderSpec's beyond-cap test)")
        val wB = spark.sparkContext.broadcast(w)
        val topSet = spark.sparkContext.broadcast(top.toSet)
        val overflowRows = df.filter(col(c).isNotNull).select(col(c)).distinct()
          .rdd.map(_.getString(0))
          .filter(value => !topSet.value.contains(value))
          .map { value =>
            val counts = NgramVec.tf(value, nBuckets)
            rowOf(value, hStep(counts, wB.value))
          }
        fitted.unionByName(spark.createDataFrame(overflowRows, schema))
      }
    df.join(encoded, Seq(c), "left")
  }
}
