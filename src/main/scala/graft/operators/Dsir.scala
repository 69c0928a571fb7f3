package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DSIR — Data Selection via Importance Resampling (Xie et al., 2023,
  * "Data Selection for Language Models via Importance Resampling").
  * Selects raw-corpus documents whose hashed-n-gram distribution looks like
  * a (small, high-quality) target corpus:
  *
  *   1. fit: hash word bigrams into B buckets; estimate two bag-of-buckets
  *      unigram models — p_target(b) and p_raw(b) — with add-0.5 smoothing.
  *   2. weight: log importance weight of a document is
  *      λ(d) = Σ_g ln(p_target(bucket(g)) / p_raw(bucket(g))).
  *   3. resample: Gumbel-top-k over λ(d) + Gumbel(0,1) noise — sampling
  *      WITHOUT replacement proportional to the importance weights.
  *
  * Everything is engine-reproducible: buckets come from md5 (identical in
  * the SQL oracle), per-gram log-ratios are rounded to 6 dp and summed as
  * DECIMAL(28,6) (exact, order-independent → `weight_micro` integers), and
  * the Gumbel noise is derived from md5(doc_id) (deterministic, mirrors
  * the library's md5-keyed sampling discipline, `Kernel.hexThreshold15`).
  *
  * 100 TB shape: `fit` is two corpus scans each reduced to a ≤B-row
  * aggregate (map-side combine; B defaults to 10k — the model state is
  * bounded by construction, like `NgramLm`'s top-V tables). The fitted
  * log-ratio table rides to the executors as an int-indexed array literal
  * (O(1) lookup inside codegen — not a map literal, which scans linearly).
  * `weights`/`resample` are then pure zero-shuffle scans over the raw
  * corpus plus one top-k. Reference contract: this is the scale
  * counterpart of skrub's row-selection surface (deduplicate/sample);
  * algorithm from the published DSIR paper.
  */
object Dsir {

  /** Fitted model: per-bucket ln(p_target/p_raw), 6-dp rounded. */
  case class DsirModel(nBuckets: Int, logRatio: Array[Double]) {
    def save(path: String): Unit = {
      val json = s"""{"nBuckets":$nBuckets,"logRatio":[${logRatio.mkString(",")}]}"""
      val p = java.nio.file.Paths.get(path)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p,
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    }
  }

  object DsirModel {
    def load(path: String): DsirModel = {
      val json = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
      val nb = """"nBuckets":(\d+)""".r.findFirstMatchIn(json).get.group(1).toInt
      val arr = """"logRatio":\[([^\]]*)\]""".r.findFirstMatchIn(json).get.group(1)
      val lr =
        if (arr.trim.isEmpty) Array.empty[Double]
        else arr.split(",").map(_.toDouble)
      require(lr.length == nb,
        s"DsirModel.load: ${lr.length} ratios for $nb buckets")
      DsirModel(nb, lr)
    }
  }

  /** Hashed-bigram buckets of a text column: one bucket id per word
    * bigram (documents with <2 tokens hash their whole normalized text —
    * `Text.wordShingles` fallback, so no document is weightless). This is
    * the REFERENCE formulation the SQL oracle mirrors; the hot paths use
    * the loop-codegen twin `VecExprs.gramBuckets` (higher-order functions
    * are CodegenFallback and build a hex string per gram — measured 8x on
    * the rehearsal corpus), pinned equivalent in DsirSpec.
    */
  def buckets(text: Column, nBuckets: Int): Column =
    transform(graft.functions.Text.wordShingles(text, 2),
      g => conv(substring(md5(g), 1, 8), 16, 10).cast(LongType) % nBuckets)

  /** Per-bucket gram counts of a corpus: ≤ nBuckets rows. */
  private def bucketCounts(df: DataFrame, textCol: String, nBuckets: Int): DataFrame =
    df.select(explode(graft.functions.VecExprs.gramBuckets(
        coalesce(col(textCol), lit("")), nBuckets)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))

  /** Fit the bucketed importance model from a target corpus and the raw
    * corpus. Both reduce to ≤B-row aggregates; the division and ln happen
    * driver-side on the bounded arrays.
    */
  def fit(raw: DataFrame, target: DataFrame, textCol: String,
          nBuckets: Int = 10000): DsirModel =
    fitFromCounts(bucketCountsOf(raw, textCol, nBuckets),
      bucketCountsOf(target, textCol, nBuckets))

  /** Dense per-bucket gram counts of a corpus — ONE scan reduced to a
    * ≤nBuckets-row aggregate. Public so fit/diagnostic workflows can count
    * each corpus once and share the arrays (`fitFromCounts`,
    * `klFromCounts`) instead of re-scanning per call.
    */
  def bucketCountsOf(df: DataFrame, textCol: String,
                     nBuckets: Int): Array[Long] = {
    require(nBuckets > 0 && nBuckets <= (1 << 22),
      s"Dsir: nBuckets $nBuckets out of (0, 4M] — state must stay driver-bounded")
    val a = new Array[Long](nBuckets)
    bucketCounts(df, textCol, nBuckets).collect().foreach { r =>
      a(r.getLong(0).toInt) = r.getLong(1)
    }
    a
  }

  /** Fit from already-collected count arrays (same smoothing/rounding as
    * `fit` — that overload delegates here).
    */
  def fitFromCounts(raw: Array[Long], target: Array[Long]): DsirModel = {
    require(raw.length == target.length && raw.nonEmpty,
      s"Dsir.fitFromCounts: ${raw.length} raw vs ${target.length} target buckets")
    val nBuckets = raw.length
    val totT = target.sum.toDouble + 0.5 * nBuckets
    val totR = raw.sum.toDouble + 0.5 * nBuckets
    val lr = Array.tabulate(nBuckets) { i =>
      val pt = (target(i) + 0.5) / totT
      val pr = (raw(i) + 0.5) / totR
      // same 6-dp rounding the per-gram oracle applies
      BigDecimal(math.log(pt / pr))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    DsirModel(nBuckets, lr)
  }

  /** GPT-3-style quality-classifier filter (Brown et al. 2020 appendix A
    * trains a linear classifier between a high-quality seed and raw
    * CommonCrawl; CCNet's fastText head plays the same role): a
    * hashed-bucket Naive-Bayes log-odds scorer IS this module's model
    * with target = the positive (high-quality) corpus and raw = the
    * negative contrast corpus — the fitted per-bucket
    * log(P(g|pos)/P(g|neg)) is exactly `logRatio`. This entry point NAMES
    * that composition and adds the decision: score every doc and flag the
    * ones whose total log-odds clears `minMeanMicro` micro-nats PER GRAM
    * (0 = "more positive-like than negative-like"). The comparison is
    * all-integer (score_micro > minMeanMicro * n_grams — no division), so
    * the verdict is exactly oracle-reproducible. Empty/whitespace-only
    * docs are EXPLICITLY low-quality (a token-count conjunct, not an
    * assumption about their gram score: the tokenizer's whole-text
    * fallback gives an empty doc ONE '' gram, whose smoothed unseen-
    * bucket log-ratio is positive whenever the neg corpus outweighs the
    * pos seed — the standard small-seed setup — so without the conjunct
    * empty docs would flag high-quality).
    *
    * Output: (doc_id, score_micro, n_grams, quality_pred). Scale shape =
    * `weights`: two bounded fit aggregates (≤nBuckets rows each) + ONE
    * zero-shuffle codegen scan over `docs`.
    */
  def classifierFlag(docs: DataFrame, textCol: String, idCol: String,
                     pos: DataFrame, neg: DataFrame,
                     nBuckets: Int = 10000,
                     minMeanMicro: Long = 0L): DataFrame = {
    val model = fit(raw = neg, target = pos, textCol, nBuckets)
    val micro = model.logRatio.map(lr => Math.round(lr * 1e6))
    val text = coalesce(col(textCol), lit(""))
    docs.select(col(idCol).as("doc_id"),
        graft.functions.VecExprs.gramWeightMicro(text, micro)
          .as("score_micro"),
        size(graft.functions.VecExprs.gramBuckets(text, nBuckets))
          .cast(LongType).as("n_grams"),
        size(graft.functions.Text.tokens(text)).cast(LongType)
          .as("__n_toks"))
      .withColumn("quality_pred",
        col("__n_toks") > 0L &&
          col("score_micro") > lit(minMeanMicro) * col("n_grams"))
      .drop("__n_toks")
  }

  /** Log importance weight per document as integer micro-nats:
    * (idCol, weight_micro). Pure scan — the model is an int-indexed array
    * literal; per-gram 6-dp values sum exactly as DECIMAL(28,6).
    */
  def weights(raw: DataFrame, textCol: String, idCol: String,
              model: DsirModel): DataFrame = {
    // 6-dp log-ratios in exact micro-longs: the integer sum inside the
    // loop expression equals the composed DECIMAL(28,6) aggregate bit for
    // bit (each logRatio double is the nearest double to a 6-dp decimal,
    // so round(lr * 1e6) recovers that decimal's micro value exactly)
    val micro = model.logRatio.map(lr => Math.round(lr * 1e6))
    raw.select(col(idCol).as("doc_id"),
      graft.functions.VecExprs.gramWeightMicro(
        coalesce(col(textCol), lit("")), micro).as("weight_micro"))
  }

  /** (doc_id, weight_micro, key_micro): the Gumbel-perturbed selection
    * keys — key(d) = λ(d) + Gumbel(0,1) in micro-nats, the Gumbel draw
    * md5(doc_id)-derived (60-bit uniform), so every selection built on the
    * keys is deterministic and oracle-reproducible.
    */
  private def keyed(raw: DataFrame, textCol: String, idCol: String,
                    model: DsirModel): DataFrame = {
    val w = weights(raw, textCol, idCol, model)
    // u in (0,1): (h60 + 0.5) / 2^60 from the first 15 md5 hex digits
    val u = (conv(substring(md5(col("doc_id").cast(StringType)), 1, 15), 16, 10)
      .cast(DoubleType) + lit(0.5)) / lit(1152921504606846976.0)
    val gumbelMicro = round(-log(-log(u)) * lit(1000000.0)).cast(LongType)
    w.withColumn("key_micro", col("weight_micro") + gumbelMicro)
  }

  /** Gumbel-top-k importance resample WITHOUT replacement: take the k
    * largest keys. Output: (doc_id, weight_micro, key_micro, rank), rank
    * 1..k by (key desc, doc_id). The exact k-list merges through the
    * driver (TakeOrderedAndProject) — right for eval-sized k; for
    * corpus-sized selections use `selectFraction`.
    */
  def resample(raw: DataFrame, textCol: String, idCol: String,
               model: DsirModel, k: Int): DataFrame = {
    // sort+limit plans as TakeOrderedAndProject (per-partition top-k, then
    // one k-row merge) — no global sort; the rank window then runs over k
    // rows only, so its single partition is bounded by construction.
    val top = keyed(raw, textCol, idCol, model)
      .orderBy(col("key_micro").desc, col("doc_id").asc).limit(k)
    val win = Window.orderBy(col("key_micro").desc, col("doc_id").asc)
    top.withColumn("rank", row_number().over(win))
  }

  /** KL(target ‖ corpus) over the hashed-bucket models — the selection
    * diagnostic from the DSIR paper: a selection that worked moves the
    * corpus distribution TOWARD the target, so KL(target ‖ selected) must
    * drop below KL(target ‖ raw). One ≤B-row aggregate per frame; the
    * per-bucket terms p_t·ln(p_t/p_c) are rounded to pico-nats (12 dp) and
    * summed exactly, so the diagnostic is engine-reproducible. Returns the
    * KL in pico-nats.
    */
  def klDiagnostic(corpus: DataFrame, target: DataFrame, textCol: String,
                   nBuckets: Int = 10000): Long =
    klFromCounts(bucketCountsOf(target, textCol, nBuckets),
      bucketCountsOf(corpus, textCol, nBuckets))

  /** KL from already-collected count arrays — fit+diagnose workflows
    * count each corpus once (`bucketCountsOf`) and share the arrays
    * instead of paying 2-3 redundant corpus scans.
    */
  def klFromCounts(target: Array[Long], corpus: Array[Long]): Long = {
    require(target.length == corpus.length && target.nonEmpty,
      s"Dsir.klFromCounts: ${target.length} target vs ${corpus.length} corpus buckets")
    val nBuckets = target.length
    val totT = target.sum.toDouble + 0.5 * nBuckets
    val totC = corpus.sum.toDouble + 0.5 * nBuckets
    var kl = 0L
    var i = 0
    while (i < nBuckets) {
      val pt = (target(i) + 0.5) / totT
      val pc = (corpus(i) + 0.5) / totC
      // exactly the oracle's CAST(round(term * 1e12) AS BIGINT): multiply
      // first, then round half away from zero on the PRODUCT — compared on
      // the exact fractional part (p - floor(p) is exact for |p| >= 1 by
      // Sterbenz, trivially exact below), never via the p + 0.5 shift,
      // whose own IEEE rounding can flip a boundary double (the largest
      // double below 0.5 plus 0.5 rounds to exactly 1.0)
      val p = pt * math.log(pt / pc) * 1000000000000.0
      val a = math.abs(p)
      val f = math.floor(a)
      val r = if (a - f >= 0.5) f + 1.0 else f
      kl += (if (p < 0) -r else r).toLong
      i += 1
    }
    kl
  }

  /** Importance-select ~`frac` of the corpus WITHOUT driver
    * materialization — the 100 TB twin of `resample`: the cutoff is one
    * `percentile_approx` aggregate over the Gumbel-perturbed keys
    * (bounded sketch state), selection is then a pure filter scan. The
    * KEYS are fully deterministic (md5-derived), so selection given a
    * cutoff is deterministic; the cutoff itself comes from a quantile
    * sketch whose partial-merge order a multi-executor cluster does not
    * fix, so run-to-run the threshold — and with it the boundary
    * documents — can move within the sketch's rank error. When exact
    * run-to-run reproducibility of the SET matters (release snapshots),
    * use `resample` with an explicit k, or persist the chosen `cut` and
    * re-apply it as a plain filter. Output: (doc_id, weight_micro,
    * key_micro); an empty input selects nothing.
    */
  def selectFraction(raw: DataFrame, textCol: String, idCol: String,
                     model: DsirModel, frac: Double,
                     accuracy: Int = 10000): DataFrame = {
    require(frac > 0.0 && frac <= 1.0,
      s"Dsir.selectFraction: frac $frac outside (0, 1]")
    if (frac == 1.0) keyed(raw, textCol, idCol, model)
    else {
      val ks = keyed(raw, textCol, idCol, model)
      val cutRow = ks.agg(percentile_approx(col("key_micro"),
        lit(1.0 - frac), lit(accuracy)).as("cut")).head()
      // empty input: the sketch returns NULL — select nothing rather than
      // NPE (the curate stage upstream may legitimately keep zero docs)
      if (cutRow.isNullAt(0)) ks.filter(lit(false))
      else ks.filter(col("key_micro") >= cutRow.getLong(0))
    }
  }
}
