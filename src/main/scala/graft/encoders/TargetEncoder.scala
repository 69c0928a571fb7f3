package graft.encoders

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Smoothed target encoding (beyond reference — modern skrub dropped its
  * TargetEncoder; this is the standard m-estimate form plus the
  * leakage-safe out-of-fold variant every tabular training pipeline wants;
  * Micci-Barreca 2001, "A preprocessing scheme for high-cardinality
  * categorical attributes").
  *
  * enc(c) = (sum_y(c) + m * global_mean) / (n(c) + m) — categories shrink
  * toward the global mean in proportion to their scarcity. Null categories
  * are their own group (null-safe join back). Null targets are excluded
  * from every statistic.
  *
  * Scale shape — built for the HIGH-CARDINALITY case this encoder exists
  * for: the per-category stats frame is vocabulary-sized and stays
  * DISTRIBUTED (groupBy aggregates, shuffle joins AQE can demote to
  * broadcast when small — never a mandatory broadcast or a SinglePartition
  * window over it); only k-bounded fold totals and two global scalars ever
  * reach the driver. Target sums route through DECIMAL so the encoding is
  * aggregation-order-independent at any partitioning.
  */
object TargetEncoder {

  private def decSum(y: Column): Column =
    sum(y.cast(DecimalType(24, 6))).cast(DoubleType)

  /** In-sample m-estimate encoding: adds `{cat}_target_enc`. */
  def encode(df: DataFrame, catCol: String, targetCol: String,
             m: Double = 10.0): DataFrame = {
    require(m > 0, "smoothing m must be > 0")
    val y = col(targetCol)
    val stats = df.groupBy(col(catCol).as("__cat")).agg(
      count(y).as("__n"), decSum(y).as("__s"))
    val g = stats.agg(sum(col("__s")), sum(col("__n"))).head()
    require(!g.isNullAt(0) && g.getLong(1) > 0,
      s"TargetEncoder.encode: target column '$targetCol' has no non-null " +
        "values — nothing to encode against")
    val mu = g.getDouble(0) / g.getLong(1)
    // A category whose targets are ALL null has __s = null / __n = 0:
    // coalesce so it shrinks fully to the prior mu (the m-estimate limit at
    // n=0 — and the same answer estimator() gives), instead of encoding null.
    val enc = (coalesce(col("__s"), lit(0.0)) + lit(m) * lit(mu)) /
      (col("__n") + lit(m))
    df.join(stats.select(col("__cat"), enc.as(s"${catCol}_target_enc")),
        col(catCol) <=> col("__cat"), "left")
      .drop("__cat")
  }

  /** Deterministic md5-keyed fold id in [0, k) (the sampleExact discipline
    * — reproducible in any engine, stable across runs and partitionings).
    */
  def foldOf(id: Column, k: Int, seed: Long): Column =
    conv(substring(md5(concat(id.cast(StringType), lit(":"), lit(seed.toString))),
      1, 15), 16, 10).cast(LongType) % k

  /** Out-of-fold encoding: each row's feature uses ONLY the complement
    * folds' statistics (its own target can never leak into it). Adds
    * `{cat}_target_enc` and `__fold`. A category seen only in the row's
    * own fold falls back to the complement's global mean (the m-estimate
    * limit at n=0).
    */
  def encodeOutOfFold(df: DataFrame, catCol: String, targetCol: String,
                      idCol: String, k: Int = 5, m: Double = 10.0,
                      seed: Long = 42L): DataFrame = {
    require(k >= 2, "need k >= 2 folds")
    require(m > 0, "smoothing m must be > 0")
    val y = col(targetCol)
    val withFold = df.withColumn("__fold", foldOf(col(idCol), k, seed))
    // one (category, fold) aggregate — vocabulary x k rows, distributed
    val cf = withFold.groupBy(col(catCol).as("__cat"), col("__fold"))
      .agg(count(y).as("__ncf"), decSum(y).as("__scf"))
    // category totals stay distributed (vocabulary-sized); fold totals are
    // k rows and broadcast; global totals are two driver scalars
    val catTot = cf.groupBy(col("__cat"))
      .agg(sum(col("__ncf")).as("__nc"), sum(col("__scf")).as("__sc"))
    val foldTot = cf.groupBy(col("__fold"))
      .agg(sum(col("__ncf")).as("__nf"), sum(col("__scf")).as("__sf"))
    val g = foldTot.agg(sum(col("__sf")), sum(col("__nf"))).head()
    require(!g.isNullAt(0) && g.getLong(1) > 0,
      s"TargetEncoder.encodeOutOfFold: target column '$targetCol' has no " +
        "non-null values — nothing to encode against")
    val bigS = g.getDouble(0)
    val bigN = g.getLong(1)
    // All-null-target (category, fold) / category / fold groups carry null
    // sums; coalesce every sum to 0.0 so such groups shrink to the
    // complement mean (matching encode()/estimator()) instead of going null.
    val muComp = (lit(bigS) - coalesce(col("__sf"), lit(0.0))) /
      (lit(bigN) - col("__nf"))
    val enc = (coalesce(col("__sc"), lit(0.0)) - coalesce(col("__scf"), lit(0.0)) +
        lit(m) * muComp) /
      (col("__nc") - col("__ncf") + lit(m))
    val encMap = cf.join(catTot, "__cat").join(broadcast(foldTot), "__fold")
      .select(col("__cat"), col("__fold").as("__f"),
        enc.as(s"${catCol}_target_enc"))
    withFold.join(encMap,
        withFold(catCol) <=> col("__cat") && col("__fold") === col("__f"),
        "left")
      .drop("__cat", "__f")
  }


  /** Null categories are keyed by a sentinel that no real string equals
    * (a cast of a real value never yields NUL-prefixed text).
    */
  private val NullKey = "\u0000null"

  /** Vocab size above which transform routes through a broadcast join
    * instead of a literal map: `element_at` on a Catalyst map LITERAL is a
    * per-row linear scan (no hashing), so a 100k-entry vocabulary would pay
    * up to 100k string compares per row. A broadcast hash join is O(1) per
    * row (explicitly hinted, never shuffles the main frame). Below the
    * threshold the literal map keeps the transform a pure projection (no
    * join node in the plan).
    */
  private val MapLiteralMaxVocab = 512

  /** Fitted in-sample encoder: vocabulary-sized state, replayable on any
    * frame (including one without the target), JSON-persistable.
    */
  final case class Model(catCol: String, m: Double, mu: Double,
                         enc: Map[String, Double]) {
    def transform(d: DataFrame): DataFrame = {
      val outCol = s"${catCol}_target_enc"
      val key = when(col(catCol).isNull, NullKey)
        .otherwise(col(catCol).cast(StringType))
      if (enc.size <= MapLiteralMaxVocab)
        d.withColumn(outCol,
          coalesce(element_at(typedLit(enc), key), lit(mu)))
      else {
        // keys are unique (they came from a groupBy), so the left join is
        // row-preserving; unseen categories fall back to the fitted mu
        val spark = d.sparkSession
        import spark.implicits._
        val encDf = enc.toSeq.toDF("__graft_te_key", "__graft_te_enc")
        d.withColumn("__graft_te_k", key)
          .join(broadcast(encDf), col("__graft_te_k") === col("__graft_te_key"),
            "left")
          .withColumn(outCol, coalesce(col("__graft_te_enc"), lit(mu)))
          .drop("__graft_te_k", "__graft_te_key", "__graft_te_enc")
      }
    }
  }

  /** Fit the in-sample encoding as LITERAL STATE (collected from the
    * vocabulary-sized stats frame — the fit-on-bounded-distinct discipline;
    * fails loudly past `maxCategories` rather than silently ballooning
    * driver memory).
    */
  def fit(df: DataFrame, catCol: String, targetCol: String, m: Double = 10.0,
          maxCategories: Int = 100000): Model = {
    require(m > 0, "smoothing m must be > 0")
    val y = col(targetCol)
    val stats = df.groupBy(col(catCol).as("__cat")).agg(
      count(y).as("__n"), decSum(y).as("__s"))
    val rows = stats.limit(maxCategories + 1).collect()
    require(rows.length <= maxCategories,
      s"TargetEncoder.fit: more than $maxCategories categories; " +
        "raise maxCategories or use encode() (stats stay distributed)")
    def sOf(r: org.apache.spark.sql.Row): Double =
      if (r.isNullAt(2)) 0.0 else r.getDouble(2) // all-null-target group
    val bigN = rows.map(_.getLong(1)).sum
    val bigS = rows.map(sOf).sum
    require(bigN > 0, "TargetEncoder.fit: no non-null targets to fit on")
    val mu = bigS / bigN
    val encMap: Map[String, Double] = rows.map { r =>
      val key = if (r.isNullAt(0)) NullKey else String.valueOf(r.get(0))
      key -> (sOf(r) + m * mu) / (r.getLong(1) + m)
    }.toMap
    Model(catCol, m, mu, encMap)
  }

  /** Pipeline-citizen form: fit -> frozen Model -> replayable transform. */
  def estimator(catCol: String, targetCol: String, m: Double = 10.0,
                maxCategories: Int = 100000): graft.plans.Estimator =
    new graft.plans.Estimator {
      def fit(df: DataFrame): graft.plans.Transformer = {
        val model = TargetEncoder.fit(df, catCol, targetCol, m, maxCategories)
        (d: DataFrame) => model.transform(d)
      }
    }

  /** Persist / reload a fitted Model as a small JSON file (the Bpe.save
    * discipline — byte-stable, engine-free, bit-identical transform after
    * reload; spec-pinned in PersistenceSpec).
    */
  def save(model: Model, path: String): Unit = {
    import graft.plans.Json
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val keys = model.enc.keys.toSeq.sorted // deterministic byte layout
    java.nio.file.Files.writeString(p, Json.obj(Seq(
      "type" -> Json.str("graft.TargetEncoder.Model"),
      "catCol" -> Json.str(model.catCol),
      "m" -> Json.num(model.m),
      "mu" -> Json.num(model.mu),
      "keys" -> Json.arr(keys.map(Json.str)),
      "vals" -> Json.arr(keys.map(k => Json.num(model.enc(k)))))))
  }

  def load(path: String): Model = {
    import graft.plans.Json
    val o = Json.parse(java.nio.file.Files.readString(
      java.nio.file.Paths.get(path))).asInstanceOf[Map[String, Any]]
    require(o.get("type").contains("graft.TargetEncoder.Model"),
      "not a TargetEncoder.Model file")
    def d(x: Any): Double = x match {
      case dd: Double => dd
      case l: Long    => l.toDouble
      case other      => other.toString.toDouble
    }
    val keys = o("keys").asInstanceOf[Seq[Any]].map(_.asInstanceOf[String])
    val vals = o("vals").asInstanceOf[Seq[Any]].map(d)
    Model(o("catCol").asInstanceOf[String], d(o("m")), d(o("mu")),
      keys.zip(vals).toMap)
  }
}
