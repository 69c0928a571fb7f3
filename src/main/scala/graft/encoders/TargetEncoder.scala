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
    val mu = g.getDouble(0) / g.getLong(1)
    val enc = (col("__s") + lit(m) * lit(mu)) / (col("__n") + lit(m))
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
    val bigS = g.getDouble(0)
    val bigN = g.getLong(1)
    val muComp = (lit(bigS) - col("__sf")) / (lit(bigN) - col("__nf"))
    val enc = (col("__sc") - col("__scf") + lit(m) * muComp) /
      (col("__nc") - col("__ncf") + lit(m))
    val encMap = cf.join(catTot, "__cat").join(broadcast(foldTot), "__fold")
      .select(col("__cat"), col("__fold").as("__f"),
        enc.as(s"${catCol}_target_enc"))
    withFold.join(encMap,
        withFold(catCol) <=> col("__cat") && col("__fold") === col("__f"),
        "left")
      .drop("__cat", "__f")
  }


  /** Pipeline-citizen form of the in-sample encoding: fit captures the
    * category stats AS LITERAL STATE (collected from the vocabulary-sized
    * stats frame — the fit-on-bounded-distinct discipline; fails loudly
    * past `maxCategories` rather than silently ballooning driver memory),
    * so transform replays on ANY frame, including one without the target.
    */
  def estimator(catCol: String, targetCol: String, m: Double = 10.0,
                maxCategories: Int = 100000): graft.plans.Estimator =
    new graft.plans.Estimator {
      def fit(df: DataFrame): graft.plans.Transformer = {
        val y = col(targetCol)
        val stats = df.groupBy(col(catCol).as("__cat")).agg(
          count(y).as("__n"), decSum(y).as("__s"))
        val rows = stats.limit(maxCategories + 1).collect()
        require(rows.length <= maxCategories,
          s"TargetEncoder.estimator: more than $maxCategories categories; " +
            "raise maxCategories or use encode() (stats stay distributed)")
        def sOf(r: org.apache.spark.sql.Row): Double =
          if (r.isNullAt(2)) 0.0 else r.getDouble(2) // all-null-target group
        val bigN = rows.map(_.getLong(1)).sum
        val bigS = rows.map(sOf).sum
        require(bigN > 0, "TargetEncoder.estimator: no non-null targets to fit on")
        val mu = bigS / bigN
        val encMap: Map[String, Double] = rows.map { r =>
          val key = if (r.isNullAt(0)) "\u0000null" else String.valueOf(r.get(0))
          key -> (sOf(r) + m * mu) / (r.getLong(1) + m)
        }.toMap
        new graft.plans.Transformer {
          def transform(d: DataFrame): DataFrame = {
            val key = when(col(catCol).isNull, "\u0000null")
              .otherwise(col(catCol).cast(org.apache.spark.sql.types.StringType))
            d.withColumn(s"${catCol}_target_enc",
              coalesce(element_at(typedLit(encMap), key), lit(mu)))
          }
        }
      }
    }
}
