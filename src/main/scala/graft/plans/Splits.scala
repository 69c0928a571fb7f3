package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic train/test and CV splitting on the X/y frontier (reference
  * `.skb.train_test_split` / `.skb.iter_cv_splits`,
  * skrub/_data_ops/_skrub_namespace.py:1988,2126).
  *
  * Spark-first shape: the reference materializes X/y and hands them to
  * sklearn's row-index splitters; at 100 TB there are no row indexes, so the
  * split is a PURE PREDICATE of the row's key — an md5 bucket in [0, 1000) —
  * which needs no shuffle, no sort, no materialized index, assigns every row
  * the same side on every evaluation and every engine (md5 is
  * cross-engine-reproducible, so the DuckDB oracle can replay the split
  * exactly), and pushes down to the scan as an ordinary filter.
  */
object Splits {

  /** Bucket in [0, 1000) derived from md5 of arbitrary key EXPRESSIONS
    * and seed — the general form `leakageSafeSplit` needs (its key is a
    * computed fingerprint, not a named column).
    */
  def bucketOf(keys: Seq[Column], seed: Long): Column =
    conv(substring(md5(concat_ws(":",
      (keys.map(_.cast(StringType)) :+ lit(seed.toString)): _*)), 1, 4), 16, 10)
      .cast(IntegerType) % 1000

  /** Bucket in [0, 1000) derived from md5 of the key columns and seed. */
  def bucket(keys: Seq[String], seed: Long): Column =
    bucketOf(keys.map(col), seed)

  /** Rows whose bucket falls below `testFraction * 1000` are test rows. */
  def isTest(keys: Seq[String], testFraction: Double, seed: Long): Column =
    bucket(keys, seed) < (testFraction * 1000).toInt

  /** (train, test) split of `df` keyed on `keys`. */
  def trainTestSplit(df: DataFrame, keys: Seq[String],
                     testFraction: Double = 0.2, seed: Long = 0L): (DataFrame, DataFrame) = {
    val t = isTest(keys, testFraction, seed)
    (df.filter(!t), df.filter(t))
  }

  /** The split as a labeled column (oracle-checkable form). */
  def withSplitLabel(df: DataFrame, keys: Seq[String], testFraction: Double = 0.2,
                     seed: Long = 0L, out: String = "split"): DataFrame =
    df.withColumn(out,
      when(isTest(keys, testFraction, seed), "test").otherwise("train"))

  /** LEAKAGE-SAFE split for document corpora: duplicated content must
    * never straddle train/test (a test doc whose duplicate sits in train
    * is benchmark contamination by construction). The side is a pure
    * predicate of the row's CONTENT GROUP, not its id: by default the
    * exact-dedup content fingerprint (`Text.contentFingerprint` — every
    * whitespace/case variant of the same text lands one side), or any
    * caller-supplied group expression — pass the canonical column from
    * `Dedup.deduplicate` (near-dup clusters) or a URL-domain column
    * (site-level isolation). Same zero-shuffle pushdown-able predicate
    * shape as `trainTestSplit`; `withLeakageSafeLabel` is the
    * oracle-checkable form.
    */
  def leakageSafeSplit(df: DataFrame, textCol: String,
                       testFraction: Double = 0.2, seed: Long = 0L,
                       groupExpr: Option[Column] = None): (DataFrame, DataFrame) = {
    val g = groupExpr.getOrElse(graft.functions.Text.contentFingerprint(col(textCol)))
    val t = bucketOf(Seq(g), seed) < (testFraction * 1000).toInt
    (df.filter(!t), df.filter(t))
  }

  def withLeakageSafeLabel(df: DataFrame, textCol: String,
                           testFraction: Double = 0.2, seed: Long = 0L,
                           groupExpr: Option[Column] = None,
                           out: String = "split"): DataFrame = {
    val g = groupExpr.getOrElse(graft.functions.Text.contentFingerprint(col(textCol)))
    df.withColumn(out,
      when(bucketOf(Seq(g), seed) < (testFraction * 1000).toInt, "test")
        .otherwise("train"))
  }

  /** k (train, test) folds: fold i tests the rows with bucket % k == i. */
  def iterCvSplits(df: DataFrame, keys: Seq[String], k: Int,
                   seed: Long = 0L): Seq[(DataFrame, DataFrame)] = {
    require(k >= 2, "need at least 2 folds")
    val b = bucket(keys, seed) % k
    (0 until k).map(i => (df.filter(b =!= i), df.filter(b === i)))
  }
}
