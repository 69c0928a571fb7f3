package graft.operators

import org.apache.spark.sql.DataFrame
import org.slf4j.LoggerFactory

/** Input-frame validation at pipeline entry (reference: CheckInputDataFrame,
  * skrub/_check_input.py:16-165). The Spark-relevant subset:
  *
  *  - column names must be unique (Spark allows duplicates after e.g. a
  *    suffix-less join) — duplicated names get a deterministic `__1`,
  *    `__2`, ... suffix with a warning (the reference appends a random
  *    suffix; deterministic keeps runs reproducible);
  *  - fit records the cleaned schema; transform enforces that the incoming
  *    frame has the SAME column names (extra/missing/renamed columns raise,
  *    like the reference's fit-vs-transform name check);
  *  - transform-time dtype drift (same name, different type) raises too —
  *    the reference leaves this as a TODO, but on Spark a silent dtype change
  *    corrupts downstream codegen'd expressions, so we check.
  *
  * Checks not carried over: "is this a dataframe" and sparse-column checks
  * are compile-time facts in Scala (`DataFrame` is the only accepted type;
  * Spark has no sparse pandas analog), and non-string column names cannot
  * exist in a Spark schema.
  */
object CheckInput {

  private val log = LoggerFactory.getLogger(getClass)

  final case class Model(featureNamesIn: Seq[String],
                         featureNamesOut: Seq[String],
                         dtypes: Seq[String]) {

    def transform(df: DataFrame): DataFrame = {
      val renamed = dedupe(df)
      val names = renamed.schema.fieldNames.toSeq
      if (names != featureNamesOut) {
        val missing = featureNamesOut.filterNot(names.contains)
        val extra = names.filterNot(featureNamesOut.contains)
        throw new IllegalArgumentException(
          "Columns of a dataframe passed to transform do not match the ones seen at fit time." +
            (if (missing.nonEmpty) s" Missing: ${missing.mkString(", ")}." else "") +
            (if (extra.nonEmpty) s" Extra: ${extra.mkString(", ")}." else "") +
            (if (missing.isEmpty && extra.isEmpty) " Column order differs." else ""))
      }
      val dts = renamed.schema.fields.map(_.dataType.simpleString).toSeq
      if (dts != dtypes) {
        val drift = featureNamesOut.zip(dtypes.zip(dts)).collect {
          case (n, (f, t)) if f != t => s"$n: $f -> $t"
        }
        throw new IllegalArgumentException(
          s"Column dtypes changed between fit and transform: ${drift.mkString(", ")}")
      }
      renamed
    }
  }

  private def dedupe(df: DataFrame): DataFrame = {
    val names = df.schema.fieldNames.toSeq
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    if (dups.isEmpty) df
    else {
      log.warn(s"Found duplicated column names: ${dups.mkString(", ")}. " +
        "Renaming with deterministic suffixes; please make column names unique.")
      val seen = scala.collection.mutable.Map.empty[String, Int]
      val fresh = names.map { n =>
        val k = seen.getOrElse(n, 0)
        seen(n) = k + 1
        if (k == 0) n else s"${n}__$k"
      }
      df.toDF(fresh: _*)
    }
  }

  /** Fit: record the (deduplicated) schema contract. */
  def fit(df: DataFrame): Model = {
    val cleaned = dedupe(df)
    Model(df.schema.fieldNames.toSeq, cleaned.schema.fieldNames.toSeq,
      cleaned.schema.fields.map(_.dataType.simpleString).toSeq)
  }

  def fitTransform(df: DataFrame): (Model, DataFrame) = {
    val m = fit(df)
    (m, dedupe(df))
  }
}
