package graft.plans

import org.apache.spark.sql.DataFrame
import graft.encoders.TableVectorizer
import graft.operators.{Cleaner, Joins}

/** Estimator adapters turning graft's operators into plan stages. */
object Stages {

  /** TableVectorizer as a refittable stage: fit learns routing + vocab once;
    * transform replays the frozen model on new frames (same one-hot columns
    * even if a category is absent at transform time).
    */
  def tableVectorizer(cardinalityThreshold: Int = 40,
                      highCardEncoder: String = "minhash"): Estimator =
    new Estimator {
      def fit(df: DataFrame): Transformer = {
        val model = TableVectorizer.fit(df, cardinalityThreshold,
          highCardEncoder = highCardEncoder)
        (d: DataFrame) => model.transform(d)
      }
    }

  /** Cleaner as a refittable stage (frozen datetime formats / type plans). */
  def cleaner(): Estimator = new Estimator {
    def fit(df: DataFrame): Transformer = {
      val model = Cleaner.fit(df)
      (d: DataFrame) => model.transform(d)
    }
  }

  /** SelectCols as a stage (reference SelectCols, _select_cols.py): the
    * selector resolves against the FIT-time schema and is frozen — transform
    * replays the same column list on new frames (reference behavior: the
    * fitted `all_outputs_` are fixed at fit).
    */
  def selectCols(s: graft.selectors.Selector): Estimator = new Estimator {
    def fit(df: DataFrame): Transformer = {
      val cols = graft.selectors.Selectors.expand(df, s)
      (d: DataFrame) => d.select(cols.map(org.apache.spark.sql.functions.col): _*)
    }
  }

  /** DropCols as a stage: complement of selectCols, same frozen contract. */
  def dropCols(s: graft.selectors.Selector): Estimator = new Estimator {
    def fit(df: DataFrame): Transformer = {
      val dropped = graft.selectors.Selectors.expand(df, s).toSet
      val kept = df.columns.filterNot(dropped).toSeq
      (d: DataFrame) => d.select(kept.map(org.apache.spark.sql.functions.col): _*)
    }
  }

  /** CheckInput as the pipeline's entry stage (reference pipelines start
    * with CheckInputDataFrame): fit records the schema contract, transform
    * enforces it on every later frame.
    */
  def checkInput(): Estimator = new Estimator {
    def fit(df: DataFrame): Transformer = {
      val model = graft.operators.CheckInput.fit(df)
      (d: DataFrame) => model.transform(d)
    }
  }

  /** ApplyToCols as a refittable stage: per-column fits frozen at fit time,
    * replayed as one projection on new frames.
    */
  def applyToCols(estimator: graft.operators.ApplyToCols.ColEstimator,
                  cols: graft.selectors.Selector = graft.selectors.Selector.All,
                  excludeCols: Option[graft.selectors.Selector] = None,
                  allowReject: Boolean = false,
                  keepOriginal: Boolean = false,
                  renameColumns: String = "{}"): Estimator = new Estimator {
    def fit(df: DataFrame): Transformer = {
      val model = graft.operators.ApplyToCols.fit(df, estimator, cols,
        excludeCols, allowReject, keepOriginal, renameColumns)
      (d: DataFrame) => model.transform(d)
    }
  }

  /** AggJoiner as an n-ary Merge node: inputs(0) = main, inputs(1) = aux. */
  def aggJoin(mainKey: Seq[String], auxKey: Seq[String], cols: Seq[String],
              ops: Seq[String]): Seq[DataFrame] => DataFrame = {
    case Seq(main, aux) => Joins.aggJoin(main, aux, mainKey, auxKey, cols, ops)
    case other => throw new IllegalArgumentException(
      s"aggJoin expects [main, aux], got ${other.length} inputs")
  }

  implicit def fnToTransformer(fn: DataFrame => DataFrame): Transformer =
    new Transformer { def transform(df: DataFrame): DataFrame = fn(df) }
}
