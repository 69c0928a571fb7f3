package graft.plans

import org.apache.spark.ml
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** spark.ml Pipeline interop: wrap a graft `Estimator`/`Transformer` as a
  * native `org.apache.spark.ml.PipelineStage`, so graft preprocessing
  * (Cleaner, TableVectorizer, selector stages, ...) composes with MLlib
  * estimators inside one `ml.Pipeline` — the analogue of the reference's
  * transformers being sklearn-Pipeline compatible
  * (skrub/_table_vectorizer.py:545 subclasses TransformerMixin).
  *
  * Schema notes: graft transforms are data-dependent plans, so a FITTED
  * stage computes `transformSchema` exactly, by applying its plan to an
  * empty frame of the input schema (pure Catalyst analysis — no job). An
  * UNFITTED estimator's output schema is unknowable before fit (the
  * reference has the same property: TableVectorizer's columns depend on the
  * data), so `GraftEstimator.transformSchema` is identity — downstream
  * schema validation tightens after fit, exactly like sklearn pipelines
  * validate at fit time.
  */
object SparkMl {

  final class GraftTransformer(val wrapped: Transformer,
                               override val uid: String)
      extends ml.Model[GraftTransformer] {
    def this(wrapped: Transformer) =
      this(wrapped, Identifiable.randomUID("graftTransformer"))

    override def transform(ds: Dataset[_]): DataFrame =
      wrapped.transform(ds.toDF())

    override def transformSchema(schema: StructType): StructType = {
      val spark = SparkSession.active
      val empty = spark.createDataFrame(
        new java.util.ArrayList[Row](), schema)
      wrapped.transform(empty).schema
    }

    override def copy(extra: ParamMap): GraftTransformer =
      new GraftTransformer(wrapped, uid)
  }

  final class GraftEstimator(val wrapped: Estimator,
                             override val uid: String)
      extends ml.Estimator[GraftTransformer] {
    def this(wrapped: Estimator) =
      this(wrapped, Identifiable.randomUID("graftEstimator"))

    override def fit(ds: Dataset[_]): GraftTransformer =
      new GraftTransformer(wrapped.fit(ds.toDF()), s"$uid-fitted")

    // Output schema is data-dependent before fit, so this stays IDENTITY
    // (see scaladoc): an empty-frame trial fit is NOT a safe estimate — a
    // Cleaner fit on zero rows correctly drops every column (null fraction
    // 1.0), so the "inferred" schema would be degenerate, worse than
    // identity. Consequence, documented for users: an MLlib stage consuming
    // columns an UNFITTED graft stage adds fails Pipeline.fit's upfront
    // transformSchema validation with that stage's missing-column error —
    // fit the graft stage first and compose the FITTED form (whose
    // transformSchema is exact) instead.
    override def transformSchema(schema: StructType): StructType = schema

    override def copy(extra: ParamMap): GraftEstimator =
      new GraftEstimator(wrapped, uid)
  }

  /** A graft estimator as a spark.ml pipeline stage. */
  def stage(est: Estimator): GraftEstimator = new GraftEstimator(est)

  /** A fitted graft transformer as a spark.ml pipeline stage. */
  def stage(t: Transformer): GraftTransformer = new GraftTransformer(t)
}
