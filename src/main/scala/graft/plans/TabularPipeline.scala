package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.ml.feature.{StringIndexer, StringIndexerModel, VectorAssembler}
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor}
import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier}
import graft.operators.Cleaner
import graft.encoders.TableVectorizer

/** tabular_pipeline (reference skrub/_tabular_pipeline.py:26-279): the
  * standard end-to-end tabular learner — Cleaner sanitization,
  * TableVectorizer featurization, null imputation, and a gradient-boosted
  * final estimator (reference HistGradientBoosting* -> spark.ml GBT).
  *
  * The target column rides through the feature stages as passthrough, so
  * features and label stay on the same row without any row-identity
  * gymnastics. fit = the stage stats jobs + one GBT fit; predict = one
  * `transform` pipeline — embarrassingly parallel, models broadcast,
  * no shuffle.
  */
object TabularPipeline {

  sealed trait Task
  case object Regression extends Task
  case object Classification extends Task

  final case class Model(cleaner: Cleaner.Model,
                         vectorizer: TableVectorizer.Model,
                         featureCols: Seq[String],
                         regressor: Option[GBTRegressionModel],
                         classifier: Option[(StringIndexerModel, GBTClassificationModel)],
                         target: String) {

    /** Feature frame with `extra` columns carried through untouched. */
    private def features(df: DataFrame, extra: Seq[String]): DataFrame = {
      val cleaned = cleaner.transform(df, passthrough = extra)
      val vec = vectorizer.transform(cleaned, passthrough = extra)
      val filled = featureCols.foldLeft(vec)((d, c) =>
        d.withColumn(c, coalesce(col(c).cast(DoubleType), lit(0.0))))
      new VectorAssembler().setInputCols(featureCols.toArray)
        .setOutputCol("__features").transform(filled)
    }

    private[plans] def trainingFrame(df: DataFrame): DataFrame =
      features(df, Seq(target))

    /** Predictions for a frame (target column not required). */
    def predict(df: DataFrame): DataFrame = {
      val f = features(df.drop(target), Nil)
      (regressor, classifier) match {
        case (Some(r), _) =>
          r.transform(f).withColumnRenamed("prediction", s"${target}_predicted")
            .drop("__features")
        case (_, Some((idx, c))) =>
          val labels = idx.labelsArray.head.toSeq
          // index -> label stays inside codegen (no serialized UDF)
          c.transform(f)
            .withColumn(s"${target}_predicted",
              element_at(typedLit(labels), col("prediction").cast(IntegerType) + 1))
            .drop("__features", "prediction", "rawPrediction", "probability")
        case _ => throw new IllegalStateException("no fitted estimator")
      }
    }
  }

  // --- persistence: cleaner + vectorizer round-trip as JSON; the fitted
  // GBT and label indexer use spark.ml's native writers (reference contract:
  // fitted learners survive the session, _data_ops/_estimator.py:182) ------

  def save(model: Model, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p)
    Cleaner.save(model.cleaner, path)
    TableVectorizer.save(model.vectorizer, path)
    val task = if (model.regressor.isDefined) "regression" else "classification"
    val meta = Json.obj(Seq(
      "type" -> Json.str("graft.TabularPipeline"),
      "task" -> Json.str(task),
      "target" -> Json.str(model.target),
      "feature_cols" -> Json.arr(model.featureCols.map(Json.str))))
    java.nio.file.Files.writeString(p.resolve("pipeline.json"), meta)
    model.regressor.foreach(_.write.overwrite().save(s"$path/gbt"))
    model.classifier.foreach { case (idx, c) =>
      idx.write.overwrite().save(s"$path/indexer")
      c.write.overwrite().save(s"$path/gbt")
    }
  }

  def load(path: String): Model = {
    val meta = Json.parse(java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "pipeline.json"))).asInstanceOf[Map[String, Any]]
    require(meta("type") == "graft.TabularPipeline",
      s"not a TabularPipeline model at $path")
    val cleaner = Cleaner.load(path)
    val vectorizer = TableVectorizer.load(path)
    val featureCols = meta("feature_cols").asInstanceOf[List[Any]]
      .map(_.asInstanceOf[String])
    val target = meta("target").asInstanceOf[String]
    meta("task").asInstanceOf[String] match {
      case "regression" =>
        Model(cleaner, vectorizer, featureCols,
          Some(GBTRegressionModel.load(s"$path/gbt")), None, target)
      case "classification" =>
        Model(cleaner, vectorizer, featureCols, None,
          Some((StringIndexerModel.load(s"$path/indexer"),
            GBTClassificationModel.load(s"$path/gbt"))), target)
      case other => throw new IllegalArgumentException(s"unknown task $other")
    }
  }

  /** Fit the full pipeline to predict `target` from every other column. */
  def fit(df: DataFrame, target: String, task: Task,
          maxIter: Int = 20): Model = {
    val x = df.drop(target)
    val cleanerModel = Cleaner.fit(x)
    val vecModel = TableVectorizer.fit(cleanerModel.transform(x))
    val featureCols = vecModel.transform(cleanerModel.transform(x.limit(1)))
      .schema.fields.filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSeq

    val partial = Model(cleanerModel, vecModel, featureCols, None, None, target)
    val train = partial.trainingFrame(df).filter(col(target).isNotNull)

    task match {
      case Regression =>
        val model = new GBTRegressor().setFeaturesCol("__features")
          .setLabelCol("__label").setMaxIter(maxIter)
          .fit(train.withColumn("__label", col(target).cast(DoubleType)))
        partial.copy(regressor = Some(model))
      case Classification =>
        val idx = new StringIndexer().setInputCol(target)
          .setOutputCol("__label").setHandleInvalid("skip")
          .fit(train.withColumn(target, col(target).cast(StringType)))
        val model = new GBTClassifier().setFeaturesCol("__features")
          .setLabelCol("__label").setMaxIter(maxIter)
          .fit(idx.transform(train.withColumn(target, col(target).cast(StringType))))
        partial.copy(classifier = Some((idx, model)))
    }
  }
}
