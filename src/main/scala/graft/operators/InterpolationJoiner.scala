package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.ml.classification.GBTClassifier

/** InterpolationJoiner (reference skrub/_interpolation_joiner.py:24-467):
  * instead of MATCHING aux rows, fit one supervised model per aux payload
  * column on (vectorized aux keys -> payload) and PREDICT payload values for
  * the main rows — the prediction IS the join. Useful when the aux table is
  * a sparse sample of the key space (e.g. weather stations).
  *
  * Spark-first: features via VectorAssembler over numeric/datetime key
  * columns (datetimes -> epoch seconds; the reference vectorizes with its
  * TableVectorizer), models are spark.ml GBTRegressor (numeric payloads) /
  * GBTClassifier + StringIndexer (string payloads, reference uses
  * HistGradientBoosting*). Per-column failure policy: `passOnError = true`
  * mirrors the reference's "pass" (skip the failing payload column).
  * Fit runs on the aux table; transform is one model.transform pipeline over
  * main — embarrassingly parallel, no shuffle beyond the broadcast models.
  */
object InterpolationJoiner {

  private def featurize(df: DataFrame, keyCols: Seq[String]): (DataFrame, Seq[String]) = {
    val exprs = keyCols.map { c =>
      df.schema(c).dataType match {
        case DateType | TimestampType | TimestampNTZType =>
          (unix_micros(col(c).cast(TimestampType)).cast(DoubleType) / 1e6).as(s"__f_$c")
        case _: NumericType => col(c).cast(DoubleType).as(s"__f_$c")
        case dt => throw new IllegalArgumentException(
          s"unsupported key dtype $dt for $c (vectorize strings upstream)")
      }
    }
    (df.select(df.columns.map(col).toSeq ++ exprs: _*), keyCols.map(c => s"__f_$c"))
  }

  def interpolationJoin(main: DataFrame, aux: DataFrame,
                        keys: Seq[(String, String)], payloads: Seq[String],
                        maxIter: Int = 20, passOnError: Boolean = true): DataFrame = {
    val (auxF, auxFeatNames) = featurize(aux, keys.map(_._2))
    val (mainF0, mainFeatNames) = featurize(main, keys.map(_._1))
    // align main feature names to the aux-trained model's input names
    val mainF = mainFeatNames.zip(auxFeatNames).foldLeft(mainF0) {
      case (d, (m, a)) => d.withColumnRenamed(m, a)
    }
    val assembler = new VectorAssembler()
      .setInputCols(auxFeatNames.toArray).setOutputCol("__features")
    val auxVec = assembler.transform(auxF)
    val mainVec = assembler.transform(mainF)

    val out = payloads.foldLeft(mainVec) { (acc, p) =>
      try {
        aux.schema(p).dataType match {
          case _: NumericType =>
            val model = new GBTRegressor()
              .setFeaturesCol("__features").setLabelCol(p)
              .setPredictionCol(s"${p}_predicted").setMaxIter(maxIter)
              .fit(auxVec.filter(col(p).isNotNull)
                .withColumn(p, col(p).cast(DoubleType)))
            model.transform(acc)
          case StringType =>
            val indexer = new StringIndexer().setInputCol(p)
              .setOutputCol("__label").setHandleInvalid("skip")
              .fit(auxVec)
            val model = new GBTClassifier()
              .setFeaturesCol("__features").setLabelCol("__label")
              .setPredictionCol("__pred").setMaxIter(maxIter)
              .fit(indexer.transform(auxVec.filter(col(p).isNotNull)))
            val labels = indexer.labelsArray.head
            val predicted = model.transform(acc)
            val toLabel = udf((i: Double) => labels(i.toInt))
            predicted.withColumn(s"${p}_predicted", toLabel(col("__pred")))
              .drop("__pred", "__label", "rawPrediction", "probability")
          case dt => throw new IllegalArgumentException(s"payload dtype $dt")
        }
      } catch {
        case e: Exception if passOnError =>
          // reference failure policy "pass": skip this payload column
          acc
      }
    }
    out.drop((auxFeatNames :+ "__features"): _*)
  }
}
