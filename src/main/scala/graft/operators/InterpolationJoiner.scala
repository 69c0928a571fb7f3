package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Spark-first: features via VectorAssembler over key columns — numerics
  * pass through, datetimes become epoch seconds, and string keys are
  * vectorized with MinHash signature expressions (the reference vectorizes
  * keys with its TableVectorizer, whose high-cardinality default is the
  * MinHashEncoder — _interpolation_joiner.py:43-77). Models are spark.ml
  * GBTRegressor (numeric payloads) / GBTClassifier + StringIndexer (string
  * payloads, reference uses HistGradientBoosting*).
  *
  * Per-column failure policy mirrors the reference's `on_estimator_failure`:
  * "warn" (default — skip the payload column and log why), "raise"
  * (propagate), "pass" (skip silently). Fit runs on the aux table; transform
  * is one model.transform pipeline over main — embarrassingly parallel, no
  * shuffle beyond the broadcast models.
  */
object InterpolationJoiner {

  sealed trait OnError
  /** Skip the failing payload column and log the column + exception. */
  case object Warn extends OnError
  /** Propagate the exception. */
  case object Raise extends OnError
  /** Skip the failing payload column silently. */
  case object Pass extends OnError

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Number of MinHash components used to vectorize a string key column. */
  private val StringKeyComponents = 8

  /** Dtype class of a key column for compatibility validation: string keys
    * expand to `StringKeyComponents` MinHash columns while numeric/datetime
    * keys expand to one epoch/double column — a (main, aux) key pair mixing
    * the two classes would silently misalign feature names (the reference
    * applies the aux-fit vectorizer to main keys and requires key
    * number/types to match).
    */
  private def dtypeClass(dt: DataType): String = dt match {
    case StringType                                  => "string"
    case _: NumericType                              => "numeric"
    case DateType | TimestampType | TimestampNTZType => "numeric"
    case other => throw new IllegalArgumentException(s"unsupported key dtype $other")
  }

  /** Feature expressions for ONE key column, named after the aux-side key so
    * main and aux frames produce identical feature column names per pair:
    * numeric -> double, datetime -> epoch seconds, string -> MinHash
    * signature components (pure codegen'd expressions — no join, no UDF).
    */
  private def featurizeKey(df: DataFrame, c: String, nameKey: String): Seq[Column] =
    df.schema(c).dataType match {
      case DateType | TimestampType | TimestampNTZType =>
        Seq((unix_micros(col(c).cast(TimestampType)).cast(DoubleType) / 1e6)
          .as(s"__f_$nameKey"))
      case _: NumericType => Seq(col(c).cast(DoubleType).as(s"__f_$nameKey"))
      case StringType =>
        graft.encoders.MinHashEncoder.signatureCols(
          col(c), s"__f_$nameKey", StringKeyComponents)
      case dt => throw new IllegalArgumentException(s"unsupported key dtype $dt for $c")
    }

  def interpolationJoin(main: DataFrame, aux: DataFrame,
                        keys: Seq[(String, String)], payloads: Seq[String],
                        maxIter: Int = 20, onError: OnError = Warn,
                        maxDepth: Int = 5): DataFrame = {
    // validate dtype-class compatibility per (main, aux) key pair up front:
    // per-pair featurization below guarantees equal expansion lengths only
    // within a class, so a cross-class pair must fail loudly, not misalign
    keys.foreach { case (m, a) =>
      val (cm, ca) = (dtypeClass(main.schema(m).dataType), dtypeClass(aux.schema(a).dataType))
      require(cm == ca,
        s"interpolationJoin: key pair ($m: $cm) vs ($a: $ca) mixes dtype classes; " +
          "string keys can only interpolate against string keys, numeric/datetime " +
          "against numeric/datetime")
    }
    // featurize PER KEY PAIR with aux-side names on both frames — alignment
    // is by construction, never by positional zip across pairs
    val auxExprs = keys.flatMap { case (_, a) => featurizeKey(aux, a, a) }
    val mainExprs = keys.flatMap { case (m, a) => featurizeKey(main, m, a) }
    val auxF = aux.select(aux.columns.map(col).toSeq ++ auxExprs: _*)
    val mainF = main.select(main.columns.map(col).toSeq ++ mainExprs: _*)
    val auxFeatNames = keys.flatMap { case (_, a) =>
      aux.schema(a).dataType match {
        case StringType =>
          (0 until StringKeyComponents).map(i => s"__f_${a}_minhash_$i")
        case _ => Seq(s"__f_$a")
      }
    }
    val assembler = new VectorAssembler()
      .setInputCols(auxFeatNames.toArray).setOutputCol("__features")
      .setHandleInvalid("keep")
    val auxVec = assembler.transform(auxF)
    val mainVec = assembler.transform(mainF)

    // Per-payload fits are independent (each reads auxVec only), so they run
    // CONCURRENTLY from driver threads — the reference fits payload models
    // joblib-parallel (skrub/_interpolation_joiner.py:24-467); ours overlaps
    // the iterative GBT job chains on the cluster. Each future returns the
    // transform attaching that payload's predictions; predictions fold onto
    // the main frame sequentially (pure plan composition, no jobs).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val sc = main.sparkSession.sparkContext
    // every background fit tags its jobs with one group so a Raise-policy
    // failure can cancel the in-flight sibling fits; QUEUED futures (pool
    // smaller than payload count) check the cancelled flag and never start.
    // clearJobGroup in the finally keeps reused pool threads from carrying
    // a stale cancellable group onto unrelated work.
    val fitGroup = s"graft-interp-${java.util.UUID.randomUUID()}"
    val fitsCancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
    val fits: Seq[(String, Future[DataFrame => DataFrame])] = payloads.map { p =>
      p -> Future[DataFrame => DataFrame] {
        if (fitsCancelled.get())
          throw new java.util.concurrent.CancellationException(
            s"sibling payload fit failed before '$p' started")
        sc.setJobGroup(fitGroup, s"interpolationJoin fit: $p",
          interruptOnCancel = true)
        // re-check AFTER the group is registered: the flag is set BEFORE
        // cancelJobGroup fires, so either this check sees it, or setJobGroup
        // completed first and the cancel kills the registered group — no
        // lost-cancel window (same pattern as Jobs.overlap)
        if (fitsCancelled.get())
          throw new java.util.concurrent.CancellationException(
            s"sibling payload fit failed before '$p' submitted work")
        try aux.schema(p).dataType match {
          case _: NumericType =>
            val model = new GBTRegressor()
              .setFeaturesCol("__features").setLabelCol(p)
              .setPredictionCol(s"${p}_predicted").setMaxIter(maxIter)
              .setMaxDepth(maxDepth)
              .fit(auxVec.filter(col(p).isNotNull)
                .withColumn(p, col(p).cast(DoubleType)))
            acc => model.transform(acc)
          case StringType =>
            val indexer = new StringIndexer().setInputCol(p)
              .setOutputCol("__label").setHandleInvalid("skip")
              .fit(auxVec)
            val model = new GBTClassifier()
              .setFeaturesCol("__features").setLabelCol("__label")
              .setPredictionCol("__pred").setMaxIter(maxIter)
              .setMaxDepth(maxDepth)
              .fit(indexer.transform(auxVec.filter(col(p).isNotNull)))
            val labels = indexer.labelsArray.head.toSeq
            acc => {
              val predicted = model.transform(acc)
              // index -> label stays inside codegen (no serialized UDF)
              predicted.withColumn(s"${p}_predicted",
                  element_at(typedLit(labels), col("__pred").cast(IntegerType) + 1))
                .drop("__pred", "__label", "rawPrediction", "probability")
            }
          case dt => throw new IllegalArgumentException(s"payload dtype $dt")
        } finally sc.clearJobGroup()
      }
    }
    val out =
      try {
        fits.foldLeft(mainVec) { case (acc, (p, fitF)) =>
          try Await.result(fitF, Duration.Inf)(acc)
          catch {
            case e: Exception if onError != Raise =>
              if (onError == Warn)
                log.warn(s"interpolationJoin: skipping payload column '$p': $e")
              acc
          }
        }
      } catch {
        case e: Throwable =>
          fitsCancelled.set(true); sc.cancelJobGroup(fitGroup); throw e
      }
    out.drop((auxFeatNames :+ "__features"): _*)
  }
}
