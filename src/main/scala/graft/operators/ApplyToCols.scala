package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.selectors.{Selector, Selectors}

/** User-facing per-column transformer framework (reference: ApplyToCols /
  * ApplyToEachCol / ApplyToSubFrame, skrub/_apply_to_cols.py:18-130,
  * skrub/_apply_to_each_col.py:19-487; RejectColumn contract
  * skrub/core/_apply_to_each_col.py).
  *
  * Semantics matched:
  *  - the transformer is fitted independently per selected column; columns
  *    outside `cols - excludeCols` pass through untouched;
  *  - a fit may throw [[RejectColumn]]: with `allowReject` the column passes
  *    through unchanged, without it the rejection propagates;
  *  - `keepOriginal` keeps the input column next to its outputs (outputs
  *    colliding with a kept original are renamed with a `_out` suffix);
  *  - `renameColumns` is a `"prefix_{}"`-style format applied to every
  *    transformation output name;
  *  - fitted state is exposed per column (`transformers`, `inputToOutputs`)
  *    like the reference's `transformers_` / `input_to_outputs_`.
  *
  * Spark-first shape: a fitted column model is a set of NAMED EXPRESSIONS,
  * so transform is ONE projection over the input — never a withColumn chain
  * (each withColumn is an analysis pass) and never a per-column job. Fit-time
  * data dependence goes through `fitCols`, which estimators override to
  * compute stats for ALL their columns in one aggregate job (see
  * [[ApplyToCols.squashingScaler]]) — the per-column default is only the
  * fallback for genuinely independent fits.
  */
object ApplyToCols {

  /** A transformer refuses a column it is not suited for (reference
    * core.RejectColumn).
    */
  final case class RejectColumn(message: String) extends RuntimeException(message)

  /** Fitted single-column model: output (name, expression) pairs for the
    * column. Names are pre-rename; most transformers emit one output named
    * like the input.
    */
  trait ColModel {
    def outputs(colName: String): Seq[(String, Column)]
  }

  /** Single-column estimator. Implement `fitCol`; override `fitCols` when
    * the fit needs data stats, so N columns cost ONE job instead of N.
    */
  trait ColEstimator {
    /** Fit one column; throw [[RejectColumn]] to decline it. */
    def fitCol(df: DataFrame, colName: String): ColModel

    /** Batch fit hook: default = independent per-column fits. */
    def fitCols(df: DataFrame, colNames: Seq[String]): Seq[(String, Either[RejectColumn, ColModel])] =
      colNames.map { c =>
        try c -> Right(fitCol(df, c))
        catch { case r: RejectColumn => c -> Left(r) }
      }
  }

  /** The fitted ApplyToCols: per-column models + passthrough bookkeeping. */
  final case class Model(transformers: Seq[(String, ColModel)],
                         rejected: Seq[String],
                         allColumns: Seq[String],
                         keepOriginal: Boolean,
                         renameColumns: String) {

    private val fitted = transformers.toMap

    /** input column -> its (post-rename) output names. */
    lazy val inputToOutputs: Map[String, Seq[String]] =
      transformers.map { case (c, m) =>
        c -> m.outputs(c).map { case (n, _) => finalName(c, n) }
      }.toMap

    private def renamed(n: String): String = renameColumns.replace("{}", n)

    private def finalName(in: String, out: String): String = {
      val r = renamed(out)
      if (keepOriginal && r == in) s"${r}_out" else r
    }

    /** ONE projection: each input column slot expands in place to its
      * outputs (plus the original when `keepOriginal`), untouched columns
      * pass through — preserving the reference's column order contract.
      */
    def transform(df: DataFrame): DataFrame = {
      val projection = df.columns.toSeq.flatMap { c =>
        fitted.get(c) match {
          case Some(m) =>
            val outs = m.outputs(c).map { case (n, e) => e.as(finalName(c, n)) }
            if (keepOriginal) col(c) +: outs else outs
          case None => Seq(col(c))
        }
      }
      df.select(projection: _*)
    }
  }

  /** Fit `estimator` on every column selected by `cols - excludeCols`. */
  def fit(df: DataFrame, estimator: ColEstimator,
          cols: Selector = Selector.All,
          excludeCols: Option[Selector] = None,
          allowReject: Boolean = false,
          keepOriginal: Boolean = false,
          renameColumns: String = "{}"): Model = {
    val selected = {
      val base = Selectors.expand(df, cols)
      excludeCols match {
        case Some(ex) => val drop = Selectors.expand(df, ex).toSet
                         base.filterNot(drop)
        case None     => base
      }
    }
    val results = estimator.fitCols(df, selected)
    val rejections = results.collect { case (c, Left(r)) => c -> r }
    if (!allowReject) rejections.headOption.foreach { case (c, r) =>
      throw new IllegalArgumentException(
        s"transformer rejected column '$c' (${r.message}); pass allowReject=true to pass it through", r)
    }
    Model(results.collect { case (c, Right(m)) => c -> m },
      rejections.map(_._1), df.columns.toSeq, keepOriginal, renameColumns)
  }

  def fitTransform(df: DataFrame, estimator: ColEstimator,
                   cols: Selector = Selector.All,
                   excludeCols: Option[Selector] = None,
                   allowReject: Boolean = false,
                   keepOriginal: Boolean = false,
                   renameColumns: String = "{}"): DataFrame =
    fit(df, estimator, cols, excludeCols, allowReject, keepOriginal,
      renameColumns).transform(df)

  // ---- library estimators ----------------------------------------------

  /** Reference `Drop` (skrub/_select_cols.py:200): unconditionally drop
    * each selected column. Unlike the `DropCols` STAGE this is a
    * per-column transformer, so it composes with other ColEstimators over
    * selector-chosen columns (e.g. drop everything of one dtype inside an
    * ApplyToCols pipeline); a fitted model emitting zero outputs removes
    * the column slot from the single output projection.
    */
  val drop: ColEstimator = new ColEstimator {
    def fitCol(df: DataFrame, c: String): ColModel = new ColModel {
      def outputs(colName: String): Seq[(String, Column)] = Seq.empty
    }
  }

  /** SquashingScaler as a ColEstimator: rejects non-numeric columns; fits
    * the quantiles of ALL accepted columns in ONE aggregate job.
    */
  def squashingScaler(maxAbs: Double = 3.0, qLow: Double = 0.25,
                      qHigh: Double = 0.75, roundTo: Int = 6): ColEstimator =
    new ColEstimator {
      private def accept(df: DataFrame, c: String): Unit = df.schema(c).dataType match {
        case _: NumericType => ()
        case dt => throw RejectColumn(s"expected a numeric column, got $dt")
      }

      def fitCol(df: DataFrame, c: String): ColModel = {
        accept(df, c)
        model(graft.encoders.SquashingScaler.fit(df, c, maxAbs, qLow, qHigh))
      }

      override def fitCols(df: DataFrame, cs: Seq[String]): Seq[(String, Either[RejectColumn, ColModel])] = {
        val (ok, bad) = cs.partition(c => df.schema(c).dataType match {
          case _: NumericType => true
          case _              => false
        })
        val fittedModels: Map[String, ColModel] = if (ok.isEmpty) Map.empty else {
          // one aggregate job for every accepted column's three quantiles
          val exprs = ok.map(c =>
            expr(s"percentile($c, array($qLow, 0.5, $qHigh))").as(s"__q__$c"))
          val row = df.agg(exprs.head, exprs.tail: _*).collect()(0)
          ok.map { c =>
            val qs = Option(row.getAs[scala.collection.Seq[Double]](s"__q__$c"))
              .getOrElse(scala.collection.Seq(0.0, 0.0, 0.0))
            val scale = if (qs(2) - qs(0) == 0.0) 1.0 else qs(2) - qs(0)
            c -> model(graft.encoders.SquashingScaler.Model(qs(1), scale, maxAbs))
          }.toMap
        }
        cs.map { c =>
          if (fittedModels.contains(c)) c -> Right(fittedModels(c))
          else c -> Left(RejectColumn(
            s"expected a numeric column, got ${df.schema(c).dataType}"))
        }
      }

      private def model(m: graft.encoders.SquashingScaler.Model): ColModel =
        (c: String) => Seq(c -> round(m.expr(col(c)), roundTo))
    }

  /** ToDatetime as a ColEstimator — the reference's canonical allow_reject
    * example (a DatetimeEncoder pipeline rejecting non-datetime columns):
    * accepts a string column iff a format guessed from a non-null sample
    * parses every sampled value; fitCols draws the samples for ALL candidate
    * columns in ONE job (the Cleaner's batching discipline).
    */
  def toDatetime(sampleRows: Int = 10000): ColEstimator = new ColEstimator {
    def fitCol(df: DataFrame, c: String): ColModel = {
      if (df.schema(c).dataType != StringType)
        throw RejectColumn(s"expected a string column, got ${df.schema(c).dataType}")
      graft.operators.ToDatetime.fitCol(df, c) match {
        case Some(_) =>
          val fmt = graft.operators.ToDatetime.guessFormat(
            graft.operators.ToDatetime.sample(df, c)).get
          (cn: String) => Seq(cn -> try_to_timestamp(col(cn), lit(fmt)))
        case None => throw RejectColumn("no datetime format fits the sample")
      }
    }

    override def fitCols(df: DataFrame, cs: Seq[String]): Seq[(String, Either[RejectColumn, ColModel])] = {
      val (strs, others) = cs.partition(df.schema(_).dataType == StringType)
      val samples: Map[String, Seq[String]] =
        if (strs.isEmpty) Map.empty
        else {
          val exprs = strs.map(c => slice(collect_list(col(c)), 1,
            graft.operators.ToDatetime.SampleSize).as(c))
          val row = df.limit(sampleRows).agg(exprs.head, exprs.tail: _*).collect()(0)
          strs.map(c => c -> row.getSeq[String](row.fieldIndex(c)).toSeq).toMap
        }
      cs.map { c =>
        if (!samples.contains(c))
          c -> Left(RejectColumn(s"expected a string column, got ${df.schema(c).dataType}"))
        else graft.operators.ToDatetime.guessFormat(samples(c)) match {
          case Some(fmt) => c -> Right(new ColModel {
            def outputs(cn: String) = Seq(cn -> try_to_timestamp(col(cn), lit(fmt)))
          })
          case None => c -> Left(RejectColumn("no datetime format fits the sample"))
        }
      }
    }
  }

  /** ToFloat as a ColEstimator: accepts a string column iff every sampled
    * non-null value parses as a number; one batched sample job.
    */
  def toFloat(sampleRows: Int = 10000): ColEstimator = new ColEstimator {
    private def parses(s: String): Boolean =
      scala.util.Try(s.trim.toDouble).isSuccess

    def fitCol(df: DataFrame, c: String): ColModel = {
      if (df.schema(c).dataType != StringType)
        throw RejectColumn(s"expected a string column, got ${df.schema(c).dataType}")
      val sample = df.select(col(c)).filter(col(c).isNotNull)
        .limit(graft.operators.ToDatetime.SampleSize)
        .collect().map(_.getString(0)).toSeq
      if (sample.nonEmpty && sample.forall(parses))
        (cn: String) => Seq(cn -> col(cn).try_cast(DoubleType))
      else throw RejectColumn("sampled values do not parse as numbers")
    }

    override def fitCols(df: DataFrame, cs: Seq[String]): Seq[(String, Either[RejectColumn, ColModel])] = {
      val (strs, _) = cs.partition(df.schema(_).dataType == StringType)
      val samples: Map[String, Seq[String]] =
        if (strs.isEmpty) Map.empty
        else {
          val exprs = strs.map(c => slice(collect_list(col(c)), 1,
            graft.operators.ToDatetime.SampleSize).as(c))
          val row = df.limit(sampleRows).agg(exprs.head, exprs.tail: _*).collect()(0)
          strs.map(c => c -> row.getSeq[String](row.fieldIndex(c)).toSeq).toMap
        }
      cs.map { c =>
        if (!samples.contains(c))
          c -> Left(RejectColumn(s"expected a string column, got ${df.schema(c).dataType}"))
        else if (samples(c).nonEmpty && samples(c).forall(parses))
          c -> Right(new ColModel {
            def outputs(cn: String) = Seq(cn -> col(cn).try_cast(DoubleType))
          })
        else c -> Left(RejectColumn("sampled values do not parse as numbers"))
      }
    }
  }

  /** DatetimeEncoder as a ColEstimator: rejects non-datetime columns, emits
    * the standard part columns (stateless fit — no job).
    */
  def datetimeEncoder(resolution: String = "hour",
                      addTotalSeconds: Boolean = true): ColEstimator =
    new ColEstimator {
      def fitCol(df: DataFrame, c: String): ColModel = {
        df.schema(c).dataType match {
          case DateType | TimestampType | TimestampNTZType => ()
          case dt => throw RejectColumn(s"expected a datetime column, got $dt")
        }
        (cn: String) =>
          graft.encoders.DatetimeEncoder.partColumns(col(cn), resolution,
            addTotalSeconds).map { case (suffix, e) => s"${cn}_$suffix" -> e }
      }
    }

  private implicit def fnToColModel(f: String => Seq[(String, Column)]): ColModel =
    new ColModel { def outputs(colName: String): Seq[(String, Column)] = f(colName) }

  // ---- sub-frame form ---------------------------------------------------

  /** Whole-frame estimator over a column SUBSET (reference ApplyToSubFrame,
    * skrub/_apply_to_sub_frame.py:15-277). The reference recombines the
    * transformed sub-frame with passthrough columns by positional concat;
    * Spark frames have no positional row identity, so the contract here is
    * explicit instead: the estimator fits on the projected subset, and the
    * fitted function receives the FULL frame and must leave non-selected
    * columns untouched — which every graft frame transformer (Cleaner,
    * TableVectorizer) already satisfies, and which avoids the join a
    * positional concat would need.
    */
  trait SubFrameEstimator {
    /** Fit on the selected-columns projection; return a transform over the
      * full frame restricted to those columns.
      */
    def fitFrame(subset: DataFrame, cols: Seq[String]): DataFrame => DataFrame
  }

  final case class SubFrameModel(cols: Seq[String],
                                 fn: DataFrame => DataFrame) {
    def transform(df: DataFrame): DataFrame = fn(df)
  }

  /** Fit `estimator` on the columns selected by `cols - excludeCols`. */
  def fitSubFrame(df: DataFrame, estimator: SubFrameEstimator,
                  cols: Selector = Selector.All,
                  excludeCols: Option[Selector] = None): SubFrameModel = {
    val selected = {
      val base = Selectors.expand(df, cols)
      excludeCols match {
        case Some(ex) => val drop = Selectors.expand(df, ex).toSet
                         base.filterNot(drop)
        case None     => base
      }
    }
    SubFrameModel(selected,
      estimator.fitFrame(df.select(selected.map(col): _*), selected))
  }
}
