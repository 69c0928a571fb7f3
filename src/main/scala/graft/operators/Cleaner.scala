package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Kernel

/** Cleaner — the reference's standard sanitization entry point
  * (skrub/_table_vectorizer.py:120-187 `_get_preprocessors`): per column,
  *   CheckInput -> CleanNullStrings -> DropUninformative -> ToDatetime ->
  *   ToFloat -> CleanCategories/ToStr,
  * where every conversion step may REJECT a column (leave it unchanged)
  * instead of failing — the single-column-transformer reject contract
  * (skrub/_single_column_transformer.py:38).
  *
  * Execution shape: ONE stats aggregate for DropUninformative decisions
  * (count / null count / approx distinct for every column together), ONE
  * limit-bounded sample job drawing the ToDatetime / ToFloat accept samples
  * for every string column together (limit pushdown — never a full scan,
  * never a job per column), then a SINGLE `select` applying every accepted
  * conversion — executors see one scan of the input regardless of column
  * count.
  */
object Cleaner {

  /** Rows scanned (once, single job) to draw the per-string-column accept
    * samples; a column with NO non-null value in this window falls back to a
    * per-column non-null probe (see `fit`), so sparse columns still get
    * format-guessed like the reference.
    */
  val SampleScanRows = 10000

  sealed trait ColPlan
  case object Dropped extends ColPlan
  case object Passthrough extends ColPlan
  final case class ToTimestamp(format: String) extends ColPlan
  case object ToFloatPlan extends ColPlan
  case object CleanString extends ColPlan

  final case class Model(plans: Seq[(String, ColPlan)],
                         nullMarkers: Seq[String]) {
    /** Apply the fitted per-column plans; `passthrough` columns (absent at
      * fit time, e.g. a prediction target) are kept untouched.
      */
    def transform(df: DataFrame, passthrough: Seq[String] = Nil): DataFrame = {
      val extra = passthrough.filter(df.columns.contains).map(col)
      val exprs = plans.flatMap {
        case (_, Dropped) => None
        case (c, Passthrough) => Some(col(c))
        case (c, ToTimestamp(f)) =>
          Some(try_to_timestamp(Kernel.cleanNullStrings(col(c), nullMarkers),
            lit(f)).as(c))
        case (c, ToFloatPlan) =>
          Some(Kernel.cleanNullStrings(col(c), nullMarkers)
            .try_cast(DoubleType).as(c))
        case (c, CleanString) =>
          Some(Kernel.cleanNullStrings(col(c), nullMarkers).as(c))
      }
      df.select(exprs ++ extra: _*)
    }
  }

  /** Can every sample string be parsed as a plain float? (ToFloat accept
    * rule; reference ToFloat rejects a column when nothing converts,
    * skrub/_to_float.py:38.)
    */
  private def allFloat(samples: Seq[String]): Boolean =
    samples.nonEmpty && samples.forall(s =>
      scala.util.Try(s.trim.toDouble).isSuccess)

  /** ONE sample job for ALL string columns (not one limit-collect per
    * column — a 500-string-column table must not launch 500 driver jobs):
    * GlobalLimit takes `SampleScanRows` rows in one partition and
    * collect_list gathers them; slice keeps the first SampleSize cleaned
    * non-null values per column. Which rows the limit takes (and their
    * order) is not a hard Spark guarantee across sources/retries, so accept
    * decisions treat the sample as "some rows", not "THE first rows" — a
    * column only parses as datetime/float if EVERY sampled value does, so
    * borderline flips require a genuinely mixed column. Null-marker strings
    * are cleaned to null BEFORE collection so they never block a
    * parse-based accept.
    *
    * Bias guard: a sparse column whose non-null values all appear after
    * the sampled window would be silently left unparsed (the reference
    * samples non-null values of the whole column, _to_datetime.py:17).
    * Only for columns whose windowed sample came back EMPTY, fall back
    * to a per-column filter(isNotNull).limit probe — bounded extra jobs
    * (pathological columns only), zero extra jobs in the common case.
    */
  private def drawSamples(df: DataFrame,
                          nullMarkers: Seq[String]): Map[String, Seq[String]] = {
    val stringCols = df.schema.fields.filter(_.dataType == StringType).map(_.name).toSeq
    if (stringCols.isEmpty) Map.empty
    else {
      val sExprs = stringCols.map(c => slice(
        collect_list(Kernel.cleanNullStrings(col(c), nullMarkers)),
        1, ToDatetime.SampleSize).as(c))
      val sRow = df.limit(SampleScanRows)
        .agg(sExprs.head, sExprs.tail: _*).collect()(0)
      val windowed =
        stringCols.map(c => c -> sRow.getSeq[String](sRow.fieldIndex(c)).toSeq).toMap
      windowed.map { case (cName, sample) =>
        if (sample.nonEmpty) cName -> sample
        else {
          val cleaned = Kernel.cleanNullStrings(col(cName), nullMarkers)
          val probe = df.select(cleaned.as(cName)).filter(col(cName).isNotNull)
            .limit(ToDatetime.SampleSize).collect().map(_.getString(0)).toSeq
          cName -> probe
        }
      }
    }
  }

  def fit(df: DataFrame,
          dropNullFraction: Double = 1.0,
          dropIfConstant: Boolean = true,
          nullMarkers: Seq[String] = Kernel.DefaultNullMarkers): Model = {
    // three INDEPENDENT overlapped fit jobs (Jobs.overlapAll submits each
    // from its own driver thread so they fill scheduler slots together):
    //  1. null fractions — declarative counts, stays whole-stage codegen
    //  2. is-constant probes — the decision only needs "distinct <= 1", so
    //     the exact saturating DistinctAtMost(c, 1) answers it with a
    //     2-element state that saturates within the first rows; kept OUT of
    //     job 1 because an imperative aggregate would knock the null counts
    //     out of codegen (the 12x de-codegen finding, BASELINE.md r8 —
    //     this previously ran approx_count_distinct in the same scan)
    //  3. the limit-bounded format-guess sample scan
    val names = df.schema.fields.map(_.name).toSeq
    val nullExprs = names.map { c =>
      count(when(Kernel.isNullLike(df, c), 1)).as(s"${c}__nulls")
    } :+ count(lit(1)).as("__n")
    val distExprs = names.map(c =>
      graft.functions.Contingency.distinctAtMost(col(c), 1).as(s"${c}__dist"))
    val jobs = graft.ops.Jobs.overlapAll(df.sparkSession.sparkContext)(Seq[() => Any](
      () => df.agg(nullExprs.head, nullExprs.tail: _*).collect()(0),
      () => df.agg(distExprs.head, distExprs.tail: _*).collect()(0),
      () => drawSamples(df, nullMarkers)))
    val row = jobs(0).asInstanceOf[org.apache.spark.sql.Row]
    val distRow = jobs(1).asInstanceOf[org.apache.spark.sql.Row]
    val samples = jobs(2).asInstanceOf[Map[String, Seq[String]]]
    val n = row.getAs[Long]("__n").toDouble
    val plans = df.schema.fields.toSeq.map { f =>
      val nulls = row.getAs[Long](s"${f.name}__nulls")
      val dist = distRow.getAs[Long](s"${f.name}__dist")
      val nullFrac = if (n == 0) 1.0 else nulls / n
      if (nullFrac >= dropNullFraction) f.name -> Dropped
      else if (dropIfConstant && dist <= 1 && nulls == 0) f.name -> Dropped
      else f.dataType match {
        case StringType =>
          val sample = samples(f.name)
          ToDatetime.guessFormat(sample) match {
            case Some(fmt) => f.name -> ToTimestamp(fmt)
            case None if allFloat(sample) => f.name -> ToFloatPlan
            case None => f.name -> CleanString
          }
        case _ => f.name -> Passthrough
      }
    }
    Model(plans, nullMarkers)
  }

  def fitTransform(df: DataFrame): DataFrame = fit(df).transform(df)

  // --- persistence (reference learners pickle their fitted state,
  // skrub/_data_ops/_estimator.py:182; ours is explicit JSON so a fitted
  // Cleaner survives the session and reloads in a fresh one) ---------------

  import graft.plans.Json

  private def planJson(p: ColPlan): (String, Option[String]) = p match {
    case Dropped         => ("dropped", None)
    case Passthrough     => ("passthrough", None)
    case ToTimestamp(f)  => ("to_timestamp", Some(f))
    case ToFloatPlan     => ("to_float", None)
    case CleanString     => ("clean_string", None)
  }

  def save(model: Model, path: String): Unit = {
    val plans = model.plans.map { case (c, p) =>
      val (kind, fmt) = planJson(p)
      Json.obj(Seq("col" -> Json.str(c), "kind" -> Json.str(kind)) ++
        fmt.map(f => "format" -> Json.str(f)))
    }
    val json = Json.obj(Seq(
      "type" -> Json.str("graft.Cleaner"),
      "plans" -> Json.arr(plans),
      "null_markers" -> Json.arr(model.nullMarkers.map(Json.str))))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "cleaner.json"), json)
  }

  def load(path: String): Model = {
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "cleaner.json"))
    val root = Json.parse(json).asInstanceOf[Map[String, Any]]
    require(root("type") == "graft.Cleaner", s"not a Cleaner model at $path")
    val plans = root("plans").asInstanceOf[List[Any]].map { e =>
      val m = e.asInstanceOf[Map[String, Any]]
      val c = m("col").asInstanceOf[String]
      val p = m("kind").asInstanceOf[String] match {
        case "dropped"      => Dropped
        case "passthrough"  => Passthrough
        case "to_timestamp" => ToTimestamp(m("format").asInstanceOf[String])
        case "to_float"     => ToFloatPlan
        case "clean_string" => CleanString
        case other => throw new IllegalArgumentException(s"unknown plan kind $other")
      }
      c -> p
    }
    val markers = root("null_markers").asInstanceOf[List[Any]].map(_.asInstanceOf[String])
    Model(plans, markers)
  }
}
