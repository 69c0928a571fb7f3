package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pairwise column association via bias-corrected Cramér's V (reference:
  * skrub/_column_associations.py:16-326, Bergsma-style correction).
  *
  * Fully distributed: the input is scanned exactly once per contingency job
  * and nothing but contingency cells (bounded by the bin/category
  * vocabularies) ever leaves the executors. The all-pairs path builds EVERY
  * pair's contingency table in one flat aggregation buffer in a single scan
  * (functions.Contingency.ContingencyAll) — no row × pairs amplification,
  * no combo shuffle — and the V arithmetic runs driver-side on the ~15 KB
  * result, exactly like any other bounded-stats collect.
  */
object ColumnAssociations {

  /** Max contingency cells a single-pair job may gather before failing
    * loudly (VERDICT r7 finding #4: the contract is binned/bounded inputs;
    * a caller passing two raw high-cardinality columns should get an error
    * pointing at fitBins, not unbounded aggregation state).
    */
  val MaxPairCells: Int = 1 << 16

  /** Joint code-space bound under which allPairs pre-aggregates by a packed
    * mixed-radix int key (whole-stage codegen) before the contingency
    * update; beyond it the combo frame could rival the corpus and the
    * direct flat-buffer aggregate is used instead.
    */
  val PackedSpaceCap: Long = 1L << 22

  /** One-row frame: (col_a, col_b, cramers_v) for a categorical pair.
    *
    * Plan shape: one groupBy(a, b) contingency aggregate, then a capped
    * gather of the (tiny) contingency frame to the DRIVER, where marginals,
    * dimensions and the zero-cell-corrected chi2 are computed in O(cells)
    * hash-map arithmetic — one exchange total, no global window. (The
    * previous form computed the same quantities with nested SQL
    * higher-order-function lambdas — `filter`/`element_at` over an array
    * literal are linear scans, making it O(cells²) interpreted: a pair in
    * the ~5k–65k cell band passed the loud-failure guard yet could run for
    * hours, defeating the guard's intent.)
    */
  def cramersV(df: DataFrame, a: String, b: String,
               maxCells: Int = MaxPairCells): DataFrame = {
    val obs = df.filter(col(a).isNotNull && col(b).isNotNull)
      .groupBy(col(a), col(b)).agg(count(lit(1)).cast(DoubleType).as("o"))
    val cells = obs.agg(graft.functions.Contingency.boundedCollect(
        struct(col(a).cast(StringType).as("va"), col(b).cast(StringType).as("vb"),
          col("o")), maxCells).as("cells"))
      .head().getSeq[Row](0)
    // marginals accumulated in cell order (same fold order as the former
    // SQL-lambda form, so the 6-digit rounded value is unchanged)
    val rts = new java.util.LinkedHashMap[String, Double]()
    val cts = new java.util.LinkedHashMap[String, Double]()
    var n = 0.0
    cells.foreach { cell =>
      val o = cell.getDouble(2)
      rts.merge(cell.getString(0), o, _ + _)
      cts.merge(cell.getString(1), o, _ + _)
      n += o
    }
    val (r, c) = (rts.size.toDouble, cts.size.toDouble)
    // zero cells are absent from the groupBy contingency but still contribute
    // (0 - e)^2 / e = e to chi2; since all expected counts sum to n,
    // chi2 = sum_observed[(o-e)^2/e - e] + n
    var chi2 = 0.0
    cells.foreach { cell =>
      val e = rts.get(cell.getString(0)) * cts.get(cell.getString(1)) / n
      val o = cell.getDouble(2)
      chi2 += (o - e) * (o - e) / e - e
    }
    chi2 += n
    val v = {
      val phi2 = chi2 / n
      val phi2corr = math.max(0.0, phi2 - (r - 1) * (c - 1) / (n - 1))
      val rcorr = r - (r - 1) * (r - 1) / (n - 1)
      val ccorr = c - (c - 1) * (c - 1) / (n - 1)
      val den = math.min(rcorr - 1, ccorr - 1)
      if (n > 1 && den > 0) math.sqrt(phi2corr / den) else 0.0
    }
    val r6 = round6(v)
    import scala.jdk.CollectionConverters._
    df.sparkSession.createDataFrame(
      Seq(Row(a, b, r6)).asJava,
      StructType(Seq(StructField("col_a", StringType, nullable = false),
        StructField("col_b", StringType, nullable = false),
        StructField("cramers_v", DoubleType, nullable = false))))
  }


  /** Same formula, driver-side, over one pair's dense row-major cell block
    * (va × vb counts; vocab entries that never occur have zero marginals and
    * are excluded from r/c and chi2, matching the observed-cells form).
    */
  private def biasCorrectedVLocal(cells: Array[Long], off: Int,
                                  va: Int, vb: Int): Double = {
    val rt = new Array[Double](va)
    val ct = new Array[Double](vb)
    var n = 0.0
    var i = 0
    while (i < va) {
      var j = 0
      while (j < vb) {
        val o = cells(off + i * vb + j).toDouble
        rt(i) += o; ct(j) += o; n += o
        j += 1
      }
      i += 1
    }
    if (n <= 1) return 0.0
    var r = 0.0; var c = 0.0
    i = 0; while (i < va) { if (rt(i) > 0) r += 1; i += 1 }
    var j = 0; while (j < vb) { if (ct(j) > 0) c += 1; j += 1 }
    var chi2 = 0.0
    i = 0
    while (i < va) {
      if (rt(i) > 0) {
        j = 0
        while (j < vb) {
          if (ct(j) > 0) {
            val e = rt(i) * ct(j) / n
            val o = cells(off + i * vb + j).toDouble
            chi2 += (o - e) * (o - e) / e
          }
          j += 1
        }
      }
      i += 1
    }
    val phi2 = chi2 / n
    val phi2corr = math.max(0.0, phi2 - (r - 1) * (c - 1) / (n - 1))
    val rcorr = r - (r - 1) * (r - 1) / (n - 1)
    val ccorr = c - (c - 1) * (c - 1) / (n - 1)
    val den = math.min(rcorr - 1, ccorr - 1)
    if (den > 0) math.sqrt(phi2corr / den) else 0.0
  }

  /** Spark `round(x, 6)` parity (HALF_UP on the decimal expansion). */
  private def round6(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** All given pairs, unioned (each pair is one independent small job). */
  def forPairs(df: DataFrame, pairs: Seq[(String, String)]): DataFrame =
    pairs.map { case (a, b) => cramersV(df, a, b) }.reduce(_.unionByName(_))

  // -------------------------------------------------------------------------
  // All-pairs associations (reference column_associations contract,
  // _column_associations.py:16-326): every column is discretized to a string
  // bin label — numerics/datetimes with >= `catThreshold` distinct values get
  // `nBins - 1` equal-width bins plus a null bin, low-distinct numerics and
  // strings are categorical with the `maxCats - 1` most frequent categories
  // kept and the rest lumped (nulls are their own category) — then ONE
  // single-pass flat-buffer aggregate builds every pair's contingency table
  // in one scan, and the (tiny, bounded) buffer yields bias-corrected
  // Cramér's V per pair on the driver. Pearson correlation for numeric
  // pairs rides the stats scan. At 100 TB: 2 stats passes + 1 contingency
  // pass over the input, never one job per pair, never row × pairs
  // amplification.
  // -------------------------------------------------------------------------

  final case class BinPlans(labels: Seq[(String, Column)],
                            numericCols: Seq[String],
                            extras: Map[String, Option[Double]] = Map.empty,
                            codes: Seq[(String, Column)] = Nil,
                            vocabOf: Map[String, Int] = Map.empty,
                            specs: Seq[BinSpec] = Nil)

  /** Serializable description of one column's fitted discretization —
    * everything `labelOf` needs to rebuild the label expression, so a
    * fitted bin plan can be persisted as plain JSON and reloaded
    * bit-identically (Drift.PsiModel save/load). `kind`: "num" (numeric /
    * boolean, cast to double), "ts" (date/timestamp, epoch seconds), "cat"
    * (top-`kept` categories, rest lumped to __other).
    */
  final case class BinSpec(col: String, kind: String,
                           min: Double = 0.0, max: Double = 0.0,
                           nBins: Int = 0, kept: Seq[String] = Nil,
                           nanAsNull: Boolean = false)

  /** The ONE label-expression builder — fitBins routes through this, and so
    * does a reloaded model, so the fit path and the reload path cannot
    * drift apart.
    */
  def labelOf(s: BinSpec): Column = {
    val c = col(s.col)
    if (s.kind == "cat") {
      val v = c.cast(StringType)
      when(c.isNull, "__null")
        .when(v.isin(s.kept: _*), v).otherwise("__other").as(s.col)
    } else {
      val nullCond = if (s.nanAsNull) c.isNull || isnan(c) else c.isNull
      if (s.max == s.min) when(nullCond, "__null").otherwise(lit("b0")).as(s.col)
      else {
        val e =
          if (s.kind == "ts")
            unix_micros(c.cast(TimestampType)).cast(DoubleType) / 1e6
          else c.cast(DoubleType)
        val binInt = least(floor((e - s.min) / (s.max - s.min) * (s.nBins - 1)),
          lit(s.nBins - 2.0)).cast(IntegerType)
        when(nullCond, "__null")
          .otherwise(concat(lit("b"), binInt.cast(StringType))).as(s.col)
      }
    }
  }

  /** Fit the per-column discretization (two small stats jobs). Callers that
    * need additional whole-frame aggregates (e.g. allPairs' Pearson
    * correlations) pass them as `extraAggs` — they ride the SAME stats scan
    * instead of paying their own pass over the input, and come back in
    * `BinPlans.extras` keyed by their alias.
    *
    * Besides the string `labels`, the plan carries equivalent dense integer
    * `codes` (one int in [0, vocabOf(col)) per column, nulls included as
    * their own code) for the single-pass contingency aggregate — same
    * discretization, no string hashing in the hot loop.
    */
  def fitBins(df: DataFrame, cols: Seq[String], nBins: Int = 10,
              maxCats: Int = 10, catThreshold: Int = 30,
              extraAggs: Seq[Column] = Nil): BinPlans = {
    val numericExpr: Map[String, Column] =
      cols.flatMap { c =>
        df.schema(c).dataType match {
          case _: NumericType => Some(c -> col(c).cast(DoubleType))
          case BooleanType    => Some(c -> col(c).cast(DoubleType))
          case DateType | TimestampType | TimestampNTZType =>
            Some(c -> (unix_micros(col(c).cast(TimestampType)).cast(DoubleType) / 1e6))
          case _ => None
        }
      }.toMap
    // per-column top-categories job: one pruned codegen scan + a tiny
    // minKBy global aggregate over the counted frame (bounded k-element
    // state; ordering (cnt desc, value asc) preserved by the
    // (negated-count, value) sort key). Per-column jobs replaced the old
    // melted explode — the melt doubled-or-worse every row through a
    // two-level string hash aggregate, where C pruned single-column scans
    // overlap from driver threads and each stays in whole-stage codegen.
    def topCatOne(c: String): Seq[String] =
      df.select(col(c).cast(StringType).as("v"))
        .filter(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
        .agg(graft.functions.AggExprs.minKBy(
          struct(negate(col("cnt")).as("n"), col("v").as("v")),
          maxCats + 1).as("top"))
        .collect()(0).getSeq[Row](0).map(_.getString(1)).toSeq
    // Three overlapped job groups, all submitted concurrently:
    //  1. min/max + caller extras — declarative only, stays codegen'd
    //  2. saturating exact distinct probes (DistinctAtMost: <= cap+1-element
    //     state, one branch per row once saturated) for the binned-vs-
    //     categorical threshold decision — kept OUT of job 1 because an
    //     imperative aggregate would knock the whole stats scan out of
    //     whole-stage codegen (measured 0.8 s -> 10 s at the 100x rehearsal)
    //  3. one top-categories job per non-numeric column
    val alwaysCat = cols.filterNot(numericExpr.contains)
    val minMaxExprs = numericExpr.toSeq.flatMap { case (c, e) =>
      // NaN sorts ABOVE every double in Spark, so max() returns NaN when
      // any value is NaN — and a NaN/Inf bin edge poisons the serialized
      // BinSpec (bare NaN is invalid JSON; Drift.savePsi would write a
      // file loadPsi can never parse). NaN rows are null-binned anyway
      // and +/-Inf clamp into the extreme bins, so edges over FINITE
      // values are the correct contract, not just the serializable one.
      val finite = when(isnan(e) ||
        e === Double.PositiveInfinity || e === Double.NegativeInfinity,
        lit(null)).otherwise(e)
      Seq(min(finite).as(s"${c}__min"), max(finite).as(s"${c}__max"))
    } ++ extraAggs
    var extras = Map.empty[String, Option[Double]]
    var minMax = Map.empty[String, (Double, Double)]
    var distincts = Map.empty[String, Long]
    val statsThunk = () => {
      if (minMaxExprs.nonEmpty) {
        val row = df.agg(minMaxExprs.head, minMaxExprs.tail: _*).collect()(0)
        extras = extraAggs.map { e =>
          val name = row.schema.fieldNames(minMaxExprs.indexOf(e))
          name -> Option(row.getAs[Any](name)).map(_.toString.toDouble)
            .filterNot(_.isNaN)
        }.toMap
        minMax = numericExpr.keys.map { c =>
          c -> (Option(row.getAs[Any](s"${c}__min")).fold(0.0)(_.toString.toDouble),
            Option(row.getAs[Any](s"${c}__max")).fold(0.0)(_.toString.toDouble))
        }.toMap
      }
      Map.empty[String, Seq[String]]
    }
    val distinctThunk = () => {
      if (numericExpr.nonEmpty) {
        val dExprs = numericExpr.keys.toSeq.map(c =>
          graft.functions.Contingency.distinctAtMost(col(c), catThreshold)
            .as(s"${c}__d"))
        val row = df.agg(dExprs.head, dExprs.tail: _*).collect()(0)
        distincts = numericExpr.keys.toSeq
          .map(c => c -> row.getAs[Long](s"${c}__d")).toMap
      }
      Map.empty[String, Seq[String]]
    }
    val thunks: Seq[() => Map[String, Seq[String]]] =
      Seq(statsThunk, distinctThunk) ++
        alwaysCat.map(c => () => Map(c -> topCatOne(c)))
    val alwaysCats = graft.ops.Jobs
      .overlapAll(df.sparkSession.sparkContext)(thunks)
      .reduce(_ ++ _)
    val numStats: Map[String, (Double, Double, Long)] = numericExpr.keys.map { c =>
      val (mn, mx) = minMax.getOrElse(c, (0.0, 0.0))
      c -> (mn, mx, distincts.getOrElse(c, 0L))
    }.toMap
    val catCols = cols.filter(c =>
      !numericExpr.contains(c) || numStats(c)._3 < catThreshold)
    val residualCats = catCols.filter(numericExpr.contains)
    val topCats: Map[String, Seq[String]] =
      alwaysCats ++ graft.ops.Jobs.overlapAll(df.sparkSession.sparkContext)(
        residualCats.map(c => () => c -> topCatOne(c))).toMap
    val planned: Seq[(String, BinSpec, Column, Column, Int)] = cols.map { c =>
      val nanAsNull = df.schema(c).dataType match {
        case FloatType | DoubleType => true; case _ => false
      }
      val nullCond =
        if (nanAsNull) col(c).isNull || isnan(col(c)) else col(c).isNull
      if (!catCols.contains(c)) {
        // equal-width bins over [min, max]; x == max clamps into the last bin
        val (mn, mx, _) = numStats(c)
        val kind = df.schema(c).dataType match {
          case DateType | TimestampType | TimestampNTZType => "ts"
          case _ => "num"
        }
        val spec = BinSpec(c, kind, mn, mx, nBins, Nil, nanAsNull)
        val label = labelOf(spec)
        if (mx == mn) {
          (c, spec, label, when(nullCond, lit(1)).otherwise(lit(0)).as(c), 2)
        } else {
          val e = numericExpr(c)
          val binInt = least(floor((e - mn) / (mx - mn) * (nBins - 1)),
            lit(nBins - 2.0)).cast(IntegerType)
          (c, spec, label,
            when(nullCond, lit(nBins - 1)).otherwise(binInt).as(c), nBins)
        }
      } else {
        val cats = topCats.getOrElse(c, Seq.empty)
        val kept = if (cats.length <= maxCats) cats else cats.take(maxCats - 1)
        val spec = BinSpec(c, "cat", kept = kept)
        val label = labelOf(spec)
        val v = col(c).cast(StringType)
        // a kept value literally named "__other"/"__null" merges with the
        // lump/null label in the string form — `.distinct` reproduces that
        // merge in code space
        val vocabLabels = (kept ++ Seq("__other", "__null")).distinct
        val idxOf = vocabLabels.zipWithIndex.toMap
        val keptMap: Map[String, Int] = kept.map(k => k -> idxOf(k)).toMap
        val code = when(col(c).isNull, lit(idxOf("__null")))
          .otherwise(if (keptMap.isEmpty) lit(idxOf("__other"))
          else coalesce(element_at(typedLit(keptMap), v), lit(idxOf("__other"))))
        (c, spec, label, code.as(c), vocabLabels.length)
      }
    }
    BinPlans(
      planned.map(p => p._1 -> p._3),
      numericExpr.keys.toSeq.filter(c =>
        df.schema(c).dataType match {
          case _: NumericType | BooleanType => true
          case _ => false
        }),
      extras,
      planned.map(p => p._1 -> p._4),
      planned.map(p => p._1 -> p._5).toMap,
      planned.map(_._2))
  }

  /** All-pairs associations: ONE single-pass flat-buffer contingency job
    * (plus the two fitBins stats jobs, which also carry the numeric pairs'
    * Pearson corr), then per-pair bias-corrected Cramér's V computed on the
    * driver from the bounded (Σ |vocab_a|×|vocab_b| cells) buffer.
    * Output: (left_column_name, right_column_name, cramer_v, pearson_corr),
    * top `topN` by V.
    */
  def allPairs(df: DataFrame, topN: Int = 1000): DataFrame = {
    val cols = df.schema.fields.collect {
      case f if (f.dataType match {
        case _: NumericType | BooleanType | StringType | DateType |
             TimestampType | TimestampNTZType => true
        case _ => false
      }) => f.name
    }.toSeq
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.length
    } yield (cols(i), cols(j))
    // Pearson for numeric pairs rides the fitBins stats scan — numericCols is
    // schema-derived, so the corr aggregates are known before any stats run
    val schemaNumeric = cols.filter(c => df.schema(c).dataType match {
      case _: NumericType | BooleanType => true
      case _ => false
    }).toSet
    val numPairs = pairs.filter { case (a, b) =>
      schemaNumeric.contains(a) && schemaNumeric.contains(b)
    }
    val outSchema = StructType(Seq(
      StructField("left_column_name", StringType, nullable = false),
      StructField("right_column_name", StringType, nullable = false),
      StructField("cramer_v", DoubleType, nullable = false),
      StructField("pearson_corr", DoubleType, nullable = true)))
    if (pairs.isEmpty)
      return df.sparkSession.createDataFrame(
        java.util.Collections.emptyList[Row](), outSchema)
    val plans = fitBins(df, cols, extraAggs = numPairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 6).as(s"__corr__${a}__${b}")
    })

    val colIdx = cols.zipWithIndex.toMap
    val vocabs = cols.map(plans.vocabOf)
    val pairA = pairs.map(p => colIdx(p._1))
    val pairB = pairs.map(p => colIdx(p._2))
    // ONE scan either way; the difference is where the typed-imperative
    // update runs. When the joint code space Π vocab is small (narrow
    // frames), pack all codes into one mixed-radix int in the (codegen'd)
    // projection and aggregate by that primitive key first — the corpus-
    // sized pass is then a whole-stage-codegen hash aggregate, and the
    // interpreted contingency update touches only <= Π vocab combo rows.
    // Wide frames overflow the packed space combinatorially (11^20 keys
    // would make the combo frame as big as the corpus), so they take the
    // direct path: every row updates one flat Array[Long] buffer holding
    // all pair tables (map-side partials, ~KBs per partition, zero row
    // amplification at any width).
    val space = vocabs.foldLeft(1L)((acc, v) =>
      if (acc > PackedSpaceCap) acc else acc * v)
    val flat = if (space <= PackedSpaceCap) {
      val strides = vocabs.scanRight(1)(_ * _).tail // row-major mixed radix
      val packed = plans.codes.zip(strides).map { case ((_, code), s) =>
        code * lit(s)
      }.reduce(_ + _)
      df.select(packed.as("__k"))
        .groupBy(col("__k")).agg(count(lit(1)).as("__cnt"))
        .agg(graft.functions.Contingency.contingencyPacked(
          col("__k"), col("__cnt"), strides, vocabs, pairA, pairB).as("cells"))
        .head().getSeq[Long](0).toArray
    } else {
      df.select(array(plans.codes.map(_._2): _*).as("__codes"))
        .agg(graft.functions.Contingency.contingencyAll(
          col("__codes"), vocabs, pairA, pairB).as("cells"))
        .head().getSeq[Long](0).toArray
    }
    val offs = graft.functions.Contingency.ContingencyAll
      .offsets(vocabs, pairA, pairB)

    val pearson: Map[(String, String), Double] = numPairs.flatMap { case (a, b) =>
      plans.extras.getOrElse(s"__corr__${a}__${b}", None).map((a, b) -> _)
    }.toMap
    val rows: Seq[Row] = pairs.zipWithIndex.map { case ((a, b), p) =>
      val v = biasCorrectedVLocal(flat, offs(p),
        vocabs(colIdx(a)), vocabs(colIdx(b)))
      Row(a, b, round6(v),
        pearson.get((a, b)).map(Double.box).orNull)
    }
    import scala.jdk.CollectionConverters._
    df.sparkSession.createDataFrame(rows.asJava, outSchema)
      .orderBy(col("cramer_v").desc, col("left_column_name"), col("right_column_name"))
      .limit(topN)
  }
}
