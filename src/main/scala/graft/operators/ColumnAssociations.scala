package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pairwise column association via bias-corrected Cramér's V (reference:
  * skrub/_column_associations.py:16-326, Bergsma-style correction).
  *
  * Fully distributed: contingency table = one groupBy(a, b) aggregate;
  * marginals are window sums over the (tiny) contingency frame — the input
  * is scanned exactly once per pair, and nothing but the contingency rows
  * (|distinct a| x |distinct b|) ever leaves the executors.
  */
object ColumnAssociations {

  /** One-row frame: (col_a, col_b, cramers_v) for a categorical pair. */
  def cramersV(df: DataFrame, a: String, b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val obs = df.filter(col(a).isNotNull && col(b).isNotNull)
      .groupBy(col(a), col(b)).agg(count(lit(1)).cast(DoubleType).as("o"))
    val wAll = Window.partitionBy()
    val wA = Window.partitionBy(col(a))
    val wB = Window.partitionBy(col(b))
    val enriched = obs
      .withColumn("n", sum(col("o")).over(wAll))
      .withColumn("rt", sum(col("o")).over(wA))
      .withColumn("ct", sum(col("o")).over(wB))
      .withColumn("r", size(collect_set(col(a)).over(wAll)).cast(DoubleType))
      .withColumn("c", size(collect_set(col(b)).over(wAll)).cast(DoubleType))
    // zero cells are absent from the groupBy contingency but still contribute
    // (0 - e)^2 / e = e to chi2; since all expected counts sum to n,
    // chi2 = sum_observed[(o-e)^2/e - e] + n
    val e = col("rt") * col("ct") / col("n")
    val cell = (col("o") - e) * (col("o") - e) / e - e
    val aggd = enriched.agg(
      (sum(cell) + first(col("n"))).as("chi2"),
      first(col("n")).as("n"), first(col("r")).as("r"), first(col("c")).as("c"))
    aggd.select(
      lit(a).as("col_a"), lit(b).as("col_b"),
      round(biasCorrectedV(col("chi2"), col("n"), col("r"), col("c")), 6).as("cramers_v"))
  }

  /** Bias-corrected Cramér's V (matches the reference's formula). A constant
    * column (r = 1 or c = 1) or a single-row frame makes the corrected
    * denominator zero — no association is measurable, so V = 0 rather than a
    * divide-by-zero (ANSI mode makes that an ERROR, not a NaN).
    */
  private def biasCorrectedV(chi2: org.apache.spark.sql.Column,
                             n: org.apache.spark.sql.Column,
                             r: org.apache.spark.sql.Column,
                             c: org.apache.spark.sql.Column) = {
    val phi2 = chi2 / n
    val phi2corr = greatest(lit(0.0), phi2 - (r - 1) * (c - 1) / (n - 1))
    val rcorr = r - (r - 1) * (r - 1) / (n - 1)
    val ccorr = c - (c - 1) * (c - 1) / (n - 1)
    val den = least(rcorr - 1, ccorr - 1)
    when(n > 1 && den > 0, sqrt(phi2corr / den)).otherwise(0.0)
  }

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
  // GROUPING SETS aggregate builds every pair's contingency table in a
  // single scan + shuffle, and the (tiny) contingency frame yields
  // bias-corrected Cramér's V per pair. Pearson correlation for numeric
  // pairs comes from one more single-row aggregate. At 100 TB: 2 stats
  // passes + 1 contingency pass over the input, never one job per pair.
  // -------------------------------------------------------------------------

  final case class BinPlans(labels: Seq[(String, org.apache.spark.sql.Column)],
                            numericCols: Seq[String],
                            extras: Map[String, Option[Double]] = Map.empty)

  /** Fit the per-column discretization (two small stats jobs). Callers that
    * need additional whole-frame aggregates (e.g. allPairs' Pearson
    * correlations) pass them as `extraAggs` — they ride the SAME stats scan
    * instead of paying their own pass over the input, and come back in
    * `BinPlans.extras` keyed by their alias.
    */
  def fitBins(df: DataFrame, cols: Seq[String], nBins: Int = 10,
              maxCats: Int = 10, catThreshold: Int = 30,
              extraAggs: Seq[org.apache.spark.sql.Column] = Nil): BinPlans = {
    val numericExpr: Map[String, org.apache.spark.sql.Column] =
      cols.flatMap { c =>
        df.schema(c).dataType match {
          case _: NumericType => Some(c -> col(c).cast(DoubleType))
          case BooleanType    => Some(c -> col(c).cast(DoubleType))
          case DateType | TimestampType | TimestampNTZType =>
            Some(c -> (unix_micros(col(c).cast(TimestampType)).cast(DoubleType) / 1e6))
          case _ => None
        }
      }.toMap
    // stats job 1: min/max/approx-distinct for numeric-like columns, plus any
    // caller-supplied aggregates — ONE scan for everything
    import org.apache.spark.sql.expressions.Window
    // melted one-scan top-categories job for the given columns
    def topCatsJob(catCols: Seq[String]): Map[String, Seq[String]] =
      if (catCols.isEmpty) Map.empty
      else {
        val kv = df.select(explode(array(catCols.map(c =>
            struct(lit(c).as("c"), col(c).cast(StringType).as("v"))): _*)).as("kv"))
          .select(col("kv.c").as("c"), col("kv.v").as("v"))
          .filter(col("v").isNotNull)
          .groupBy(col("c"), col("v")).agg(count(lit(1)).as("cnt"))
        // bounded top-k per column via minKBy (map-side partial combine,
        // k-element state) — the previous per-column sort window shuffled
        // EVERY distinct (column, value, count) row, unbounded for a
        // high-cardinality column; ordering (cnt desc, value asc) is
        // preserved by the (negated-count, value) sort key
        kv.groupBy(col("c"))
          .agg(graft.functions.AggExprs.minKBy(
            struct(negate(col("cnt")).as("n"), col("v").as("v")),
            maxCats + 1).as("top"))
          .collect()
          .map(r => r.getString(0) ->
            r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(1)).toSeq)
          .toMap
      }
    val statExprs = numericExpr.toSeq.flatMap { case (c, e) =>
      Seq(min(e).as(s"${c}__min"), max(e).as(s"${c}__max"),
        approx_count_distinct(col(c), 0.02).as(s"${c}__d"))
    } ++ extraAggs
    // Non-numeric columns are categorical REGARDLESS of the stats results,
    // so their (melted, one-scan) top-categories job is independent of the
    // stats job — Jobs.overlap runs them from separate threads. Only numeric
    // columns that the stats reveal as low-distinct need a residual top-cats
    // pass, and usually none do.
    val alwaysCat = cols.filterNot(numericExpr.contains)
    var extras = Map.empty[String, Option[Double]]
    val (alwaysCats, numStats) =
      graft.ops.Jobs.overlap(df.sparkSession.sparkContext) {
        topCatsJob(alwaysCat)
      } {
        if (statExprs.isEmpty) Map.empty[String, (Double, Double, Long)]
        else {
          val row = df.agg(statExprs.head, statExprs.tail: _*).collect()(0)
          extras = extraAggs.map { e =>
            val name = row.schema.fieldNames(statExprs.indexOf(e))
            name -> Option(row.getAs[Any](name)).map(_.toString.toDouble)
              .filterNot(_.isNaN)
          }.toMap
          numericExpr.keys.map { c =>
            c -> (Option(row.getAs[Any](s"${c}__min")).fold(0.0)(_.toString.toDouble),
              Option(row.getAs[Any](s"${c}__max")).fold(0.0)(_.toString.toDouble),
              row.getAs[Long](s"${c}__d"))
          }.toMap
        }
      }
    val catCols = cols.filter(c =>
      !numericExpr.contains(c) || numStats(c)._3 < catThreshold)
    val residualCats = catCols.filter(numericExpr.contains)
    val topCats: Map[String, Seq[String]] = alwaysCats ++ topCatsJob(residualCats)
    val labels = cols.map { c =>
      if (!catCols.contains(c)) {
        // equal-width bins over [min, max]; x == max clamps into the last bin
        val (mn, mx, _) = numStats(c)
        val e = numericExpr(c)
        val bin =
          if (mx == mn) lit("b0")
          else concat(lit("b"), least(floor((e - mn) / (mx - mn) * (nBins - 1)), lit(nBins - 2.0)).cast(IntegerType).cast(StringType))
        c -> when(col(c).isNull || (df.schema(c).dataType match {
          case FloatType | DoubleType => isnan(col(c)); case _ => lit(false)
        }), "__null").otherwise(bin).as(c)
      } else {
        val cats = topCats.getOrElse(c, Seq.empty)
        val kept = if (cats.length <= maxCats) cats else cats.take(maxCats - 1)
        val v = col(c).cast(StringType)
        c -> when(col(c).isNull, "__null")
          .when(v.isin(kept: _*), v).otherwise("__other").as(c)
      }
    }
    BinPlans(labels, numericExpr.keys.toSeq.filter(c =>
      df.schema(c).dataType match {
        case _: NumericType | BooleanType => true
        case _ => false
      }), extras)
  }

  /** All-pairs associations: one contingency job via GROUPING SETS, then
    * per-pair bias-corrected Cramér's V and (numeric pairs) Pearson corr.
    * Output: (left_column_name, right_column_name, cramer_v, pearson_corr),
    * top `topN` by V.
    */
  def allPairs(df: DataFrame, topN: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
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
    val plans = fitBins(df, cols, extraAggs = numPairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 6).as(s"__corr__${a}__${b}")
    })
    val binned = df.select(plans.labels.map(_._2): _*)

    // ONE hash aggregate by the FULL binned tuple first: bin labels bound
    // every column to <= max(nBins, maxCats)+1 values, so the distinct
    // combo count is data-bounded and small (and never exceeds the row
    // count — the degenerate case merely adds one cheap pre-pass). Only
    // the aggregated combo frame is then expanded x |pairs| and re-summed
    // into per-pair cells. The previous GROUPING SETS form expanded EVERY
    // INPUT ROW x |pairs| before its partial aggregation — 22.5M virtual
    // rows for 1.5M x 15 pairs at the 10x rehearsal (6.9 s vs DuckDB's
    // vectorized 0.6 s); the combo pre-aggregation scans the input once
    // and pays the pair fan-out only on the tiny combo frame.
    val base = binned.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__cnt"))
    val pairStructs = array(pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(a).as("va"), col(b).as("vb"))
    }: _*)
    val perPair = base
      .select(explode(pairStructs).as("p"), col("__cnt"))
      .groupBy(col("p.col_a").as("col_a"), col("p.col_b").as("col_b"),
        col("p.va").as("va"), col("p.vb").as("vb"))
      .agg(sum(col("__cnt")).cast(DoubleType).as("o"))

    // A pair's whole contingency table is at most (nBins+1) x (maxCats+1)
    // cells — collect it into ONE group and compute marginals, dimensions,
    // and the zero-cell-corrected chi2 locally with array functions. One
    // shuffle replaces the previous three window passes + final aggregate
    // over the same key; the local work is O(cells^2) on <= ~121 cells.
    val cont = perPair.groupBy(col("col_a"), col("col_b"))
      .agg(collect_list(struct(col("va"), col("vb"), col("o"))).as("cells"))
    val arr = col("cells")
    def sumO(a: org.apache.spark.sql.Column) =
      aggregate(a, lit(0.0), (acc, x) => acc + x.getField("o"))
    def marginals(field: String) = map_from_entries(transform(
      array_distinct(transform(arr, x => x.getField(field))),
      v => struct(v, sumO(filter(arr, y => y.getField(field) === v)))))
    val withDims = cont
      .withColumn("n", sumO(arr))
      .withColumn("rts", marginals("va"))
      .withColumn("cts", marginals("vb"))
      .withColumn("r", size(col("rts")).cast(DoubleType))
      .withColumn("c", size(col("cts")).cast(DoubleType))
    // zero-cell correction as in cramersV: chi2 = sum[(o-e)^2/e - e] + n
    val chi2 = aggregate(arr, lit(0.0), (acc, x) => {
      val e = element_at(col("rts"), x.getField("va")) *
        element_at(col("cts"), x.getField("vb")) / col("n")
      val o = x.getField("o")
      acc + (o - e) * (o - e) / e - e
    }) + col("n")
    val vFrame = withDims.select(col("col_a"), col("col_b"),
      round(biasCorrectedV(chi2, col("n"), col("r"), col("c")), 6).as("cramer_v"))

    // pearson came back with the stats scan (extras); broadcast the tiny map
    // into a literal lookup instead of joining a 15-row frame
    val result =
      if (numPairs.isEmpty) vFrame.withColumn("pearson_corr", lit(null).cast(DoubleType))
      else {
        val pearson: Map[String, Double] = numPairs.flatMap { case (a, b) =>
          plans.extras.getOrElse(s"__corr__${a}__${b}", None).map(v => s"$a\u0001$b" -> v)
        }.toMap
        val lookup = if (pearson.isEmpty) lit(null).cast(DoubleType)
          else element_at(typedLit(pearson),
            concat_ws("\u0001", col("col_a"), col("col_b")))
        vFrame.withColumn("pearson_corr", lookup)
      }
    result
      .withColumnRenamed("col_a", "left_column_name")
      .withColumnRenamed("col_b", "right_column_name")
      .orderBy(col("cramer_v").desc, col("left_column_name"), col("right_column_name"))
      .limit(topN)
  }
}
