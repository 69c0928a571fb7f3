package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temperature-based source mixing — rebalance a multi-source corpus toward
  * a target mixture before training (the T5/Gopher "temperature sampling"
  * rule: source weight proportional to count^(1/T), T > 1 flattens the
  * mixture toward uniform, T = 1 keeps natural proportions). The reference
  * library has no mixing surface; this is a required station in any
  * 100 TB training-data pipeline.
  *
  * Per-source sampling rate:
  *   rate_s = min(1, (srt_s / S) * (total * targetFrac) / n_s)
  * with srt_s = round(n_s^(1/T), 6) and S = sum of srt_s — the rounded
  * weights are summed as DECIMAL(28,6), so S is an order-independent exact
  * sum and the rates are bit-identical across engines and partitionings.
  *
  * Row selection is the library's deterministic md5-fraction contract
  * (Kernel.hexThreshold15 semantics, computed here as a column expression
  * so the whole operator stays one declarative plan): keep a row iff the
  * first 15 hex chars of md5(id:seed) fall below the rate's 60-bit hex
  * threshold. floor(rate * 2^60) is a power-of-two multiply — exact in
  * IEEE double — so the column form equals the driver-side BigDecimal form.
  *
  * Scale shape: ONE tiny per-source aggregate (|sources| rows — mixtures
  * are defined over a bounded source set by construction), broadcast back,
  * then a pure codegen'd filter scan. Zero corpus-sized shuffles.
  */
object Mix {

  /** Per-source rates: (sourceCol, n_docs, weight, rate). */
  def temperatureRates(df: DataFrame, sourceCol: String,
                       temperature: Double = 2.0,
                       targetFrac: Double = 1.0): DataFrame =
    temperatureRatesBy(df, sourceCol, count(lit(1)), temperature, targetFrac)

  /** Weighted form: source mass = an integer aggregate of the caller's
    * choosing — pass `sum(col("n_toks"))` for TOKEN-weighted mixing, the
    * form LLM data recipes actually specify (source shares denominated in
    * tokens, docs still the sampling unit). Same formula, same
    * order-independent DECIMAL weight sum, same md5 row selection.
    */
  def temperatureRatesBy(df: DataFrame, sourceCol: String, massAgg: Column,
                         temperature: Double = 2.0,
                         targetFrac: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy() // the frame is |sources| rows — tiny
    val counts = df.groupBy(col(sourceCol))
      .agg(massAgg.cast(LongType).as("n_docs"))
    // T = 2 (the common flattening choice) routes through sqrt, which IEEE
    // correctly-rounds in every engine; pow's libm implementations may
    // differ in the last ulp, so general T is deterministic within Spark
    // but only sqrt carries the cross-engine hash guarantee
    val invT = 1.0 / temperature
    val nD = col("n_docs").cast(DoubleType)
    val srt = round(if (invT == 0.5) sqrt(nD) else pow(nD, lit(invT)), 6)
      .cast(DecimalType(28, 6))
    val frac = col("__srt").cast(DoubleType) / col("__ssum").cast(DoubleType)
    counts.withColumn("__srt", srt)
      .withColumn("__ssum", sum(col("__srt")).over(w))
      .withColumn("__total", sum(col("n_docs")).over(w))
      .withColumn("weight", round(frac, 6))
      .withColumn("rate", round(least(lit(1.0),
        frac * (col("__total").cast(DoubleType) * lit(targetFrac)) /
          col("n_docs").cast(DoubleType)), 6))
      .select(col(sourceCol), col("n_docs"), col("weight"), col("rate"))
  }

  /** Audit form: every input row + its source's `rate` and the
    * deterministic `sampled` verdict. `idCols` must uniquely identify rows.
    */
  def temperatureFlag(df: DataFrame, sourceCol: String, idCols: Seq[String],
                      temperature: Double = 2.0, targetFrac: Double = 1.0,
                      seed: Long = 42L): DataFrame =
    temperatureFlagBy(df, sourceCol, count(lit(1)), idCols, temperature,
      targetFrac, seed)

  /** Weighted audit form (see temperatureRatesBy). */
  def temperatureFlagBy(df: DataFrame, sourceCol: String, massAgg: Column,
                        idCols: Seq[String],
                        temperature: Double = 2.0, targetFrac: Double = 1.0,
                        seed: Long = 42L): DataFrame = {
    val rates = broadcast(
      temperatureRatesBy(df, sourceCol, massAgg, temperature, targetFrac)
        .select(col(sourceCol).as("__mix_src"), col("rate")))
    val h = substring(md5(concat_ws(":",
      idCols.map(col(_).cast(StringType)) :+ lit(seed.toString): _*)), 1, 15)
    // 60-bit hex threshold as a column (mirrors Kernel.hexThreshold15;
    // rate * 2^60 is exact — power-of-two multiply — so floor agrees with
    // the BigDecimal driver-side form); hex() is uppercase -> lower()
    val thr = when(col("rate") >= 1.0, lit("g"))
      .otherwise(lpad(lower(hex(floor(col("rate") * lit(1.152921504606846976e18))
        .cast(LongType))), 15, "0"))
    // null-SAFE join: a null source is its own stratum (groupBy already
    // counts it as one) — a plain equi-join would silently DROP its rows
    // from the census
    df.join(rates, df(sourceCol) <=> rates("__mix_src"))
      .drop("__mix_src")
      .withColumn("sampled", h < thr)
  }

  /** Survivors only — the frame a training run reads. */
  def temperatureSample(df: DataFrame, sourceCol: String, idCols: Seq[String],
                        temperature: Double = 2.0, targetFrac: Double = 1.0,
                        seed: Long = 42L): DataFrame =
    temperatureFlag(df, sourceCol, idCols, temperature, targetFrac, seed)
      .filter(col("sampled")).drop("rate", "sampled")

  /** Fractional-epoch repetition schedule — the LLaMA-style data recipe
    * ("Wikipedia 2.45 epochs, CommonCrawl 1.1, code 0.64"): materialize
    * `epochs(source)` copies of every row, where a fractional epoch f
    * means each row repeats floor(f) times plus ONE extra repeat for the
    * deterministic frac(f)-share of rows (md5(id:seed) threshold — the
    * `temperatureFlag` selection discipline, so the realized share is
    * exact in expectation and every engine replays the same choice).
    * Epochs below 1 subsample (0 repeats for the non-selected rows);
    * sources absent from the map default to 1.0. Output adds
    * `repeat_idx` (0-based) — (ids..., repeat_idx) stays unique, so
    * packing/shuffling downstream treats repeats as distinct rows.
    *
    * Scale shape: one broadcast of the |sources|-row epoch table, one
    * codegen'd scan computing the per-row copy count, one explode —
    * output-row-linear, zero shuffles.
    */
  def repeatEpochs(df: DataFrame, sourceCol: String, idCols: Seq[String],
                   epochs: Map[String, Double],
                   seed: Long = 42L): DataFrame = {
    require(epochs.values.forall(e => e >= 0.0 && e <= 1000.0),
      "epochs must be in [0, 1000] — a larger factor is almost certainly " +
        "a unit mistake and would explode the corpus")
    require(!df.columns.contains("repeat_idx"),
      "repeatEpochs: the input already has a repeat_idx column — repeats " +
        "of repeats need an explicit rename first")
    val spark = df.sparkSession
    import spark.implicits._
    val eTable = broadcast(
      epochs.toSeq.toDF("__ep_src", "__ep").select(
        col("__ep_src"),
        floor(col("__ep")).cast(LongType).as("__whole"),
        // frac as an exact 60-bit hex threshold (temperatureFlag's form)
        when(col("__ep") - floor(col("__ep")) <= 0.0, lit("0"))
          .otherwise(lpad(lower(hex(
            floor((col("__ep") - floor(col("__ep"))) *
              lit(1.152921504606846976e18)).cast(LongType))), 15, "0"))
          .as("__thr")))
    val h = substring(md5(concat_ws(":",
      idCols.map(col(_).cast(StringType)) :+ lit(seed.toString): _*)), 1, 15)
    df.join(eTable, df(sourceCol) <=> eTable("__ep_src"), "left")
      .withColumn("__n",
        coalesce(col("__whole"), lit(1L)) +
          when(col("__thr").isNotNull && h < col("__thr"), 1L).otherwise(0L))
      .filter(col("__n") > 0)
      .withColumn("repeat_idx",
        explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__ep_src", "__whole", "__thr", "__n")
  }
}
