package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Synthetic dataset generators (reference: skrub/datasets/_generating.py:
  * make_deduplication_data:18, toy_cities:183, make_retail_events:310).
  *
  * Spark-first shape: every generator is `spark.range(n)` + pure
  * deterministic expressions — no driver-side arrays, no RNG state. The
  * pseudo-random stream derives from md5(row id, salt, seed), so the same
  * call yields the same rows on any partitioning, any cluster size, and any
  * engine (the reference seeds numpy instead; its exact stream is not a
  * contract, the distributions are).
  */
object Generators {

  /** Uniform [0, 1) from md5 bits of (id, salt, seed) — 6 hex digits. */
  private def u(id: Column, salt: String, seed: Long): Column =
    conv(substring(md5(concat_ws(":", id.cast(StringType), lit(salt),
      lit(seed.toString))), 1, 6), 16, 10).cast(DoubleType) / lit(16777216.0)

  /** Integer in [0, n) from the uniform stream. */
  private def ui(id: Column, salt: String, seed: Long, n: Int): Column =
    floor(u(id, salt, seed) * n).cast(IntegerType)

  /** Exponential(mean) via inverse CDF. */
  private def uExp(id: Column, salt: String, seed: Long, mean: Double): Column =
    -lit(mean) * log(lit(1.0) - u(id, salt, seed))

  private val Alphabet = "abcdefghijklmnopqrstuvwxyz"

  /** One pseudo-random lowercase letter. */
  private def uLetter(id: Column, salt: String, seed: Long): Column =
    lit(Alphabet).substr(ui(id, salt, seed, 26) + 1, lit(1))

  /** Standard normal via Box-Muller on two uniform draws. */
  private def uNormal(id: Column, salt: String, seed: Long): Column =
    sqrt(-lit(2.0) * log(lit(1.0) - u(id, salt + "_a", seed))) *
      cos(lit(2.0 * math.Pi) * u(id, salt + "_b", seed))

  /** Duplicate each example `entriesPerExample(i)` times, misspelling each
    * character with probability `probMistake` (first copy of each example
    * is kept intact, mirroring the reference's visible behavior where
    * originals survive among the duplicates).
    */
  def makeDeduplicationData(spark: SparkSession, examples: Seq[String],
                            entriesPerExample: Seq[Int],
                            probMistake: Double = 0.2,
                            seed: Long = 0L): DataFrame = {
    require(examples.length == entriesPerExample.length,
      "examples and entriesPerExample must align")
    val meta = examples.zip(entriesPerExample).zipWithIndex.map {
      case ((ex, n), i) => (i, ex, n)
    }
    import spark.implicits._
    val base = meta.toDF("example_id", "example", "n_copies")
      .withColumn("copy", explode(sequence(lit(0), col("n_copies") - 1)))
    val rid = concat_ws("_", col("example_id"), col("copy"))
    // per-character misspelling: char j flips iff u(rid:j) < p; replacement
    // is a uniform lowercase letter. copy 0 stays intact.
    val chars = split(col("example"), "")
    val mangled = array_join(transform(chars, (ch, j) => {
      val cid = concat_ws("#", rid, j.cast(StringType))
      when(col("copy") === 0, ch)
        .when(u(cid, "flip", seed) < probMistake, uLetter(cid, "repl", seed))
        .otherwise(ch)
    }), "")
    base.select(mangled.as("value"))
  }

  /** The reference's fixed doc-example frame (toy_orders:81-143), with the
    * boolean target as the `delayed` column; `split` = train | test | all.
    */
  def toyOrders(spark: SparkSession, split: String = "train"): DataFrame = {
    import spark.implicits._
    val all = Seq(
      (1, "pen", 2, "2020-04-03", false),
      (2, "cup", 3, "2020-04-04", false),
      (3, "cup", 5, "2020-04-04", true),
      (4, "spoon", 1, "2020-04-05", false),
      (5, "cup", 5, "2020-04-11", true),
      (6, "fork", 2, "2020-04-12", false)
    ).toDF("ID", "product", "quantity", "date", "delayed")
      .withColumn("date", to_date(col("date")))
    split match {
      case "train" => all.filter(col("ID") <= 4)
      case "test"  => all.filter(col("ID") > 4)
      case "all"   => all
      case other => throw new IllegalArgumentException(
        s"split must be train|test|all, got $other")
    }
  }

  /** The reference's fixed product frame (toy_products:144-181). */
  def toyProducts(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("screen", 100, "supermarket.com", "electronics"),
      ("hammer", 15, "bestproducts.com", "tools"),
      ("keyboard", 20, "supermarket.com", "electronics"),
      ("usb key", 9, "bestproducts.com", "electronics"),
      ("charger", 13, "bestproducts.com", "electronics"),
      ("screwdriver", 12, "supermarket.com", "tools")
    ).toDF("description", "price", "seller", "category")
  }

  private val Cities = Seq("Amsterdam", "Athens", "Berlin", "Bratislava",
    "Brussels", "Bucharest", "Budapest", "Copenhagen", "Dublin", "Helsinki",
    "Lisbon", "Ljubljana", "Madrid", "Paris", "Prague", "Rome", "Stockholm",
    "Tallinn", "Vienna", "Warsaw")

  /** Mixed-type showcase frame: uid, cities (with nulls) + ordinal
    * encoding, start/end datetimes (end nullable, after start), and
    * `nMetrics` float columns (reference toy_cities:183-309).
    */
  def toyCities(spark: SparkSession, seed: Long = 0L, size: Long = 1000L,
                nulls: Double = 0.1, nMetrics: Int = 4): DataFrame = {
    require(nulls >= 0.0 && nulls <= 1.0, s"nulls must be in [0, 1], got $nulls")
    val id = col("id")
    val cityIdx = ui(id, "city", seed, Cities.length)
    val cityArr = array(Cities.map(lit): _*)
    val cityNull = u(id, "citynull", seed) < nulls
    val endNull = u(id, "endnull", seed) < nulls
    // uid: 10 pseudo-random lowercase letters
    val uid = concat((0 until 10).map(j => uLetter(id, s"uid$j", seed)): _*)
    val start = timestamp_seconds(lit(1577836800L) + // 2020-01-01
      floor(u(id, "start", seed) * 86400 * 365 * 3).cast(LongType))
    val end = timestamp_seconds(unix_timestamp(start) +
      floor(uExp(id, "dur", seed, 3600.0 * 24)).cast(LongType))
    val metrics = (0 until nMetrics).map(m =>
      round(u(id, s"metric$m", seed), 6).as(s"metric_$m"))
    spark.range(size).select(Seq(
      uid.as("uid"),
      when(cityNull, lit(null).cast(StringType))
        .otherwise(element_at(cityArr, cityIdx + 1)).as("cities"),
      when(cityNull, lit(null).cast(IntegerType))
        .otherwise(cityIdx).as("encoded_cities"),
      start.as("start"),
      when(endNull, lit(null).cast(TimestampType)).otherwise(end).as("end")
    ) ++ metrics: _*)
  }

  private val Devices = Seq("mobile", "desktop", "tablet")
  private val PageCats = Seq("electronics", "fashion", "home", "sports", "books")
  private val EventTypes = Seq("page_view", "search", "add_to_cart", "wishlist")

  /** Clickstream events for sessionization/classification demos (reference
    * make_retail_events:310-520): ~`nEvents` rows over `nUsers` users in
    * sessions of mean length 5; `converted` is a session-level label whose
    * probability rises with the session's best intent event, desktop
    * device, and mean price — learnable from the observable columns.
    */
  def makeRetailEvents(spark: SparkSession, nUsers: Int = 200,
                       nEvents: Int = 5000, seed: Long = 0L): DataFrame = {
    val meanSession = 5.0
    val nSessions = math.max(1, math.round(nEvents / meanSession).toInt)
    val sid = col("id")
    val userIdx = ui(sid, "user", seed, nUsers)
    // session length 1 + Poisson-ish via rounded exponential
    val sLen = (lit(1) + floor(uExp(sid, "len", seed, meanSession - 1.0))
      .cast(IntegerType)).as("n")
    val sessions = spark.range(nSessions).select(
      sid.as("session_id"), userIdx.as("user_idx"), sLen,
      // session start over 90 days from 2024-01-01
      (lit(1704067200L) + floor(u(sid, "sstart", seed) * 86400 * 90)
        .cast(LongType)).as("session_start"),
      u(sid, "conv", seed).as("conv_draw"))
    val ev = sessions
      .withColumn("event_i", explode(sequence(lit(0), col("n") - 1)))
    val eid = concat_ws("_", col("session_id"), col("event_i"))
    val eventIdx = ui(eid, "etype", seed, EventTypes.length)
    val device = element_at(array(Devices.map(lit): _*),
      ui(col("session_id"), "device", seed, Devices.length) + 1)
    val price = round(exp(lit(3.5) + lit(0.8) * uNormal(eid, "price", seed)), 2)
    val events = ev.select(
      col("session_id"), col("user_idx"), col("conv_draw"), col("event_i"),
      concat(lit("user_"), lpad(col("user_idx").cast(StringType), 4, "0"))
        .as("user_id"),
      timestamp_seconds(col("session_start") +
        (col("event_i") * 180) + floor(u(eid, "jit", seed) * 120).cast(LongType))
        .as("timestamp"),
      device.as("device_type"),
      element_at(array(PageCats.map(lit): _*),
        ui(eid, "page", seed, PageCats.length) + 1).as("page_category"),
      element_at(array(EventTypes.map(lit): _*), eventIdx + 1).as("event_type"),
      round(uExp(eid, "top", seed, 120.0), 3).as("time_on_page"),
      price.as("price_viewed"),
      eventIdx.as("intent"))
    // session-level label: logistic-ish in (max intent, device, mean price)
    val sessFeat = events.groupBy(col("session_id"))
      .agg(max(col("intent")).as("best_intent"),
        avg(col("price_viewed")).as("mean_price"),
        first(col("device_type")).as("dev"),
        first(col("conv_draw")).as("draw"))
      .withColumn("p_conv",
        lit(0.05) + lit(0.22) * col("best_intent") +
          when(col("dev") === "desktop", 0.1).otherwise(0.0) +
          least(col("mean_price") / 1000.0, lit(0.1)))
      .select(col("session_id"),
        (col("draw") < col("p_conv")).as("converted"))
    events.join(sessFeat, "session_id")
      .select("user_id", "timestamp", "device_type", "page_category",
        "event_type", "time_on_page", "price_viewed", "converted")
  }
}
