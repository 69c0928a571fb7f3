package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Generators

/** Synthetic generators: shapes, determinism under repartitioning, and the
  * distributional/structural contracts the reference documents.
  */
class GeneratorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Datasets.load returns the reference Bunch shape over a parquet fixture") {
    import graft.sources.Datasets
    val dir = java.nio.file.Files.createTempDirectory("graft-ds").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "cat", "label")
      .write.mode("overwrite").parquet(s"$dir/toy.parquet")
    val d = Datasets.load(spark, "toy", dir, target = Some("label"))
    assert(d.table.count() === 2)
    assert(d.x.columns.toSeq === Seq("id", "cat"))
    assert(d.y.get.columns.toSeq === Seq("label"))
    assert(d.metadata("target") === "label")
    assert(d.path.endsWith("toy.parquet"))
    // no target: x is the whole table, y absent
    val d2 = Datasets.load(spark, "toy", dir)
    assert(d2.x.columns.length === 3 && d2.y.isEmpty)
    // unknown target fails loudly
    intercept[IllegalArgumentException] {
      Datasets.load(spark, "toy", dir, target = Some("nope"))
    }
  }

  test("makeDeduplicationData keeps one intact copy and mangles the rest") {
    val out = Generators.makeDeduplicationData(spark,
      Seq("string1", "string2"), Seq(4, 5), probMistake = 0.3, seed = 9L)
    val vals = out.as[String].collect()
    assert(vals.length === 9)
    assert(vals.count(_ == "string1") >= 1)
    assert(vals.count(_ == "string2") >= 1)
    // every entry has the source length and most characters intact
    assert(vals.forall(v => v.length == 7))
    assert(vals.exists(v => v != "string1" && v != "string2")) // some mangled
    // deterministic
    val again = Generators.makeDeduplicationData(spark,
      Seq("string1", "string2"), Seq(4, 5), probMistake = 0.3, seed = 9L)
    assert(again.as[String].collect().sorted.toSeq === vals.sorted.toSeq)
  }

  test("toyCities: schema, null fractions, end after start, metric range") {
    val df = Generators.toyCities(spark, seed = 1L, size = 2000L,
      nulls = 0.2, nMetrics = 2)
    assert(df.columns.toSeq === Seq("uid", "cities", "encoded_cities",
      "start", "end", "metric_0", "metric_1"))
    val r = df.agg(
      avg(col("cities").isNull.cast("double")).as("cnull"),
      avg(col("end").isNull.cast("double")).as("enull"),
      min(col("metric_0")).as("mmin"), max(col("metric_0")).as("mmax"),
      sum(when(col("end") < col("start"), 1).otherwise(0)).as("bad"),
      countDistinct(col("uid")).as("uids")).collect()(0)
    assert(math.abs(r.getAs[Double]("cnull") - 0.2) < 0.05)
    assert(math.abs(r.getAs[Double]("enull") - 0.2) < 0.05)
    assert(r.getAs[Double]("mmin") >= 0.0 && r.getAs[Double]("mmax") < 1.0)
    assert(r.getAs[Long]("bad") === 0L)
    assert(r.getAs[Long]("uids") > 1900L) // uids effectively unique
    // ordinal encoding consistent with the city value
    val pairs = df.filter(col("cities").isNotNull)
      .select("cities", "encoded_cities").distinct().collect()
    assert(pairs.map(_.getString(0)).distinct.length === pairs.length)
  }

  test("toyOrders / toyProducts match the reference doc frames") {
    val train = Generators.toyOrders(spark, "train")
    assert(train.count() === 4)
    assert(train.columns.toSeq === Seq("ID", "product", "quantity", "date", "delayed"))
    assert(Generators.toyOrders(spark, "test").count() === 2)
    assert(Generators.toyOrders(spark, "all").count() === 6)
    assert(train.filter(col("delayed")).select("ID").as[Int].collect() === Array(3))
    val prods = Generators.toyProducts(spark)
    assert(prods.count() === 6)
    assert(prods.filter(col("category") === "tools").count() === 2)
    intercept[IllegalArgumentException] { Generators.toyOrders(spark, "nope") }
  }

  test("selectCols/dropCols stages freeze the fit-time column list") {
    import graft.plans._
    import graft.selectors.Selectors
    val df = Seq((1, "a", 2.0)).toDF("id", "s", "x")
    val sel = Plan.makeLearner(Var("x").apply(Stages.selectCols(Selectors.numeric)))
    assert(sel.fitTransform(Map("x" -> df)).columns.toSeq === Seq("id", "x"))
    // frozen: a new numeric column at transform time is NOT picked up
    val wider = df.withColumn("y", col("x") * 2)
    assert(sel.transform(Map("x" -> wider)).columns.toSeq === Seq("id", "x"))
    val drop = Plan.makeLearner(Var("x").apply(Stages.dropCols(Selectors.cols("s"))))
    assert(drop.fitTransform(Map("x" -> df)).columns.toSeq === Seq("id", "x"))
  }

  test("makeRetailEvents: session-consistent labels and learnable signal") {
    val df = Generators.makeRetailEvents(spark, nUsers = 50,
      nEvents = 2000, seed = 3L).persist()
    assert(df.columns.toSeq === Seq("user_id", "timestamp", "device_type",
      "page_category", "event_type", "time_on_page", "price_viewed",
      "converted"))
    val n = df.count()
    assert(n > 1000 && n < 4000) // ~nEvents rows
    // both classes present; add_to_cart sessions convert more often
    val byIntent = df.groupBy(col("event_type"))
      .agg(avg(col("converted").cast("double")).as("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byIntent("add_to_cart") > byIntent("page_view"))
    val rate = df.agg(avg(col("converted").cast("double"))).head().getDouble(0)
    assert(rate > 0.05 && rate < 0.95)
    df.unpersist()
  }
}
