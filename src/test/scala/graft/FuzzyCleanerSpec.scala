package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Cleaner, FuzzyJoin, ToDatetime}

/** FuzzyJoin semantics (the reference Joiner doctest analog,
  * _joiner.py:220-248), ToDatetime format guessing with day/month ambiguity
  * evidence, Cleaner end-to-end.
  */
class FuzzyCleanerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fuzzyJoin matches misspelled keys to their nearest aux row") {
    val main = Seq("France", "germannY", "Itali").toDF("country")
    val aux = Seq(("germany", 1), ("france", 2), ("italy", 3)).toDF("name", "aux_id")
    val out = FuzzyJoin.fuzzyJoin(main, aux, Seq("country" -> "name"))
    val matches = out.select("country", "name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(matches("France") === "france")
    assert(matches("germannY") === "germany")
    assert(matches("Itali") === "italy")
    assert(out.filter(col(FuzzyJoin.MatchInfoAccepted)).count() === 3)
  }

  test("fuzzyJoin maxDist rejects far matches, nulling aux payload") {
    val main = Seq("france", "zzzqqqxxx").toDF("country")
    val aux = Seq(("france", 2), ("italy", 3)).toDF("name", "aux_id")
    val out = FuzzyJoin.fuzzyJoin(main, aux, Seq("country" -> "name"),
      maxDist = 0.5)
    val rows = out.collect().map(r =>
      r.getString(0) -> (r.getAs[Any]("name"), r.getAs[Boolean](FuzzyJoin.MatchInfoAccepted))).toMap
    assert(rows("france") === (("france", true)))
    assert(rows("zzzqqqxxx")._1 === null)
    assert(!rows("zzzqqqxxx")._2)
  }

  test("RECALL FLOOR: LSH candidate path agrees with the exact 1-NN on >= 90% of keys") {
    // the beyond-broadcast path (candidates = "lsh") must recover the exact
    // broadcast path's match for nearly all keys on the nation fixture —
    // the quality cost of the approximation is measured, not assumed
    val nation = TestSpark.table("nation").select($"n_name", $"n_regionkey")
    val guesses = TestSpark.table("customer")
      .join(TestSpark.table("nation"), $"c_nationkey" === $"n_nationkey", "left")
      .withColumn("nation_guess",
        when($"c_custkey" % 3 === 0, regexp_replace(lower($"n_name"), "[aeiou]", ""))
          .when($"c_custkey" % 3 === 1, lower($"n_name").substr(lit(1), length($"n_name") - 1))
          .otherwise(lower($"n_name")))
      .select($"c_custkey", $"nation_guess")
    val exact = FuzzyJoin.fuzzyJoin(guesses, nation, Seq("nation_guess" -> "n_name"))
      .select($"c_custkey", $"n_name".as("m_exact"))
    val lsh = FuzzyJoin.fuzzyJoin(guesses, nation, Seq("nation_guess" -> "n_name"),
        candidates = "lsh", lshTables = 16, lshPlanes = 4)
      .select($"c_custkey", $"n_name".as("m_lsh"))
    val agree = exact.join(lsh, Seq("c_custkey"))
      .agg(avg(($"m_exact" <=> $"m_lsh").cast("double"))).head().getDouble(0)
    assert(agree >= 0.9, s"LSH fuzzy-join agreement degraded to $agree")
  }

  test("fuzzyJoin numeric keys use standard-scaled euclidean distance") {
    val main = Seq(10.0, 55.0).toDF("x")
    val aux = Seq((10.0, "a"), (50.0, "b"), (100.0, "c")).toDF("ax", "tag")
    val out = FuzzyJoin.fuzzyJoin(main, aux, Seq("x" -> "ax"))
    val matches = out.collect().map(r => r.getDouble(0) -> r.getString(5)).toMap
    assert(matches(10.0) === "a")
    assert(matches(55.0) === "b")
  }

  test("guessFormat resolves day/month ambiguity via day>12 evidence") {
    // all days <= 12: month-first wins (candidate priority)
    assert(ToDatetime.guessFormat(Seq("01/02/2021", "03/04/2021"))
      === Some("MM/dd/yyyy"))
    // a day > 12 forces month-first to fail parsing -> day-first
    assert(ToDatetime.guessFormat(Seq("01/02/2021", "25/04/2021"))
      === Some("dd/MM/yyyy"))
    assert(ToDatetime.guessFormat(Seq("2021-05-06")) === Some("yyyy-MM-dd"))
    assert(ToDatetime.guessFormat(Seq("not a date")) === None)
    assert(ToDatetime.guessFormat(Nil) === None)
  }

  test("toDatetime parses with the guessed format; rejects garbage columns") {
    val df = Seq("2021-01-02 03:04:05", "2021-06-07 08:09:10").toDF("t")
    val out = ToDatetime.toDatetime(df, "t")
    assert(out.schema("t").dataType === TimestampType)
    assert(out.filter($"t".isNull).count() === 0)
    val garbage = Seq("abc", "def").toDF("t")
    assert(ToDatetime.toDatetime(garbage, "t").schema("t").dataType === StringType)
  }

  test("Cleaner drops uninformative columns and types the rest") {
    val messy = Seq(
      ("2021-01-02 03:04:05", "1.5", "N/A", "X", null: String),
      ("2021-06-07 08:09:10", "2.5", "ok", "X", null: String))
      .toDF("date_s", "num_s", "cat_s", "const_col", "null_col")
    val out = Cleaner.fitTransform(messy)
    assert(out.columns.toSeq === Seq("date_s", "num_s", "cat_s"))
    assert(out.schema("date_s").dataType === TimestampType)
    assert(out.schema("num_s").dataType === DoubleType)
    val cats = out.select("cat_s").as[Option[String]].collect().toSet
    assert(cats === Set(None, Some("ok")))
  }

  test("Cleaner date-parses a sparse column whose values start after the sample window") {
    // every non-null value sits past the SampleScanRows window, so the
    // batched head sample sees only nulls — the per-column non-null probe
    // fallback must still find them and accept the datetime parse
    val n = Cleaner.SampleScanRows + 6000
    val df = spark.range(n.toLong).select(
      col("id"),
      when(col("id") >= Cleaner.SampleScanRows,
        concat(lit("2021-01-02 03:04:"), lpad(col("id") % 60, 2, "0")))
        .otherwise(lit(null)).cast(StringType).as("late_dates"))
    val out = Cleaner.fitTransform(df)
    assert(out.schema("late_dates").dataType === TimestampType)
    assert(out.filter(col("late_dates").isNotNull).count() === 6000L)
  }

  test("minKBy returns the k smallest elements ascending, bounded per group") {
    val df = Seq((1, 5.0), (1, 1.0), (1, 3.0), (1, 2.0), (2, 9.0))
      .toDF("g", "v")
    val out = df.groupBy($"g")
      .agg(graft.functions.AggExprs.minKBy(struct($"v"), 3).as("top"))
      .select($"g", expr("transform(top, t -> t.v)").as("vs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(1) === Seq(1.0, 2.0, 3.0))
    assert(out(2) === Seq(9.0))
  }

  test("minKBy agrees with sort_array(collect_list) under shuffled partitions") {
    val df = spark.range(200).selectExpr("id % 7 as g",
      "cast(pmod(id * 2654435761, 1000) as double) as v").repartition(8)
    val viaMinK = df.groupBy($"g")
      .agg(graft.functions.AggExprs.minKBy(struct($"v"), 5).as("top"))
      .select($"g", expr("transform(top, t -> t.v)").as("vs"))
    val viaSort = df.groupBy($"g")
      .agg(expr("slice(array_sort(collect_list(v)), 1, 5)").as("vs"))
    val l = viaMinK.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val r = viaSort.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(l === r)
  }

  test("modeAgg: most frequent wins, smallest breaks ties, all-null is null") {
    val df = Seq(
      (1, Some("b")), (1, Some("b")), (1, Some("a")),
      (2, Some("z")), (2, Some("y")),          // tie -> smallest value
      (3, None), (3, None)                      // all null -> null
    ).toDF("g", "v")
    val out = df.groupBy($"g")
      .agg(graft.functions.AggExprs.modeAgg($"v").as("m"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) === "b")
    assert(out(2) === "y")
    assert(out(3) === null)
    // parity with the declarative two-level form under shuffled partitions
    val big = spark.range(1000).selectExpr("id % 13 as g",
      "concat('v', cast(pmod(id * 7, 5) as string)) as v").repartition(8)
    val viaAgg = big.groupBy($"g")
      .agg(graft.functions.AggExprs.modeAgg($"v").as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaTwoLevel = big.groupBy($"g", $"v").agg(count($"v").as("c"))
      .groupBy($"g").agg(expr("min_by(v, struct(-c, v))").as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaAgg === viaTwoLevel)
  }

  test("second_neighbor rescales by the distance to the 2nd nearest aux row") {
    val main = Seq("francd").toDF("country")
    val aux = Seq(("france", 1), ("franco", 2), ("italy", 3)).toDF("name", "aux_id")
    val out = FuzzyJoin.fuzzyJoin(main, aux, Seq("country" -> "name"),
        refStrategy = Some(FuzzyJoin.RefDist.SecondNeighbor(1)))
      .select(col(FuzzyJoin.MatchInfoDistance), col(FuzzyJoin.MatchInfoRescaled),
        col("name")).collect()(0)
    // rescaled = d(best) / d(second best) — strictly within (0, 1] here
    assert(out.getString(2) === "france" || out.getString(2) === "franco")
    assert(out.getDouble(1) > 0.0 && out.getDouble(1) <= 1.0)
    assert(out.getDouble(1) !== out.getDouble(0)) // per-row rescale applied
  }

  test("self_join_neighbor rescales by the matched aux row's own NN distance") {
    // aux has a tight pair (france/franco) and an outlier (zzz): a match to
    // the outlier rescales by a LARGE ref distance, a match to the tight
    // pair by a small one
    val main = Seq("francf", "zzy").toDF("country")
    val aux = Seq(("france", 1), ("franco", 2), ("zzz", 3)).toDF("name", "aux_id")
    val out = FuzzyJoin.fuzzyJoin(main, aux, Seq("country" -> "name"),
        refStrategy = Some(FuzzyJoin.RefDist.SelfJoinNeighbor(1)))
      .select(col("country"), col(FuzzyJoin.MatchInfoDistance),
        col(FuzzyJoin.MatchInfoRescaled), col("name"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("francf").getString(3).startsWith("franc"))
    assert(out("zzy").getString(3) === "zzz")
    // the outlier's self-NN distance is large, so its rescaled distance is
    // far smaller relative to raw than the tight pair's
    val tight = out("francf"); val far = out("zzy")
    assert(far.getDouble(2) / far.getDouble(1) <
      tight.getDouble(2) / tight.getDouble(1))
  }
}
