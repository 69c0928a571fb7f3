package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans._

/** Choice grids, grid search over plans, deterministic k-fold CV. */
class ChoicesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("grid is the ordered cross product; default is the first outcome") {
    val c1 = Choices.chooseFrom("a", Seq(1, 2))
    val c2 = Choices.chooseBool("b", default = true)
    val g = Choices.grid(Seq(c1, c2))
    assert(g.length === 4)
    assert(g.head === Map("a" -> 1, "b" -> true)) // all-defaults first
    assert(c1.default === 1)
  }

  test("chooseFloat log spacing and chooseInt dedup") {
    val f = Choices.chooseFloat("lr", 0.01, 1.0, 3, log = true)
    assert(math.abs(f.outcomes(1) - 0.1) < 1e-9)
    val i = Choices.chooseInt("k", 1, 3, 5)
    assert(i.outcomes === Seq(1, 2, 3)) // rounded duplicates removed
  }

  test("discretized numeric default is the MIDDLE grid element (reference)") {
    // _choosing.py:794 default() -> grid[(len-1)//2]
    val f = Choices.chooseFloat("lr", 0.0, 1.0, 5)
    assert(f.default === 0.5)
    val i = Choices.chooseInt("k", 1, 3, 5) // grid [1,2,3] after dedup
    assert(i.default === 2)
    // categorical default stays FIRST outcome
    assert(Choices.chooseFrom("m", Seq("a", "b", "c")).default === "a")
  }

  test("continuous ranges: log midpoint default, bounded deterministic draws") {
    // _choosing.py:741-752: default = exp(mean(log(low), log(high)))
    val lr = Choices.chooseFloatRange("lr", 1e-4, 1e-0, log = true)
    assert(math.abs(lr.default - 1e-2) < 1e-12)
    val k = Choices.chooseIntRange("k", 1, 100, log = true)
    assert(k.default === 10.0)
    // explicit default override wins
    assert(Choices.chooseFloatRange("d", 0.0, 1.0,
      default = Some(0.9)).default === 0.9)
    // draws stay in range; log draws spread across decades; int draws can
    // reach `high` (the +1-1e-6 truncation offset)
    val rng = new scala.util.Random(7L)
    val draws = (1 to 2000).map(_ => lr.draw(rng))
    assert(draws.forall(v => v >= 1e-4 && v <= 1.0))
    assert(draws.count(_ < 1e-2) > 600, "log draws should split decades evenly")
    val rngI = new scala.util.Random(7L)
    val intDraws = (1 to 2000).map(_ => Choices.chooseIntRange("n", 1, 4).draw(rngI))
    assert(intDraws.toSet === Set(1.0, 2.0, 3.0, 4.0))
    // deterministic under the same seed
    val a = Choices.randomDraws(Seq(Choices.chooseFrom("m", Seq("x", "y"))),
      Seq(lr), 5, seed = 3L)
    val b = Choices.randomDraws(Seq(Choices.chooseFrom("m", Seq("x", "y"))),
      Seq(lr), 5, seed = 3L)
    assert(a === b)
    assert(a.forall(m => m.contains("m") && m.contains("lr")))
  }

  test("optional: Some(value)/None choice with flippable default") {
    val o = Choices.optional("reduce", "pca")
    assert(o.outcomes === Seq(Some("pca"), None))
    assert(o.default === Some("pca"))
    assert(Choices.optional("reduce", "pca", defaultNone = true).default === None)
  }

  test("Config: thread-local context overrides and restores; wires thresholds") {
    import graft.ops.Config
    assert(Config.get.cardinalityThreshold === 40)
    val out = Config.context(Config.Settings(cardinalityThreshold = 2)) {
      assert(Config.get.cardinalityThreshold === 2)
      // TableReport reads the active config: a 3-distinct column flags
      // high-card under threshold 2
      graft.operators.TableReport.summarize(
          Seq("a", "b", "c").toDF("v")).collect()
        .map(r => r.getAs[Boolean]("is_high_cardinality")).head
    }
    assert(out === true)
    assert(Config.get.cardinalityThreshold === 40) // restored
    intercept[IllegalArgumentException] {
      Config.Settings(enableSubsampling = "sometimes")
    }
  }

  test("enableSubsampling config gates fit and preview subsampling") {
    import graft.ops.Config
    val x = (1 to 100).map(i => (i, i * 2.0)).toDF("id", "v")
    val plan = Var("x").subsample(10).transform(df => df)
    // force: a plain fitTransform subsamples without the per-call opt-in
    Config.context(Config.Settings(enableSubsampling = "force")) {
      assert(Plan.makeLearner(plan).fitTransform(Map("x" -> x)).count() === 10)
    }
    // disable: even preview sees everything
    Config.context(Config.Settings(enableSubsampling = "disable")) {
      assert(Plan.makeLearner(plan).preview(Map("x" -> x)).count() === 100)
    }
    // default: per-call request honored (pinned elsewhere too)
    assert(Plan.makeLearner(plan).fitTransform(Map("x" -> x)).count() === 100)
  }

  test("gridSearch fits each combination and ranks by score") {
    // learnable toy: pick the cardinality threshold that routes v to one-hot
    val fitDf = (1 to 100).map(i => "v" + i % 5).toDF("v")
    def planFor(p: Map[String, Any]): Plan =
      Var("x").apply(Stages.tableVectorizer(
        cardinalityThreshold = p("thr").asInstanceOf[Int]))
    val results = Choices.gridSearch(
      Seq(Choices.chooseFrom("thr", Seq(2, 40))),
      planFor,
      fitEnv = Map("x" -> fitDf),
      valEnv = Map("x" -> fitDf),
      // score = number of ONE-HOT output columns ("v_v<i>"; thr=2 routes to
      // minhash instead, yielding none)
      score = df => df.columns.count(_.startsWith("v_v")).toDouble)
    assert(results.head.params("thr") === 40)
    assert(results.head.score > results.last.score)
  }

  test("randomizedSearch samples continuous ranges and ranks by score") {
    val fitDf = (1 to 100).map(i => "v" + i % 5).toDF("v")
    def planFor(p: Map[String, Any]): Plan =
      Var("x").apply(Stages.tableVectorizer(
        cardinalityThreshold = p("thr").asInstanceOf[Long].toInt))
    val results = Choices.randomizedSearch(
      Nil, Seq(Choices.chooseIntRange("thr", 2, 40)),
      planFor, Map("x" -> fitDf), Map("x" -> fitDf),
      score = df => df.columns.count(_.startsWith("v_v")).toDouble,
      n = 6, seed = 11L)
    assert(results.length === 6)
    assert(results.map(_.score).sliding(2).forall(s => s.head >= s.last))
    // any draw with thr > 5 one-hots the 5-distinct column and wins
    assert(results.head.score > 0)
  }

  test("adaptiveSearch (TPE) concentrates trials near the optimum") {
    val x = Seq(1).toDF("one")
    // objective over a log range + a binary choice: optimum at lr=1e-2,
    // mode="good"; the plan writes the params into columns so `score`
    // (which only sees the frame) can read them back
    def planFor(p: Map[String, Any]): Plan = {
      val lr = p("lr").asInstanceOf[Double]
      val pen = if (p("mode") == "good") 0.0 else 4.0
      Var("x").transform(df =>
        df.withColumn("lr", lit(lr)).withColumn("pen", lit(pen)))
    }
    val evalLog = scala.collection.mutable.ArrayBuffer[Double]()
    def score(df: org.apache.spark.sql.DataFrame): Double = {
      val r = df.head()
      val lr = r.getDouble(r.fieldIndex("lr"))
      val d = math.log10(lr) + 2 // 0 at lr = 1e-2
      evalLog += math.abs(d)
      -(d * d) - r.getDouble(r.fieldIndex("pen"))
    }
    val lrRange = Choices.chooseFloatRange("lr", 1e-4, 1.0, log = true)
    val mode = Choices.chooseFrom("mode", Seq("bad", "good"))
    val results = Choices.adaptiveSearch(Seq(mode), Seq(lrRange), planFor,
      Map("x" -> x), Map("x" -> x), score,
      nTrials = 24, nStartup = 6, seed = 5L)
    assert(results.length === 24)
    // concentration: post-startup trials sit closer to the optimum than the
    // random startup trials on average
    val startup = evalLog.take(6)
    val guided = evalLog.drop(12)
    assert(guided.sum / guided.length < startup.sum / startup.length,
      s"guided=${guided.mkString(",")} startup=${startup.mkString(",")}")
    // the discrete dimension is learned too: best results pick "good"
    assert(results.take(3).forall(_.params("mode") == "good"))
    // beats pure random search with the same budget and seed
    val rand = Choices.randomizedSearch(Seq(mode), Seq(lrRange), planFor,
      Map("x" -> x), Map("x" -> x), score, n = 24, seed = 5L)
    assert(results.head.score >= rand.head.score)
  }

  test("crossValidate: deterministic folds, refit per fold") {
    val x = (1 to 300).map(i => (i, "c" + i % 3)).toDF("id", "cat")
    def planFor(p: Map[String, Any]): Plan =
      Var("x").apply(Stages.tableVectorizer())
    val r1 = Choices.crossValidate(Map.empty, planFor,
      Map("x" -> x), "x", k = 3, score = _.count().toDouble)
    val r2 = Choices.crossValidate(Map.empty, planFor,
      Map("x" -> x.repartition(7)), "x", k = 3, score = _.count().toDouble)
    assert(r1.foldScores.sum === 300.0)         // folds partition the data
    assert(r1.foldScores === r2.foldScores)     // stable under repartition
    assert(r1.foldScores.forall(_ > 50))        // roughly balanced
  }

  test("halvingSearch prunes on data fractions and converges to the best") {
    val x = (1 to 200).map(i => (i, "v" + i % 5)).toDF("id", "v")
    def planFor(p: Map[String, Any]): Plan =
      Var("x").apply(Stages.tableVectorizer(
        cardinalityThreshold = p("thr").asInstanceOf[Int]))
    val results = Choices.halvingSearch(
      Seq(Choices.chooseFrom("thr", Seq(2, 10, 40))),
      planFor,
      fitEnv = Map("x" -> x),
      valEnv = Map("x" -> x),
      score = df => df.columns.count(_.startsWith("v_v")).toDouble,
      xVar = "x", splitKeys = Seq("id"),
      nCandidates = 3, factor = 2, minFraction = 0.25)
    assert(results.head.params("thr") === 40)
    // deterministic: same call, same ranking
    val again = Choices.halvingSearch(
      Seq(Choices.chooseFrom("thr", Seq(2, 10, 40))),
      planFor, Map("x" -> x), Map("x" -> x),
      df => df.columns.count(_.startsWith("v_v")).toDouble,
      "x", Seq("id"), nCandidates = 3, factor = 2, minFraction = 0.25)
    assert(again.map(_.params) === results.map(_.params))
  }

  test("subsample node gates on mode: preview on, transform off") {
    val x = (1 to 100).map(i => (i, i * 2.0)).toDF("id", "v")
    val plan = Var("x").subsample(10).transform(df => df)
    val learner = Plan.makeLearner(plan)
    // preview subsamples without touching the learner's fitted state
    assert(learner.preview(Map("x" -> x)).count() === 10)
    intercept[IllegalStateException] { learner.transform(Map("x" -> x)) }
    // fit without subsample sees everything; transform never subsamples
    learner.fit(Map("x" -> x))
    assert(learner.transform(Map("x" -> x)).count() === 100)
    // opt-in subsampled fit (reference enable_subsampling='force')
    assert(learner.fitTransform(Map("x" -> x), subsample = true).count() === 10)
    // 'random' is deterministic: same rows every evaluation
    val r = Var("x").subsample(10, how = "random")
    val a = Plan.makeLearner(r).preview(Map("x" -> x)).select("id")
      .as[Int].collect().sorted
    val b = Plan.makeLearner(r).preview(Map("x" -> x.repartition(5)))
      .select("id").as[Int].collect().sorted
    assert(a.toSeq === b.toSeq)
  }
}
