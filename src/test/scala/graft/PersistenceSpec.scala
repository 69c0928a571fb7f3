package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Cleaner
import graft.encoders.TableVectorizer
import graft.plans._

/** Fit → save → load → bit-identical transform, for every fitted artifact
  * (VERDICT r4 task 3; reference contract: learners pickle and reload,
  * skrub/_data_ops/_estimator.py:182).
  */
class PersistenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_persist_$tag").toString

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema === b.schema)
    assert(a.collect().toSeq === b.collect().toSeq)
  }

  private def messyFrame: DataFrame = Seq(
    (1L, "2021-03-01 10:00:00", "12.5", "ok"),
    (2L, "2021-03-02 11:30:00", "7.25", "N/A"),
    (3L, "2021-03-03 12:45:00", "99.0", "warn")
  ).toDF("id", "ts_str", "num_str", "status")

  test("Cleaner model round-trips through JSON save/load") {
    val dir = tmpDir("cleaner")
    val model = Cleaner.fit(messyFrame)
    Cleaner.save(model, dir)
    val loaded = Cleaner.load(dir)
    assert(loaded === model)
    sameRows(model.transform(messyFrame), loaded.transform(messyFrame))
  }

  test("TableVectorizer model round-trips through JSON save/load") {
    val dir = tmpDir("tv")
    val df = Seq((1L, "a", "2021-01-05 00:00:00"), (2L, "b", "2021-02-06 00:00:00"))
      .toDF("k", "cat", "d")
      .select(col("k"), col("cat"), to_timestamp(col("d")).as("d"))
    val model = TableVectorizer.fit(df)
    TableVectorizer.save(model, dir)
    val loaded = TableVectorizer.load(dir)
    assert(loaded === model)
    sameRows(model.transform(df), loaded.transform(df))
  }

  test("TargetEncoder model round-trips through JSON save/load") {
    val f = tmpDir("te") + "/te.json"
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0), (null, 5.0))
      .toDF("cat", "y")
    val model = graft.encoders.TargetEncoder.fit(df, "cat", "y", m = 2.0)
    graft.encoders.TargetEncoder.save(model, f)
    val loaded = graft.encoders.TargetEncoder.load(f)
    assert(loaded === model) // bit-identical state incl. the null sentinel
    // transform parity incl. an unseen category (falls back to fitted mu)
    val probe = Seq(("a", 1L), ("b", 2L), (null, 3L), ("zz", 4L))
      .toDF("cat", "id")
    sameRows(model.transform(probe).orderBy("id"),
      loaded.transform(probe).orderBy("id"))
  }

  test("KBins model round-trips through JSON save/load") {
    val f = tmpDir("kbins") + "/kbins.json"
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val model = graft.encoders.KBins.fit(df, "x", k = 4)
    graft.encoders.KBins.save(model, f)
    val loaded = graft.encoders.KBins.load(f)
    assert(loaded === model) // edges survive double round-trip bit-exactly
    sameRows(model.transform(df).orderBy("x"), loaded.transform(df).orderBy("x"))
  }

  test("TextEncoder model round-trips through JSON save/load") {
    import graft.encoders.{HashEmbeddingProvider, TextEncoder}
    val f = tmpDir("textenc") + "/textenc.json"
    val provider = HashEmbeddingProvider(16)
    val df = TestSpark.table("customer").select(col("c_name")).limit(200)
    val model = TextEncoder.fit(df, "c_name", provider, Some(4))
    TextEncoder.save(model, f)
    val loaded = TextEncoder.load(f)
    assert(loaded.outDim === model.outDim)
    assert(loaded.scale === model.scale) // double survives bit-exactly
    assert(loaded.pca.isDefined === model.pca.isDefined)
    (loaded.pca zip model.pca).foreach { case (l, m) =>
      assert(l.mean.toSeq === m.mean.toSeq)
      assert(l.basis.map(_.toSeq).toSeq === m.basis.map(_.toSeq).toSeq)
      assert(l.eigenvalues.toSeq === m.eigenvalues.toSeq)
    }
    // the provider is runtime state (like the reference re-loading the
    // language model after unpickling): same provider + loaded state must
    // transform bit-identically
    sameRows(
      TextEncoder.transform(df, "c_name", provider, model).orderBy("c_name"),
      TextEncoder.transform(df, "c_name", provider, loaded).orderBy("c_name"))
    // the no-PCA form round-trips too (absent "pca" key)
    val m2 = TextEncoder.fit(df, "c_name", provider, nComponents = None)
    val f2 = tmpDir("textenc2") + "/textenc2.json"
    TextEncoder.save(m2, f2)
    assert(TextEncoder.load(f2).pca.isEmpty && TextEncoder.load(f2).scale === m2.scale)
  }

  test("Drift PsiModel round-trips through JSON save/load") {
    val f = tmpDir("psi") + "/psi.json"
    // numeric (with NaN) and timestamp columns get >= catThreshold (30)
    // DISTINCT values so they genuinely fit as "num"/"ts" BinSpecs (an
    // 8-row fixture routed ALL columns to "cat" and never exercised the
    // min/max serialization — the blind spot that hid the NaN-edge bug),
    // plus a categorical with nulls — all three kinds round-trip
    val ref = (1 to 40).map { i =>
      (if (i == 3) Double.NaN else i.toDouble,
        f"2021-01-${(i % 28) + 1}%02d ${i % 24}%02d:00:00",
        if (i % 7 == 0) null else s"c${i % 3}")
    }.toDF("x", "ts_str", "cat")
      .select(col("x"), to_timestamp(col("ts_str")).as("ts"), col("cat"))
    val cur = Seq(
      (0.5, "2020-12-25 00:00:00", "c0"), (90.0, "2021-02-02 00:00:00", "d"),
      (3.0, "2021-01-11 00:00:00", null), (Double.NaN, "2021-01-15 00:00:00", "c1")
    ).toDF("x", "ts_str", "cat")
      .select(col("x"), to_timestamp(col("ts_str")).as("ts"), col("cat"))
    val model = graft.operators.Drift.fitPsi(ref, Seq("x", "ts", "cat"),
      nBins = 4, maxCats = 2)
    // the fixture must actually exercise all three spec kinds — and the
    // NaN in x must NOT poison the fitted numeric edges (NaN-safe min/max)
    assert(model.specs.map(s => s.col -> s.kind).toMap ===
      Map("x" -> "num", "ts" -> "ts", "cat" -> "cat"))
    val xSpec = model.specs.find(_.col == "x").get
    assert(xSpec.min === 1.0 && xSpec.max === 40.0,
      s"NaN leaked into the numeric edges: $xSpec")
    graft.operators.Drift.savePsi(model, f)
    val loaded = graft.operators.Drift.loadPsi(f, spark)
    assert(loaded.specs === model.specs) // bin plans survive bit-exactly
    assert(loaded.eps === model.eps)
    // scoring parity: the reloaded model bins `cur` (incl. below-range,
    // NaN, null, and unseen-category rows) identically
    sameRows(model.score(cur), loaded.score(cur))
  }

  test("TabularPipeline regression model survives save/load with identical predictions") {
    val dir = tmpDir("pipeline")
    val train = (1 to 200).map(i => (i.toLong, (i % 7).toString, i * 2.0 + (i % 3)))
      .toSeq.toDF("k", "cat", "y")
    val model = TabularPipeline.fit(train, "y", TabularPipeline.Regression, maxIter = 5)
    TabularPipeline.save(model, dir)
    val loaded = TabularPipeline.load(dir)
    sameRows(model.predict(train).orderBy("k"), loaded.predict(train).orderBy("k"))
  }

  test("Learner with a persistent stage: fit, save, load, identical transform") {
    // frozen-vocabulary estimator with an explicit JSON state
    val est = new PersistentEstimator {
      def fit(df: DataFrame): Transformer = {
        val vocab = df.select(col("cat")).filter(col("cat").isNotNull)
          .distinct().orderBy(col("cat")).collect().map(_.getString(0)).toSeq
        mk(vocab)
      }
      def loadTransformer(data: String): Transformer =
        mk(Json.parse(data).asInstanceOf[List[Any]].map(_.asInstanceOf[String]))
      private def mk(vocab: Seq[String]): Transformer = new PersistentTransformer {
        def saveData: String = Json.arr(vocab.map(Json.str))
        def transform(d: DataFrame): DataFrame =
          d.select(col("k") +: vocab.map(v =>
            when(col("cat") === v, 1.0).otherwise(0.0).as(s"cat_$v")): _*)
      }
    }
    val plan = Apply(MarkX(Var("in")), est)
    val full = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "cat")
    val part = Seq((4L, "a")).toDF("k", "cat")

    val learner = Plan.makeLearner(plan)
    learner.fit(Map("in" -> full))
    val dir = tmpDir("learner")
    learner.save(dir)

    val reloaded = Plan.loadLearner(plan, dir)
    // the reloaded learner must keep the FULL fitted vocabulary: transform
    // on a frame containing only "a" still emits cat_b / cat_c columns
    val out = reloaded.transform(Map("in" -> part))
    assert(out.columns.toSeq === Seq("k", "cat_a", "cat_b", "cat_c"))
    sameRows(learner.transform(Map("in" -> part)), out)
  }

  test("unfitted learner refuses to save; non-persistent stage fails loudly") {
    val opaque = new Estimator {
      def fit(df: DataFrame): Transformer = new Transformer {
        def transform(d: DataFrame): DataFrame = d
      }
    }
    val plan = Apply(Var("in"), opaque)
    val learner = Plan.makeLearner(plan)
    intercept[IllegalStateException] { learner.save(tmpDir("bad1")) }
    learner.fit(Map("in" -> Seq((1L, "a")).toDF("k", "cat")))
    intercept[IllegalArgumentException] { learner.save(tmpDir("bad2")) }
  }
}
