package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.encoders.{OnnxEmbeddingProvider, OnnxMini, TextEncoder}

/** The real-ONNX provider path (VERDICT r14 task 4): actual ONNX bytes
  * (hand-rolled protobuf wire writer) parsed by the hand-rolled reader,
  * evaluated as batched matmuls on executors behind the
  * `EmbeddingProvider` contract — round-trip, hand-computed forward
  * parity, Gemm/transB (the torch.onnx nn.Linear export shape), batching
  * invariance, the per-JVM parse cache, and the unique-string cache
  * hit-rate (the model prices exactly n_distinct rows).
  */
class OnnxMiniSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val layers = OnnxMini.demoWeights(8, 6, 4)

  /** Reference forward pass, straight-line: relu(x W0 + b0) W1 + b1. */
  private def refForward(x: Array[Double]): Array[Double] = {
    val (w0, b0, _) = layers(0)
    val (w1, b1, _) = layers(1)
    val h = Array.tabulate(6) { k =>
      val s = (0 until 8).map(j => x(j) * w0(j)(k)).sum + b0(k)
      if (s > 0) s else 0.0
    }
    Array.tabulate(4)(m => (0 until 6).map(k => h(k) * w1(k)(m)).sum + b1(m))
  }

  test("writeMlp -> parse round-trip: graph structure, weights, inDim") {
    val bytes = OnnxMini.writeMlp(layers)
    val m = OnnxMini.parse(bytes)
    assert(m.inputName === "input" && m.outputName === "output")
    assert(m.nodes.map(_.op) === Seq("MatMul", "Add", "Relu", "MatMul", "Add"))
    assert(m.inDim === 8)
    assert(m.inits("w0").dims === Seq(8, 6))
    assert(m.inits("b1").data.toSeq === layers(1)._2.toSeq)
    // weights survive the float32 round-trip exactly (dyadic by design)
    assert(m.inits("w1").data.toSeq === layers(1)._1.flatten.toSeq)
  }

  test("forward == hand-computed reference; Gemm/transB graph (the " +
    "torch.onnx nn.Linear shape) evaluates identically") {
    val xs = Array(
      Array(3.0, 0.0, 1.0, 4.0, 0.0, 2.0, 0.0, 5.0),
      Array(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Array(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0))
    val mm = OnnxMini.parse(OnnxMini.writeMlp(layers))
    val viaMatmul = mm.forward(xs)
    xs.zip(viaMatmul).foreach { case (x, y) =>
      assert(y.toSeq === refForward(x).toSeq)
    }
    val mg = OnnxMini.parse(OnnxMini.writeMlp(layers, gemm = true))
    assert(mg.nodes.map(_.op) === Seq("Gemm", "Relu", "Gemm"))
    assert(mg.inDim === 8)
    assert(mg.forward(xs).map(_.toSeq).toSeq ===
      viaMatmul.map(_.toSeq).toSeq)
    // out-of-scope ops fail LOUDLY at parse, never misread
    val e = intercept[Exception] {
      OnnxMini.parse(OnnxMini.writeMlp(
        Seq((Array(Array(1.0)), Array(0.0), "Softmax"))))
    }
    assert(e.getMessage.contains("unsupported op"))
  }

  test("provider: batch-size invariance, per-JVM parse cache, and the " +
    "unique-string hit rate — the model prices exactly n_distinct rows") {
    val bytes = OnnxMini.writeMlp(layers)
    // a corpus with 3 distinct texts duplicated to 60 rows
    val texts = Seq("alpha beta gamma", "delta epsilon", "zeta eta theta")
    val docs = (0 until 60).map(i => (i.toLong, texts(i % 3)))
      .toDF("doc_id", "text")
    val distinctVals = docs
      .select(coalesce($"text".cast("string"), lit("")).as("value"))
      .distinct()
    def embedMap(bs: Int) =
      OnnxEmbeddingProvider(bytes, 8, 4, batchSize = bs)
        .embed(distinctVals).collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    val e1 = embedMap(1)
    assert(e1.size === 3)
    assert(embedMap(2) === e1, "batch boundaries must not change results")
    assert(embedMap(1000) === e1)
    // parse cache: the three embeds above share one parsed model per JVM
    // (local mode: driver == executor)
    val before = OnnxMini.parseCount
    embedMap(7)
    assert(OnnxMini.parseCount === before,
      "same bytes re-embedded must hit the JVM parse cache")
    // unique-string hit rate: TextEncoder embeds DISTINCT values only,
    // so the forward pass sees 3 rows for the 60-row corpus
    val acc = spark.sparkContext.longAccumulator("onnx_rows")
    val prov = OnnxEmbeddingProvider(bytes, 8, 4, batchSize = 2,
      rowsSeen = Some(acc))
    val enc = TextEncoder.encode(docs, "text", prov, nComponents = Some(2))
    assert(enc.count() === 60)
    assert((0 until 2).forall(i => enc.columns.contains(s"text_$i")))
    // fit embeds distinct values once, transform once more: 2 x 3 rows
    assert(acc.value === 6L,
      s"forward pass priced ${acc.value} rows for 3 distinct values " +
        "across fit+transform — the unique-string cache is not engaged")
  }

  test("provider forward matches the oracle arithmetic on real features " +
    "(the q_onnx_embed contract: exact dyadic math, x 2^16 integers)") {
    val bytes = OnnxMini.writeMlp(layers)
    val docs = TestSpark.table("documents").limit(50)
    val vals = docs
      .select(coalesce($"text".cast("string"), lit("")).as("value"))
      .distinct()
    val out = OnnxEmbeddingProvider(bytes, 8, 4).embed(vals)
      .select($"value", $"embedding")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val e = r.getSeq[Double](1)
      assert(e.length === 4)
      e.foreach { v =>
        val scaled = v * 65536.0
        assert(scaled == math.rint(scaled),
          s"non-integer micro feature $scaled — exactness broken")
      }
    }
  }
}
