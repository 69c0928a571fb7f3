package graft.encoders

import java.nio.charset.StandardCharsets.UTF_8

/** Minimal ONNX model reader/writer + evaluator for small feed-forward
  * (MLP-family) models — the real-provider half of the TextEncoder
  * integration (VERDICT r14 task 4). The reference loads a pretrained
  * sentence transformer through a vendored runtime
  * (skrub/_text_encoder.py:22-446); this environment has no model zoo,
  * no network, and a frozen dependency set, so the provider contract is
  * exercised against REAL ONNX BYTES with a hand-rolled reader instead —
  * the executor-side plumbing (broadcastable bytes, per-JVM parse cache,
  * batched forward passes) is exactly what a full runtime would sit
  * behind, and a real exported model whose graph stays inside the op
  * subset below loads as-is.
  *
  * Scope (loud on violation, never silent): a topologically-sorted graph
  * of {MatMul, Gemm, Add, Sub, Mul, Div, Relu, Tanh, Sigmoid, Identity}
  * over float32/float64 2-D tensors. Parsing speaks the protobuf wire
  * format directly (varint + length-delimited fields) for the subset of
  * ModelProto/GraphProto/NodeProto/TensorProto/AttributeProto such
  * models use — field numbers below are the public onnx.proto schema's.
  *
  * Evaluation is in Double throughout (float32 initializers upcast
  * exactly), so a model with dyadic weights over integer-valued features
  * is bit-reproducible — which is what lets `q_onnx_embed` carry a full
  * DuckDB hash oracle instead of a rows-only check.
  */
object OnnxMini {

  /** Row-major 2-D (or 1-D bias) tensor. */
  final case class Tensor(dims: Seq[Int], data: Array[Double]) {
    def rows: Int = if (dims.length == 2) dims.head else 1
    def cols: Int = dims.last
  }

  final case class NodeDef(op: String, inputs: Seq[String],
                           outputs: Seq[String], attrs: Map[String, Double])

  final case class Model(inputName: String, outputName: String,
                         nodes: Seq[NodeDef], inits: Map[String, Tensor]) {
    /** Input width: the cols of the first weight consumed together with
      * the graph input (MatMul) or its rows (Gemm transB=1).
      */
    val inDim: Int = nodes.collectFirst {
      case n if (n.op == "MatMul" || n.op == "Gemm") &&
        n.inputs.contains(inputName) =>
        val w = inits(n.inputs.filter(_ != inputName).head)
        if (n.op == "Gemm" && n.attrs.getOrElse("transB", 0.0) == 1.0)
          w.cols else w.rows
    }.getOrElse(sys.error("OnnxMini: no MatMul/Gemm consumes the input"))

    /** Batched forward pass: [n, inDim] -> [n, outDim]. */
    def forward(batch: Array[Array[Double]]): Array[Array[Double]] =
      eval(this, batch)
  }

  // ---- protobuf wire primitives (proto3 wire format, public spec) ----

  private final class Reader(val b: Array[Byte], var p: Int, val end: Int) {
    def hasNext: Boolean = p < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        val x = b(p); p += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      v
    }
    def tag(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }
    def sub(): Reader = {
      val l = varint().toInt; val r = new Reader(b, p, p + l); p += l; r
    }
    def bytesOf(): Array[Byte] = {
      val l = varint().toInt
      val out = java.util.Arrays.copyOfRange(b, p, p + l); p += l; out
    }
    def str(): String = new String(bytesOf(), UTF_8)
    def fixed32(): Int = {
      val v = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
      p += 4; v
    }
    def fixed64(): Long = {
      var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
      p += 8; v
    }
    def skip(wt: Int): Unit = wt match {
      case 0 => varint()
      case 1 => p += 8
      case 2 =>
        // two statements: `p += varint()` would capture the OLD p before
        // varint() advances it (left-to-right evaluation)
        val l = varint().toInt; p += l
      case 5 => p += 4
      case other => sys.error(s"OnnxMini: unsupported wire type $other")
    }
  }

  private final class Writer {
    val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def tag(field: Int, wt: Int): Unit = varint((field.toLong << 3) | wt)
    def lenDelim(field: Int, bytes: Array[Byte]): Unit = {
      tag(field, 2); varint(bytes.length.toLong); out.write(bytes)
    }
    def str(field: Int, s: String): Unit = lenDelim(field, s.getBytes(UTF_8))
    def int(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def bytes: Array[Byte] = out.toByteArray
  }

  // ---- parse (onnx.proto field numbers cited inline) ----

  /** Parse ONNX model bytes. Throws (never misreads) on ops/types outside
    * the documented subset.
    */
  def parse(bytes: Array[Byte]): Model = {
    val r = new Reader(bytes, 0, bytes.length)
    var graph: Reader = null
    while (r.hasNext) r.tag() match {
      case (7, 2) => graph = r.sub() // ModelProto.graph
      case (_, wt) => r.skip(wt)
    }
    require(graph != null, "OnnxMini: ModelProto has no graph")
    parseGraph(graph)
  }

  private def parseGraph(g: Reader): Model = {
    val nodes = Seq.newBuilder[NodeDef]
    val inits = Map.newBuilder[String, Tensor]
    val inputs = Seq.newBuilder[String]
    val outputs = Seq.newBuilder[String]
    while (g.hasNext) g.tag() match {
      case (1, 2) => nodes += parseNode(g.sub()) // GraphProto.node
      case (5, 2) => inits += parseTensor(g.sub()) // GraphProto.initializer
      case (11, 2) => inputs += parseValueInfoName(g.sub()) // .input
      case (12, 2) => outputs += parseValueInfoName(g.sub()) // .output
      case (_, wt) => g.skip(wt)
    }
    val initMap = inits.result()
    // some exporters list initializers among graph inputs: the real input
    // is the one with no initializer
    val realIn = inputs.result().filterNot(initMap.contains)
    require(realIn.length == 1,
      s"OnnxMini: expected exactly one non-initializer input, got $realIn")
    val outs = outputs.result()
    require(outs.nonEmpty, "OnnxMini: graph has no output")
    Model(realIn.head, outs.head, nodes.result(), initMap)
  }

  private def parseValueInfoName(v: Reader): String = {
    var name = ""
    while (v.hasNext) v.tag() match {
      case (1, 2) => name = v.str() // ValueInfoProto.name
      case (_, wt) => v.skip(wt)
    }
    name
  }

  private val SupportedOps = Set("MatMul", "Gemm", "Add", "Sub", "Mul",
    "Div", "Relu", "Tanh", "Sigmoid", "Identity")

  private def parseNode(n: Reader): NodeDef = {
    val ins = Seq.newBuilder[String]
    val outs = Seq.newBuilder[String]
    var op = ""
    val attrs = Map.newBuilder[String, Double]
    while (n.hasNext) n.tag() match {
      case (1, 2) => ins += n.str() // NodeProto.input
      case (2, 2) => outs += n.str() // NodeProto.output
      case (4, 2) => op = n.str() // NodeProto.op_type
      case (5, 2) => attrs ++= parseAttr(n.sub()) // NodeProto.attribute
      case (_, wt) => n.skip(wt)
    }
    require(SupportedOps.contains(op),
      s"OnnxMini: unsupported op '$op' (supported: ${SupportedOps.toSeq.sorted.mkString(", ")})")
    NodeDef(op, ins.result(), outs.result(), attrs.result())
  }

  private def parseAttr(a: Reader): Option[(String, Double)] = {
    var name = ""; var value = Option.empty[Double]
    while (a.hasNext) a.tag() match {
      case (1, 2) => name = a.str() // AttributeProto.name
      case (2, 5) => // AttributeProto.f (float)
        value = Some(java.lang.Float.intBitsToFloat(a.fixed32()).toDouble)
      case (3, 0) => value = Some(a.varint().toDouble) // AttributeProto.i
      case (_, wt) => a.skip(wt)
    }
    value.map(name -> _)
  }

  private def parseTensor(t: Reader): (String, Tensor) = {
    val dims = Seq.newBuilder[Long]
    var dtype = 1 // TensorProto.DataType.FLOAT
    var name = ""
    var floats = Array.empty[Double]
    var raw = Array.empty[Byte]
    while (t.hasNext) t.tag() match {
      case (1, 0) => dims += t.varint() // TensorProto.dims
      case (1, 2) => // packed dims
        val s = t.sub(); while (s.hasNext) dims += s.varint()
      case (2, 0) => dtype = t.varint().toInt // TensorProto.data_type
      case (4, 5) => // TensorProto.float_data, unpacked
        floats :+= java.lang.Float.intBitsToFloat(t.fixed32()).toDouble
      case (4, 2) => // float_data, packed
        val s = t.sub()
        val buf = Array.newBuilder[Double]
        while (s.hasNext)
          buf += java.lang.Float.intBitsToFloat(s.fixed32()).toDouble
        floats = buf.result()
      case (10, 1) => // TensorProto.double_data, unpacked
        floats :+= java.lang.Double.longBitsToDouble(t.fixed64())
      case (10, 2) => // double_data, packed
        val s = t.sub()
        val buf = Array.newBuilder[Double]
        while (s.hasNext)
          buf += java.lang.Double.longBitsToDouble(s.fixed64())
        floats = buf.result()
      case (8, 2) => name = t.str() // TensorProto.name
      case (9, 2) => raw = t.bytesOf() // TensorProto.raw_data
      case (_, wt) => t.skip(wt)
    }
    require(dtype == 1 || dtype == 11,
      s"OnnxMini: tensor '$name' dtype $dtype unsupported (FLOAT/DOUBLE only)")
    val data =
      if (floats.nonEmpty) floats
      else if (raw.nonEmpty) {
        val bb = java.nio.ByteBuffer.wrap(raw)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        if (dtype == 1) Array.fill(raw.length / 4)(bb.getFloat.toDouble)
        else Array.fill(raw.length / 8)(bb.getDouble)
      } else Array.empty[Double]
    val d = dims.result().map(_.toInt)
    require(d.product == data.length,
      s"OnnxMini: tensor '$name' dims $d vs ${data.length} values")
    name -> Tensor(d, data)
  }

  // ---- eval ----

  private def eval(m: Model, batch: Array[Array[Double]])
      : Array[Array[Double]] = {
    val n = batch.length
    if (n == 0) return Array.empty
    val inDim = m.inDim
    batch.foreach(r => require(r.length == inDim,
      s"OnnxMini: input row width ${r.length} != model inDim $inDim"))
    val env = scala.collection.mutable.HashMap.empty[String, Tensor]
    env ++= m.inits
    env(m.inputName) = Tensor(Seq(n, inDim), batch.flatten)
    for (node <- m.nodes) {
      def in(i: Int): Tensor = env.getOrElse(node.inputs(i),
        sys.error(s"OnnxMini: '${node.inputs(i)}' undefined at ${node.op}"))
      val out = node.op match {
        case "MatMul" => matmul(in(0), in(1), 1.0)
        case "Gemm" =>
          val alpha = node.attrs.getOrElse("alpha", 1.0)
          val beta = node.attrs.getOrElse("beta", 1.0)
          require(node.attrs.getOrElse("transA", 0.0) == 0.0,
            "OnnxMini: Gemm transA unsupported")
          val b0 = in(1)
          val b = if (node.attrs.getOrElse("transB", 0.0) == 1.0)
            transpose(b0) else b0
          val ab = matmul(in(0), b, alpha)
          if (node.inputs.length > 2) broadcastBinOp(ab, in(2),
            (x, y) => x + beta * y)
          else ab
        case "Add" => broadcastBinOp(in(0), in(1), _ + _)
        case "Sub" => broadcastBinOp(in(0), in(1), _ - _)
        case "Mul" => broadcastBinOp(in(0), in(1), _ * _)
        case "Div" => broadcastBinOp(in(0), in(1), _ / _)
        case "Relu" => unary(in(0), x => if (x > 0) x else 0.0)
        case "Tanh" => unary(in(0), math.tanh)
        case "Sigmoid" => unary(in(0), x => 1.0 / (1.0 + math.exp(-x)))
        case "Identity" => in(0)
      }
      env(node.outputs.head) = out
    }
    val y = env.getOrElse(m.outputName,
      sys.error(s"OnnxMini: output '${m.outputName}' never produced"))
    require(y.rows == n, s"OnnxMini: output rows ${y.rows} != batch $n")
    Array.tabulate(n)(i =>
      java.util.Arrays.copyOfRange(y.data, i * y.cols, (i + 1) * y.cols))
  }

  private def transpose(t: Tensor): Tensor = {
    require(t.dims.length == 2, "OnnxMini: transpose needs 2-D")
    val (r, c) = (t.dims.head, t.dims(1))
    val out = new Array[Double](r * c)
    var i = 0
    while (i < r) {
      var j = 0
      while (j < c) { out(j * r + i) = t.data(i * c + j); j += 1 }
      i += 1
    }
    Tensor(Seq(c, r), out)
  }

  private def matmul(a: Tensor, b: Tensor, alpha: Double): Tensor = {
    require(a.cols == b.rows,
      s"OnnxMini: matmul ${a.dims} x ${b.dims}")
    val (n, k, mm) = (a.rows, a.cols, b.cols)
    val out = new Array[Double](n * mm)
    var i = 0
    while (i < n) {
      var kk = 0
      while (kk < k) {
        val av = a.data(i * k + kk) * alpha
        if (av != 0.0) {
          var j = 0
          while (j < mm) {
            out(i * mm + j) += av * b.data(kk * mm + j); j += 1
          }
        }
        kk += 1
      }
      i += 1
    }
    Tensor(Seq(n, mm), out)
  }

  private def broadcastBinOp(a: Tensor, b: Tensor,
                             f: (Double, Double) => Double): Tensor = {
    if (a.dims == b.dims)
      Tensor(a.dims, Array.tabulate(a.data.length)(i => f(a.data(i), b.data(i))))
    else {
      // row broadcast: [n, m] op [m] (or [1, m])
      require(b.data.length == a.cols,
        s"OnnxMini: cannot broadcast ${b.dims} onto ${a.dims}")
      val m = a.cols
      Tensor(a.dims, Array.tabulate(a.data.length)(i =>
        f(a.data(i), b.data(i % m))))
    }
  }

  private def unary(a: Tensor, f: Double => Double): Tensor =
    Tensor(a.dims, a.data.map(f))

  // ---- write (fixture/export path) ----

  /** Serialize an MLP as ONNX bytes: per layer a (weights [k, m], bias
    * [m], activation) triple, activation one of "Relu"/"Tanh"/"Sigmoid"/
    * "" (none). float32 initializers (the standard export dtype; dyadic
    * weights stay exact). With `gemm = true` each layer is emitted as
    * one Gemm node with transB=1 over [m, k]-stored weights — the shape
    * torch.onnx exports for nn.Linear — instead of MatMul+Add. The
    * result round-trips through `parse` and any conforming ONNX runtime.
    */
  def writeMlp(layers: Seq[(Array[Array[Double]], Array[Double], String)],
               gemm: Boolean = false): Array[Byte] = {
    require(layers.nonEmpty, "OnnxMini: empty MLP")
    val g = new Writer()
    var cur = "input"
    layers.zipWithIndex.foreach { case ((w, b, act), li) =>
      val wName = s"w$li"; val bName = s"b$li"
      val wStored = if (gemm) { // [m, k] like nn.Linear.weight
        val (k, m) = (w.length, w.head.length)
        Array.tabulate(m, k)((j, i) => w(i)(j))
      } else w
      g.lenDelim(5, tensorBytes(wName,
        Seq(wStored.length, wStored.head.length),
        wStored.flatten)) // GraphProto.initializer
      g.lenDelim(5, tensorBytes(bName, Seq(b.length), b))
      val last = li == layers.length - 1 && act.isEmpty
      val added = if (last) "output" else s"a$li"
      if (gemm)
        g.lenDelim(1, nodeBytes("Gemm", Seq(cur, wName, bName), Seq(added),
          Map("transB" -> 1L)))
      else {
        val mm = s"mm$li"
        g.lenDelim(1, nodeBytes("MatMul", Seq(cur, wName), Seq(mm)))
        g.lenDelim(1, nodeBytes("Add", Seq(mm, bName), Seq(added)))
      }
      cur = added
      if (act.nonEmpty) {
        val actOut = if (li == layers.length - 1) "output" else s"h$li"
        g.lenDelim(1, nodeBytes(act, Seq(cur), Seq(actOut)))
        cur = actOut
      }
    }
    g.str(2, "graft_mlp") // GraphProto.name
    g.lenDelim(11, valueInfoBytes("input")) // GraphProto.input
    g.lenDelim(12, valueInfoBytes(cur)) // GraphProto.output
    val m = new Writer()
    m.int(1, 8L) // ModelProto.ir_version
    val opset = new Writer()
    opset.str(1, "") // OperatorSetIdProto.domain
    opset.int(2, 13L) // OperatorSetIdProto.version
    m.lenDelim(8, opset.bytes) // ModelProto.opset_import
    m.lenDelim(7, g.bytes) // ModelProto.graph
    m.bytes
  }

  private def tensorBytes(name: String, dims: Seq[Int],
                          data: Array[Double]): Array[Byte] = {
    val w = new Writer()
    dims.foreach(d => w.int(1, d.toLong)) // TensorProto.dims
    w.int(2, 1L) // TensorProto.data_type = FLOAT
    val packed = new Writer()
    data.foreach { v =>
      val bits = java.lang.Float.floatToIntBits(v.toFloat)
      packed.out.write(bits & 0xff); packed.out.write((bits >>> 8) & 0xff)
      packed.out.write((bits >>> 16) & 0xff)
      packed.out.write((bits >>> 24) & 0xff)
    }
    w.lenDelim(4, packed.bytes) // TensorProto.float_data (packed)
    w.str(8, name) // TensorProto.name
    w.bytes
  }

  private def nodeBytes(op: String, ins: Seq[String], outs: Seq[String],
                        intAttrs: Map[String, Long] = Map.empty)
      : Array[Byte] = {
    val w = new Writer()
    ins.foreach(w.str(1, _)) // NodeProto.input
    outs.foreach(w.str(2, _)) // NodeProto.output
    w.str(4, op) // NodeProto.op_type
    intAttrs.foreach { case (name, v) =>
      val a = new Writer()
      a.str(1, name) // AttributeProto.name
      a.int(3, v) // AttributeProto.i
      a.int(20, 2L) // AttributeProto.type = INT
      w.lenDelim(5, a.bytes) // NodeProto.attribute
    }
    w.bytes
  }

  private def valueInfoBytes(name: String): Array[Byte] = {
    val w = new Writer()
    w.str(1, name) // ValueInfoProto.name
    w.bytes
  }

  // ---- per-JVM parse cache (the executor-side path) ----

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Model]()
  private val parses = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Parse count across this JVM — observable cache behavior for specs
    * (an executor embedding many partitions must parse once).
    */
  def parseCount: Long = parses.get()

  /** Model for `bytes`, parsed at most once per JVM per distinct content
    * (keyed by SHA-256 of the bytes — executors hold the parsed weights,
    * not one copy per partition).
    */
  def cached(bytes: Array[Byte]): Model = {
    val key = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-256").digest(bytes))
    cache.computeIfAbsent(key, _ => { parses.incrementAndGet(); parse(bytes) })
  }

  /** Deterministic dyadic demo weights (k/16 steps) for a
    * inDim -> hid (Relu) -> outDim MLP: every coefficient is exactly
    * representable in float32 AND in decimal, so the forward pass over
    * integer features is bit-exact in any engine — the property
    * `q_onnx_embed`'s DuckDB oracle relies on. Layer 0 w(i)(j) =
    * ((31i + 17j) % 13 - 6)/16, layer L shifts by 7L; bias b(j) =
    * ((11j + 5L) % 7 - 3)/16.
    */
  def demoWeights(inDim: Int, hid: Int, outDim: Int)
      : Seq[(Array[Array[Double]], Array[Double], String)] = {
    def w(l: Int, rows: Int, cols: Int): Array[Array[Double]] =
      Array.tabulate(rows, cols)((i, j) =>
        (((31 * i + 17 * j + 7 * l) % 13) - 6) / 16.0)
    def b(l: Int, cols: Int): Array[Double] =
      Array.tabulate(cols)(j => (((11 * j + 5 * l) % 7) - 3) / 16.0)
    Seq((w(0, inDim, hid), b(0, hid), "Relu"),
      (w(1, hid, outDim), b(1, outDim), ""))
  }
}
