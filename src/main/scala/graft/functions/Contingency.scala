package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass all-pairs contingency aggregation (SURVEY §2.4's suggested
  * shape for column_associations; reference contract:
  * skrub/_column_associations.py:16-326).
  *
  * Why: the declarative alternatives amplify the input before aggregating —
  * GROUPING SETS expands every row × |pairs| into the partial aggregation,
  * and even the full-binned-tuple pre-aggregation pays a combo-frame
  * explode × |pairs| plus two more shuffles. Here every row updates ONE
  * flat Array[Long] buffer holding every pair's full contingency table
  * (bounded by the bin vocabularies: Σ_pairs |vocab_a|×|vocab_b| cells,
  * ~15 KB for 6 columns at 10 bins), so the whole job is one scan, one
  * map-side partial per partition, and one ~15 KB buffer merge — no row
  * amplification, no combo shuffle, at ANY corpus size.
  */
object Contingency {

  /** Aggregates an array<int> of per-column bin codes (never null, each in
    * [0, vocab(col))) into the flat concatenation of all pair contingency
    * tables: for pair p = (a, b) the cells live at
    * offset(p) + code_a * vocab(b) + code_b, row-major.
    */
  case class ContingencyAll(child: Expression,
                            vocabs: Seq[Int],
                            pairA: Seq[Int],
                            pairB: Seq[Int],
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {
    require(pairA.length == pairB.length, "pairA/pairB length mismatch")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    // flat-buffer geometry, shared with the driver-side decoder
    @transient private lazy val aIdx: Array[Int] = pairA.toArray
    @transient private lazy val bIdx: Array[Int] = pairB.toArray
    @transient private lazy val vb: Array[Int] = bIdx.map(vocabs(_))
    @transient private lazy val offs: Array[Int] =
      ContingencyAll.offsets(vocabs, pairA, pairB)

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](offs.last)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val codes = child.eval(input).asInstanceOf[ArrayData]
      var p = 0
      val nPairs = aIdx.length
      while (p < nPairs) {
        buf(offs(p) + codes.getInt(aIdx(p)) * vb(p) + codes.getInt(bIdx(p))) += 1L
        p += 1
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bos = new ByteArrayOutputStream(buf.length * 8 + 4)
      val out = new DataOutputStream(bos)
      out.writeInt(buf.length)
      var i = 0
      while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = new Array[Long](n)
      var i = 0
      while (i < n) { buf(i) = in.readLong(); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): ContingencyAll =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): ContingencyAll =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  object ContingencyAll {
    /** Pair start offsets into the flat buffer (length |pairs| + 1). */
    def offsets(vocabs: Seq[Int], pairA: Seq[Int], pairB: Seq[Int]): Array[Int] = {
      val offs = new Array[Int](pairA.length + 1)
      var p = 0
      while (p < pairA.length) {
        offs(p + 1) = offs(p) + vocabs(pairA(p)) * vocabs(pairB(p))
        p += 1
      }
      offs
    }
  }

  /** Column wrapper: flat all-pairs contingency counts of a codes array. */
  def contingencyAll(codes: Column, vocabs: Seq[Int],
                     pairA: Seq[Int], pairB: Seq[Int]): Column =
    GraftBridge.column(ContingencyAll(GraftBridge.expression(codes),
      vocabs, pairA, pairB).toAggregateExpression())

  /** Weighted variant over a PRE-AGGREGATED packed-code frame: the caller
    * groupBy'd a mixed-radix packed int key (code_i * stride_i summed — a
    * fully codegen'd projection + primitive-key hash aggregate) and this
    * aggregate decodes each (key, count) combo back to per-column codes and
    * adds `count` to every pair cell. Runs over at most Π vocab combo rows,
    * so the interpreted update cost is bounded by the code space, not the
    * corpus.
    */
  case class ContingencyPacked(key: Expression, cnt: Expression,
                               strides: Seq[Int],
                               vocabs: Seq[Int],
                               pairA: Seq[Int],
                               pairB: Seq[Int],
                               mutableAggBufferOffset: Int = 0,
                               inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {
    require(pairA.length == pairB.length, "pairA/pairB length mismatch")

    override def children: Seq[Expression] = Seq(key, cnt)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    @transient private lazy val aIdx: Array[Int] = pairA.toArray
    @transient private lazy val bIdx: Array[Int] = pairB.toArray
    @transient private lazy val vb: Array[Int] = bIdx.map(vocabs(_))
    @transient private lazy val strideArr: Array[Int] = strides.toArray
    @transient private lazy val vocabArr: Array[Int] = vocabs.toArray
    @transient private lazy val offs: Array[Int] =
      ContingencyAll.offsets(vocabs, pairA, pairB)

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](offs.last)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val k = key.eval(input).asInstanceOf[Int]
      val w = cnt.eval(input).asInstanceOf[Long]
      val codes = new Array[Int](vocabArr.length)
      var i = 0
      while (i < codes.length) {
        codes(i) = (k / strideArr(i)) % vocabArr(i)
        i += 1
      }
      var p = 0
      while (p < aIdx.length) {
        buf(offs(p) + codes(aIdx(p)) * vb(p) + codes(bIdx(p))) += w
        p += 1
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bos = new ByteArrayOutputStream(buf.length * 8 + 4)
      val out = new DataOutputStream(bos)
      out.writeInt(buf.length)
      var i = 0
      while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = new Array[Long](n)
      var i = 0
      while (i < n) { buf(i) = in.readLong(); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): ContingencyPacked =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): ContingencyPacked =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(key = newChildren(0), cnt = newChildren(1))
  }

  /** Column wrapper: packed-combo weighted contingency counts. */
  def contingencyPacked(key: Column, cnt: Column, strides: Seq[Int],
                        vocabs: Seq[Int], pairA: Seq[Int],
                        pairB: Seq[Int]): Column =
    GraftBridge.column(ContingencyPacked(GraftBridge.expression(key),
      GraftBridge.expression(cnt), strides, vocabs, pairA, pairB)
      .toAggregateExpression())

  /** Exact distinct count saturating at `cap`: returns min(distinct, cap+1),
    * i.e. any value > cap means "more than cap". State is a <= cap+1 element
    * set, and once saturated the per-row update is a single branch — no
    * hashing, no HLL register walk. This is the right tool for threshold
    * decisions ("fewer than 30 distinct values?"): approx_count_distinct
    * pays a per-row HLL update for a precision the decision never needed,
    * and being an imperative aggregate it also knocks every OTHER aggregate
    * sharing its scan out of whole-stage codegen — so fit paths run it in
    * its own (overlapped) job instead.
    */
  case class DistinctAtMost(child: Expression, cap: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.HashSet[Any]] {
    require(cap >= 1, s"cap must be >= 1, got $cap")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = LongType

    override def createAggregationBuffer(): java.util.HashSet[Any] =
      new java.util.HashSet[Any]()

    override def update(buf: java.util.HashSet[Any],
                        input: InternalRow): java.util.HashSet[Any] = {
      if (buf.size > cap) return buf // saturated: one branch per row
      val v = child.eval(input)
      if (v != null) buf.add(v match {
        case r: InternalRow                                  => r.copy()
        case s: org.apache.spark.unsafe.types.UTF8String     => s.clone()
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
        case other                                           => other
      })
      buf
    }

    override def merge(buf: java.util.HashSet[Any],
                       other: java.util.HashSet[Any]): java.util.HashSet[Any] = {
      val it = other.iterator()
      while (it.hasNext && buf.size <= cap) buf.add(it.next())
      buf
    }

    override def eval(buf: java.util.HashSet[Any]): Any =
      math.min(buf.size, cap + 1).toLong

    @transient private lazy val proj =
      org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Array(child.dataType))
    @transient private lazy val numStructFields: Int = child.dataType match {
      case s: StructType => s.size
      case _             => -1
    }

    override def serialize(buf: java.util.HashSet[Any]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      buf.forEach { v =>
        row.update(0, v)
        val u = proj(row)
        out.writeInt(u.getSizeInBytes)
        u.writeToStream(out, null)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): java.util.HashSet[Any] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = new java.util.HashSet[Any](n * 2)
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val rowBytes = new Array[Byte](len)
        in.readFully(rowBytes)
        val u = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
        u.pointTo(rowBytes, len)
        buf.add(child.dataType match {
          case _: StructType => u.getStruct(0, numStructFields).copy()
          case dt            => u.get(0, dt)
        })
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): DistinctAtMost =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): DistinctAtMost =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  /** Column wrapper: exact distinct count saturating at `cap` (result
    * cap + 1 means "more than cap").
    */
  def distinctAtMost(v: Column, cap: Int): Column =
    GraftBridge.column(DistinctAtMost(GraftBridge.expression(v), cap)
      .toAggregateExpression())

  /** `collect_list` with a hard state cap: exceeding `cap` elements in any
    * partial or merged buffer fails LOUDLY instead of accumulating unbounded
    * state. Used to gather a (supposedly tiny) contingency frame to one row —
    * a caller who passes two raw high-cardinality columns gets an error
    * pointing at binning, not an OOM (VERDICT r7 finding #4's guard).
    */
  case class BoundedCollect(child: Expression, cap: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Any]] {
    require(cap >= 1, s"cap must be >= 1, got $cap")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

    override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Any] =
      scala.collection.mutable.ArrayBuffer.empty

    private def checked(buf: scala.collection.mutable.ArrayBuffer[Any]) = {
      if (buf.length > cap) throw new IllegalStateException(
        s"BoundedCollect: more than $cap elements — the contingency frame " +
          "is not bounded; bin or lump the input columns (fitBins) before " +
          "computing associations on raw high-cardinality columns")
      buf
    }

    override def update(buf: scala.collection.mutable.ArrayBuffer[Any],
                        input: InternalRow): scala.collection.mutable.ArrayBuffer[Any] = {
      val v = child.eval(input)
      if (v != null) buf += (v match {
        case r: InternalRow                                  => r.copy()
        case s: org.apache.spark.unsafe.types.UTF8String     => s.clone()
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
        case other                                           => other
      })
      checked(buf)
    }

    override def merge(buf: scala.collection.mutable.ArrayBuffer[Any],
                       other: scala.collection.mutable.ArrayBuffer[Any]): scala.collection.mutable.ArrayBuffer[Any] =
      checked(buf ++= other)

    override def eval(buf: scala.collection.mutable.ArrayBuffer[Any]): Any =
      new GenericArrayData(buf.toArray)

    @transient private lazy val proj =
      org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Array(child.dataType))
    @transient private lazy val numStructFields: Int = child.dataType match {
      case s: StructType => s.size
      case _             => -1
    }

    override def serialize(buf: scala.collection.mutable.ArrayBuffer[Any]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.length)
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      buf.foreach { v =>
        row.update(0, v)
        val u = proj(row)
        out.writeInt(u.getSizeInBytes)
        u.writeToStream(out, null)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Any] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = new scala.collection.mutable.ArrayBuffer[Any](n)
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val rowBytes = new Array[Byte](len)
        in.readFully(rowBytes)
        val u = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
        u.pointTo(rowBytes, len)
        buf += (child.dataType match {
          case _: StructType => u.getStruct(0, numStructFields).copy()
          case dt            => u.get(0, dt)
        })
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollect =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollect =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  /** Column wrapper: capped collect (loud failure beyond `cap` elements). */
  def boundedCollect(v: Column, cap: Int): Column =
    GraftBridge.column(BoundedCollect(GraftBridge.expression(v), cap)
      .toAggregateExpression())
}
