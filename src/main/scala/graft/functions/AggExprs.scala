package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Custom aggregate functions for bounded top-k shapes.
  *
  * Why: Spark has `min_by` (k=1) but no bounded k-smallest aggregate; the
  * declarative alternatives don't scale — `collect_list` + `array_sort` +
  * `slice` shuffles EVERY group element (|aux| rows per key for the fuzzy
  * join), and a `row_number` window re-shuffles and fully sorts the pair
  * frame. `MinKBy` keeps partial aggregation: each map-side partial carries
  * at most k elements per group, so the shuffle is one bounded row per key
  * regardless of group size — the same contract `min_by` has.
  */
object AggExprs {

  /** The k smallest values of `child` per group, ascending by `child`'s
    * natural (recursive, null-last-free — inputs are never null here)
    * ordering. Output: array of `child.dataType`, length = min(k, group
    * size). Null child values are ignored (matches min_by).
    *
    * Buffer is a sorted bounded array; update is O(log k) search +
    * memmove, merge is a bounded merge. Runs under ObjectHashAggregateExec.
    */
  case class MinKBy(child: Expression, k: Int,
                    distinct: Boolean = false,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[ArrayBuffer[Any]] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

    @transient private lazy val ordering: Ordering[Any] =
      TypeUtils.getInterpretedOrdering(child.dataType)

    override def createAggregationBuffer(): ArrayBuffer[Any] = ArrayBuffer.empty

    private def insert(buf: ArrayBuffer[Any], v: Any): ArrayBuffer[Any] = {
      if (buf.length == k && ordering.compare(v, buf.last) >= 0) return buf
      // binary search for insertion point (first element > v keeps ties
      // first-come, which is fine: equal elements are interchangeable)
      var lo = 0; var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ordering.compare(buf(mid), v) <= 0) lo = mid + 1 else hi = mid
      }
      // distinct mode (KMV): an equal element sits immediately left of the
      // insertion point — skip it so duplicates never occupy sketch slots
      if (distinct && lo > 0 && ordering.compare(buf(lo - 1), v) == 0)
        return buf
      buf.insert(lo, v)
      if (buf.length > k) buf.remove(buf.length - 1)
      buf
    }

    override def update(buf: ArrayBuffer[Any], input: InternalRow): ArrayBuffer[Any] = {
      val v = child.eval(input)
      if (v == null) buf
      else insert(buf, v match {
        // eval results may be views into a reused input buffer — copy them
        case r: InternalRow                                      => r.copy()
        case s: org.apache.spark.unsafe.types.UTF8String         => s.clone()
        case a: org.apache.spark.sql.catalyst.util.ArrayData     => a.copy()
        case m: org.apache.spark.sql.catalyst.util.MapData       => m.copy()
        case other                                               => other
      })
    }

    override def merge(buf: ArrayBuffer[Any], other: ArrayBuffer[Any]): ArrayBuffer[Any] = {
      other.foreach(v => insert(buf, v))
      buf
    }

    override def eval(buf: ArrayBuffer[Any]): Any =
      new GenericArrayData(buf.toArray)

    @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))
    @transient private lazy val numStructFields: Int = child.dataType match {
      case s: StructType => s.size
      case _             => -1
    }

    override def serialize(buf: ArrayBuffer[Any]): Array[Byte] = {
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

    override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = new ArrayBuffer[Any](n)
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val rowBytes = new Array[Byte](len)
        in.readFully(rowBytes)
        val u = new UnsafeRow(1)
        u.pointTo(rowBytes, len)
        val v = child.dataType match {
          case _: StructType => u.getStruct(0, numStructFields).copy()
          case dt            => u.get(0, dt)
        }
        buf += v
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): MinKBy =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MinKBy =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  /** Column wrapper: k smallest `v` per group, ascending. */
  def minKBy(v: Column, k: Int): Column =
    GraftBridge.column(MinKBy(GraftBridge.expression(v), k)
      .toAggregateExpression())

  /** k smallest DISTINCT values (the KMV-sketch form: duplicates occupy no
    * slots, so the buffer is a true k-minimum-values sketch and the
    * partial/merge state stays exactly k-bounded with map-side combine —
    * only k values per partition ever shuffle).
    */
  def minKDistinctBy(v: Column, k: Int): Column =
    GraftBridge.column(MinKBy(GraftBridge.expression(v), k, distinct = true)
      .toAggregateExpression())

  /** Statistical mode with skrub's tie-break (smallest value among the most
    * frequent; nulls ignored; all-null group -> null), as ONE aggregate.
    *
    * Why: the declarative form is a two-level aggregation (count per
    * (key, value), then arg-min per key) — two exchanges plus a reassembly
    * join per mode column. ModeAgg's count-map buffer does it in the same
    * single groupBy as every other aggregate: the partial buffer holds one
    * entry per distinct value in the partition slice, exactly what the
    * first-level hash aggregate's shuffle rows would have carried — same
    * bytes, two fewer exchanges and no join.
    */
  case class ModeAgg(child: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.HashMap[Any, Long]] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = true
    override def dataType: DataType = child.dataType

    @transient private lazy val ordering: Ordering[Any] =
      TypeUtils.getInterpretedOrdering(child.dataType)

    override def createAggregationBuffer(): java.util.HashMap[Any, Long] =
      new java.util.HashMap[Any, Long]()

    override def update(buf: java.util.HashMap[Any, Long],
                        input: InternalRow): java.util.HashMap[Any, Long] = {
      val v = child.eval(input)
      if (v != null) {
        val key = v match {
          case r: InternalRow                                  => r.copy()
          case s: org.apache.spark.unsafe.types.UTF8String     => s.clone()
          case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
          case other                                           => other
        }
        buf.merge(key, 1L, (a, b) => a + b)
      }
      buf
    }

    override def merge(buf: java.util.HashMap[Any, Long],
                       other: java.util.HashMap[Any, Long]): java.util.HashMap[Any, Long] = {
      other.forEach((k, v) => buf.merge(k, v, (a, b) => a + b))
      buf
    }

    override def eval(buf: java.util.HashMap[Any, Long]): Any = {
      var best: Any = null
      var bestCnt = -1L
      buf.forEach { (v, cnt) =>
        if (cnt > bestCnt || (cnt == bestCnt && ordering.compare(v, best) < 0)) {
          best = v; bestCnt = cnt
        }
      }
      best
    }

    @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))
    @transient private lazy val numStructFields: Int = child.dataType match {
      case s: StructType => s.size
      case _             => -1
    }

    override def serialize(buf: java.util.HashMap[Any, Long]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      buf.forEach { (v, cnt) =>
        row.update(0, v)
        val u = proj(row)
        out.writeInt(u.getSizeInBytes)
        u.writeToStream(out, null)
        out.writeLong(cnt)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): java.util.HashMap[Any, Long] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = new java.util.HashMap[Any, Long](n * 2)
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val rowBytes = new Array[Byte](len)
        in.readFully(rowBytes)
        val u = new UnsafeRow(1)
        u.pointTo(rowBytes, len)
        val v = child.dataType match {
          case _: StructType => u.getStruct(0, numStructFields).copy()
          case dt            => u.get(0, dt)
        }
        buf.put(v, in.readLong())
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): ModeAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): ModeAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  /** Column wrapper: skrub-tie-break mode of `v` per group. */
  def modeAgg(v: Column): Column =
    GraftBridge.column(ModeAgg(GraftBridge.expression(v))
      .toAggregateExpression())
}
