package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Exponentially weighted moving average as a RUNNING-FRAME window
  * aggregate: y_0 = x_0, y_i = (1-alpha)*y_{i-1} + alpha*x_i (pandas
  * `ewm(alpha, adjust=False)`), nulls carry the previous value.
  *
  * Why this shape: the recurrence is a per-key ordered fold, which Spark
  * has no declarative form for. Over a ROWS UNBOUNDED PRECEDING frame,
  * WindowExec feeds rows to `update` INCREMENTALLY in the frame's sort
  * order and evaluates after each row — so one buffer holding the running
  * y computes the exact recurrence in O(rows) per key: one shuffle on the
  * partition keys, one per-key sort, no quadratic re-folds, no driver
  * state. The closed-form alternative (weights (1-a)^{i-j} in a window
  * sum) overflows for long streams; this never does.
  *
  * NOT mergeable by construction (an EWMA of two halves cannot be
  * combined), so `merge` throws: use it ONLY as a window function over
  * (partitionBy keys, orderBy total-order, rowsBetween(unboundedPreceding,
  * currentRow)) — `TimeFeatures.ewma` wires exactly that.
  */
object Ewma {

  case class EwmaAgg(child: Expression, alpha: Double,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Double]] {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")

    private val oneMinus = 1.0 - alpha

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType

    // buffer: (running y, seen-any-value flag as 0.0/1.0)
    override def createAggregationBuffer(): Array[Double] = Array(0.0, 0.0)

    override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
      val v = child.eval(input)
      if (v != null) {
        val x = v.asInstanceOf[Number].doubleValue()
        if (buf(1) == 0.0) { buf(0) = x; buf(1) = 1.0 }
        else buf(0) = buf(0) * oneMinus + x * alpha
      }
      buf
    }

    override def merge(buf: Array[Double], other: Array[Double]): Array[Double] =
      throw new UnsupportedOperationException(
        "ewma is order-dependent and cannot merge partial aggregates; use it " +
          "as a window function over (partitionBy keys, orderBy total order, " +
          "rowsBetween(unboundedPreceding, currentRow)) — see TimeFeatures.ewma")

    override def eval(buf: Array[Double]): Any =
      if (buf(1) == 0.0) null else buf(0)

    override def serialize(buf: Array[Double]): Array[Byte] = {
      val bos = new ByteArrayOutputStream(20)
      val out = new DataOutputStream(bos)
      out.writeDouble(buf(0)); out.writeDouble(buf(1))
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Array[Double] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      Array(in.readDouble(), in.readDouble())
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): EwmaAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): EwmaAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  /** Column wrapper (pair with `.over(...)` — see EwmaAgg's contract). */
  def ewma(v: Column, alpha: Double): Column =
    GraftBridge.column(EwmaAgg(GraftBridge.expression(v), alpha)
      .toAggregateExpression())
}
