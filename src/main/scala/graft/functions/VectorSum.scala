package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Elementwise sum of `array<double>` rows — a map-side-combined Catalyst
  * aggregate (TypedImperativeAggregate).
  *
  * Why a custom aggregate: the Lloyd-round centroid mean needs "sum the
  * vectors in each cell", and without this the options are a
  * `posexplode(v)` + groupBy(cid, pos) — a corpus×dim row explosion and
  * shuffle — or `collect_list` of whole vectors (unbounded buffer). Here the
  * buffer is one dim-length array per group per partition: partial sums are
  * computed map-side and the shuffle carries k×dim doubles per partition,
  * independent of corpus size.
  *
  * Rows must all have the same length; null rows are ignored; an all-null
  * group sums to null.
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  /** Empty array = "no input seen yet" (a zero-dim vector row is rejected). */
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def addInto(buf: Array[Double], v: Array[Double]): Array[Double] =
    if (v.isEmpty) buf
    else if (buf.isEmpty) v
    else {
      require(buf.length == v.length,
        s"vector_sum: mixed dimensions ${buf.length} vs ${v.length}")
      var i = 0
      while (i < buf.length) { buf(i) += v(i); i += 1 }
      buf
    }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else addInto(buf, v.asInstanceOf[ArrayData].toDoubleArray())
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] =
    addInto(buf, other)

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
  override def prettyName: String = "vector_sum"
}

object VectorSum {
  /** Column API: `vector_sum(arrayCol)`. */
  def vector_sum(c: Column): Column =
    Bridge.column(VectorSum(Bridge.expression(c)).toAggregateExpression())
}
