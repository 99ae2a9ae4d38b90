package graft.sql

import graft.core.Geom
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Geometry => JtsGeometry}
import java.nio.{ByteBuffer, ByteOrder}

/** Geometry aggregates (SURVEY.md §2.5).
  *
  * - `st_envelope_agg`: envelope-of-envelopes — the reference's explicit
  *   cheap-union optimization (`vectors.py:359-381` envelopes_union,
  *   `collections.py:107-112` convex_hull/envelope shortcut). Constant-size
  *   buffer (4 doubles) → map-side partial agg is nearly free.
  * - `st_union_agg`: cascaded union + simplify(0), silently dropping invalid
  *   geometries — exactly `cascaded_union` (`vectors.py:383-403`) and the
  *   dissolve path (`collections.py:210-220`). Buffer unions eagerly every
  *   `FlushEvery` inputs so memory stays bounded at scale.
  */
case class EnvelopeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Double] =
    Array(Double.PositiveInfinity, Double.PositiveInfinity,
          Double.NegativeInfinity, Double.NegativeInfinity)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val bb = Geom.fromWkb(v.asInstanceOf[Array[Byte]]).bbox
      if (!bb.xmin.isNaN) {
        if (bb.xmin < buf(0)) buf(0) = bb.xmin
        if (bb.ymin < buf(1)) buf(1) = bb.ymin
        if (bb.xmax > buf(2)) buf(2) = bb.xmax
        if (bb.ymax > buf(3)) buf(3) = bb.ymax
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (b(0) < a(0)) a(0) = b(0)
    if (b(1) < a(1)) a(1) = b(1)
    if (b(2) > a(2)) a(2) = b(2)
    if (b(3) > a(3)) a(3) = b(3)
    a
  }

  override def eval(buf: Array[Double]): Any =
    if (buf(0).isInfinity) null
    else Geom.toWkb(Geom.polygonFromBounds(buf(0), buf(1), buf(2), buf(3)))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(4)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): EnvelopeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): EnvelopeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "st_envelope_agg"
}

/** Mutable union buffer: pending geometries + a running union. */
final class UnionBuf(var pending: java.util.ArrayList[JtsGeometry],
                     var merged: JtsGeometry)

case class UnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[UnionBuf] {

  private val FlushEvery = 256

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): UnionBuf =
    new UnionBuf(new java.util.ArrayList[JtsGeometry](), null)

  private def flush(buf: UnionBuf): Unit = {
    if (!buf.pending.isEmpty) {
      if (buf.merged != null) buf.pending.add(buf.merged)
      // UnaryUnionOp == shapely unary_union == the reference's cascaded path
      buf.merged = org.locationtech.jts.operation.union.UnaryUnionOp.union(buf.pending)
      buf.pending = new java.util.ArrayList[JtsGeometry]()
    }
  }

  override def update(buf: UnionBuf, input: InternalRow): UnionBuf = {
    val v = child.eval(input)
    if (v != null) {
      val g = GeomSqlOps.readJts(v.asInstanceOf[Array[Byte]])
      // drop invalid with the reference's silence (vectors.py:390-403)
      if (g.isValid) {
        buf.pending.add(g)
        if (buf.pending.size >= FlushEvery) flush(buf)
      }
    }
    buf
  }

  override def merge(a: UnionBuf, b: UnionBuf): UnionBuf = {
    flush(b)
    if (b.merged != null) a.pending.add(b.merged)
    if (a.pending.size >= FlushEvery) flush(a)
    a
  }

  override def eval(buf: UnionBuf): Any = {
    flush(buf)
    if (buf.merged == null) null
    // .simplify(0) parity with cascaded_union (vectors.py:401)
    else GeomSqlOps.writeJts(
      org.locationtech.jts.simplify.DouglasPeuckerSimplifier.simplify(buf.merged, 0.0))
  }

  override def serialize(buf: UnionBuf): Array[Byte] = {
    flush(buf)
    if (buf.merged == null) Array.emptyByteArray else GeomSqlOps.writeJts(buf.merged)
  }

  override def deserialize(bytes: Array[Byte]): UnionBuf =
    if (bytes.isEmpty) createAggregationBuffer()
    else new UnionBuf(new java.util.ArrayList[JtsGeometry](), GeomSqlOps.readJts(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): UnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "st_union_agg"
}
