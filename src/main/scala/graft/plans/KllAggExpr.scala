package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import graft.operators.QuantileSketch.Kll
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** KLL quantile fold as a NATIVE Catalyst aggregate — same motivation as
  * [[HllRegisters]]: the `udaf` wrapper pays an encoder round-trip into
  * the ScalaAggregator shim on EVERY row, which dominates a sketch whose
  * own amortized update is a few appends. Here the double comes straight
  * off the InternalRow and the sketch mutates in place; the buffer only
  * serializes (Java serialization of the few-KB compactor ladder) when a
  * partial crosses the shuffle.
  *
  * Null inputs are skipped (countDistinct-style semantics); estimates
  * and determinism are exactly [[graft.operators.QuantileSketch.Kll]]'s.
  */
case class KllQuantilesNative(
    child: Expression,
    qs: Seq[Double],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kll] with UnaryLike[Expression] {
  require(qs.nonEmpty, "at least one quantile")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_quantiles"

  override def createAggregationBuffer(): Kll = new Kll(k)

  override def update(sk: Kll, row: InternalRow): Kll = {
    val v = child.eval(row)
    if (v != null) sk.update(v.asInstanceOf[Double])
    sk
  }

  override def merge(a: Kll, b: Kll): Kll = a.merge(b)

  override def eval(sk: Kll): Any =
    new GenericArrayData(qs.map(sk.quantile).toArray)

  override def serialize(sk: Kll): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(sk); oos.close()
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): Kll =
    new ObjectInputStream(new ByteArrayInputStream(bytes))
      .readObject().asInstanceOf[Kll]

  override def withNewMutableAggBufferOffset(n: Int): KllQuantilesNative =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllQuantilesNative =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllQuantilesNative =
    copy(child = c)
}

/** Shared (de)serialization for KLL sketch bytes persisted outside an
  * aggregation buffer — the lake-fold state (q124), like q121's HLL
  * register rows.
  */
object KllSer {
  def toBytes(sk: Kll): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(sk); oos.close()
    bos.toByteArray
  }
  def fromBytes(bytes: Array[Byte]): Kll =
    new ObjectInputStream(new ByteArrayInputStream(bytes))
      .readObject().asInstanceOf[Kll]
}

/** KLL fold surfacing the SKETCH BYTES (not estimates) — the persistable
  * partial a lake table stores and folds incrementally.
  */
case class KllSketchBytes(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kll] with UnaryLike[Expression] {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch"

  override def createAggregationBuffer(): Kll = new Kll(k)
  override def update(sk: Kll, row: InternalRow): Kll = {
    val v = child.eval(row)
    if (v != null) sk.update(v.asInstanceOf[Double])
    sk
  }
  override def merge(a: Kll, b: Kll): Kll = a.merge(b)
  override def eval(sk: Kll): Any = KllSer.toBytes(sk)
  override def serialize(sk: Kll): Array[Byte] = KllSer.toBytes(sk)
  override def deserialize(bytes: Array[Byte]): Kll = KllSer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): KllSketchBytes =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchBytes =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllSketchBytes =
    copy(child = c)
}

/** Merge two serialized sketches — the lake fold's touched-group update.
  * CodegenFallback: evaluated on group-count-sized frames only (lake
  * rows), never in a per-event hot path.
  */
case class KllMergeBytes(
    left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "kll_merge"
  override def nullSafeEval(a: Any, b: Any): Any =
    KllSer.toBytes(KllSer.fromBytes(a.asInstanceOf[Array[Byte]])
      .merge(KllSer.fromBytes(b.asInstanceOf[Array[Byte]])))
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Quantile estimates read off serialized sketch bytes (lake rows). */
case class KllQuantilesOf(child: Expression, qs: Seq[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(qs.nonEmpty, "at least one quantile")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kll_quantiles_of"
  override def nullSafeEval(bytes: Any): Any = {
    val sk = KllSer.fromBytes(bytes.asInstanceOf[Array[Byte]])
    new GenericArrayData(qs.map(sk.quantile).toArray)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
