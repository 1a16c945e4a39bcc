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
