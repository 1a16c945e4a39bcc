package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** HyperLogLog register fold as a NATIVE Catalyst aggregate
  * (TypedImperativeAggregate) — the §2.8 custom-agg surface one level
  * below `udaf`: the per-row update reads the hash straight off the
  * `InternalRow` with no encoder round-trip and mutates the byte buffer
  * in place, and the buffer serializes as its own bytes (4 KB), so the
  * shuffle payload is the registers themselves. Same algorithm and
  * register semantics as `operators.Hll` documents; `Hll.registersAgg`
  * routes DataFrame callers here.
  *
  * `child` must be a nullable LongType hash expression that is NULL for
  * null inputs (e.g. `when(v.isNotNull, xxhash64(v))`) — null rows are
  * skipped natively, giving countDistinct null semantics without a
  * sentinel.
  */
case class HllRegisters(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
  require(p >= 4 && p <= 16, s"HLL p must be in [4,16], got $p")

  private val m = 1 << p

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_registers"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(regs: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val hash = v.asInstanceOf[Long]
      val idx = (hash >>> (64 - p)).toInt
      val w = hash << p
      val rank = (math.min(java.lang.Long.numberOfLeadingZeros(w), 64 - p) + 1)
        .toByte
      if (rank > regs(idx)) regs(idx) = rank
    }
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(regs: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = regs(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(regs: Array[Byte]): Array[Byte] = regs
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)
}
