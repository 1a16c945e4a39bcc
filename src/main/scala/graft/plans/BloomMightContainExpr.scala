package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built Bloom filter — the
  * pre-shuffle pruning primitive for probe/build joins: rows whose key
  * cannot be on the other side drop map-side, before they cost network.
  * No false negatives (a dropped key provably has no match), only
  * `fpp`-rate false positives, which the exact join downstream resolves —
  * so pruning never changes results.
  *
  * The filter ships as its serialized bytes inside the expression (one
  * copy per task binary, same as any literal) and deserializes lazily per
  * JVM; the probe itself is a straight method call inside whole-stage
  * codegen — no UDF, no boxing of the hot path beyond the UTF8String key.
  * Build side uses Spark's public `df.stat.bloomFilter`, whose string
  * hashing is the UTF-8 byte hashing `mightContainBinary` probes.
  */
case class BloomMightContain(child: Expression, bloomBits: Array[Byte])
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects string, got ${child.dataType}")

  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBits))

  /** Public: called from generated code. */
  def mightContain(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    mightContain(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(bloom: BloomFilter, key: Column): Column = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    GraftBridge.column(BloomMightContain(GraftBridge.expression(key), out.toByteArray))
  }
}
