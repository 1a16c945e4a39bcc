package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cardinality of the union of fixed-width integer intervals
  * [s, s+w) over a doc's span starts — the duplicated-span token
  * coverage, computed per doc from the collected starts instead of
  * exploding every span into w position rows and counting them
  * distinct (which multiplied the coverage path's shuffle by w and
  * paid a distinct-aggregate exchange; guide §2.3 shuffle fewer
  * bytes). One sort + sweep per doc: equal or overlapping starts
  * contribute min(w, gap).
  */
case class SpanCoverage(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"span width must be >= 1: $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"span_coverage expects array<int|bigint>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "span_coverage"

  private def fromLong = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val starts = new Array[Long](n)
    var i = 0
    while (i < n) {
      starts(i) = if (fromLong) arr.getLong(i) else arr.getInt(i).toLong
      i += 1
    }
    SpanCoverage.unionLength(starts, w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.SpanCoverage.unionLength(" +
        s"${if (fromLong) s"$a.toLongArray()" else
          s"graft.plans.SpanCoverage.widen($a.toIntArray())"}, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpanCoverage {
  def widen(a: Array[Int]): Array[Long] = {
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i).toLong; i += 1 }
    out
  }

  /** |union of [s, s+w) over starts| — sort + sweep. */
  def unionLength(starts: Array[Long], w: Int): Long = {
    if (starts.length == 0) return 0L
    java.util.Arrays.sort(starts)
    var total = 0L
    var i = 0
    while (i < starts.length - 1) {
      val gap = starts(i + 1) - starts(i)
      total += math.min(w.toLong, gap)
      i += 1
    }
    total + w
  }

  def apply(starts: Column, w: Int): Column =
    GraftBridge.column(SpanCoverage(GraftBridge.expression(starts), w))
}
