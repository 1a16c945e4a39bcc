package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Count of distinct common elements of two string arrays — the Jaccard
  * numerator on the dedup verification hot path.
  *
  * `size(array_intersect(a, b))` materializes the intersection array only
  * to measure it; this expression builds one hash set of the smaller side
  * and counts membership of the other — no intermediate allocation per
  * pair. Inputs are distinct sets by construction (shingleFrame), so the
  * count equals |A∩B| exactly.
  */
case class CommonCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"common_count expects array<string>, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "common_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (small, big) = if (x.numElements() <= y.numElements()) (x, y) else (y, x)
    val set = new java.util.HashSet[Any](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) { set.add(small.getUTF8String(i)); i += 1 }
    var n = 0
    i = 0
    while (i < big.numElements()) {
      if (set.contains(big.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val small = ctx.freshName("small")
      val big = ctx.freshName("big")
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $small = $a;
         |org.apache.spark.sql.catalyst.util.ArrayData $big = $b;
         |if ($small.numElements() > $big.numElements()) {
         |  org.apache.spark.sql.catalyst.util.ArrayData tmp = $small;
         |  $small = $big; $big = tmp;
         |}
         |java.util.HashSet<Object> $set = new java.util.HashSet<Object>($small.numElements() * 2);
         |for (int $i = 0; $i < $small.numElements(); $i++) {
         |  $set.add($small.getUTF8String($i));
         |}
         |int $n = 0;
         |for (int $i = 0; $i < $big.numElements(); $i++) {
         |  if ($set.contains($big.getUTF8String($i))) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CommonCount {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(CommonCount(GraftBridge.expression(a), GraftBridge.expression(b)))
}
