package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Sparse encoding for persisted HLL register rows (the q121 lake-fold
  * class): a dense 2^p register array is ~4 KB per group even when the
  * group saw ONE distinct value. Below a fill threshold the row stores
  * sorted packed `(idx << 6) | rank` ints instead — 4 bytes per
  * NON-ZERO register — and promotes back to dense transparently once
  * merges push the fill over the threshold. Discrimination is by
  * length: exactly 2^p elements = dense, anything shorter = sparse
  * (`maxFill < 2^p` is enforced so the two can never collide).
  * Round-trip is exact — densify(sparsify(x)) == x register for
  * register — so folded estimates keep their bit-for-bit equality with
  * the one-shot sketch.
  */
object HllSparse {
  /** rank ≤ 64-p+1 ≤ 61 < 64 for p ≥ 4, so 6 bits always hold it. */
  val RankBits = 6
}

/** Dense register array → packed sparse array when the non-zero count is
  * ≤ maxFill, unchanged otherwise. Idempotent: an already-sparse input
  * (length < 2^p) passes through.
  *
  * Pass-through branches return a defensive `copy()` of the input
  * ArrayData, never the input itself: a returned alias to a reused
  * `UnsafeArrayData` buffer (sort / aggregation operators recycle row
  * buffers) would be silently corrupted when the buffer is overwritten.
  */
case class HllSparsify(child: Expression, p: Int, maxFill: Int)
  extends UnaryExpression {
  require(p >= 4 && p <= 16, s"HLL p must be in [4,16], got $p")
  require(maxFill > 0 && maxFill < (1 << p),
    s"maxFill must be in (0, 2^p), got $maxFill")

  private val m = 1 << p

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_sparsify expects array<int>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_sparsify"

  override def nullSafeEval(a: Any): Any = {
    val regs = a.asInstanceOf[ArrayData]
    if (regs.numElements() != m) return regs.copy() // already sparse
    var nz = 0
    var i = 0
    while (i < m) { if (regs.getInt(i) != 0) nz += 1; i += 1 }
    if (nz > maxFill) return regs.copy()
    val out = new Array[Int](nz)
    var j = 0
    i = 0
    while (i < m) {
      val r = regs.getInt(i)
      if (r != 0) { out(j) = (i << HllSparse.RankBits) | r; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val nz = ctx.freshName("nz")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      s"""
         |if ($a.numElements() != $m) { ${ev.value} = $a.copy(); } else {
         |  int $nz = 0;
         |  for (int $i = 0; $i < $m; $i++) if ($a.getInt($i) != 0) $nz++;
         |  if ($nz > $maxFill) { ${ev.value} = $a.copy(); } else {
         |    int[] $out = new int[$nz];
         |    int $j = 0;
         |    for (int $i = 0; $i < $m; $i++) {
         |      int $r = $a.getInt($i);
         |      if ($r != 0) $out[$j++] = ($i << ${HllSparse.RankBits}) | $r;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sparse or dense register array → dense (length 2^p). Pass-through for
  * dense input (defensively copied — see [[HllSparsify]]), scatter of
  * the packed pairs otherwise.
  */
case class HllDensify(child: Expression, p: Int)
  extends UnaryExpression {
  require(p >= 4 && p <= 16, s"HLL p must be in [4,16], got $p")

  private val m = 1 << p

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_densify expects array<int>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_densify"

  override def nullSafeEval(a: Any): Any = {
    val regs = a.asInstanceOf[ArrayData]
    if (regs.numElements() == m) return regs.copy()
    val out = new Array[Int](m)
    var i = 0
    while (i < regs.numElements()) {
      val packed = regs.getInt(i)
      out(packed >>> HllSparse.RankBits) = packed & ((1 << HllSparse.RankBits) - 1)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val packed = ctx.freshName("packed")
      s"""
         |if ($a.numElements() == $m) { ${ev.value} = $a.copy(); } else {
         |  int[] $out = new int[$m];
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    int $packed = $a.getInt($i);
         |    $out[$packed >>> ${HllSparse.RankBits}] =
         |      $packed & ${(1 << HllSparse.RankBits) - 1};
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
