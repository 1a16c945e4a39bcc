package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document folds for the Gopher repetition battery
  * ([[graft.operators.Curation.gopherRepetition]]).
  *
  * The r21 rewrite already removed every shuffle from the battery, but it
  * left the per-doc folds as higher-order-function expressions —
  * `aggregate`/`transform`/`filter` are CodegenFallback, so each doc's
  * O(W log W) work ran on the interpreted expression evaluator, and the
  * dup-set accumulator (`array_contains(acc("d"), k)`) was O(dups²)
  * per doc on adversarial repeated-token documents. These two
  * expressions move the same folds into compiled JVM code that
  * whole-stage codegen calls directly (one static call per row — no
  * fallback path, no interpreted tree walk, no quadratic accumulator).
  *
  * Semantics are EXACTLY the r21 SQL folds', verified cell-for-cell by
  * GopherFoldsSpec against an independent reference and by the DuckDB
  * oracle on q168/q199/q202:
  *
  *  - `top{2,3,4}_chars` = cnt·(word chars) of the most frequent n-gram,
  *    tie-break lexicographically least gram — gram order is the BINARY
  *    UTF8 order of the space-joined window (array_sort semantics),
  *    implemented as a virtual-joined-bytes comparator so the join never
  *    allocates.
  *  - `dup{5..10}_chars` = word chars under the union of positions
  *    covered by any window occurring ≥ 2× in the doc. Duplicate
  *    detection here is EXACT window equality (token-id runs) — the SQL
  *    form keyed windows on variadic xxhash64 of token hashes, identical
  *    modulo 64-bit collisions (none in any gated corpus; the
  *    string-keyed oracle would catch one, and exact equality can only
  *    agree with the oracle where the hashed form could diverge).
  *
  * Inputs are the `tokens()` arrays: non-null elements by construction
  * (empty tokens are filtered); a null ARRAY yields a null struct, as
  * the HOF folds did.
  */
object GopherFolds {

  /** (n_word_chars, top2, top3, top4, dup5..dup10) over one doc's tokens. */
  def gopherStats(arr: ArrayData): InternalRow = {
    val w = arr.numElements()
    val toks = new Array[Array[Byte]](w)
    val nchars = new Array[Int](w)
    var total = 0L
    var i = 0
    while (i < w) {
      val t = arr.getUTF8String(i)
      toks(i) = t.getBytes
      nchars(i) = t.numChars()
      total += nchars(i)
      i += 1
    }
    // dictionary-encode tokens once: the 5..10-gram dup scans compare
    // windows as int runs instead of re-comparing bytes per level
    val ids = new Array[Int](w)
    if (w > 0) {
      val dict = new java.util.HashMap[UTF8String, Integer](w * 2)
      i = 0
      while (i < w) {
        val t = arr.getUTF8String(i)
        var id = dict.get(t)
        if (id == null) { id = Integer.valueOf(dict.size()); dict.put(t, id) }
        ids(i) = id.intValue()
        i += 1
      }
    }
    val covered = new Array[Boolean](w)
    val out = new Array[Any](10)
    out(0) = total
    out(1) = topChars(toks, nchars, 2)
    out(2) = topChars(toks, nchars, 3)
    out(3) = topChars(toks, nchars, 4)
    var n = 5
    while (n <= 10) {
      out(n - 1) = covChars(ids, nchars, covered, n)
      n += 1
    }
    new GenericInternalRow(out)
  }

  /** (n, n_dup, dup_chars, tot_chars) of one doc's paragraph/line array:
    * element count, count minus distinct count, occurrences-beyond-the-
    * first chars of repeated values, and total chars.
    */
  def dupStats(arr: ArrayData): InternalRow = {
    val w = arr.numElements()
    // distinct value -> [count, numChars]
    val m = new java.util.HashMap[UTF8String, Array[Long]](w * 2)
    var total = 0L
    var i = 0
    while (i < w) {
      val t = arr.getUTF8String(i)
      var e = m.get(t)
      if (e == null) { e = Array(0L, t.numChars().toLong); m.put(t, e) }
      e(0) += 1L
      total += e(1)
      i += 1
    }
    var dup = 0L
    val it = m.values().iterator()
    while (it.hasNext) {
      val e = it.next()
      dup += (e(0) - 1L) * e(1)
    }
    new GenericInternalRow(Array[Any](
      w.toLong, (w - m.size()).toLong, dup, total))
  }

  /** Byte of the virtual space-joined window starting at token `t0`,
    * streamed via a cursor — compares two windows exactly as UTF8 binary
    * comparison of their `concat_ws(" ", ...)` strings would, without
    * building the strings.
    */
  private def cmpJoined(toks: Array[Array[Byte]], a0: Int, b0: Int, n: Int): Int = {
    var ta = 0; var pa = 0
    var tb = 0; var pb = 0
    while (true) {
      var ba = -1
      while (ba == -1 && ta < n) {
        val t = toks(a0 + ta)
        if (pa < t.length) { ba = t(pa) & 0xFF; pa += 1 }
        else if (ta + 1 < n) { ba = 0x20; ta += 1; pa = 0 }
        else ta += 1
      }
      var bb = -1
      while (bb == -1 && tb < n) {
        val t = toks(b0 + tb)
        if (pb < t.length) { bb = t(pb) & 0xFF; pb += 1 }
        else if (tb + 1 < n) { bb = 0x20; tb += 1; pb = 0 }
        else tb += 1
      }
      if (ba == -1 && bb == -1) return 0
      if (ba == -1) return -1
      if (bb == -1) return 1
      if (ba != bb) return ba - bb
    }
    0
  }

  private def cmpIdWin(ids: Array[Int], a0: Int, b0: Int, n: Int): Int = {
    var k = 0
    while (k < n) {
      val d = ids(a0 + k) - ids(b0 + k)
      if (d != 0) return d
      k += 1
    }
    0
  }

  /** Sorted window-start indices 0..m-1 under `cmp` (bottom-up merge —
    * no boxing; stability is irrelevant, equal windows are
    * interchangeable).
    */
  private def sortIdx(m: Int, cmp: (Int, Int) => Int): Array[Int] = {
    var src = Array.tabulate(m)(identity)
    var dst = new Array[Int](m)
    var width = 1
    while (width < m) {
      var lo = 0
      while (lo < m) {
        val mid = math.min(lo + width, m)
        val hi = math.min(lo + 2 * width, m)
        var i = lo; var j = mid; var k = lo
        while (i < mid && j < hi) {
          if (cmp(src(i), src(j)) <= 0) { dst(k) = src(i); i += 1 }
          else { dst(k) = src(j); j += 1 }
          k += 1
        }
        while (i < mid) { dst(k) = src(i); i += 1; k += 1 }
        while (j < hi) { dst(k) = src(j); j += 1; k += 1 }
        lo += 2 * width
      }
      val t = src; src = dst; dst = t
      width *= 2
    }
    src
  }

  /** cnt · (word chars of the gram) for the most frequent n-gram;
    * tie-break = lexicographically least joined gram (the sorted-run
    * fold: a strictly longer run replaces the best, so among equal
    * counts the first gram in sorted order wins).
    */
  private def topChars(toks: Array[Array[Byte]], nchars: Array[Int], n: Int): Long = {
    val m = toks.length - n + 1
    if (m <= 0) return 0L
    val idx = sortIdx(m, (a, b) => cmpJoined(toks, a, b, n))
    var bc = 0L
    var bestStart = idx(0)
    var rc = 0L
    var k = 0
    while (k < m) {
      if (k > 0 && cmpJoined(toks, idx(k - 1), idx(k), n) == 0) rc += 1L
      else rc = 1L
      if (rc > bc) { bc = rc; bestStart = idx(k) }
      k += 1
    }
    var s = 0L
    var j = bestStart
    while (j < bestStart + n) { s += nchars(j); j += 1 }
    bc * s
  }

  /** Word chars under the union of positions covered by any n-window
    * occurring ≥ 2× in the doc (exact window equality).
    */
  private def covChars(ids: Array[Int], nchars: Array[Int],
      covered: Array[Boolean], n: Int): Long = {
    val w = ids.length
    val m = w - n + 1
    if (m <= 0) return 0L
    val idx = sortIdx(m, (a, b) => cmpIdWin(ids, a, b, n))
    java.util.Arrays.fill(covered, 0, w, false)
    var runStart = 0
    var k = 1
    while (k <= m) {
      if (k == m || cmpIdWin(ids, idx(k - 1), idx(k), n) != 0) {
        if (k - runStart >= 2) {
          var r = runStart
          while (r < k) {
            var p = idx(r)
            val e = p + n
            while (p < e) { covered(p) = true; p += 1 }
            r += 1
          }
        }
        runStart = k
      }
      k += 1
    }
    var s = 0L
    var p = 0
    while (p < w) { if (covered(p)) s += nchars(p); p += 1 }
    s
  }
}

/** Struct of the ten token-derived Gopher repetition stats of one doc. */
case class GopherRepStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gopher_rep_stats expects array<string>, got $t")
  }
  override def dataType: DataType = GopherRepStats.schema
  override def prettyName: String = "gopher_rep_stats"
  override def nullSafeEval(a: Any): Any =
    GopherFolds.gopherStats(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.GopherFolds.gopherStats($a);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherRepStats {
  val schema: StructType = StructType(Seq(
    "n_word_chars", "top2_chars", "top3_chars", "top4_chars",
    "dup5_chars", "dup6_chars", "dup7_chars", "dup8_chars",
    "dup9_chars", "dup10_chars").map(StructField(_, LongType, nullable = false)))

  def apply(tokens: Column): Column =
    GraftBridge.column(GopherRepStats(GraftBridge.expression(tokens)))
}

/** Struct (n, n_dup, dup_chars, tot_chars) of one doc's paragraph/line
  * array — the duplicate-value character accounting of the Gopher
  * paragraph/line rules in one native pass.
  */
case class DupValueStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dup_value_stats expects array<string>, got $t")
  }
  override def dataType: DataType = DupValueStats.schema
  override def prettyName: String = "dup_value_stats"
  override def nullSafeEval(a: Any): Any =
    GopherFolds.dupStats(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.GopherFolds.dupStats($a);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DupValueStats {
  val schema: StructType = StructType(Seq(
    "n", "n_dup", "dup_chars", "tot_chars")
    .map(StructField(_, LongType, nullable = false)))

  def apply(arr: Column): Column =
    GraftBridge.column(DupValueStats(GraftBridge.expression(arr)))
}
