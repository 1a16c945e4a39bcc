package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.AgnosticEncoders
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch (HyperLogLog) — the 100 TB COUNT
  * DISTINCT path.
  *
  * Exact distinct needs a shuffle of every distinct key (that is what
  * Spark's `countDistinct` plans: expand + two-phase agg keyed on the
  * value). At scale the production shape is a bounded-state mergeable
  * summary: each partition folds its rows into a fixed 2^p-register
  * array, partials merge associatively (register-wise max) on the reduce
  * side, and the final read is O(m). This is HyperLogLog (Flajolet,
  * Fusy, Gandouet, Meunier 2007 — public algorithm) with the standard
  * small-range linear-counting correction; the reference engines expose
  * the same shape as approx_distinct.
  *
  * Completes the engine-owned sketch family next to count-min (q108,
  * heavy hitters) and KLL (q114, quantiles): all three are typed
  * [[Aggregator]]s (the §2.8 custom-agg surface) whose shuffle payload is
  * the sketch, never the values.
  *
  * Engineering choices:
  *  - input is a 64-bit `xxhash64` column hashed Spark-side (codegen'd,
  *    deterministic): top p bits pick the register, the leading-zero
  *    count of the remaining 64-p bits (+1) is the rank. Deterministic
  *    end-to-end; merge is order-independent, so re-runs and any
  *    partitioning reproduce the same estimate.
  *  - p=12 (4096 single-byte registers ≈ 4 KB state) gives a standard
  *    error of 1.04/sqrt(m) ≈ 1.6%; driver gates assert ±5%.
  *  - the register state is FIRST-CLASS: [[registersAgg]] surfaces it as
  *    an `array<int>` column, [[mergeRegisters]] is a native `zip_with`
  *    greatest, and [[estimate]] reads an estimate off any register
  *    column with built-in expressions only — so sketches can be
  *    persisted in a lake table and folded incrementally across batches
  *    (q121), exactly like the count-min cells of q108/q109. Every power
  *    of two and the fold order match the in-JVM path bit for bit, so
  *    a lake-folded estimate EQUALS the one-shot estimate.
  *  - Spark's own `approx_count_distinct` is the built-in equivalent
  *    (gated in q99); this aggregator is the engine-owned variant.
  */
object Hll {

  /** Registers: byte buffer of size 2^p folded per partition; merge =
    * element-wise max; finish surfaces `array<int>` for native reads.
    */
  final case class RegistersAgg(p: Int)
      extends Aggregator[Long, Array[Byte], Seq[Int]] {
    require(p >= 4 && p <= 16, s"HLL p must be in [4,16], got $p")
    private val m = 1 << p

    def zero: Array[Byte] = new Array[Byte](m)

    def reduce(regs: Array[Byte], hash: Long): Array[Byte] = {
      if (hash == Hll.NullSentinel) return regs // null input: not a value
      val idx = (hash >>> (64 - p)).toInt
      val w = hash << p
      // rank = leading zeros of the remaining bits + 1, capped so an
      // all-zero suffix still yields a valid register value
      val rank = (math.min(java.lang.Long.numberOfLeadingZeros(w), 64 - p) + 1)
        .toByte
      if (rank > regs(idx)) regs(idx) = rank
      regs
    }

    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    def finish(regs: Array[Byte]): Seq[Int] = regs.map(_.toInt).toSeq

    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Seq[Int]] =
      AgnosticEncoders.IterableEncoder(scala.reflect.classTag[Seq[Int]],
        AgnosticEncoders.PrimitiveIntEncoder, containsNull = false,
        lenientSerialization = false)
  }

  /** Null inputs must not count as a distinct value (countDistinct
    * semantics) — `xxhash64` would fold a null into its seed and count it.
    * The hash child is NULL for null values and the native fold skips
    * nulls; the typed [[RegistersAgg]] path uses this sentinel instead (a
    * genuine value hashing exactly here is ignored with probability
    * 2^-64, far below the sketch's own error).
    */
  private[graft] val NullSentinel: Long = 0x6c62272e07bb0142L

  /** Driver/state-side estimate over a raw register buffer — the SAME
    * arithmetic as the [[estimate]] Column (harmonic mean, standard
    * small-range linear-counting switch, identical fold order over the
    * registers), for callers holding registers OUTSIDE a plan — e.g.
    * [[graft.streaming.SigmaStream]]'s degraded value_count state. Keeping
    * one constant set means a stream-side estimate equals the batch-side
    * [[approxDistinct]] of the same values bit for bit.
    */
  def estimateScala(regs: Array[Byte], p: Int = 12): Double = {
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += 1.0 / (1L << regs(i)).toDouble
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m.toDouble * m.toDouble / invSum
    if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else raw
  }

  /** HLL register array (`array<int>`, length 2^p) as an aggregation
    * column over any expression. Null values are not counted. DataFrame
    * callers route through the NATIVE [[graft.plans.HllRegisters]]
    * aggregate — per-row update straight off the InternalRow, no encoder
    * round-trip; [[RegistersAgg]] remains the typed-Dataset surface.
    */
  def registersAgg(value: Column, p: Int = 12): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.HllRegisters(
        org.apache.spark.sql.GraftBridge.expression(
          when(value.isNotNull, xxhash64(value))), p)
        .toAggregateExpression())

  /** Merge two register columns: native element-wise max — associative,
    * commutative, idempotent, so lake folds are batch-cut independent.
    */
  def mergeRegisters(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => greatest(x, y))

  /** Estimate read off a register column, built-ins only (usable on lake
    * rows without the aggregator): harmonic mean with the standard
    * small-range linear-counting switch. Fold order and every constant
    * match the in-JVM path, so estimates are reproducible bit for bit.
    */
  def estimate(regs: Column, p: Int = 12): Column = {
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    // 2^-r exactly: 1/(1L << r). The functions-API shiftleft only takes a
    // literal shift, so build the catalyst node for a column shift.
    def pow2(r: Column): Column = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        org.apache.spark.sql.GraftBridge.expression(lit(1L)),
        org.apache.spark.sql.GraftBridge.expression(r)))
    val invSum = aggregate(regs, lit(0.0),
      (acc, r) => acc + lit(1.0) / pow2(r).cast("double"))
    val zeros = size(filter(regs, r => r === 0))
    val raw = lit(alpha * m.toDouble * m.toDouble) / invSum
    when(raw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
  }

  /** Approximate COUNT(DISTINCT expr) as an aggregation column. */
  def approxDistinct(value: Column, p: Int = 12): Column =
    estimate(registersAgg(value, p), p)

  // ------------------------------------------------- sparse lake rows

  /** Storage encoding for PERSISTED register rows (the q121 lake-fold
    * class): dense 4 KB per group is wasteful when group cardinality is
    * huge and most groups are small — a group that saw one value carries
    * one non-zero register. Below `maxFill` non-zero registers the row
    * stores packed `(idx << 6) | rank` ints (4 bytes per non-zero
    * register; a 1-distinct group is ONE int), above it the dense array
    * passes through unchanged — the promote happens transparently on the
    * next [[sparsify]] after a merge pushes fill over the threshold.
    * Round-trip is exact (HllSpec gates register-for-register equality),
    * so folded estimates keep bit-for-bit equality with one-shot.
    */
  def sparsify(regs: Column, p: Int = 12, maxFill: Int = 256): Column =
    org.apache.spark.sql.GraftBridge.column(graft.plans.HllSparsify(
      org.apache.spark.sql.GraftBridge.expression(regs), p, maxFill))

  /** Sparse-or-dense register column → dense (merge/estimate form). */
  def densify(regs: Column, p: Int = 12): Column =
    org.apache.spark.sql.GraftBridge.column(graft.plans.HllDensify(
      org.apache.spark.sql.GraftBridge.expression(regs), p))

  /** [[mergeRegisters]] accepting sparse or dense inputs on either side. */
  def mergeRegistersAuto(a: Column, b: Column, p: Int = 12): Column =
    mergeRegisters(densify(a, p), densify(b, p))
}
