package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, xxhash64}

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
  *  - Spark's own `approx_count_distinct` is the built-in equivalent
  *    (gated in q99); this aggregator is the engine-owned variant the
  *    lake fold / streaming paths can persist and merge incrementally,
  *    like the count-min cells of q108/q109.
  */
object Hll {

  /** Registers: byte array of size 2^p; merge = element-wise max. */
  final case class HllAgg(p: Int) extends Aggregator[Long, Array[Byte], Double] {
    require(p >= 4 && p <= 16, s"HLL p must be in [4,16], got $p")
    private val m = 1 << p

    def zero: Array[Byte] = new Array[Byte](m)

    def reduce(regs: Array[Byte], hash: Long): Array[Byte] = {
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

    def finish(regs: Array[Byte]): Double = {
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      var invSum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        invSum += java.lang.Math.scalb(1.0, -regs(i).toInt)
        if (regs(i) == 0) zeros += 1
        i += 1
      }
      val raw = alpha * m.toDouble * m.toDouble / invSum
      // small-range correction: linear counting while registers are sparse
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    }

    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Approximate COUNT(DISTINCT expr) as an aggregation column. */
  def approxDistinct(value: Column, p: Int = 12): Column =
    udaf(HllAgg(p), Encoders.scalaLong).apply(xxhash64(value))
}
