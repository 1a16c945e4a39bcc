package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-vector math over `array<float>` embedding columns, as sequential
  * fold expressions (`zip_with` + `aggregate`): left-to-right summation is
  * deterministic and matches a scalar reference implementation bit-for-bit,
  * so similarity scores are engine-portable without tolerance comparisons.
  * All codegen'd — no UDFs in the hot path.
  */
object VectorFunctions {

  /** Cast array<float> → array<double> (exact widening). */
  def asDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Sequential left-to-right sum of an array<double>. */
  def seqSum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    seqSum(zip_with(a, b, (x, y) => x * y))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fold-composed cosine (reference form; bit-equal to cosine below). */
  def cosineFold(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Fused native cosine (one generated loop — the hot-path form). */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineSimilarity(a, b)

  /** Squared L2 distance (no sqrt — ranking-equivalent, cheaper). */
  def l2sq(a: Column, b: Column): Column =
    seqSum(zip_with(a, b, (x, y) => (x - y) * (x - y)))

  /** Per-vector symmetric int8 quantization scale: 127 / max|x|
    * (0.0 for the zero vector). Stored next to the codes for dequant.
    */
  def int8Scale(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x)))
    when(maxAbs > 0, lit(127.0) / maxAbs).otherwise(lit(0.0))
  }

  /** Symmetric int8 codes: clamp(floor(x*scale + 0.5), -127, 127) —
    * `floor(+0.5)` rather than `round()` because Spark's round on doubles
    * goes through shortest-decimal HALF_UP while other engines round the
    * binary value; floor is the same IEEE operation everywhere, so codes
    * are bit-reproducible cross-engine. A 4x memory cut for ANN search:
    * at 100 TB of fp32 embeddings the quantized corpus is what fits in
    * cluster RAM; scoring dequantizes as (qa·qb)/(sa·sb) within a few
    * ULPs of the fp32 cosine numerator.
    */
  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec, x =>
      greatest(lit(-127L), least(lit(127L), floor(x * scale + lit(0.5)))))

  /** [[quantizeInt8]] narrowed to `array<tinyint>` — the true 1-byte
    * at-rest representation (4x smaller than fp32, 8x than the double
    * working form). This is the column an ANN index stores and shuffles;
    * scoring widens each code back to long inside the generated loop
    * (register-level, free).
    */
  def quantizeInt8Bytes(vec: Column, scale: Column): Column =
    transform(quantizeInt8(vec, scale), x => x.cast(ByteType))

  /** Exact int64 dot product of two int8 code arrays. Codes are in
    * [-127, 127], so 64-dim dots stay below 2^21 — no overflow, and every
    * intermediate is exactly representable, which is what lets an external
    * engine reproduce quantized scores bit-for-bit.
    */
  /** Exact int64 squared L2 distance of two int8 code arrays — the
    * assignment metric of the quantized k-means family. Same overflow
    * argument as [[dotInt]]: per-dim deltas ≤ 254, 64-dim sums < 2^23.
    */
  def l2sqInt(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast(LongType) - y.cast(LongType)) * (x.cast(LongType) - y.cast(LongType))),
      lit(0L), (acc, x) => acc + x)

  def dotInt(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(LongType) * y.cast(LongType)),
      lit(0L), (acc, x) => acc + x)

  /** Cosine similarity computed ENTIRELY in the int8 code domain. The
    * per-vector symmetric scales cancel:
    * (qa/sa)·(qb/sb) / (|qa/sa|·|qb/sb|) = qa·qb / (|qa||qb|) — so no
    * scale column is needed at scoring time and the only inputs are the
    * 1-byte codes. Integer dots are exact; the final sqrt/divide is the
    * same IEEE arithmetic in any engine (no tolerance needed in oracles).
    * A degenerate all-zero vector (norm 0) scores 0.0, not NaN — NaN
    * ordering differs between Spark and external engines, so a NaN here
    * would silently reorder top-k results against an oracle.
    */
  def cosineInt8(a: Column, b: Column): Column = {
    val denom = sqrt(dotInt(a, a).cast(DoubleType)) * sqrt(dotInt(b, b).cast(DoubleType))
    when(denom > 0d, dotInt(a, b).cast(DoubleType) / denom).otherwise(lit(0d))
  }
}
