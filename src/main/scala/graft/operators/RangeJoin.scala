package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Point-in-interval (range) join via prefix bucketing.
  *
  * The security-lake shape of this is IP-in-CIDR enrichment: attach the
  * threat-feed / GeoIP / ASN range record covering each event's address.
  * The reference's enrichment joins are exact-key only
  * (`lib/rust/shared/src/functions.rs:108-255` — point lookups against an
  * indexed table); range feeds force users out to their ad-hoc SQL engine,
  * where the textbook formulation
  *
  *   `points JOIN ranges ON p BETWEEN lo AND hi`
  *
  * has no equi-key, so Spark (and Trino/Athena alike) plans a broadcast
  * nested-loop join: O(|points| x |ranges|) comparisons — a scale-killer at
  * 100 TB of events against a million-entry feed.
  *
  * This operator restores an equi-join: every range [lo, hi] is exploded to
  * the fixed-width buckets it covers (`ceil(span / width)` rows — bounded,
  * small when width ~ median span), every point probes exactly ONE bucket
  * (`p div width`), and the residual `BETWEEN` filters within the bucket.
  * The join is then a plain hash join on the bucket key: broadcastable when
  * the feed is small, shuffle-partitioned (and AQE-skew-splittable) when
  * not. A hot bucket degrades to (ranges-in-bucket x points-in-bucket)
  * within one task, never to the full cross product.
  *
  * Domain: non-negative integral points/bounds (IPv4 as unsigned-in-long,
  * ports, epoch seconds). Inclusive on both ends, matching SQL BETWEEN.
  */
object RangeJoin {

  private val BUCKET = "__range_bucket"

  /** Exact integral floor-division (SQL `div`) — `Column./` is double
    * division, which loses exactness past 2^53.
    */
  private def idiv(c: Column, w: Long): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    GraftBridge.column(
      new IntegralDivide(GraftBridge.expression(c.cast(LongType)), Literal(w)))
  }

  /** Inner point-in-range join: one output row per (point row, covering
    * range). Overlapping ranges multi-match; uncovered points drop.
    *
    * @param bucketWidth bucket size in point units; choose near the median
    *                    range span — each range emits `span/width + 1`
    *                    bucket rows, each point probes one bucket.
    * @param broadcastRanges hint the exploded range side as broadcastable
    *                        (right for feeds up to ~10s of MB).
    */
  def pointInRange(
      points: DataFrame,
      pointCol: String,
      ranges: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Long,
      broadcastRanges: Boolean = false): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val exploded = ranges.withColumn(
      BUCKET,
      explode(sequence(idiv(col(loCol), bucketWidth), idiv(col(hiCol), bucketWidth))))
    val rangeSide = if (broadcastRanges) broadcast(exploded) else exploded
    points
      .withColumn(BUCKET, idiv(col(pointCol), bucketWidth))
      .join(rangeSide, Seq(BUCKET))
      .where(col(pointCol).between(col(loCol), col(hiCol)))
      .drop(BUCKET)
  }

  /** Left-outer enrichment variant: every point row survives; covered rows
    * gain the range columns, uncovered rows carry nulls. When `pickOne` a
    * deterministic single match (smallest [lo, hi]) is kept per point row —
    * the usual "most specific CIDR wins" feed semantics — keyed by
    * `pointId` (a unique point-row key).
    */
  def enrich(
      points: DataFrame,
      pointId: String,
      pointCol: String,
      ranges: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Long,
      broadcastRanges: Boolean = true,
      pickOne: Boolean = true): DataFrame = {
    val rangeCols = ranges.columns.toSeq
    val matched0 = pointInRange(
      points.select(pointId, pointCol), pointCol, ranges, loCol, hiCol,
      bucketWidth, broadcastRanges)
    val matched =
      if (!pickOne) matched0
      else {
        // min_by over a struct orders by (span, lo): most specific range,
        // ties broken by position — deterministic, one shuffle on pointId.
        val packed = struct(
          (col(hiCol) - col(loCol)).as("__span") +: col(loCol).as("__lo") +:
            rangeCols.map(col): _*)
        matched0
          .groupBy(col(pointId))
          .agg(min(packed).as("__best"))
          .select(col(pointId) +: rangeCols.map(c => col(s"__best.$c").as(c)): _*)
      }
    points.join(matched.drop(pointCol), Seq(pointId), "left")
  }

  /** Dotted-quad IPv4 string → unsigned value in a long (codegen'd
    * built-ins only). Malformed input → null via try arithmetic.
    */
  def ipv4ToLong(ip: Column): Column = {
    val parts = split(ip, "\\.")
    when(size(parts) === 4,
      aggregate(parts, lit(0L),
        (acc, x) => acc * 256 + when(x.cast(LongType).between(0, 255), x.cast(LongType))))
  }

  /** CIDR string ("10.1.0.0/16") → inclusive [lo, hi] bounds struct. */
  def cidrBounds(cidr: Column): Column = {
    val base = ipv4ToLong(element_at(split(cidr, "/"), 1))
    val bits = element_at(split(cidr, "/"), 2).cast(LongType)
    // 2^(32-bits): shiftleft needs a literal shift, so go through pow —
    // double-exact for every power of two up to 2^32
    val span = pow(lit(2.0), (lit(32L) - bits).cast("double")).cast(LongType)
    val lo = base - pmod(base, span)
    struct(lo.as("lo"), (lo + span - 1).as("hi"))
  }
}
