package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Range-join semantics vs the naive theta-join, bucket-boundary cases,
  * plan shape (equi hash join, no nested-loop), and the IPv4/CIDR helpers.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val ranges = Seq(
    // (range_id, lo, hi)  — widths straddle the bucket size (100) on purpose
    (1L, 0L, 9L),        // within bucket 0
    (2L, 95L, 105L),     // straddles buckets 0/1
    (3L, 100L, 399L),    // spans buckets 1..3
    (4L, 250L, 260L),    // nested inside range 3 (overlap)
    (5L, 1000L, 1000L)   // single-point range on a bucket boundary
  ).toDF("range_id", "lo", "hi")

  private val points = Seq(
    (10L, 0L), (11L, 9L), (12L, 10L),   // range 1 edges + miss
    (13L, 95L), (14L, 100L), (15L, 105L), (16L, 106L),
    (17L, 255L),                         // overlapping ranges 3+4
    (18L, 399L), (19L, 400L),            // hi edge + miss
    (20L, 1000L), (21L, 999L)
  ).toDF("pid", "p")

  private def naive = points.join(ranges, col("p").between(col("lo"), col("hi")))

  test("bucketed result equals the naive theta-join, boundaries inclusive") {
    for (width <- Seq(7L, 100L, 1000L)) {
      val got = RangeJoin.pointInRange(points, "p", ranges, "lo", "hi", width)
        .select("pid", "range_id").as[(Long, Long)].collect().toSet
      val want = naive.select("pid", "range_id").as[(Long, Long)].collect().toSet
      assert(got == want, s"width=$width")
      assert(want.contains((17L, 3L)) && want.contains((17L, 4L))) // multi-match
      assert(want.contains((10L, 1L)) && want.contains((11L, 1L))) // lo/hi edges
      assert(!want.exists(_._1 == 12L) && !want.exists(_._1 == 19L)) // misses drop
    }
  }

  test("randomized: bucketed equals naive on 500 points x 40 ranges") {
    val rnd = new scala.util.Random(7)
    val rs = (1 to 40).map { i =>
      val lo = rnd.nextInt(5000).toLong; (i.toLong, lo, lo + rnd.nextInt(300))
    }.toDF("range_id", "lo", "hi")
    val ps = (1 to 500).map(i => (i.toLong, rnd.nextInt(5500).toLong)).toDF("pid", "p")
    val got = RangeJoin.pointInRange(ps, "p", rs, "lo", "hi", 128)
      .select("pid", "range_id").as[(Long, Long)].collect().toSet
    val want = ps.join(rs, col("p").between(col("lo"), col("hi")))
      .select("pid", "range_id").as[(Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("plan is an equi hash join — no nested-loop, no cartesian") {
    val plan = RangeJoin
      .pointInRange(points, "p", ranges, "lo", "hi", 100, broadcastRanges = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("enrich keeps every point row; pickOne keeps the most specific range") {
    val out = RangeJoin
      .enrich(points, "pid", "p", ranges, "lo", "hi", bucketWidth = 100)
      .collect().map(r => r.getAs[Long]("pid") -> Option(r.getAs[Any]("range_id"))).toMap
    assert(out.size == 12) // every point row survives exactly once
    assert(out(17L) == Some(4L)) // nested (smaller) range wins over range 3
    assert(out(12L) == None && out(19L) == None)
  }

  test("ipv4ToLong and cidrBounds") {
    val df = Seq(
      ("0.0.0.0", "10.1.0.0/16"),
      ("255.255.255.255", "192.168.4.17/30"),
      ("10.1.2.3", "0.0.0.0/0"),
      ("999.1.2.3", "1.2.3.4/32")
    ).toDF("ip", "cidr")
      .select(
        RangeJoin.ipv4ToLong(col("ip")).as("ipn"),
        RangeJoin.cidrBounds(col("cidr")).as("b"))
      .select("ipn", "b.lo", "b.hi")
      .collect()
    assert(Option(df(0).getAs[Any]("ipn")) == Some(0L))
    assert(df(0).getAs[Long]("lo") == (10L << 24 | 1L << 16))
    assert(df(0).getAs[Long]("hi") == (10L << 24 | 1L << 16 | 0xFFFFL))
    assert(df(1).getAs[Long]("ipn") == 0xFFFFFFFFL)
    assert(df(1).getAs[Long]("hi") - df(1).getAs[Long]("lo") == 3L)
    assert(df(2).getAs[Long]("lo") == 0L && df(2).getAs[Long]("hi") == 0xFFFFFFFFL)
    assert(df(3).isNullAt(df(3).fieldIndex("ipn"))) // malformed octet -> null
    assert(df(3).getAs[Long]("lo") == df(3).getAs[Long]("hi")) // /32 single host
  }
}
