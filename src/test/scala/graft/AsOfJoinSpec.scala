package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** As-of join semantics: direction, tie inclusivity, tolerance, key
  * isolation, null handling, and the null-carried-value atomicity case.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val left = Seq(
    (1L, "a", ts("2024-01-01 10:00:00")),
    (2L, "a", ts("2024-01-01 12:00:00")),
    (3L, "b", ts("2024-01-01 11:00:00")),
    (4L, "c", ts("2024-01-01 11:00:00")) // key with no right rows
  ).toDF("id", "k", "ts")

  private val right = Seq(
    ("a", ts("2024-01-01 09:00:00"), 1.0),
    ("a", ts("2024-01-01 10:00:00"), 2.0), // tie with left id=1
    ("a", ts("2024-01-01 11:30:00"), 3.0),
    ("b", ts("2024-01-01 11:45:00"), 9.0) // only AFTER left id=3
  ).toDF("k", "ts", "v")

  private def byId(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
    df.collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("rv")).map(_.asInstanceOf[Double]))
      .toMap

  test("backward inclusive picks the latest right row at-or-before each left ts") {
    val out = byId(AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("v" -> "rv")))
    assert(out == Map(1L -> Some(2.0), 2L -> Some(3.0), 3L -> None, 4L -> None))
  }

  test("strict backward excludes the equal-timestamp right row") {
    val out = byId(
      AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("v" -> "rv"), strict = true))
    assert(out(1L) == Some(1.0)) // 10:00 tie excluded, falls back to 09:00
    assert(out(2L) == Some(3.0))
  }

  test("forward picks the earliest right row at-or-after each left ts") {
    val out = byId(
      AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("v" -> "rv"),
        direction = AsOfJoin.Forward))
    assert(out == Map(1L -> Some(2.0), 2L -> None, 3L -> Some(9.0), 4L -> None))
  }

  test("tolerance nulls matches beyond the window but keeps the left row") {
    val out = byId(
      AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("v" -> "rv"),
        tolerance = Some(expr("INTERVAL 40 MINUTES"))))
    // id=2's latest prior right row is 11:30 (30 min gap, kept);
    // id=1's is the 10:00 tie (0 min); none for b/c.
    assert(out == Map(1L -> Some(2.0), 2L -> Some(3.0), 3L -> None, 4L -> None))
    val tight = byId(
      AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("v" -> "rv"),
        tolerance = Some(expr("INTERVAL 10 MINUTES"))))
    assert(tight == Map(1L -> Some(2.0), 2L -> None, 3L -> None, 4L -> None))
  }

  test("null right keys never match; left rows with null keys survive unmatched") {
    val l = Seq((1L, Option.empty[String], ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val r = Seq((Option.empty[String], ts("2024-01-01 09:00:00"), 5.0)).toDF("k", "ts", "v")
    val out = byId(AsOfJoin.asOf(l, r, Seq("k"), "ts", "ts", Seq("v" -> "rv")))
    assert(out == Map(1L -> None))
  }

  test("a matched right row with a null carried value stays null (struct atomicity)") {
    val l = Seq((1L, "a", ts("2024-01-01 12:00:00"))).toDF("id", "k", "ts")
    val r = Seq(
      ("a", ts("2024-01-01 09:00:00"), Some(7.0)),
      ("a", ts("2024-01-01 11:00:00"), Option.empty[Double]) // latest, value null
    ).toDF("k", "ts", "v")
    val out = byId(AsOfJoin.asOf(l, r, Seq("k"), "ts", "ts", Seq("v" -> "rv")))
    // must NOT see through to the older 7.0
    assert(out == Map(1L -> None))
  }

  test("randomized: matches an independent per-row scan model (800 x 600 rows)") {
    val rnd = new scala.util.Random(13)
    def randTs() = new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)
    val lrows = (1 to 800).map(i => (i.toLong, s"k${rnd.nextInt(12)}", randTs()))
    val rrows = (1 to 600).map(i => (s"k${rnd.nextInt(15)}", randTs(), rnd.nextDouble()))
    val l = lrows.toDF("id", "k", "ts")
    val r = rrows.toDF("k", "ts", "v")
    for (strict <- Seq(false, true)) {
      val got = byId(AsOfJoin.asOf(l, r, Seq("k"), "ts", "ts", Seq("v" -> "rv"),
        strict = strict))
      val want = lrows.map { case (id, k, ts) =>
        val qualifying = rrows.filter { case (rk, rts, _) =>
          rk == k && (if (strict) rts.getTime < ts.getTime else rts.getTime <= ts.getTime)
        }
        // random millisecond timestamps: collisions vanishingly unlikely,
        // so maxBy is unambiguous
        id -> (if (qualifying.isEmpty) None else Some(qualifying.maxBy(_._2.getTime)._3))
      }.toMap
      assert(got == want, s"strict=$strict")
      assert(want.values.count(_.isDefined) > 500) // the model isn't vacuous
    }
  }

  test("plan shape: exactly one exchange, no join operator") {
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("v" -> "rv"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in plan:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
