package graft

import graft.operators.{Alerts, Detection}
import graft.plans.AnchoredSession
import graft.queries.Alerting
import org.apache.spark.sql.functions._

/** Native anchored-session operator: result parity with the Dataset fold
  * and the expected physical shape (one shuffle, sorted input).
  */
class AnchoredSessionSpec extends SparkSpec {
  import spark.implicits._

  private def matches = Detection.ruleMatches(
    Tables.load(spark, sf, "events"), Alerting.rules, matchId = col("event_id"))

  test("native operator output equals the Dataset fold on real data") {
    val cfg = Alerts.AlertConfig(threshold = 2, windowSeconds = 1800)
    val m = matches.filter(col("rule_name") === "error_burst")
    val expected = Alerts.aggregate(spark, m, cfg).toDF
      .select("rule_name", "dedupe", "alert_id", "first_matched_at",
        "last_matched_at", "match_count", "activated", "created_at")
      .collect().toSet
    val got = AnchoredSession.aggregate(spark, m, cfg).collect().toSet
    assert(got.nonEmpty)
    assert(got == expected)
  }

  test("plan shape: exchange on keys + sort feed the custom exec") {
    val cfg = Alerts.AlertConfig(1, 3600)
    val plan = AnchoredSession.aggregate(spark, matches, cfg)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AnchoredSession"))
    assert(plan.contains("Exchange hashpartitioning"))
    assert(plan.contains("Sort ["))
  }

  test("window boundary and threshold semantics survive the native path") {
    val m = Seq(
      ("r", "k", 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("r", "k", 2L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00")),
      ("r", "k", 3L, java.sql.Timestamp.valueOf("2024-01-01 00:31:00")),
      ("r", "z", 4L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    ).toDF("rule_name", "dedupe", "match_id", "ts")
    val out = AnchoredSession.aggregate(spark, m,
      Alerts.AlertConfig(threshold = 2, windowSeconds = 1800))
      .orderBy("dedupe", "first_matched_at").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("match_count") == 2 && out(0).getAs[Boolean]("activated"))
    assert(out(0).getAs[java.sql.Timestamp]("created_at")
      == java.sql.Timestamp.valueOf("2024-01-01 00:05:00"))
    assert(out(1).getAs[Long]("match_count") == 1 && !out(1).getAs[Boolean]("activated"))
    assert(out(1).isNullAt(out(1).fieldIndex("created_at")))
    assert(out(2).getAs[String]("dedupe") == "z")
  }
}
