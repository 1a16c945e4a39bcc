package graft

import graft.operators.{AlertContext, Enrichment}
import graft.transform.TransformDsl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Alert context merge/diff, enrichment upsert, url/user-agent parsing. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("alert context merge dedups and preserves order; diff yields additions") {
    val df = Seq((Seq("a", "b"), Seq("b", "c"))).toDF("old", "new")
    val out = df.select(
      AlertContext.merge(col("old"), col("new")).as("m"),
      AlertContext.diff(col("old"), col("new")).as("d")).head
    assert(out.getSeq[String](0) == Seq("a", "b", "c"))
    assert(out.getSeq[String](1) == Seq("c"))
  }

  test("alert context merge tolerates nulls on either side") {
    val df = Seq((null: Seq[String], Seq("x"))).toDF("old", "new")
    val out = df.select(AlertContext.merge(col("old"), col("new")).as("m")).head
    assert(out.getSeq[String](0) == Seq("x"))
  }

  test("mergeMaps merges key-wise and passes through null sides") {
    val df = Seq(
      (Map("ip" -> Seq("1.1.1.1")), Map("ip" -> Seq("2.2.2.2"), "user" -> Seq("u"))),
      (null.asInstanceOf[Map[String, Seq[String]]], Map("ip" -> Seq("3.3.3.3")))
    ).toDF("old", "new")
    val out = df.select(AlertContext.mergeMaps(col("old"), col("new")).as("m")).collect()
    val m0 = out(0).getMap[String, scala.collection.Seq[String]](0)
    assert(m0("ip").toList == List("1.1.1.1", "2.2.2.2"))
    assert(m0("user").toList == List("u"))
    assert(out(1).getMap[String, scala.collection.Seq[String]](0)("ip").toList == List("3.3.3.3"))
  }

  test("enrichment mergeUpsert: updates win, unmatched rows survive") {
    val main = Seq(("k1", "old1"), ("k2", "old2")).toDF("pk", "v")
    val temp = Seq(("k2", "new2"), ("k3", "new3")).toDF("pk", "v")
    val out = Enrichment.mergeUpsert(main, temp, "pk")
      .orderBy("pk").collect()
    assert(out.toSeq == Seq(Row("k1", "old1"), Row("k2", "new2"), Row("k3", "new3")))
  }

  test("cosine_similarity is callable from spark.sql") {
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head
    assert(r.getDouble(0) == 1.0)
  }

  test("delivery renderers produce deterministic CDC and slack payloads") {
    import graft.operators.{Alerts => A, Delivery}
    val alerts = Seq(A.AlertRow("r1", "k", "id1",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-01 00:05:00"),
      3L, true, None)).toDF
    val cdc = Delivery.cdcPayload(alerts).head
    assert(cdc.getString(0) == "id1" && cdc.getString(1).contains("\"match_count\":3"))
    val slack = Delivery.slackText(alerts).head
    assert(slack.getString(1).contains("*r1*") && slack.getString(1).contains("3 matches"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    Delivery.deliver(Delivery.cdcPayload(alerts),
      batch => got ++= batch)
    assert(got.size == 1 && got.head._1 == "id1")
  }

  test("parse_url extracts scheme/host/path/query") {
    val df = Seq("https://example.com:8443/a/b?x=1&y=2").toDF("u")
    val r = df.select(TransformDsl.parseUrl(col("u")).as("p"))
      .select("p.scheme", "p.host", "p.path", "p.query").head
    assert(r == Row("https", "example.com", "/a/b", "x=1&y=2"))
  }

  test("parse_user_agent classifies cli and browser agents") {
    val df = Seq("aws-cli/2.9 Python/3.9",
      "Mozilla/5.0 (iPhone) Safari/604.1").toDF("ua")
    val rows = df.select(TransformDsl.parseUserAgent(col("ua")).as("p"))
      .select("p.name", "p.version", "p.device").collect()
    assert(rows(0) == Row("aws-cli", "2.9", "other"))
    assert(rows(1) == Row("Safari", "604.1", "mobile"))
  }
}
