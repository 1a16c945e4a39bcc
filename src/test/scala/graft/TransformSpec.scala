package graft

import graft.sources.Framing
import graft.transform.{Compact, Grok, TransformDsl}
import graft.transform.TransformDsl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Transform DSL, grok, compact, framing (fixtures from FIXTURES.md). */
class TransformSpec extends SparkSpec {
  import spark.implicits._

  test("setPath creates nested structs; getPath reads them back") {
    val df = Seq(("a", 1)).toDF("name", "v")
    val out = setPath(df, "user.meta.score", col("v") * 10)
    assert(out.select(col("user.meta.score")).head.getInt(0) == 10)
  }

  test("setPath on existing struct overwrites only the addressed field") {
    val df = Seq(("x", "y")).toDF("a", "b")
      .select(struct(col("a"), col("b")).as("s"))
    val out = setPath(df, "s.a", lit("z"))
    assert(out.select("s.a", "s.b").head == Row("z", "y"))
  }

  test("getPath resolves missing roots AND missing intermediate fields to null") {
    val df = Seq(("a", 1)).toDF("name", "v")
      .select(struct(col("name")).as("user"), col("v"))
    assert(df.select(getPath(df, "nope.x")).head.isNullAt(0))          // missing root
    assert(df.select(getPath(df, "user.meta.score")).head.isNullAt(0)) // missing intermediate
    assert(df.select(getPath(df, "user.name")).head.getString(0) == "a")
    assert(df.select(getPath(df, "v.x")).head.isNullAt(0))             // path through non-struct
  }

  test("rename implements the del+assign idiom") {
    val df = Seq(("ev1", 5)).toDF("eventName", "n")
    val out = Transform(Seq(Rename("eventName", "event.action")))(df)
    assert(out.columns.toSet == Set("n", "event"))
    assert(out.select("event.action").head.getString(0) == "ev1")
  }

  test("abort drops matching records; null condition does not abort") {
    val df = Seq(("header", 0), ("data", 1), (null, 2)).toDF("kind", "i")
    val out = Transform(Seq(AbortWhen(col("kind") === "header")))(df)
    assert(out.select("i").as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("parseKeyValue keeps last value for repeated keys, drops bare tokens") {
    val df = Seq("OU=a, OU=b, CN=x, garbage", "k=v1 v2=").toDF("s")
    val out1 = df.filter(col("s").contains("OU"))
      .select(parseKeyValue(col("s"), ", ", "=").as("m"))
    assert(out1.select(element_at(col("m"), "OU")).head.getString(0) == "b")
    assert(out1.select(element_at(col("m"), "CN")).head.getString(0) == "x")
    assert(out1.select(element_at(col("m"), "garbage")).head.isNullAt(0))
    val out2 = df.filter(col("s").startsWith("k"))
      .select(parseKeyValue(col("s")).as("m"))
    assert(out2.select(element_at(col("m"), "k")).head.getString(0) == "v1")
    assert(out2.select(element_at(col("m"), "v2")).head.getString(0) == "")
  }

  test("grok compiles patterns to regex and extracts typed fields") {
    val g = Grok.compile("%{IPV4:ip} - %{WORD:user} \"%{DATA:msg}\" %{INT:code}")
    val df = Seq("10.0.0.5 - alice \"GET /x\" 200", "not a log line").toDF("line")
    val cols = g.columns(col("line"))
    val out = df.select(cols("ip").as("ip"), cols("user").as("user"),
      cols("code").as("code")).collect()
    assert(out(0) == Row("10.0.0.5", "alice", "200"))
    assert(out(1) == Row(null, null, null))
  }

  test("compact nulls empty strings/arrays and all-null structs") {
    val df = Seq(("", Seq.empty[String], ("x", "")), ("a", Seq("b"), (null, null)))
      .toDF("s", "arr", "st")
    val out = Compact.compactAll(df).collect()
    assert(out(0) == Row(null, null, Row("x", null)))
    assert(out(1) == Row("a", Seq("b"), null))
  }

  test("cloudwatch subscription payloads explode into per-event rows") {
    val payload =
      """{"messageType":"DATA_MESSAGE","owner":"1","logGroup":"/aws/fn","logStream":"s",
        |"subscriptionFilters":["f"],
        |"logEvents":[{"id":"1","timestamp":1673386272000,"message":"{\"level\":\"info\"}"},
        |{"id":"2","timestamp":1673386273000,"message":"plain"}]}""".stripMargin.replace("\n", "")
    val control = """{"messageType":"CONTROL_MESSAGE","logEvents":[]}"""
    val df = Seq(payload, control).toDF("message")
    val out = Framing.cloudwatchExpand(df)
    val rows = out.orderBy("ts").collect()
    assert(rows.length == 2)
    assert(rows(1).getAs[String]("message") == "plain")
    assert(rows(0).getAs[String]("log_group") == "/aws/fn")
  }

  test("csv framing with configured headers trims and null-fills") {
    val df = Seq("my-bucket, path/to/object.txt", "only-bucket").toDF("message")
    val out = Framing.csvWithHeaders(df, Seq("Bucket", "Key")).collect()
    assert(out(0) == Row("my-bucket", "path/to/object.txt"))
    assert(out(1).getString(0) == "only-bucket" && out(1).isNullAt(1))
  }

  test("pre-transform json parse routes objects to json, text to message") {
    val df = Seq("""{"a":1}""", "plain text", "{broken").toDF("message")
    val out = Framing.preTransformJsonParse(df).collect()
    assert(out(0).getAs[String]("json") == """{"a":1}""" && out(0).isNullAt(0))
    assert(out(1).getAs[String]("message") == "plain text")
    assert(out(2).getAs[String]("message") == "{broken")
  }

  test("content routing fans one source into per-table frames") {
    val df = Seq(("cloudtrail", 1), ("s3", 2), ("cloudtrail", 3)).toDF("kind", "i")
    val routed = Framing.routeByContent(df, col("kind"))
    val tables = Framing.routedTables(routed, Seq("cloudtrail", "s3"))
    assert(tables("cloudtrail").count() == 2 && tables("s3").count() == 1)
  }
}
