package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Managed AWS WAF mapping (reference
  * data/managed/log_sources/aws_waf/log_source.yml): JSON web-ACL logs →
  * ECS. ARN decomposition feeds cloud.*, the http version splits into
  * network.protocol/http.version, allow/block becomes event.type, and the
  * terminating / non-terminating rule-match details keep their nested
  * shape (snake_cased) under aws.waf.
  */
object AwsWaf {

  private val matchDetail = StructType(Seq(
    StructField("conditionType", StringType),
    StructField("sensitivityLevel", StringType),
    StructField("location", StringType),
    StructField("matchedData", ArrayType(StringType))))

  val rawSchema: StructType = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("webaclId", StringType),
    StructField("action", StringType),
    StructField("httpSourceId", StringType),
    StructField("httpSourceName", StringType),
    StructField("terminatingRuleId", StringType),
    StructField("terminatingRuleType", StringType),
    StructField("httpRequest", StructType(Seq(
      StructField("clientIp", StringType),
      StructField("country", StringType),
      StructField("httpMethod", StringType),
      StructField("httpVersion", StringType),
      StructField("requestId", StringType),
      StructField("uri", StringType),
      StructField("args", StringType),
      StructField("headers", ArrayType(StructType(Seq(
        StructField("name", StringType), StructField("value", StringType)))))))),
    StructField("labels", ArrayType(StructType(Seq(StructField("name", StringType))))),
    StructField("terminatingRuleMatchDetails", ArrayType(matchDetail)),
    StructField("nonTerminatingMatchingRules", ArrayType(StructType(Seq(
      StructField("ruleId", StringType),
      StructField("action", StringType),
      StructField("ruleMatchDetails", ArrayType(matchDetail))))))))

  private def snakeDetail(v: Column): Column = struct(
    v.getField("conditionType").as("condition_type"),
    v.getField("sensitivityLevel").as("sensitivity_level"),
    v.getField("location").as("location"),
    v.getField("matchedData").as("matched_data"))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    set("event.kind", lit("event"))
    set("event.original", col("json"))
    set("event.category", array(lit("web")))
    set("event.action", col("r.action"))
    set("event.type", concat(array(lit("access")),
      when(col("r.action") === "ALLOW", array(lit("allowed")))
        .when(col("r.action") === "BLOCK", array(lit("denied")))
        .otherwise(array().cast(ArrayType(StringType)))))
    set("ts", timestamp_millis(col("r.timestamp")))

    // arn:partition:service:region:account_id:waf_id
    val arn = col("r.webaclId")
    def arnPart(i: Int) = {
      val ex = regexp_extract(arn, "arn:([^:]*):([^:]*):([^:]*):([^:]*):(.*)", i)
      when(ex =!= "", ex)
    }
    set("aws.waf.id", arnPart(5))
    set("aws.waf.arn", arn)
    set("aws.waf.request.headers", col("r.httpRequest.headers"))
    set("aws.waf.source.id", when(col("r.httpSourceId") =!= "-", col("r.httpSourceId")))
    set("aws.waf.source.name", when(col("r.httpSourceName") =!= "-", col("r.httpSourceName")))

    set("cloud.provider", lit("aws"))
    set("cloud.account.id", arnPart(4))
    set("cloud.region", arnPart(3))
    set("cloud.service.name", arnPart(2))

    // "HTTP/1.1" → protocol http, version 1.1
    val httpVer = col("r.httpRequest.httpVersion")
    val proto = regexp_extract(httpVer, "(\\w+)/([0-9.]+)", 1)
    val ver = regexp_extract(httpVer, "(\\w+)/([0-9.]+)", 2)
    set("http.version", when(ver =!= "", ver))
    set("http.request.method", col("r.httpRequest.httpMethod"))
    set("http.request.id", col("r.httpRequest.requestId"))
    set("network.protocol", when(proto =!= "", lower(proto)))
    set("network.transport", when(lower(proto) === "http", "tcp"))

    set("related.ip", filter(array(col("r.httpRequest.clientIp")), x => x.isNotNull))
    set("rule.id", col("r.terminatingRuleId"))
    set("rule.ruleset", col("r.terminatingRuleType"))
    set("source.geo.country_iso_code", col("r.httpRequest.country"))
    set("source.ip", col("r.httpRequest.clientIp"))
    set("url.query", col("r.httpRequest.args"))
    set("url.path", col("r.httpRequest.uri"))

    set("aws.waf.labels", F.transform(col("r.labels"), v => v.getField("name")))
    set("tags", g("aws.waf.labels"))
    set("aws.waf.terminating_rule_match_details",
      F.transform(col("r.terminatingRuleMatchDetails"), v => snakeDetail(v)))
    set("aws.waf.non_terminating_matching_rules",
      F.transform(col("r.nonTerminatingMatchingRules"), rule => struct(
        rule.getField("ruleId").as("rule_id"),
        rule.getField("action").as("action"),
        F.transform(rule.getField("ruleMatchDetails"), v => snakeDetail(v)).as("rule_match_details"))))

    out = out.drop("r", "json")
    ecsFooter(out)
  }
}
