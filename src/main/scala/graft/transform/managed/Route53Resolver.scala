package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Managed AWS Route 53 Resolver query-log mapping (reference
  * data/managed/log_sources/aws_route53_resolver_logs/log_source.yml):
  * JSON query logs → ECS dns.*, network typing (transport → iana number,
  * ip version), answer normalization (trailing-dot strip, CNAME naming,
  * related ip/host fan-out), and the Route 53 DNS-firewall vendor fields.
  */
object Route53Resolver {

  val rawSchema: StructType = StructType(Seq(
    StructField("account_id", StringType),
    StructField("region", StringType),
    StructField("vpc_id", StringType),
    StructField("query_timestamp", StringType),
    StructField("query_name", StringType),
    StructField("query_class", StringType),
    StructField("query_type", StringType),
    StructField("rcode", StringType),
    StructField("transport", StringType),
    StructField("srcaddr", StringType),
    StructField("srcport", StringType),
    StructField("srcids", StructType(Seq(StructField("instance", StringType)))),
    StructField("answers", ArrayType(StructType(Seq(
      StructField("Class", StringType),
      StructField("Type", StringType),
      StructField("Rdata", StringType))))),
    StructField("firewall_rule_action", StringType),
    StructField("firewall_rule_group_id", StringType),
    StructField("firewall_domain_list_id", StringType)))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    set("event.original", col("json"))
    set("event.kind", lit("event"))
    set("event.category", array(lit("network")))
    set("event.type", array(lit("protocol")))
    set("cloud.provider", lit("aws"))
    set("cloud.account.id", col("r.account_id"))
    set("ts", try_to_timestamp(col("r.query_timestamp")))
    set("cloud.region", col("r.region"))
    set("aws.vpc_id", col("r.vpc_id"))
    set("aws.instance_id", col("r.srcids.instance"))
    set("cloud.instance.id", g("aws.instance_id"))

    val qname = regexp_replace(col("r.query_name"), "\\.$", "")
    set("dns.question.name", qname)
    set("dns.question.class", col("r.query_class"))
    set("dns.question.type", col("r.query_type"))
    set("dns.response_code", col("r.rcode"))

    // answers: strip trailing dot, CNAME gets name = data
    set("dns.answers", F.transform(col("r.answers"), ans => {
      val data0 = ans.getField("Rdata")
      val data = when(data0.isNotNull && data0.endsWith("."),
        data0.substr(lit(1), length(data0) - 1)).otherwise(data0)
      val typ = ans.getField("Type")
      struct(
        ans.getField("Class").as("class"),
        typ.as("type"),
        data.as("data"),
        when(typ === "CNAME", data).as("name"))
    }))
    val answers = coalesce(g("dns.answers"),
      array().cast(ArrayType(StructType(Seq(
        StructField("class", StringType), StructField("type", StringType),
        StructField("data", StringType), StructField("name", StringType))))))
    set("related.ip", F.transform(
      filter(answers, a => a.getField("type").isin("A", "AAAA")), _.getField("data")))
    set("related.hosts", F.transform(
      filter(answers, a => a.getField("type").isin("CNAME", "PTR")), _.getField("data")))

    val transport = lower(col("r.transport"))
    set("network.transport", transport)
    set("network.iana_number",
      when(transport === "tcp", "6").when(transport === "udp", "17"))
    set("network.protocol", lit("dns"))

    set("source.port", col("r.srcport").try_cast(IntegerType))
    set("source.address", col("r.srcaddr"))
    set("source.ip", col("r.srcaddr"))
    set("network.type",
      when(col("r.srcaddr").contains("."), "ipv4")
        .when(col("r.srcaddr").contains(":"), "ipv6"))

    set("aws.route53.firewall.action", col("r.firewall_rule_action"))
    set("aws.route53.firewall.rule_group.id", col("r.firewall_rule_group_id"))
    set("aws.route53.firewall.domain_list.id", col("r.firewall_domain_list_id"))

    set("event.outcome",
      when(col("r.rcode") === "NOERROR", "success").otherwise("failure"))

    out = out.drop("r", "json")
    ecsFooter(out)
  }
}
