package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed Zeek dns.log mapping (reference
  * data/managed/log_sources/zeek/tables/dns.yml, fixture F3): JSON lines
  * with epoch-float `ts`, dotted `id.*` endpoint fields, DNS answer
  * arrays → ECS dns.*, source/destination, network.transport, related.ip.
  */
object ZeekDns {

  val rawSchema: StructType = StructType(Seq(
    StructField("ts", DoubleType),
    StructField("uid", StringType),
    StructField("id.orig_h", StringType),
    StructField("id.orig_p", IntegerType),
    StructField("id.resp_h", StringType),
    StructField("id.resp_p", IntegerType),
    StructField("proto", StringType),
    StructField("query", StringType),
    StructField("qclass_name", StringType),
    StructField("qtype_name", StringType),
    StructField("rcode_name", StringType),
    StructField("answers", ArrayType(StringType)),
    StructField("TTLs", ArrayType(DoubleType)),
    StructField("rejected", BooleanType)))

  def apply(df: DataFrame): DataFrame = {
    val parsed = df.withColumn("r", from_json(col("json"), rawSchema))
    val ips = filter(coalesce(col("r.answers"), array().cast(ArrayType(StringType))),
      x => isIpv4(x))
    val shaped = parsed
      .withColumn("ts", timestamp_seconds(col("r.ts")))
      .withColumn("dns", struct(
        struct(
          col("r.query").as("name"),
          col("r.qclass_name").as("class"),
          col("r.qtype_name").as("type")).as("question"),
        col("r.answers").as("answers"),
        ips.as("resolved_ip"),
        col("r.rcode_name").as("response_code")))
      .withColumn("source", struct(
        col("`r`.`id.orig_h`").as("ip"), col("`r`.`id.orig_p`").as("port")))
      .withColumn("destination", struct(
        col("`r`.`id.resp_h`").as("ip"), col("`r`.`id.resp_p`").as("port")))
      .withColumn("network", struct(lower(col("r.proto")).as("transport")))
      .withColumn("event", struct(
        lit("network").as("kind"), col("r.uid").as("id"),
        when(col("r.rejected"), "failure").otherwise("success").as("outcome")))
      .withColumn("related", struct(
        array_distinct(concat(
          filter(array(col("`r`.`id.orig_h`"), col("`r`.`id.resp_h`")), x => isIpv4(x)),
          ips)).as("ip"),
        array().cast(ArrayType(StringType)).as("user"),
        array().cast(ArrayType(StringType)).as("hash")))
      .drop("r", "json")
    ecsFooter(shaped)
  }
}
