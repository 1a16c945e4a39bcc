package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed AWS VPC Flow mapping (reference
  * data/managed/log_sources/aws_vpcflow/log_source.yml, fixture F2):
  * space-delimited text lines; header lines (`version …` /
  * `instance-id …`) abort; the default v2 14-token layout parses with
  * numeric try-casts (bad tokens → null, not failures); event time comes
  * from the flow `start` epoch seconds.
  */
object VpcFlow {

  private val v2Fields = Seq(
    "version", "account_id", "interface_id", "srcaddr", "dstaddr",
    "srcport", "dstport", "protocol", "packets", "bytes",
    "start", "end", "action", "log_status")

  private val numeric = Map(
    "version" -> IntegerType, "srcport" -> IntegerType, "dstport" -> IntegerType,
    "protocol" -> IntegerType, "packets" -> LongType, "bytes" -> LongType,
    "start" -> LongType, "end" -> LongType)

  def apply(df: DataFrame): DataFrame = {
    val noHeaders = Transform(Seq(
      AbortWhen(col("message").startsWith("version ") ||
        col("message").startsWith("instance-id "))))(df)
    val toks = split(trim(col("message")), " +")
    val withFields = v2Fields.zipWithIndex.foldLeft(noHeaders) { case (d, (f, i)) =>
      val raw = try_element_at(toks, lit(i + 1))
      d.withColumn(f, numeric.get(f).map(t => raw.try_cast(t)).getOrElse(raw))
    }
    val shaped = withFields
      .withColumn("ts", timestamp_seconds(col("start")))
      .withColumn("event", struct(
        col("message").as("original"),
        lit("event").as("kind"),
        array(lit("network")).as("category"),
        array(lit("connection")).as("type"),
        lower(col("action")).as("action")))
      .withColumn("source", struct(col("srcaddr").as("ip"), col("srcport").as("port")))
      .withColumn("destination", struct(col("dstaddr").as("ip"), col("dstport").as("port")))
      .withColumn("network", struct(
        col("protocol").as("iana_number"),
        col("packets").as("packets"),
        col("bytes").as("bytes")))
      .withColumn("aws", struct(struct(
        col("version"), col("account_id"), col("interface_id"),
        col("start"), col("end"), col("log_status")).as("vpcflow")))
      .withColumn("related", struct(
        filter(array(col("srcaddr"), col("dstaddr")), x => isIpv4(x)).as("ip"),
        array().cast(ArrayType(StringType)).as("user"),
        array().cast(ArrayType(StringType)).as("hash")))
      .drop(v2Fields: _*).drop("message")
    ecsFooter(shaped)
  }
}
