package graft.transform.managed

import graft.transform.Grok
import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed AWS S3 server-access-log mapping (reference
  * data/managed/log_sources/aws_s3access/log_source.yml): one grok over
  * the space-delimited line into the aws.s3access vendor struct, then ECS
  * shaping — client/user, http request/url, event id/action/outcome/
  * duration, related, cloud.region recovered from the host header.
  */
object S3Access {

  private val defs = Map(
    "S3DATE" -> "%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME}\\s\\+%{INT}",
    "S3REQUESTER" -> "[a-zA-Z0-9\\/_\\.\\-%:@]+",
    "S3REQUESTID" -> "[a-zA-Z0-9]+",
    "S3OPERATION" -> "%{WORD}.%{WORD}.%{WORD}",
    "S3KEY" -> "[a-zA-Z0-9\\/_\\.\\-%+]+",
    "S3ID" -> "[a-zA-Z0-9\\/_\\.\\-%+=]+",
    "S3VERSION" -> "[a-zA-Z0-9.]+")

  private val pattern =
    "%{BASE16NUM:bucket_owner} %{HOSTNAME:bucket} \\[%{S3DATE:s3access_time}\\] (?:-|%{IP:remote_ip}) (?:-|%{S3REQUESTER:requester}) %{S3REQUESTID:request_id} %{S3OPERATION:operation} (?:-|%{S3KEY:key}) (?:-|\"%{DATA:request_uri}\") %{NUMBER:http_status} (?:-|%{WORD:error_code}) (?:-|%{NUMBER:bytes_sent}) (?:-|%{NUMBER:object_size}) (?:-|%{NUMBER:total_time}) (?:-|%{NUMBER:turn_around_time}) (?:-|\"-\"|\"%{DATA:referrer}\") (?:-|\"(-|%{DATA:user_agent})\") (?:-|%{S3KEY:version_id}) (?:-|%{S3ID:host_id}) (?:-|%{S3VERSION:signature_version}) (?:-|%{S3KEY:cipher_suite}) (?:-|%{WORD:authentication_type}) (?:-|%{S3ID:host_header}) (?:-|%{S3VERSION:tls_version})%{GREEDYDATA:leftover}"

  private lazy val grok = Grok.compile(pattern, defs)
  private lazy val uriGrok =
    Grok.compile("%{NOTSPACE:method} %{NOTSPACE:url} [hH][tT][tT][pP]/%{NOTSPACE:version}")

  def apply(df: DataFrame): DataFrame = {
    val c = grok.columns(col("message"), anchored = true)
    val intFields = Set("http_status", "bytes_sent", "object_size", "total_time", "turn_around_time")
    // vendor struct with the reference's int casts ('-' never reaches the
    // cast: the grok alternation already nulls unset fields)
    val s3Fields = grok.fields.filterNot(_ == "leftover").map { f =>
      (if (intFields(f)) c(f).try_cast(LongType) else c(f)).as(f)
    }

    var out = df.withColumn("aws", struct(struct(s3Fields: _*).as("s3access")))
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    set("event.kind", lit("event"))
    set("event.type", array(lit("access")))
    set("event.category", array(lit("web")))
    set("cloud.provider", lit("aws"))
    // region from "<bucket>.s3.<region>.amazonaws.com"
    set("cloud.region", uriRegion(g("aws.s3access.host_header")))

    val uc = uriGrok.columns(g("aws.s3access.request_uri"), anchored = true)
    set("http.request.method", uc("method"))
    set("http.version", uc("version"))
    set("http.response.status_code", g("aws.s3access.http_status"))
    set("http.response.body.bytes", g("aws.s3access.bytes_sent"))
    set("http.request.referrer", g("aws.s3access.referrer"))

    // VRL prefixes "s3://" so parse_url sees an authority; host is the key
    val u = uc("url")
    val s3u = concat(lit("s3://"), u)
    set("url.original", u)
    set("url.domain", parse_url(s3u, lit("HOST")))
    set("url.path", parse_url(s3u, lit("PATH")))
    set("url.query", parse_url(s3u, lit("QUERY")))

    set("ts", try_to_timestamp(g("aws.s3access.s3access_time"), lit("dd/MMM/yyyy:HH:mm:ss Z")))
    out = delPath(out, "aws.s3access.s3access_time")

    set("client.ip", g("aws.s3access.remote_ip"))
    set("client.address", g("aws.s3access.remote_ip"))
    set("client.user.id", g("aws.s3access.requester"))
    set("event.id", g("aws.s3access.request_id"))
    set("event.action", g("aws.s3access.operation"))
    set("event.outcome",
      when(g("aws.s3access.error_code").isNotNull, "failure").otherwise("success"))
    set("event.code", g("aws.s3access.error_code"))
    set("event.duration", g("aws.s3access.total_time") * 1000000L) // ms → ns

    set("related.ip",
      filter(array(g("aws.s3access.remote_ip")), x => x.isNotNull))
    set("related.user",
      filter(array(g("aws.s3access.bucket_owner")), x => x.isNotNull))

    set("user_agent.original", g("aws.s3access.user_agent"))
    set("tls.cipher", g("aws.s3access.cipher_suite"))
    // "TLSV1.2" → version "1.2", protocol "tls"
    val tlsParts = split(lower(g("aws.s3access.tls_version")), "v", 2)
    set("tls.version", try_element_at(tlsParts, lit(2)))
    set("tls.version_protocol", try_element_at(tlsParts, lit(1)))

    out = delPath(out, "message")
    ecsFooter(out)
  }

  /** `^%{DATA}s3\.%{DATA:region}\.%{DATA}$` over the host header. */
  private def uriRegion(hostHeader: Column): Column = {
    val ex = regexp_extract(hostHeader, "^(?:.*?)s3\\.(.*?)\\.(?:.*)$", 1)
    when(ex =!= "", ex)
  }
}
