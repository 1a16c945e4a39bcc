package graft.schema

import org.apache.spark.sql.types._

/** Representative ECS master schema — the role of the reference's
  * data/ecs_iceberg_schema.json (54 top-level field families; SURVEY.md
  * §1.2 verified only boolean/int/long/float/double/string/timestamp/
  * struct/list appear). Tables cherry-pick subtrees from this master via
  * SchemaRegistry.resolve; the subset below covers the families the
  * managed mappings in this repo emit, in the same shapes.
  */
object EcsSchema {

  private def s(fields: StructField*): StructType = StructType(fields)
  private def f(name: String, dt: DataType): StructField = StructField(name, dt, nullable = true)
  private val str = StringType
  private val strArr = ArrayType(StringType, containsNull = true)

  val master: StructType = s(
    f("ts", TimestampType),
    f("message", str),
    f("labels", strArr),
    f("tags", strArr),
    f("ecs", s(f("version", str))),
    f("agent", s(f("name", str), f("type", str), f("version", str))),
    f("event", s(
      f("action", str), f("category", strArr), f("created", TimestampType),
      f("id", str), f("kind", str), f("module", str), f("original", str),
      f("outcome", str), f("provider", str), f("severity", LongType),
      f("type", strArr))),
    f("cloud", s(
      f("account", s(f("id", str), f("name", str))),
      f("provider", str), f("region", str), f("service", s(f("name", str))))),
    f("host", s(f("hostname", str), f("id", str), f("ip", strArr), f("name", str))),
    f("user", s(f("domain", str), f("email", str), f("id", str), f("name", str))),
    f("user_agent", s(
      f("device", s(f("name", str))), f("name", str),
      f("original", str), f("version", str))),
    f("source", s(
      f("address", str), f("bytes", LongType), f("domain", str),
      f("ip", str), f("port", IntegerType))),
    f("destination", s(
      f("address", str), f("bytes", LongType), f("domain", str),
      f("ip", str), f("port", IntegerType))),
    f("client", s(f("address", str), f("ip", str), f("port", IntegerType))),
    f("server", s(f("address", str), f("ip", str), f("port", IntegerType))),
    f("network", s(
      f("bytes", LongType), f("direction", str), f("iana_number", IntegerType),
      f("packets", LongType), f("protocol", str), f("transport", str), f("type", str))),
    f("dns", s(
      f("answers", strArr),
      f("header_flags", strArr),
      f("question", s(f("class", str), f("name", str),
        f("registered_domain", str), f("type", str))),
      f("resolved_ip", strArr),
      f("response_code", str))),
    f("url", s(
      f("domain", str), f("full", str), f("original", str),
      f("path", str), f("port", IntegerType), f("query", str), f("scheme", str))),
    f("http", s(
      f("request", s(f("method", str), f("referrer", str))),
      f("response", s(f("bytes", LongType), f("status_code", IntegerType))))),
    f("tls", s(
      f("cipher", str), f("version", str),
      f("server", s(f("issuer", str), f("subject", str))))),
    f("file", s(
      f("extension", str), f("hash", s(f("md5", str), f("sha1", str), f("sha256", str))),
      f("name", str), f("path", str), f("size", LongType))),
    f("process", s(
      f("args", strArr), f("command_line", str), f("entity_id", str),
      f("executable", str), f("name", str), f("pid", LongType),
      f("parent", s(f("name", str), f("pid", LongType))))),
    f("threat", s(
      f("indicator", s(f("ip", str), f("type", str))),
      f("technique", s(f("id", strArr), f("name", strArr))))),
    f("related", s(f("hash", strArr), f("ip", strArr), f("user", strArr))))

  /** Resolve a table schema from ECS subtrees + custom fields (the
    * reference's per-table `schema.ecs_field_names` + `schema.fields`).
    */
  def tableSchema(ecsFieldNames: Seq[String],
      custom: StructType = new StructType()): StructType =
    SchemaRegistry.resolve(master, ecsFieldNames, custom)
}
