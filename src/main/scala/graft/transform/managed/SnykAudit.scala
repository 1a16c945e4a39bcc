package graft.transform.managed

import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed Snyk audit-log mapping (reference
  * data/managed/log_sources/snyk/tables/audit.yml): group/org/project ids
  * into the vendor struct, user/group identity to ECS, free-form content
  * re-encoded as a JSON string.
  */
object SnykAudit {

  val rawSchema: StructType = StructType(Seq(
    StructField("groupId", StringType),
    StructField("orgId", StringType),
    StructField("projectId", StringType),
    StructField("userId", StringType),
    StructField("event", StringType),
    StructField("created", StringType),
    StructField("content", StringType)))

  def apply(df: DataFrame): DataFrame = {
    var out = df.withColumn("r", from_json(col("json"), rawSchema))
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    set("event.original", col("json"))
    set("user.group.id", col("r.groupId"))
    set("user.id", col("r.userId"))
    set("event.action", col("r.event"))
    set("ts", try_to_timestamp(col("r.created")))
    set("snyk.audit", struct(
      col("r.orgId").as("org_id"),
      col("r.projectId").as("project_id"),
      col("r.content").as("content")))

    out = out.drop("r", "json")
    ecsFooter(out)
  }
}
