package graft.transform.managed

import graft.sources.Framing
import graft.transform.TransformDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Managed Amazon S3 Inventory mapping (reference
  * data/managed/log_sources/aws_s3inventory/log_source.yml): headerless
  * CSV manifests (configured csv_headers) → file.* ECS shape with the
  * aws.s3inventory vendor struct. Non-.csv objects are skipped upstream
  * via [[Framing.routeByFileMetadata]] (the source's
  * select_table_from_payload_metadata aborts them).
  */
object S3Inventory {

  /** The inventory report column order (headerless files). */
  val headers: Seq[String] = Seq(
    "Bucket", "Key", "VersionId", "IsLatest", "IsDeleteMarker", "Size",
    "LastModifiedDate", "ETag", "StorageClass", "IsMultipartUploaded",
    "ReplicationStatus", "EncryptionStatus", "ObjectLockRetainUntilDate",
    "ObjectLockMode", "ObjectLockLegalHoldStatus", "IntelligentTieringAccessTier",
    "BucketKeyStatus", "ChecksumAlgorithm")

  /** From raw `{message}` CSV lines. */
  def apply(lines: DataFrame): DataFrame = fromCsv(Framing.csvWithHeaders(lines, headers))

  /** From a frame already carrying the header columns. */
  def fromCsv(df: DataFrame): DataFrame = {
    var out = df
    def g(p: String): Column = getPath(out, p)
    def set(p: String, v: Column): Unit = out = setPath(out, p, v)

    // S3 CSV inventory quotes values; strip the quotes the csv framer kept
    def c(n: String): Column = {
      val raw = col(n)
      when(raw.startsWith("\"") && raw.endsWith("\""),
        expr(s"substring($n, 2, length($n) - 2)")).otherwise(raw)
    }

    set("event.kind", lit("event"))
    set("event.category", array(lit("file")))
    set("event.type", array(lit("info")))
    set("cloud.provider", lit("aws"))
    set("cloud.service.name", lit("s3"))

    set("aws.s3inventory", struct(
      c("Bucket").as("bucket"),
      c("Key").as("key"),
      c("VersionId").as("version_id"),
      c("IsLatest").try_cast(BooleanType).as("is_latest"),
      c("IsDeleteMarker").try_cast(BooleanType).as("is_delete_marker"),
      c("Size").try_cast(LongType).as("size"),
      try_to_timestamp(c("LastModifiedDate")).as("last_modified"),
      c("ETag").as("e_tag"),
      c("StorageClass").as("storage_class"),
      c("IsMultipartUploaded").try_cast(BooleanType).as("is_multipart_uploaded"),
      c("ReplicationStatus").as("replication_status"),
      c("EncryptionStatus").as("encryption_status"),
      c("IntelligentTieringAccessTier").as("intelligent_tiering_access_tier"),
      c("BucketKeyStatus").as("bucket_key_status"),
      c("ChecksumAlgorithm").as("checksum_algorithm"),
      struct(
        try_to_timestamp(c("ObjectLockRetainUntilDate")).as("retain_until"),
        c("ObjectLockMode").as("mode"),
        c("ObjectLockLegalHoldStatus").as("legal_hold_status")).as("object_lock")))

    set("file.path", concat(lit("s3://"), g("aws.s3inventory.bucket"),
      lit("/"), g("aws.s3inventory.key")))
    set("file.mtime", g("aws.s3inventory.last_modified"))
    set("file.hash.md5", g("aws.s3inventory.e_tag"))
    set("file.size", g("aws.s3inventory.size"))
    set("related.hash", filter(array(g("file.hash.md5")), x => x.isNotNull))

    out = out.drop(headers: _*)
    ecsFooter(out)
  }
}
