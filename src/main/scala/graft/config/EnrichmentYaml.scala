package graft.config

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.JsonNode
import graft.lake.{Lake, Snapshots}
import graft.operators.Enrichment
import graft.schema.EcsSchema
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Loader for the reference's declarative `enrichment.yml` user surface
  * (reference `Enrichment.kt:54-59` config shape; `infra/lib/enrichment
  * .ts:229-259` load + validation; write-mode dispatch `Enrichment.kt:
  * 336-368`): `name` / `enrichment_type` (static|dynamic) / `write_mode`
  * (overwrite|append|merge, default overwrite) / `lookup_keys` /
  * `schema` (ecs_field_names + fields + primary_key) / `transform`.
  *
  * Parsed configs drive this repo's existing machinery directly:
  * [[sync]] dispatches the write mode onto [[Snapshots]] (atomic MVCC
  * commits standing in for the reference's Iceberg overwrite/append/
  * MERGE), and [[lookup]] runs [[Enrichment.lookupJoin]] on the
  * configured lookup keys. Full VRL `transform` programs stay out of
  * engine scope (same contract as [[LogSourceYaml]]): the text is
  * retained verbatim for the managed transform ports.
  */
object EnrichmentYaml {

  /** Parsed enrichment-table config (Enrichment.kt:54-59). */
  final case class EnrichmentConf(
      name: String,
      enrichmentType: String,
      writeMode: String,
      lookupKeys: Seq[String],
      transformVrl: Option[String],
      ecsFieldNames: Seq[String],
      customFields: StructType,
      primaryKey: Option[String]) {

    /** Lake table name, `enrich_`-prefixed like the reference
      * (Enrichment.kt:113 `enrichTableName`).
      */
    def resolvedName: String = s"enrich_$name"

    /** Full table schema, same ECS composition as log-source tables. */
    def schema: StructType = EcsSchema.tableSchema(ecsFieldNames, customFields)

    /** Apply one sync batch to the lake table under the configured write
      * mode — the reference's `doMetadataWrite` dispatch (Enrichment.kt:
      * 336-368): static tables and `overwrite` replace the table's
      * content atomically; `append` adds files; `merge` upserts by
      * `schema.primary_key`. Enrichment tables are small dims with no
      * event time, so rows land in one constant partition — overwrite of
      * that partition IS the full-table overwrite, mirroring the
      * reference's delete-all-add-one rewrite.
      */
    def sync(spark: SparkSession, tablePath: String, data: DataFrame): Unit = {
      val part = partitioned(data)
      writeMode match {
        case "overwrite" => Snapshots.overwritePartitions(part, tablePath)
        case "append" => Snapshots.append(part, tablePath)
        case "merge" =>
          val pk = primaryKey.getOrElse(sys.error(
            s"enrichment table $name: write_mode merge needs schema.primary_key"))
          if (Snapshots.currentVersion(tablePath).isEmpty)
            Snapshots.append(part, tablePath) // first sync seeds the table
          else Snapshots.mergeUpsert(spark, tablePath, part, pk)
      }
    }

    /** Current enrichment rows (the lookup side of [[lookup]]). */
    def read(spark: SparkSession, tablePath: String): DataFrame =
      Snapshots.read(spark, tablePath).drop(Lake.PartitionCol)

    /** Enrich `events` by the n-th configured lookup key (reference
      * lookup semantics: left join, struct payload under the table name —
      * `enrichment.rs:66-75` `get_by_key`).
      */
    def lookup(events: DataFrame, enrichment: DataFrame, eventKey: Column,
        keyIndex: Int = 0): DataFrame = {
      require(lookupKeys.nonEmpty, s"enrichment table $name has no lookup_keys")
      Enrichment.lookupJoin(events, enrichment, eventKey,
        lookupKeys(keyIndex), as = name)
    }

    private def partitioned(df: DataFrame): DataFrame =
      if (df.columns.contains(Lake.PartitionCol)) df
      else df.withColumn(Lake.PartitionCol, lit("1970-01-01-00"))
  }

  /** Load one enrichment-table dir (`<dir>/enrichment.yml`). A config
    * declaring `managed: {type: T}` composes over the managed base at
    * `managedRoot/lowercase(T)` by top-level shallow merge with user keys
    * winning — exactly the reference's
    * `{...loadManagedEnrichmentConfig(c), ...c}` (enrichment.ts:237-239).
    */
  def loadDir(dir: String,
      managedRoot: Option[String] = None): EnrichmentConf = {
    val userNode = parse(s"$dir/enrichment.yml")
    val managedType = Option(userNode.path("managed").path("type").asText(null))
      .filter(_.nonEmpty)
    val node = (managedType, managedRoot) match {
      case (Some(t), Some(mr)) =>
        val base = parse(s"$mr/${t.toLowerCase}/enrichment.yml")
        shallowMerge(base, userNode)
      case (Some(t), None) =>
        sys.error(s"enrichment config in $dir is managed ($t) but no managedRoot given")
      case _ => userNode
    }
    fromNode(node, fallbackName = Paths.get(dir).getFileName.toString)
  }

  /** Parse a single YAML document (tests / inline configs). */
  def loadYaml(yamlText: String, fallbackName: String = "unnamed"): EnrichmentConf =
    fromNode(yaml.readTree(yamlText), fallbackName)

  private val yaml = new com.fasterxml.jackson.databind.ObjectMapper(
    new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())

  private def parse(p: String): JsonNode =
    yaml.readTree(Files.readString(Paths.get(p)))

  /** Reference semantics are a TOP-LEVEL spread: user keys replace
    * managed keys wholesale (no deep merge — enrichment.ts:239).
    */
  private def shallowMerge(base: JsonNode, over: JsonNode): JsonNode = {
    val out = base.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    over.properties.forEach(e => out.set[JsonNode](e.getKey, e.getValue))
    out
  }

  private def fromNode(n: JsonNode, fallbackName: String): EnrichmentConf = {
    import scala.jdk.CollectionConverters._
    def text(field: String): Option[String] = {
      val v = n.path(field)
      if (v.isTextual && v.asText.nonEmpty) Some(v.asText) else None
    }
    val enrichmentType = text("enrichment_type").getOrElse("static")
    val writeModeOpt = text("write_mode")
    // static tables always overwrite; an explicit write_mode on one is a
    // config error, caught at load like the reference (enrichment.ts:240-241)
    if (enrichmentType == "static" && writeModeOpt.isDefined)
      sys.error(s"Static enrichment tables always have write mode 'overwrite'" +
        s", in ${text("name").getOrElse(fallbackName)}")
    val writeMode = writeModeOpt.getOrElse("overwrite")
    require(Set("overwrite", "append", "merge")(writeMode),
      s"unknown write_mode '$writeMode'")
    val schemaNode = n.path("schema")
    val pk = Option(schemaNode.path("primary_key").asText(null)).filter(_.nonEmpty)
    if (writeMode == "merge")
      require(pk.isDefined, // Enrichment.kt:364 "Need Primary key!"
        s"enrichment table ${text("name").getOrElse(fallbackName)}: " +
          "write_mode merge requires schema.primary_key")
    EnrichmentConf(
      name = text("name").getOrElse(fallbackName),
      enrichmentType = enrichmentType,
      writeMode = writeMode,
      lookupKeys = {
        val v = n.path("lookup_keys")
        if (v.isArray) v.elements.asScala.map(_.asText).toSeq else Nil
      },
      transformVrl = text("transform"),
      ecsFieldNames = {
        val v = schemaNode.path("ecs_field_names")
        if (v.isArray) v.elements.asScala.map(_.asText).toSeq else Nil
      },
      customFields = LogSourceYaml.fieldsToStruct(schemaNode.path("fields")),
      primaryKey = pk)
  }
}
