package graft.config

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import graft.schema.{EcsSchema, SchemaRegistry}
import graft.sources.Framing
import graft.sources.Framing.MetadataRoute
import graft.streaming.Ingest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader for the reference's declarative YAML log-source surface — the
  * actual user API of the reference system (a directory of
  * `log_source.yml` + `tables/&#42;.yml`, reference `infra/lib/log-source.ts:
  * 62-91` config shape, `:209-481` three-level composition): parse
  * `name` / `schema.ecs_field_names` / `schema.fields` / `ingest` /
  * routing programs into this repo's existing composition —
  * [[graft.schema.SchemaRegistry]] resolution, [[Framing]] routing and
  * record expansion, and [[Ingest.Pipeline]].
  *
  * Scope notes:
  *  - full VRL `transform` programs are out of engine scope (the managed
  *    Scala ports in `graft.transform.managed` carry those semantics);
  *    the program text is retained verbatim so callers can look up the
  *    matching port.
  *  - the restricted VRL grammar that IS parsed — because it is config,
  *    not code — covers every routing / expansion program in the
  *    reference's managed + example sources: `match`/`contains` if-else
  *    chains over `.__metadata.s3.key` (→ [[MetadataRoute]]s), constant
  *    tables, `abort` skips, `string!(del(.json._table))` payload
  *    routing, match-chains over a payload field, and
  *    `parse_json!(.__raw).path` record expansion.
  */
object LogSourceYaml {

  private val yaml = new ObjectMapper(new YAMLFactory())

  /** Ingest-section config (log-source.ts:69-80). */
  final case class IngestConf(
      selectTableFromPayloadMetadata: Option[String] = None,
      selectTableFromPayload: Option[String] = None,
      expandRecordsFromPayload: Option[String] = None,
      csvHeaders: Seq[String] = Nil) {
    /** Table-level values override/extend source-level (mergeDeep). */
    def over(base: IngestConf): IngestConf = IngestConf(
      selectTableFromPayloadMetadata.orElse(base.selectTableFromPayloadMetadata),
      selectTableFromPayload.orElse(base.selectTableFromPayload),
      expandRecordsFromPayload.orElse(base.expandRecordsFromPayload),
      if (csvHeaders.nonEmpty) csvHeaders else base.csvHeaders)
  }

  /** One resolved table of a log source (log-source.ts:404-462 merge). */
  final case class TableConf(
      name: String,
      resolvedName: String,
      ingest: IngestConf,
      transformVrl: Option[String],
      ecsFieldNames: Seq[String],
      customFields: StructType,
      schema: StructType) {
    /** Dotted path of the record array under the raw payload, parsed from
      * `expand_records_from_payload` (e.g. `Records`).
      */
    def recordsPath: Option[String] =
      ingest.expandRecordsFromPayload.map(parseRecordsPath)
  }

  final case class LogSource(
      name: String,
      ingest: IngestConf,
      transformVrl: Option[String],
      tables: Map[String, TableConf]) {
    /** Compiled object-metadata routing, when configured: ordered
      * [[MetadataRoute]]s + the fall-through table, ready for
      * [[Framing.routeByFileMetadata]].
      */
    def metadataRouting: Option[(Seq[MetadataRoute], String)] =
      ingest.selectTableFromPayloadMetadata.map(parseMetadataRouting(_))

    /** Compiled record-content routing, when configured (S7). */
    def payloadRouting: Option[PayloadRoute] =
      ingest.selectTableFromPayload.map(parsePayloadRouting)
  }

  // ---------------------------------------------------------------- load

  /** Load a log-source directory (`log_source.yml` + optional
    * `tables/&#42;.yml`). `name` falls back to the directory basename when
    * the YAML has none (managed sources name themselves via the user's
    * wrapper config, log-source.ts:228-251).
    */
  def loadDir(dir: String, name: Option[String] = None): LogSource = {
    val root = Paths.get(dir)
    val srcNode = parse(root.resolve("log_source.yml"))
    val srcName = name
      .orElse(text(srcNode, "name"))
      .getOrElse(root.getFileName.toString)
    val srcIngest = ingestConf(srcNode)
    val srcTransform = text(srcNode, "transform")
    val srcEcs = strings(srcNode.path("schema"), "ecs_field_names")
    val srcFields = fieldsToStruct(srcNode.path("schema").path("fields"))

    val tablesDir = root.resolve("tables")
    val tableNodes: Seq[JsonNode] =
      if (Files.isDirectory(tablesDir))
        Files.list(tablesDir).iterator.asScala.toSeq
          .filter(_.toString.endsWith(".yml")).sortBy(_.toString).map(parse)
      else Nil

    // no tables/ directory → single implicit default table from the
    // source config alone (log-source.ts:414-416)
    val nodes = if (tableNodes.nonEmpty) tableNodes
                else Seq(yaml.createObjectNode(): JsonNode)

    val tables = nodes.map { tn =>
      val tName = text(tn, "name").getOrElse("default")
      // three-level composition (log-source.ts:431-462): transforms
      // concatenate source-then-table; ecs_field_names union in order;
      // table custom fields merge over source custom fields (conflicts
      // error via SchemaRegistry.merge); ingest table-over-source.
      val tTransform = (srcTransform ++ text(tn, "transform")).toSeq match {
        case Nil => None
        case parts => Some(parts.mkString("\n\n"))
      }
      val tEcs = (srcEcs ++ strings(tn.path("schema"), "ecs_field_names")).distinct
      val tCustom = SchemaRegistry.merge(
        fieldsToStruct(tn.path("schema").path("fields")), srcFields)
      val resolvedName = if (tName == "default") srcName else s"${srcName}_$tName"
      TableConf(
        name = tName,
        resolvedName = resolvedName,
        ingest = ingestConf(tn).over(srcIngest),
        transformVrl = tTransform,
        ecsFieldNames = tEcs,
        customFields = tCustom,
        schema = EcsSchema.tableSchema(tEcs, tCustom))
    }
    require(tables.map(_.name).distinct.size == tables.size,
      s"duplicate table names in $dir")
    LogSource(srcName, srcIngest, srcTransform,
      tables.map(t => t.name -> t).toMap)
  }

  /** Load a USER log-source directory. When the user config declares
    * `managed: {type: T}` (the reference's managed-source redirect,
    * log-source.ts:231-264 + mergeManagedConfig at `:10-41`), the managed
    * directory `managedRoot/lowercase(T)` is loaded as the base and the
    * user's source-level config composes over it: user ingest keys win,
    * transforms concatenate managed-then-user, ecs_field_names union, and
    * user fields merge over managed fields. Tables come from the managed
    * directory (plus the user's own `tables/` entries).
    */
  def loadUserDir(userDir: String, managedRoot: String): LogSource = {
    val userNode = parse(Paths.get(userDir).resolve("log_source.yml"))
    val managedType = text(userNode.path("managed"), "type").map(_.toLowerCase)
    managedType match {
      case None => loadDir(userDir)
      case Some(t) =>
        val userName = text(userNode, "name")
        val base = loadDir(s"$managedRoot/$t", name = userName)
        val uIngest = ingestConf(userNode)
        val uTransform = text(userNode, "transform")
        val uEcs = strings(userNode.path("schema"), "ecs_field_names")
        val uFields = fieldsToStruct(userNode.path("schema").path("fields"))
        val srcIngest = uIngest.over(base.ingest)
        val srcTransform = (base.transformVrl ++ uTransform).toSeq match {
          case Nil => None
          case parts => Some(parts.mkString("\n\n"))
        }
        // recompose every table over the updated source level
        val tables = base.tables.view.mapValues { tc =>
          val ecs = (tc.ecsFieldNames ++ uEcs).distinct
          val custom = SchemaRegistry.merge(uFields, tc.customFields)
          tc.copy(
            ingest = tc.ingest.over(srcIngest),
            transformVrl = (tc.transformVrl ++ uTransform).toSeq match {
              case Nil => None
              case parts => Some(parts.mkString("\n\n"))
            },
            ecsFieldNames = ecs,
            customFields = custom,
            schema = EcsSchema.tableSchema(ecs, custom))
        }.toMap
        LogSource(base.name, srcIngest, srcTransform, tables)
    }
  }

  private def parse(p: Path): JsonNode = yaml.readTree(Files.readString(p))

  private def text(n: JsonNode, field: String): Option[String] = {
    val v = n.path(field)
    if (v.isTextual) Some(v.asText) else None
  }

  private def strings(n: JsonNode, field: String): Seq[String] = {
    val v = n.path(field)
    if (v.isArray) v.elements.asScala.map(_.asText).toSeq else Nil
  }

  private def ingestConf(n: JsonNode): IngestConf = {
    val ing = n.path("ingest")
    IngestConf(
      text(ing, "select_table_from_payload_metadata"),
      text(ing, "select_table_from_payload"),
      text(ing, "expand_records_from_payload"),
      strings(ing, "csv_headers"))
  }

  // ------------------------------------------------------ schema mapping

  /** YAML `schema.fields` → StructType. Type vocabulary is the one the
    * reference's sources actually use (verified across every managed +
    * example yml): scalar names, `{type: struct, fields}`,
    * `{type: list, element}`, plus `map` for completeness.
    */
  def fieldsToStruct(fields: JsonNode): StructType =
    if (!fields.isArray) new StructType()
    else StructType(fields.elements.asScala.map { f =>
      StructField(f.get("name").asText, yamlType(f.get("type")),
        nullable = true)
    }.toArray)

  def yamlType(t: JsonNode): DataType =
    if (t.isTextual) scalarType(t.asText)
    else t.path("type").asText match {
      case "struct" => fieldsToStruct(t.path("fields"))
      case "list" => ArrayType(yamlType(t.path("element")), containsNull = true)
      case "map" => MapType(yamlType(t.path("key")), yamlType(t.path("values")))
      case other => throw new IllegalArgumentException(s"unknown type node: $other")
    }

  private def scalarType(s: String): DataType = s match {
    case "string" => StringType
    case "int" | "integer" => IntegerType
    case "long" | "bigint" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case "timestamp" => TimestampType
    case "date" => DateType
    case "binary" => BinaryType
    case other => throw new IllegalArgumentException(s"unknown scalar type: $other")
  }

  // ------------------------------------------------- routing compilation

  private val MatchKey =
    raw"""match\(\s*\.__metadata\.s3\.key\s*,\s*r'([^']*)'\s*\)""".r
  private val ContainsKey =
    raw"""contains\(\s*\.__metadata\.s3\.key\s*,\s*"([^"]*)"\s*\)""".r
  private val IfClause =
    raw"""(?s)^\s*(?:else\s+)?if\s+([^{]*?)\s*\{\s*([^{}]*?)\s*\}(.*)$$""".r
  private val ElseClause = raw"""(?s)^\s*else\s*\{\s*([^{}]*?)\s*\}\s*$$""".r
  private val StringLit = raw""""([^"]*)"""".r

  /** One parsed condition term: regex pattern + negation flag. */
  private final case class Term(pattern: String, negated: Boolean)

  private def parseTerm(s: String): Term = {
    val t = s.trim
    val (neg, body) = if (t.startsWith("!")) (true, t.drop(1).trim) else (false, t)
    body match {
      case MatchKey(rx) => Term(rx, neg)
      case ContainsKey(lit) => Term(java.util.regex.Pattern.quote(lit), neg)
      case other => throw new IllegalArgumentException(
        s"unsupported routing condition: $other")
    }
  }

  /** Body of a routing branch: Some(table) or None for `abort`. */
  private def parseBody(s: String): Option[String] =
    s.replaceAll("#.*", "").trim match {
      case StringLit(t) => Some(t)
      case "abort" => None
      case other => throw new IllegalArgumentException(
        s"unsupported routing branch body: $other")
    }

  /** Compile a `select_table_from_payload_metadata` program into ordered
    * [[MetadataRoute]]s + the fall-through default, the exact input shape
    * of [[Framing.routeByFileMetadata]] (first match wins; `table = None`
    * skips the object). Grammar: a bare `"table"` literal, or an
    * if/else-if chain whose conditions are `match(.__metadata.s3.key,
    * r'RX')` / `contains(.__metadata.s3.key, "S")` terms (`||`-joined,
    * optionally `!`-negated single terms) and whose branch bodies are
    * `"table"` or `abort`. Covers every such program in the reference's
    * managed and example sources (cloudtrail, zeek, cloudflare, okta,
    * o365, suricata, teleport, crowdstrike, s3inventory, config_history).
    */
  def parseMetadataRouting(program: String,
      fallback: String = "default"): (Seq[MetadataRoute], String) = {
    val trimmed = program.trim
    trimmed match {
      case StringLit(t) => return (Nil, t) // teleport: constant table
      case _ =>
    }
    val routes = scala.collection.mutable.ArrayBuffer.empty[MetadataRoute]
    var default = fallback
    var rest = trimmed
    var done = false
    while (!done && rest.nonEmpty) rest match {
      case IfClause(cond, body, tail) =>
        val terms = cond.split(raw"\|\|").map(parseTerm).toSeq
        val outcome = parseBody(body)
        if (terms.forall(!_.negated)) {
          terms.foreach(t => routes += MetadataRoute(t.pattern, outcome))
        } else if (terms.size == 1) {
          // `if !c { B }` [else { E }] ≡ `if c { E-or-default } else { B }`
          val elseOutcome = tail.trim match {
            case "" => Some(fallback)
            case ElseClause(b) => parseBody(b)
            case other => throw new IllegalArgumentException(
              s"negated condition followed by more clauses: $other")
          }
          routes += MetadataRoute(terms.head.pattern, elseOutcome)
          outcome match {
            case Some(t) => default = t
            case None => routes += MetadataRoute(".*", None) // abort the rest
          }
          done = true
        } else throw new IllegalArgumentException(
          s"negation inside a multi-term condition: $cond")
        if (!done) {
          rest = tail.trim
          if (rest.isEmpty) done = true
          else rest match {
            case ElseClause(b) =>
              parseBody(b) match {
                case Some(t) => default = t
                case None => routes += MetadataRoute(".*", None)
              }
              done = true
            case _ if rest.startsWith("else") => () // `else if` — loop again
            case other => throw new IllegalArgumentException(
              s"unsupported routing tail: ${other.take(80)}")
          }
        }
      case other => throw new IllegalArgumentException(
        s"unsupported routing program: ${other.take(80)}")
    }
    (routes.toSeq, default)
  }

  /** Compiled `select_table_from_payload` (record-content routing, S7). */
  sealed trait PayloadRoute {
    /** The routing Column over a pre-transform-parsed frame (`json`
      * string column, [[Framing.preTransformJsonParse]]), for
      * [[Framing.routeByContent]]; abort branches yield null (callers
      * filter, as [[Framing.routeByFileMetadata]] does).
      */
    def column: Column
  }

  /** `string!(del(.json._table))`-style: the table name is a payload
    * field (duo, google_workspace, msft, onepassword, snyk).
    */
  final case class TableFromJsonField(field: String) extends PayloadRoute {
    def column: Column = get_json_object(col("json"), s"$$.$field")
  }

  /** Match-chain over a raw payload column (panw's `.message` chain). */
  final case class FieldMatchChain(fieldCol: String,
      cases: Seq[(String, String)], default: Option[String])
      extends PayloadRoute {
    def column: Column =
      cases.foldRight(default.map(lit).getOrElse(lit(null)): Column) {
        case ((rx, table), acc) => when(col(fieldCol).rlike(rx), lit(table)).otherwise(acc)
      }
  }

  private val JsonFieldDel =
    raw"""(?s).*string!?\(\s*del\(\s*\.json\.(\w+)\s*\)\s*\).*""".r
  private val MatchField = raw"""match\(\s*\.(\w+)\s*,\s*r'([^']*)'\s*\)""".r

  def parsePayloadRouting(program: String): PayloadRoute = program match {
    case JsonFieldDel(field) => TableFromJsonField(field)
    case p =>
      val cases = MatchField.findAllMatchIn(p).map { m =>
        val body = p.drop(m.end)
        val table = StringLit.findFirstMatchIn(body.takeWhile(_ != '}'))
          .map(_.group(1)).getOrElse(throw new IllegalArgumentException(
            s"match() with no table body: ${m.matched}"))
        (m.group(1), m.group(2), table)
      }.toSeq
      require(cases.nonEmpty, s"unsupported payload routing: ${p.take(80)}")
      val fields = cases.map(_._1).distinct
      require(fields.size == 1, s"mixed match fields: $fields")
      val default = // trailing `else { "t" }` keeps a table; abort → None
        raw"""(?s)else\s*\{\s*"([^"]*)"\s*\}\s*$$""".r
          .findFirstMatchIn(p).map(_.group(1))
      FieldMatchChain(fields.head, cases.map(c => (c._2, c._3)), default)
  }

  // --------------------------------------------- record expansion + glue

  private val ExpandRaw = raw"""(?s).*parse_json!?\(\s*\.__raw\s*\)((?:\.\w+)+).*""".r
  private val ExpandRet = raw"""(?s).*\bret((?:\.\w+)+)\s*\}?\s*$$""".r

  /** Dotted path of the record array inside the raw payload, from an
    * `expand_records_from_payload` program: `parse_json!(.__raw).Records`
    * → `Records`; the guarded `ret, err = parse_json(...) ... ret.path`
    * form (config_history) → `path`.
    */
  def parseRecordsPath(program: String): String = program match {
    case ExpandRaw(path) => path.stripPrefix(".").replace('.', '.')
    case ExpandRet(path) => path.stripPrefix(".")
    case other => throw new IllegalArgumentException(
      s"unsupported expand_records program: ${other.take(80)}")
  }

  /** Framing stage for one table over a raw-lines frame (`message`
    * column, [[Framing.textLines]] shape): expand the configured records
    * array to one `json` row per record, or pre-transform-parse the
    * lines when no expansion is configured. Matches the reference's S5
    * payload expansion / P2 pre-transform parse split.
    */
  def framing(t: TableConf): DataFrame => DataFrame = df =>
    t.recordsPath match {
      case Some(path) =>
        // array-of-objects → array<string> of the objects' JSON text
        // (each element feeds the same downstream as a parsed line)
        Framing.expandRecords(df,
            from_json(get_json_object(col("message"), s"$$.$path"),
              ArrayType(StringType)), as = "json")
          .filter(col("json").isNotNull)
          .drop("message")
      case None => Framing.preTransformJsonParse(df)
    }

  /** [[Ingest.Pipeline]] for one table: YAML framing → the caller's
    * transform (the managed Scala port standing in for the table's VRL
    * program) → the YAML-resolved target schema, landing at `lakePath`
    * with sidelining. The full declarative surface, wired into the
    * engine's one ingest query.
    */
  def pipeline(src: LogSource, table: String,
      transform: DataFrame => DataFrame,
      lakePath: String, sidelinePath: String): Ingest.Pipeline = {
    val t = src.tables(table)
    Ingest.Pipeline(
      transform = framing(t).andThen(transform),
      target = t.schema,
      lakePath = lakePath,
      sidelinePath = sidelinePath)
  }
}
