package graft.config

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import graft.operators.Detection
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sigma-rule import: compile the common Sigma YAML detection grammar to
  * Catalyst `Column` predicates feeding [[graft.operators.Detection]].
  *
  * The reference advertises "automatic import of Sigma detections"
  * (README "Detection-as-Code"; `scripts/sigma_generate.py:1-35` wraps the
  * external pySigma Matano backend, which converts a rule to a Python
  * `detect(record)` body plus an ECS field-mapping pipeline such as
  * `ecs-cloudtrail`). Here the same surface compiles to a declarative
  * predicate instead: the rule participates in pushdown/pruning and runs
  * codegen'd inside the one scan `Detection.ruleMatches` already does —
  * evaluating a rule pack is N filters over one pass, not N×rows Python
  * calls.
  *
  * Grammar covered (the public Sigma specification's core, which is what
  * the reference's backend handles):
  *   - `detection.<name>` selections: field maps (AND across fields, OR
  *     across a field's value list), lists of maps (OR), keyword lists
  *     (match anywhere in the designated message field);
  *   - field modifiers `contains` / `startswith` / `endswith` / `re` /
  *     `cased` / `all` / `gt` / `gte` / `lt` / `lte` / `cidr` /
  *     `windash`;
  *   - `*` / `?` wildcards in values (with `\`-escapes), case-insensitive
  *     string matching per the spec (opt out via `cased`);
  *   - `null` values (field absent or null);
  *   - `condition`: identifiers, `and` / `or` / `not`, parentheses,
  *     `1 of x*` / `all of x*` / `N of them`.
  * Correlation rules are also covered ([[loadCorrelation]] /
  * [[correlationMatches]]): the Sigma v2 correlation document
  * (`correlation: {type: event_count|value_count, group-by, timeframe,
  * condition: {gte: N}}`) and the deprecated-but-everywhere pre-2.0
  * aggregation condition (`condition: selection | count(field) by f > N`
  * with a document-level `timeframe:`) both compile to the engine's
  * threshold-aggregation shape (A1): one filter + one grouped
  * count/countDistinct per timeframe window.
  *
  * Out of scope (rare, documented): `base64`/`base64offset` encodings,
  *   `|expand` placeholders, `near` aggregations, and field-ref
  *   comparisons — loading a rule that uses one throws with the
  *   unsupported construct named.
  */
object SigmaRules {

  private val yaml = new ObjectMapper(new YAMLFactory())

  /** Severity map: Sigma `level` → the reference's alert severities. */
  private val levels = Map(
    "informational" -> "info", "low" -> "notice", "medium" -> "notice",
    "high" -> "warning", "critical" -> "critical")

  /** A count-over-window condition attached to (or referencing) rules —
    * the Sigma correlation surface. `op` ∈ gt/gte/lt/lte/eq; `field` is
    * set for value_count (distinct values of `field` per group).
    */
  final case class CorrelationSpec(
      title: String,
      corrType: String, // event_count | value_count
      ruleNames: Seq[String],
      groupBy: Seq[String],
      timeframeSeconds: Long,
      op: String,
      n: Long,
      field: Option[String],
      level: Option[String] = None)

  final case class SigmaRule(
      title: String,
      id: Option[String],
      level: Option[String],
      detect: Column,
      /** Set when the rule carried a legacy `| count() by …` aggregation
        * suffix: the base `detect` selects candidate events, and this
        * spec holds the threshold semantics to evaluate via
        * [[correlationMatches]].
        */
      correlation: Option[CorrelationSpec] = None) {
    /** As a [[Detection.Rule]], ready for `Detection.ruleMatches`. */
    def toRule(
        dedupe: Column = lit(""),
        threshold: Int = 1,
        windowSeconds: Long = 3600): Detection.SimpleRule =
      Detection.SimpleRule(
        name = title, detect = detect, dedupe = dedupe,
        severity = levels.getOrElse(level.getOrElse("medium"), "notice"),
        threshold = threshold, windowSeconds = windowSeconds)
  }

  /** Field-name mapping the pySigma "processing pipeline" performs — raw
    * CloudTrail record names → the ECS names the reference's
    * `aws_cloudtrail` transform emits (managed `log_source.yml:20-75`:
    * `.event.action = .json.eventName`, `.event.provider = del(.json
    * .eventSource)`, `.aws.cloudtrail.user_identity.type = del(.json
    * .userIdentity.type)`, …). Prefix rule: any `userIdentity.`/
    * `requestParameters.`/`responseElements.` path maps under
    * `aws.cloudtrail.*` with snake_cased steps.
    */
  val ecsCloudtrail: String => String = {
    val exact = Map(
      "eventName" -> "event.action",
      "eventSource" -> "event.provider",
      "awsRegion" -> "cloud.region",
      "sourceIPAddress" -> "source.ip",
      "userAgent" -> "user_agent.original",
      "errorCode" -> "aws.cloudtrail.error_code",
      "errorMessage" -> "aws.cloudtrail.error_message",
      "eventType" -> "aws.cloudtrail.event_type",
      "eventVersion" -> "aws.cloudtrail.event_version",
      "recipientAccountId" -> "cloud.account.id")
    val prefixed = Map(
      "userIdentity" -> "aws.cloudtrail.user_identity",
      "requestParameters" -> "aws.cloudtrail.request_parameters",
      "responseElements" -> "aws.cloudtrail.response_elements")
    (f: String) => exact.getOrElse(f, {
      val steps = f.split('.')
      prefixed.get(steps.head) match {
        case Some(base) =>
          (base +: steps.tail.map(snakeCase)).mkString(".")
        case None => f
      }
    })
  }

  private def snakeCase(s: String): String =
    s.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase

  /** Parse one Sigma rule document and compile its detection to a
    * predicate. `fieldMap` renames Sigma field names to the event
    * table's columns (e.g. [[ecsCloudtrail]]); `keywordField` is the
    * column keyword-list selections search.
    */
  def load(
      yamlText: String,
      fieldMap: String => String = identity,
      keywordField: String = "message"): SigmaRule = {
    val root = yaml.readTree(yamlText)
    val det = root.path("detection")
    require(det.isObject, "sigma rule has no detection section")
    val rawCondition = det.path("condition") match {
      case c if c.isTextual => c.asText
      // a LIST of conditions is OR of each (pre-2.0 spec, still common)
      case c if c.isArray =>
        c.elements.asScala.map(e => s"(${e.asText})").mkString(" or ")
      case _ => sys.error("sigma rule has no condition")
    }
    val title = root.path("title").asText("unnamed sigma rule")
    // the pre-2.0 spec places `timeframe` INSIDE the detection section;
    // later rules put it at document level — accept both (and never
    // compile it as a selection)
    val timeframe = Seq(det.path("timeframe"), root.path("timeframe"))
      .collectFirst { case n if n.isTextual => n.asText }
      .getOrElse("1h")
    // deprecated pre-2.0 aggregation suffix: `<cond> | count(field) by f > N`
    val (condition, legacyAgg) = rawCondition.split('|') match {
      case Array(c) => (c, None)
      case Array(c, agg) =>
        (c, Some(parseLegacyAggregation(agg.trim, title,
          parseTimeframe(timeframe), fieldMap,
          Option(root.path("level").asText(null)).filter(_.nonEmpty))))
      case _ => sys.error(s"sigma condition has multiple '|' sections: $rawCondition")
    }
    val selections: Map[String, Column] = det.properties.asScala
      .filter(e => e.getKey != "condition" && e.getKey != "timeframe")
      .map(e => e.getKey -> compileSelection(e.getValue, fieldMap, keywordField))
      .toMap
    val detect = new ConditionParser(condition.trim, selections).parse()
    SigmaRule(
      title = title,
      id = Option(root.path("id").asText(null)).filter(_.nonEmpty),
      level = Option(root.path("level").asText(null)).filter(_.nonEmpty),
      detect = detect,
      correlation = legacyAgg)
  }

  /** Parse a Sigma v2 CORRELATION document (the modern spec's form —
    * `correlation: {type, rules, group-by, timeframe, condition: {gte: N,
    * field?}}`). Field names in `group-by`/`field` go through `fieldMap`.
    */
  def loadCorrelation(
      yamlText: String,
      fieldMap: String => String = identity): CorrelationSpec = {
    import scala.jdk.CollectionConverters._
    val root = yaml.readTree(yamlText)
    val c = root.path("correlation")
    require(c.isObject, "not a sigma correlation document")
    val corrType = c.path("type").asText
    require(Set("event_count", "value_count", "temporal",
        "temporal_ordered")(corrType),
      s"unsupported correlation type '$corrType'")
    val cond = c.path("condition")
    val temporal = corrType.startsWith("temporal")
    // temporal correlations have an implicit condition (all referenced
    // rules observed); counting ones need exactly one comparison
    val ops = if (cond.isObject)
      Seq("gt", "gte", "lt", "lte", "eq").filter(o => cond.has(o)) else Nil
    require(temporal || ops.size == 1,
      s"correlation condition needs exactly one of " +
        s"gt/gte/lt/lte/eq, got ${ops.mkString(",")}")
    val field = Option(cond.path("field").asText(null)).filter(_.nonEmpty)
    require(corrType != "value_count" || field.isDefined,
      "value_count correlation needs condition.field")
    CorrelationSpec(
      title = root.path("title").asText("unnamed sigma correlation"),
      corrType = corrType,
      ruleNames = {
        val v = c.path("rules")
        if (v.isArray) v.elements.asScala.map(_.asText).toSeq
        else Seq(v.asText)
      },
      groupBy = {
        val v = c.path("group-by")
        if (v.isArray) v.elements.asScala.map(_.asText).map(fieldMap).toSeq
        else Nil
      },
      timeframeSeconds = parseTimeframe(c.path("timeframe").asText("1h")),
      op = ops.headOption.getOrElse("gte"),
      n = ops.headOption.map(o => cond.path(o).asLong).getOrElse(1L),
      field = field.map(fieldMap),
      level = Option(root.path("level").asText(null)).filter(_.nonEmpty))
  }

  /** Evaluate a correlation over an event frame: events selected by the
    * referenced rules' predicates (OR), grouped by the correlation's
    * group-by columns and a TUMBLING `timeframe` window, counted
    * (event_count) or distinct-counted over `field` (value_count), and
    * filtered by the threshold condition — the A1 batch shape, one
    * grouped aggregation. The anchored-window alternative (first match
    * opens the window, the reference's alert semantics) is
    * [[graft.plans.AnchoredSession]]; tumbling is the deterministic
    * oracle-checkable form, and both are gated engine surfaces.
    */
  def correlationMatches(events: DataFrame, rules: Seq[SigmaRule],
      corr: CorrelationSpec, ts: Column = col("ts")): DataFrame = {
    // ruleNames order matters for temporal_ordered — resolve IN that order
    val referenced = corr.ruleNames.flatMap(n => rules.find(_.title == n))
    require(referenced.size == corr.ruleNames.size,
      s"correlation '${corr.title}' references unloaded rules " +
        s"(wanted ${corr.ruleNames.mkString(", ")})")
    val winStart = // tumbling window: epoch floored to the timeframe
      from_unixtime(
        (unix_seconds(ts) / corr.timeframeSeconds).cast("long") *
          corr.timeframeSeconds).cast("timestamp")
    val keyCols = corr.groupBy.map(col)
    val out = corr.corrType match {
      case "event_count" | "value_count" =>
        val selected = events.filter(
          referenced.map(_.detect).reduce(_ || _))
        val metric = corr.corrType match {
          case "event_count" => count(lit(1))
          case "value_count" => countDistinct(col(corr.field.get))
        }
        val grouped = selected
          .groupBy((keyCols :+ winStart.as("window_start")): _*)
          .agg(metric.cast("long").as("n"))
        val pass = corr.op match {
          case "gt" => col("n") > corr.n
          case "gte" => col("n") >= corr.n
          case "lt" => col("n") < corr.n
          case "lte" => col("n") <= corr.n
          case "eq" => col("n") === corr.n
        }
        grouped.filter(pass)
      case "temporal" =>
        // all referenced rules observed in the same group + window
        // (unordered): tag each event with the rules it matches, count
        // distinct tags per (group, window)
        val tagged = referenced.zipWithIndex.map { case (r, i) =>
          events.filter(r.detect)
            .select((keyCols :+ winStart.as("window_start") :+
              lit(i).as("__tag")): _*)
        }.reduce(_.unionAll(_))
        tagged
          .groupBy((keyCols :+ col("window_start")): _*)
          .agg(countDistinct(col("__tag")).cast("long").as("n"))
          .filter(col("n") === referenced.size)
      case "temporal_ordered" =>
        // the funnel chain per (group, window): earliest rule-1 match,
        // then the earliest rule-2 match STRICTLY after it, … — all
        // stages must bind (q122's earliest-greedy semantics, windowed,
        // and q122's JOIN-CHAIN shape: R-1 slim min-aggregations all
        // hashed on the same (group, window) key, so the stage joins
        // land co-partitioned after the first shuffle; arrays stay out
        // of filter conditions — the PlanShapeSpec generator-pushdown
        // guard applies to this surface like any other)
        def stage(i: Int): DataFrame = events.filter(referenced(i).detect)
          .select((keyCols :+ winStart.as("window_start") :+
            ts.as("__ts")): _*)
        val joinKeys = corr.groupBy :+ "window_start"
        val first = stage(0)
          .groupBy((keyCols :+ col("window_start")): _*)
          .agg(min(col("__ts")).as("__t0"))
        referenced.indices.drop(1).foldLeft(first) { (prev, i) =>
          stage(i).join(prev, joinKeys)
            .where(col("__ts") > col(s"__t${i - 1}"))
            .groupBy((keyCols :+ col("window_start")): _*)
            .agg(min(col("__ts")).as(s"__t$i"))
        }.withColumn("n", lit(referenced.size.toLong))
      case other => sys.error(s"unsupported correlation type '$other'")
    }
    out.select((lit(corr.title).as("rule_name") +: keyCols) :+
      col("window_start") :+ col("n"): _*)
  }

  /** `count() by f > N` / `count(field) by f1 f2 >= N` (pre-2.0 grammar). */
  private def parseLegacyAggregation(agg: String, title: String,
      timeframeSeconds: Long, fieldMap: String => String,
      level: Option[String]): CorrelationSpec = {
    val re = raw"count\(\s*([\w.]*)\s*\)\s*(?:by\s+([\w.\s,]+?))?\s*(>=|<=|>|<|==?)\s*(\d+)".r
    agg match {
      case re(fieldRaw, byRaw, opRaw, nRaw) =>
        val field = Option(fieldRaw).map(_.trim).filter(_.nonEmpty)
        CorrelationSpec(
          title = title,
          corrType = if (field.isDefined) "value_count" else "event_count",
          ruleNames = Seq(title), // a legacy agg applies to its own rule
          groupBy = Option(byRaw).toSeq
            .flatMap(_.split("[,\\s]+")).filter(_.nonEmpty).map(fieldMap),
          timeframeSeconds = timeframeSeconds,
          op = opRaw match {
            case ">" => "gt"; case ">=" => "gte"; case "<" => "lt"
            case "<=" => "lte"; case "=" | "==" => "eq"
          },
          n = nRaw.toLong,
          field = field.map(fieldMap),
          level = level)
      case other => sys.error(
        s"unsupported sigma aggregation condition: '$other' " +
          "(count()/count(field) with by-list and a comparison are supported; " +
          "near() is not)")
    }
  }

  /** Sigma timeframe strings: `15s` / `10m` / `2h` / `1d`. */
  private[config] def parseTimeframe(s: String): Long = {
    val re = raw"(\d+)\s*([smhd])".r
    s.trim.toLowerCase match {
      case re(n, u) => n.toLong * (u match {
        case "s" => 1L; case "m" => 60L; case "h" => 3600L; case "d" => 86400L
      })
      case other => sys.error(s"unparseable sigma timeframe '$other'")
    }
  }

  /** Load every rule in a multi-document YAML stream (sigma collections
    * ship many rules per file).
    */
  def loadAll(
      yamlText: String,
      fieldMap: String => String = identity,
      keywordField: String = "message"): Seq[SigmaRule] =
    yamlText.split("(?m)^---\\s*$").iterator
      .map(_.trim).filter(_.nonEmpty)
      .map(load(_, fieldMap, keywordField)).toSeq

  /** Load a rule-pack directory the way users keep Sigma repos: every
    * `*.yml`/`*.yaml` under `dir` (recursive, sorted for determinism),
    * multi-document files expanded, correlation documents separated from
    * detection rules. A file that fails to parse names itself in the
    * error — a 500-rule pack must not die anonymously.
    */
  def loadRulePack(
      dir: String,
      fieldMap: String => String = identity,
      keywordField: String = "message"): (Seq[SigmaRule], Seq[CorrelationSpec]) = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    val files = // walk streams hold directory handles — close deterministically
      try walk.iterator.asScala
        .filter(p => p.toString.endsWith(".yml") || p.toString.endsWith(".yaml"))
        .toVector.sortBy(_.toString)
      finally walk.close()
    val rules = Seq.newBuilder[SigmaRule]
    val corrs = Seq.newBuilder[CorrelationSpec]
    files.foreach { f =>
      val text = java.nio.file.Files.readString(f)
      text.split("(?m)^---\\s*$").iterator
        .map(_.trim).filter(_.nonEmpty).foreach { doc =>
          try {
            if (yaml.readTree(doc).path("correlation").isObject)
              corrs += loadCorrelation(doc, fieldMap)
            else {
              val r = load(doc, fieldMap, keywordField)
              rules += r
              // a legacy `| count() by` rule carries its threshold as an
              // embedded correlation — surface it, or a caller consuming
              // only the rules list would silently alert per-event
              r.correlation.foreach(corrs += _)
            }
          } catch {
            case e: Exception => throw new IllegalArgumentException(
              s"sigma rule pack: failed to load $f: ${e.getMessage}", e)
          }
        }
    }
    (rules.result(), corrs.result())
  }

  // ----------------------------------------------------------- selection

  private def compileSelection(
      node: JsonNode, fieldMap: String => String, keywordField: String): Column =
    node match {
      case o if o.isObject =>
        o.properties.asScala
          .map(e => compileFieldSpec(e.getKey, e.getValue, fieldMap))
          .reduceOption(_ && _).getOrElse(lit(true))
      case a if a.isArray && a.elements.asScala.forall(_.isObject) =>
        // list of maps = OR of maps
        a.elements.asScala
          .map(compileSelection(_, fieldMap, keywordField))
          .reduceOption(_ || _).getOrElse(lit(false))
      case a if a.isArray =>
        // keyword list: match anywhere in the designated message field
        a.elements.asScala
          .map(v => stringMatch(col(keywordField), "contains", v.asText,
            caseSensitive = false))
          .reduceOption(_ || _).getOrElse(lit(false))
      case v => // bare scalar keyword
        stringMatch(col(keywordField), "contains", v.asText, caseSensitive = false)
    }

  /** One `field|mod1|mod2: value(s)` entry → predicate. */
  private def compileFieldSpec(
      key: String, value: JsonNode, fieldMap: String => String): Column = {
    val parts = key.split('|')
    val field = col(fieldMap(parts.head))
    var mods = parts.tail.toList
    val requireAll = mods.contains("all")
    val caseSensitive = mods.contains("cased")
    mods = mods.filterNot(m => m == "all" || m == "cased")
    val values: Seq[JsonNode] =
      if (value.isArray) value.elements.asScala.toSeq else Seq(value)
    val perValue = values.map(compileOneValue(field, mods, _, caseSensitive))
    if (requireAll) perValue.reduceOption(_ && _).getOrElse(lit(true))
    else perValue.reduceOption(_ || _).getOrElse(lit(false))
  }

  private def compileOneValue(
      field: Column, mods: List[String], v: JsonNode,
      caseSensitive: Boolean): Column = mods match {
    case Nil =>
      if (v.isNull) field.isNull
      else if (v.isNumber) field === lit(v.numberValue.toString.toDouble match {
        case d if d.isWhole => v.asLong
        case _ => v.asDouble
      })
      else if (v.isBoolean) field === lit(v.asBoolean)
      else stringMatch(field, "equals", v.asText, caseSensitive)
    case "contains" :: Nil =>
      stringMatch(field, "contains", v.asText, caseSensitive)
    case "startswith" :: Nil =>
      stringMatch(field, "startswith", v.asText, caseSensitive)
    case "endswith" :: Nil =>
      stringMatch(field, "endswith", v.asText, caseSensitive)
    case "re" :: Nil => field.rlike(v.asText) // |re is case-SENSITIVE per spec
    case "gt" :: Nil => field > numLit(v)
    case "gte" :: Nil => field >= numLit(v)
    case "lt" :: Nil => field < numLit(v)
    case "lte" :: Nil => field <= numLit(v)
    case "cidr" :: Nil =>
      val b = graft.operators.RangeJoin.cidrBounds(lit(v.asText))
      val ip = graft.operators.RangeJoin.ipv4ToLong(field)
      ip.between(b.getField("lo"), b.getField("hi"))
    case "windash" :: rest =>
      // cmd-line dash variants in BOTH directions — a slash-spelled rule
      // value must match dash-spelled events and vice versa; Sigma's full
      // permutation set also covers unicode dashes (en dash here — the
      // one seen in pasted command lines), per-position mixes are
      // approximated by the uniform spellings
      val t = v.asText
      Seq(t, t.replace('-', '/'), t.replace('/', '-'),
          t.replace('-', '–'))
        .distinct
        .map(s => compileOneValue(field, rest, yaml.readTree(quote(s)),
          caseSensitive))
        .reduce(_ || _)
    case other =>
      sys.error(s"unsupported sigma modifier chain: ${other.mkString("|")}")
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
    } + "\""

  private def numLit(v: JsonNode): Column =
    if (v.isNumber) {
      if (v.isIntegralNumber) lit(v.asLong) else lit(v.asDouble)
    } else lit(v.asText.toDouble)

  /** Sigma string matching: case-insensitive by default, `*`/`?` glob
    * wildcards with `\`-escapes. Plain values compile to the codegen'd
    * equality/LIKE family; wildcarded values to one anchored `rlike`.
    */
  private[config] def stringMatch(
      field: Column, mode: String, value: String,
      caseSensitive: Boolean): Column = {
    val f = if (caseSensitive) field.cast("string") else lower(field.cast("string"))
    val v = if (caseSensitive) value else value.toLowerCase
    if (hasWildcard(v)) {
      val core = globToRegex(v)
      val rx = mode match {
        case "equals" => s"^$core$$"
        case "contains" => core
        case "startswith" => s"^$core"
        case "endswith" => s"$core$$"
      }
      f.rlike(rx)
    } else {
      val l = unescape(v)
      mode match {
        case "equals" => f === lit(l)
        case "contains" => f.contains(lit(l))
        case "startswith" => f.startsWith(l)
        case "endswith" => f.endsWith(l)
      }
    }
  }

  private def hasWildcard(v: String): Boolean = {
    var i = 0
    while (i < v.length) {
      v.charAt(i) match {
        case '\\' => i += 2
        case '*' | '?' => return true
        case _ => i += 1
      }
    }
    false
  }

  /** Glob → regex, honoring `\*` / `\?` / `\\` escapes; everything else
    * regex-quoted.
    */
  private[config] def globToRegex(v: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < v.length) {
      v.charAt(i) match {
        case '\\' if i + 1 < v.length =>
          sb.append(java.util.regex.Pattern.quote(v.charAt(i + 1).toString))
          i += 2
        case '*' => sb.append(".*"); i += 1
        case '?' => sb.append("."); i += 1
        case c => sb.append(java.util.regex.Pattern.quote(c.toString)); i += 1
      }
    }
    sb.toString
  }

  private def unescape(v: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < v.length) {
      v.charAt(i) match {
        case '\\' if i + 1 < v.length => sb.append(v.charAt(i + 1)); i += 2
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  // ----------------------------------------------------------- condition

  /** Recursive-descent parser for the Sigma condition grammar:
    *   expr  := term (('or') term)*
    *   term  := fact (('and') fact)*
    *   fact  := 'not' fact | '(' expr ')' | ofExpr | IDENT
    *   ofExpr:= ('1' | INT | 'all') 'of' (PATTERN | 'them')
    * Pattern identifiers may end in `*` (prefix match over selection
    * names). `N of …` for N>1 compiles to "at least N of the matched
    * selections true" via an integer sum — still one codegen'd predicate.
    */
  private final class ConditionParser(
      input: String, selections: Map[String, Column]) {
    private val tokens: Array[String] =
      input.trim.replace("(", " ( ").replace(")", " ) ")
        .split("\\s+").filter(_.nonEmpty)
    private var pos = 0

    private def peek: Option[String] = tokens.lift(pos)
    private def next(): String = { val t = tokens(pos); pos += 1; t }

    def parse(): Column = {
      val c = expr()
      require(pos == tokens.length,
        s"sigma condition: trailing tokens after position $pos in '$input'")
      c
    }

    private def expr(): Column = {
      var c = term()
      while (peek.contains("or")) { next(); c = c || term() }
      c
    }

    private def term(): Column = {
      var c = fact()
      while (peek.contains("and")) { next(); c = c && fact() }
      c
    }

    private def fact(): Column = peek match {
      case Some("not") => next(); !fact()
      case Some("(") =>
        next(); val c = expr()
        require(peek.contains(")"), s"sigma condition: missing ')' in '$input'")
        next(); c
      case Some(n) if n == "all" || n.forall(_.isDigit) =>
        next()
        require(peek.contains("of"),
          s"sigma condition: expected 'of' after '$n' in '$input'")
        next()
        val pat = next()
        val matched = selectByPattern(pat)
        require(matched.nonEmpty,
          s"sigma condition: '$pat' matches no selection in '$input'")
        if (n == "all") matched.reduce(_ && _)
        else {
          val k = n.toInt
          if (k == 1) matched.reduce(_ || _)
          else matched.map(c => when(c, 1).otherwise(0))
            .reduce(_ + _) >= lit(k)
        }
      case Some(id) =>
        next()
        selections.getOrElse(id,
          sys.error(s"sigma condition references unknown selection '$id'"))
      case None => sys.error(s"sigma condition: unexpected end of '$input'")
    }

    private def selectByPattern(pat: String): Seq[Column] =
      if (pat == "them") selections.values.toSeq
      else if (pat.endsWith("*"))
        selections.collect {
          case (k, v) if k.startsWith(pat.dropRight(1)) => v
        }.toSeq
      else selections.get(pat).toSeq
  }
}
