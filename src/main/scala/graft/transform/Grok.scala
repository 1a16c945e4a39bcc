package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Grok pattern compilation to `regexp_extract` column graphs.
  *
  * The reference's managed transforms call VRL `parse_grok`/`parse_groks`
  * (~32 uses across the managed log sources, SURVEY.md §2.6). Instead of a runtime
  * grok interpreter, patterns compile once at plan build into a plain Java
  * regex; each named capture becomes a `regexp_extract(col, regex, groupIdx)`
  * expression — fully codegen'd, no UDF.
  */
object Grok {

  /** Built-in pattern dictionary (the subset the managed sources use). */
  val patterns: Map[String, String] = Map(
    "WORD" -> "\\b\\w+\\b",
    "NOTSPACE" -> "\\S+",
    "SPACE" -> "\\s*",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "INT" -> "[+-]?(?:[0-9]+)",
    "NUMBER" -> "[+-]?(?:[0-9]+(?:\\.[0-9]+)?)",
    "BASE10NUM" -> "[+-]?(?:[0-9]+(?:\\.[0-9]+)?)",
    "POSINT" -> "\\b[1-9][0-9]*\\b",
    "USERNAME" -> "[a-zA-Z0-9._-]+",
    "IPV4" -> "(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "HOSTNAME" -> "\\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\\.?\\b",
    "TIMESTAMP_ISO8601" -> "[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}(?::[0-9]{2}(?:\\.[0-9]+)?)?(?:Z|[+-][0-9]{2}:?[0-9]{2})?",
    "LOGLEVEL" -> "(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE)",
    "QUOTEDSTRING" -> "\"(?:[^\"\\\\]|\\\\.)*\"",
    "UUID" -> "[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}")

  private val ref = "%\\{(\\w+)(?::([\\w.\\[\\]]+))?\\}".r

  /** Compiled grok: the assembled regex and the ordered capture fields. */
  final case class Compiled(regex: String, fields: Seq[String]) {
    /** One Column per named capture; empty match → null (VRL parity). */
    def columns(input: Column): Map[String, Column] =
      fields.zipWithIndex.map { case (f, i) =>
        val ex = regexp_extract(input, regex, i + 1)
        f -> when(ex =!= "", ex)
      }.toMap
  }

  /** Expand `%{PATTERN:field}` references into a single anchored regex with
    * one capture group per named field (unnamed refs are non-capturing).
    */
  def compile(grok: String): Compiled = {
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var last = 0
    for (m <- ref.findAllMatchIn(grok)) {
      sb.append(java.util.regex.Pattern.quote(grok.substring(last, m.start)))
      val pat = patterns.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"unknown grok pattern %{${m.group(1)}}"))
      Option(m.group(2)) match {
        case Some(field) => fields += field; sb.append("(").append(pat).append(")")
        case None => sb.append("(?:").append(pat).append(")")
      }
      last = m.end
    }
    sb.append(java.util.regex.Pattern.quote(grok.substring(last)))
    Compiled(sb.toString, fields.toSeq)
  }
}
