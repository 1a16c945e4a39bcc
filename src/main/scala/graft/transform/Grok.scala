package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Grok pattern compilation to `regexp_extract` column graphs.
  *
  * The reference's managed transforms call VRL `parse_grok`/`parse_groks`
  * (~32 uses across the managed log sources, SURVEY.md §2.6). Instead of a
  * runtime grok interpreter, patterns compile once at plan build into a
  * plain Java regex; each named capture becomes a
  * `regexp_extract(col, regex, groupIdx)` expression — fully codegen'd, no
  * UDF.
  *
  * Grok-standard semantics: literal text between `%{...}` refs is RAW
  * REGEX (the managed sources rely on `(?:-|%{IP:x})` alternations and
  * escaped quotes), custom definitions may reference each other and embed
  * named captures, and `parse_groks`' multi-pattern form tries patterns in
  * order — first full match wins (see [[Grok.compileAll]]).
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
    "BASE16NUM" -> "(?:0[xX])?[0-9a-fA-F]+",
    "POSINT" -> "\\b[1-9][0-9]*\\b",
    "USERNAME" -> "[a-zA-Z0-9._-]+",
    "IPV4" -> "(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    // the standard grok IPV6 pattern (compressed forms + IPv4-mapped tails,
    // optional zone); a loose [0-9A-Fa-f:.]+ would also swallow dotted quads
    "IPV6" -> ("((([0-9A-Fa-f]{1,4}:){7}([0-9A-Fa-f]{1,4}|:))|(([0-9A-Fa-f]{1,4}:){6}(:[0-9A-Fa-f]{1,4}|((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3})|:))|(([0-9A-Fa-f]{1,4}:){5}(((:[0-9A-Fa-f]{1,4}){1,2})|:((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3})|:))|(([0-9A-Fa-f]{1,4}:){4}(((:[0-9A-Fa-f]{1,4}){1,3})|((:[0-9A-Fa-f]{1,4})?:((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3}))|:))|(([0-9A-Fa-f]{1,4}:){3}(((:[0-9A-Fa-f]{1,4}){1,4})|((:[0-9A-Fa-f]{1,4}){0,2}:((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3}))|:))|(([0-9A-Fa-f]{1,4}:){2}(((:[0-9A-Fa-f]{1,4}){1,5})|((:[0-9A-Fa-f]{1,4}){0,3}:((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3}))|:))|(([0-9A-Fa-f]{1,4}:){1}(((:[0-9A-Fa-f]{1,4}){1,6})|((:[0-9A-Fa-f]{1,4}){0,4}:((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3}))|:))|(:(((:[0-9A-Fa-f]{1,4}){1,7})|((:[0-9A-Fa-f]{1,4}){0,5}:((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3}))|:)))(%.+)?"),
    "IP" -> "(?:%{IPV6}|%{IPV4})",
    "HOSTNAME" -> "\\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\\.?\\b",
    "TIMESTAMP_ISO8601" -> "[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}(?::[0-9]{2}(?:\\.[0-9]+)?)?(?:Z|[+-][0-9]{2}:?[0-9]{2})?",
    "MONTHDAY" -> "(?:0[1-9]|[12][0-9]|3[01]|[1-9])",
    "MONTH" -> "\\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\\b",
    "YEAR" -> "(?:\\d\\d){1,2}",
    "TIME" -> "(?:[0-9]{2}):(?:[0-9]{2}):(?:[0-9]{2})(?:\\.[0-9]+)?",
    "LOGLEVEL" -> "(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE)",
    "QUOTEDSTRING" -> "\"(?:[^\"\\\\]|\\\\.)*\"",
    "UUID" -> "[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}")

  private val ref = "%\\{(\\w+)(?::([\\w.\\[\\]]+))?\\}".r

  /** Compiled grok: the assembled regex and each capture field with its
    * Java regex group index (literal capturing groups shift indices — the
    * builder counts them so embedded raw groups like s3access's
    * `"(-|%{DATA:user_agent})"` don't misalign extraction).
    */
  final case class Compiled(regex: String, fieldIdx: Seq[(String, Int)]) {
    def fields: Seq[String] = fieldIdx.map(_._1)
    /** True iff the whole line matches this pattern. */
    def matches(input: Column): Column = input.rlike("^(?:" + regex + ")$")
    /** Groups 0..n of the single match as `array<string>` (null on no
      * match) — ONE matcher run per row via [[graft.plans.RegexpMatchGroups]];
      * per-field `regexp_extract` would re-match per capture (40 captures =
      * 40 runs). Catalyst subexpression elimination shares the array across
      * the per-field projections below.
      */
    def groupsArray(input: Column, anchored: Boolean): Column =
      graft.plans.RegexpMatchGroups(input,
        if (anchored) "^(?:" + regex + ")$" else regex)
    /** One Column per named capture; empty capture → null (VRL parity).
      * `anchored = true` requires a whole-line match (parse_groks
      * semantics); the default extracts from the first partial match.
      */
    def columns(input: Column, anchored: Boolean = false): Map[String, Column] = {
      val groups = groupsArray(input, anchored)
      fieldIdx.map { case (f, i) =>
        val ex = element_at(groups, i + 1)
        f -> when(ex =!= "", ex)
      }.toMap
    }
  }

  /** Expand `%{PATTERN:field}` references into a single regex, with one
    * capture group per named field (unnamed refs are non-capturing).
    * `defs` adds/overrides pattern definitions; definitions may reference
    * other patterns and contain named captures of their own.
    */
  def compile(grok: String, defs: Map[String, String] = Map.empty): Compiled = {
    val dict = patterns ++ defs
    val fields = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    val sb = new StringBuilder
    var groups = 0 // capturing groups appended so far

    // count capturing '(' in a raw-regex literal: not escaped, not in a
    // character class, not followed by '?' (except named groups '(?<name>')
    def appendLiteral(lit: String): Unit = {
      var i = 0; var inClass = false
      while (i < lit.length) {
        lit.charAt(i) match {
          case '\\' => i += 1 // skip escaped char
          case '[' if !inClass => inClass = true
          case ']' if inClass => inClass = false
          case '(' if !inClass =>
            val isNonCapturing = i + 1 < lit.length && lit.charAt(i + 1) == '?' &&
              !(i + 2 < lit.length && lit.charAt(i + 2) == '<' &&
                i + 3 < lit.length && lit.charAt(i + 3) != '=' && lit.charAt(i + 3) != '!')
            if (!isNonCapturing) groups += 1
          case _ =>
        }
        i += 1
      }
      sb.append(lit)
    }

    def expand(pattern: String, seen: Set[String]): Unit = {
      var last = 0
      for (m <- ref.findAllMatchIn(pattern)) {
        appendLiteral(pattern.substring(last, m.start))
        val name = m.group(1)
        if (seen.contains(name))
          throw new IllegalArgumentException(s"recursive grok pattern %{$name}")
        val pat = dict.getOrElse(name,
          throw new IllegalArgumentException(s"unknown grok pattern %{$name}"))
        Option(m.group(2)) match {
          case Some(field) =>
            groups += 1
            fields += ((field, groups))
            sb.append("(")
            expand(pat, seen + name)
            sb.append(")")
          case None =>
            sb.append("(?:")
            expand(pat, seen + name)
            sb.append(")")
        }
        last = m.end
      }
      appendLiteral(pattern.substring(last))
    }

    expand(grok, Set.empty)
    Compiled(sb.toString, fields.toSeq)
  }

  /** VRL `parse_groks`: try patterns in order, first full match wins. The
    * result covers the union of all patterns' fields; a field takes its
    * value from the FIRST matching pattern that captures it (later
    * patterns never override — ordered-alternative semantics).
    */
  final case class CompiledSet(alternatives: Seq[Compiled]) {
    def fields: Seq[String] = alternatives.flatMap(_.fields).distinct
    def matches(input: Column): Column =
      alternatives.map(_.matches(input)).reduce(_ || _)
    def columns(input: Column): Map[String, Column] =
      columnsFrom(alternatives.map(_.groupsArray(input, anchored = true)))

    /** Field columns over per-alternative match arrays. Callers that fan
      * the fields into MANY projections should materialize the arrays
      * first ([[materialized]]) so each regex provably runs once per row —
      * a column reference cannot be duplicated by plan rewrites, whereas
      * an inline expression relies on subexpression elimination.
      */
    def columnsFrom(groupArrs: Seq[Column]): Map[String, Column] = {
      // guard each alternative's extracts so only the first matching
      // pattern contributes (ordered-alternative semantics)
      val guards = groupArrs.map(_.isNotNull)
      val notEarlier = guards.scanLeft(lit(true))((acc, g) => acc && !g)
      fields.map { f =>
        val cands = alternatives.zipWithIndex.collect {
          case (c, i) if c.fields.contains(f) =>
            val idx = c.fieldIdx.find(_._1 == f).get._2
            val ex = element_at(groupArrs(i), idx + 1)
            when(guards(i) && notEarlier(i), when(ex =!= "", ex))
        }
        f -> coalesce(cands: _*)
      }.toMap
    }

    /** Materialize one match-array column per alternative, returning the
      * widened frame, the field columns reading from them, and the
      * temporary column names for the caller to drop when done.
      */
    def materialized(df: org.apache.spark.sql.DataFrame, input: Column)
        : (org.apache.spark.sql.DataFrame, Map[String, Column], Seq[String]) = {
      val names = alternatives.indices.map(i => s"__grok_arr_$i")
      val widened = alternatives.zip(names).foldLeft(df) { case (d, (alt, n)) =>
        d.withColumn(n, alt.groupsArray(input, anchored = true))
      }
      (widened, columnsFrom(names.map(col)), names)
    }
  }

  def compileAll(groks: Seq[String], defs: Map[String, String] = Map.empty): CompiledSet =
    CompiledSet(groks.map(compile(_, defs)))
}
