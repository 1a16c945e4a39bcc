package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** User-agent parsing from an ordered pattern LEXICON (the reference's
  * `parse_user_agent` delegates to the uap-core browser/OS/device tables;
  * VRL stdlib `parse_user_agent` in "enriched" mode). This is a trimmed
  * re-expression of that public pattern vocabulary as data: first match
  * wins within each dimension, exactly uap-core's evaluation order rule.
  *
  * Everything compiles to one chained `when` Column per dimension —
  * codegen'd `rlike`/`regexp_extract`, no UDF — so the lexicon
  * participates in whole-stage codegen like any built-in.
  *
  * Output shape is the ECS `user_agent` object:
  * `{name, version, os: {name, version, full}, device: {name}}`.
  */
object UaLexicon {

  /** One user-agent-family rule: regex (order matters), display family,
    * and an optional version-capture regex (defaults to the same regex,
    * group 1).
    */
  final case class Rule(re: String, family: String, versionRe: Option[String] = None)

  /** Browser/agent families, most-specific first (uap-core ordering:
    * tools and SDKs before engines, Edge/Opera/Samsung before Chrome,
    * Chrome before Safari — every WebKit UA advertises Safari).
    */
  val agents: Seq[Rule] = Seq(
    Rule("""aws-cli/([\w.]+)""", "aws-cli"),
    Rule("""(aws-sdk-[\w-]+)/([\w.]+)""", "aws-sdk",
      Some("""aws-sdk-[\w-]+/([\w.]+)""")),
    Rule("""curl/([\w.]+)""", "curl"),
    Rule("""Wget/([\w.]+)""", "Wget"),
    Rule("""python-requests/([\w.]+)""", "python-requests"),
    Rule("""okhttp/([\w.]+)""", "okhttp"),
    Rule("""Go-http-client/([\w.]+)""", "Go-http-client"),
    Rule("""Apache-HttpClient/([\w.]+)""", "Apache-HttpClient"),
    Rule("""(?:^|\s)Java/([\w.]+)""", "Java"),
    // browsers — forks/shells before Chrome, Chrome before Safari
    Rule("""Edge?/([\w.]+)""", "Edge"),
    Rule("""EdgiOS/([\w.]+)""", "Edge Mobile"),
    Rule("""EdgA/([\w.]+)""", "Edge Mobile"),
    Rule("""OPR/([\w.]+)""", "Opera"),
    Rule("""Opera[/ ]([\w.]+)""", "Opera"),
    Rule("""SamsungBrowser/([\w.]+)""", "Samsung Internet"),
    Rule("""YaBrowser/([\w.]+)""", "Yandex Browser"),
    Rule("""Vivaldi/([\w.]+)""", "Vivaldi"),
    Rule("""Brave Chrome/([\w.]+)""", "Brave"),
    Rule("""CriOS/([\w.]+)""", "Chrome Mobile iOS"),
    Rule("""Chromium/([\w.]+)""", "Chromium"),
    Rule("""Chrome/([\w.]+) Mobile""", "Chrome Mobile"),
    Rule("""Chrome/([\w.]+)""", "Chrome"),
    Rule("""FxiOS/([\w.]+)""", "Firefox iOS"),
    Rule("""Firefox/([\w.]+)""", "Firefox"),
    Rule("""MSIE ([\w.]+)""", "IE"),
    Rule("""Trident/.*rv:([\w.]+)""", "IE"),
    // Safari reports its version in Version/x; bare Safari/x is the build.
    // iPhone/iPad must be checked BEFORE the desktop Version/ rule: real
    // mobile UAs carry "Version/17.1 Mobile/15E148 Safari/604.1", which the
    // desktop rule's optional " Mobile/\w+" group would otherwise claim
    // (uap-core families this as "Mobile Safari").
    Rule("""(?:iPhone|iPad|iPod).*Version/[\w.]+.*Safari""", "Mobile Safari",
      Some("""Version/([\w.]+)""")),
    Rule("""Version/([\w.]+)(?: Mobile/\w+)? Safari""", "Safari",
      Some("""Version/([\w.]+)""")),
    Rule("""(?:iPhone|iPad).*Safari/([\w.]+)""", "Mobile Safari"),
    Rule("""Safari/([\w.]+)""", "Safari"))

  /** OS families. Windows NT internal versions map to marketing names,
    * as the uap-core os table does.
    */
  val osRules: Seq[Rule] = Seq(
    Rule("""Windows NT 10\.0""", "Windows", Some("""Windows NT (10)\.0""")),
    Rule("""Windows NT 6\.3""", "Windows", Some("""Windows NT 6\.(3)""")),
    Rule("""Windows NT 6\.2""", "Windows", Some("""Windows NT 6\.(2)""")),
    Rule("""Windows NT 6\.1""", "Windows", Some("""Windows NT 6\.(1)""")),
    Rule("""Windows NT ([\d.]+)""", "Windows"),
    Rule("""(?:iPhone|iPad|iPod).*OS ([\d_]+)""", "iOS"),
    Rule("""Mac OS X ([\d_.]+)""", "Mac OS X"),
    Rule("""Mac OS X""", "Mac OS X", Some("""Mac OS X ([\d_.]+)""")),
    Rule("""Android ([\d.]+)""", "Android"),
    Rule("""Android""", "Android", Some("""Android ([\d.]+)""")),
    Rule("""CrOS \w+ ([\d.]+)""", "Chrome OS"),
    Rule("""Ubuntu""", "Ubuntu", Some("""Ubuntu[/ ]([\d.]+)""")),
    Rule("""Linux""", "Linux", Some("""Linux[/ ]([\d.]+)""")),
    Rule("""Windows""", "Windows", Some("""Windows ([\d.]+)""")))

  /** Windows NT x.y → marketing version (the only lookup uap-core's os
    * table does via replacement strings rather than captures).
    */
  private val windowsMarketing = Map("10" -> "10", "3" -> "8.1", "2" -> "8", "1" -> "7")

  /** Device families — hardware markers, most-specific first. */
  val devices: Seq[Rule] = Seq(
    Rule("""iPhone""", "iPhone"),
    Rule("""iPad""", "iPad"),
    Rule("""iPod""", "iPod"),
    Rule("""(SM-[A-Za-z0-9]+)""", "Samsung $1"),
    Rule("""(Pixel [\w ]*\d)""", "Google $1"),
    Rule("""Macintosh""", "Mac"),
    Rule("""Android""", "Generic Smartphone"))

  private def firstMatch(c: Column, rules: Seq[Rule])(
      build: (Rule, Column) => Column): Column =
    rules.foldRight(lit(null).cast("string")) { (r, fallback) =>
      when(c.rlike(r.re), build(r, c)).otherwise(fallback)
    }

  private def versionOf(c: Column, r: Rule): Column = {
    val re = r.versionRe.getOrElse(r.re)
    val raw = regexp_extract(c, re, 1)
    when(raw =!= "", raw)
  }

  def agentName(c: Column): Column = firstMatch(c, agents)((r, _) => lit(r.family))

  def agentVersion(c: Column): Column =
    firstMatch(c, agents)((r, col) => versionOf(col, r))

  def osStruct(c: Column): Column = {
    val name = firstMatch(c, osRules)((r, _) => lit(r.family))
    val ver = firstMatch(c, osRules) { (r, col) =>
      val raw = versionOf(col, r)
      val dotted = translate(raw, "_", ".")
      if (r.family == "Windows")
        windowsMarketing.foldLeft(dotted) { case (acc, (k, v)) =>
          when(raw === k, lit(v)).otherwise(acc)
        }
      else dotted
    }
    struct(
      name.as("name"),
      ver.as("version"),
      when(ver.isNotNull, concat(name, lit(" "), ver))
        .otherwise(name).as("full"))
  }

  def deviceStruct(c: Column): Column = {
    val name = firstMatch(c, devices) { (r, col) =>
      if (r.family.contains("$1"))
        concat(lit(r.family.takeWhile(_ != '$')), regexp_extract(col, r.re, 1))
      else lit(r.family)
    }
    struct(coalesce(name, when(c.isNotNull, "Other")).as("name"))
  }

  /** The full ECS user_agent object (without `original`, which callers
    * attach themselves since it is the input).
    */
  def parse(c: Column): Column = struct(
    agentName(c).as("name"),
    agentVersion(c).as("version"),
    osStruct(c).as("os"),
    deviceStruct(c).as("device"))
}
