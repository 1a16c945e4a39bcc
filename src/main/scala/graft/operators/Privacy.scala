package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PII detection + redaction for training corpora: emails, IPv4 addresses,
  * and NANP-style phone numbers are counted and masked with typed
  * placeholders. Pure codegen'd column expressions (regexp_count /
  * regexp_replace) — one pass over the text, no UDFs, trivially
  * distributable; the patterns use only syntax with identical semantics in
  * Java regex and RE2, so an external engine reproduces both counts and
  * redacted text byte-for-byte.
  *
  * A production deployment extends `patterns` (SSNs, IBANs, secrets) — the
  * operator shape (ordered masked rewrite + per-kind counts) is the same.
  */
object Privacy {

  /** Pattern set, applied in order (emails first: they contain dots and
    * digits that the later patterns must not see as their own matches).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  val patterns: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "<EMAIL>"),
    ("ip", Ipv4Re, "<IP>"),
    ("phone", PhoneRe, "<PHONE>"))

  /** Adds `n_emails`, `n_ips`, `n_phones` (counts over the ORIGINAL text)
    * and `redacted` (all three kinds masked, in pattern order).
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val counted = patterns.foldLeft(df) { case (d, (kind, re, _)) =>
      d.withColumn(s"n_${kind}s", regexp_count(text, lit(re)).cast(LongType))
    }
    val redacted: Column = patterns.foldLeft(text) {
      case (c, (_, re, mask)) => regexp_replace(c, re, mask)
    }
    counted.withColumn("redacted", redacted)
  }
}
