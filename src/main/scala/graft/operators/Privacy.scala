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

  // ---- extended kinds -------------------------------------------------------

  /** SSN with the SSA issuance exclusions (area not 000/666/900+, group not
    * 00, serial not 0000) encoded as pure alternation — RE2 has no
    * lookahead, so exclusion-by-alternation is what keeps the pattern
    * byte-identical between Java regex and an RE2 oracle.
    */
  val SsnRe: String =
    "\\b(00[1-9]|0[1-9]\\d|[1-5]\\d{2}|6[0-57-9]\\d|66[0-57-9]|[78]\\d{2})" +
      "-(0[1-9]|[1-9]\\d)-(000[1-9]|00[1-9]\\d|0[1-9]\\d{2}|[1-9]\\d{3})\\b"

  /** Card-shaped candidate: 13–19 digits, each optionally followed by one
    * space/dash. Candidates are only COUNTED when they pass [[luhnValid]];
    * redaction masks every candidate (conservative — a leaked PAN with a
    * typo'd digit should still not survive into a training corpus).
    * A CONTIGUOUS run longer than 19 digits matches nowhere (every
    * candidate end falls inside the run, failing the trailing `\b`);
    * a separator-punctuated longer run CAN yield a 13–19-digit prefix
    * whose last group boundary provides the `\b` — conservative
    * over-matching that the Luhn gate keeps out of the counts. Words
    * break digit runs, so free text does not chain into candidates.
    */
  val CcRe: String = "\\b(?:\\d[ -]?){12,18}\\d\\b"

  /** IPv6: full 8-group form, or single-`::` compressed with one trailing
    * group (the dominant textual forms in logs). Leftmost-first alternation
    * behaves identically in Java regex and RE2.
    */
  val Ipv6Re: String =
    "\\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\\b|" +
      "\\b(?:[0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}\\b"

  /** Extended pattern set; order matters for redaction (emails first —
    * they contain digits and dots; SSN before the card pattern so an SSN
    * is never absorbed into a card-shaped digit run; IPv6 before IPv4).
    */
  val extendedPatterns: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "<EMAIL>"),
    ("ssn", SsnRe, "<SSN>"),
    ("cc", CcRe, "<CC>"),
    ("ipv6", Ipv6Re, "<IPV6>"),
    ("ip", Ipv4Re, "<IP>"),
    ("phone", PhoneRe, "<PHONE>"))

  /** Luhn checksum over a card candidate (separators stripped), as a pure
    * codegen'd expression — `transform` over digit positions of the
    * REVERSED string (position 1 = check digit), doubling even positions
    * with the >9 ⇒ −9 fold, then one `aggregate` sum. Exact integer
    * arithmetic, bit-identical in any engine.
    */
  def luhnValid(cand: Column): Column = {
    val digits = reverse(regexp_replace(cand, "[ -]", ""))
    val vals = transform(sequence(lit(1), length(digits)), i => {
      val d = ascii(substr(digits, i, lit(1))) - lit(48)
      when(i % 2 === 0, when(d > 4, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    aggregate(vals, lit(0), (a, x) => a + x) % 10 === 0
  }

  /** [[redactPii]] over [[extendedPatterns]]: per-kind counts on the
    * ORIGINAL text (`n_emails`, `n_ssns`, `n_ccs`, `n_ipv6s`, `n_ips`,
    * `n_phones`) and a `redacted` rewrite masking all six kinds in order.
    * The card count is Luhn-gated (candidates that fail the checksum are
    * masked but not counted). Still one codegen'd pass, zero shuffles.
    */
  def redactPiiExtended(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val counted = extendedPatterns.foldLeft(df) {
      case (d, ("cc", re, _)) =>
        d.withColumn("n_ccs",
          size(filter(regexp_extract_all(text, lit(re), lit(0)), luhnValid(_)))
            .cast(LongType))
      case (d, (kind, re, _)) =>
        d.withColumn(s"n_${kind}s", regexp_count(text, lit(re)).cast(LongType))
    }
    val redacted: Column = extendedPatterns.foldLeft(text) {
      case (c, (_, re, mask)) => regexp_replace(c, re, mask)
    }
    counted.withColumn("redacted", redacted)
  }

  /** k-anonymity suppression over quasi-identifier columns — the
    * publishing gate a training corpus with joined user metadata needs
    * BEFORE release: any row whose quasi-identifier combination is shared
    * by fewer than k rows is suppressed (the combination is identifying).
    * One grouped count on the quasi columns plus a slim join of (keys, n)
    * back onto the rows — bodies never shuffle; the marking frame is
    * group-cardinality-sized. Returns the input rows with `__group_n` and
    * `__k_kept`; callers filter or audit.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, s"need quasi columns and k>=1")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__group_n"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) :+ col("__group_n"): _*)
    // NULL quasi values form real groups (groupBy already counts them as
    // one), so the count join must be null-safe: a plain using-columns
    // equi-join would silently drop null-keyed rows — neither kept,
    // suppressed, nor audited — the worst failure direction for a
    // publishing gate. `<=>` is still a hash-joinable equality key.
    val cond = quasiCols.map(c => df(c) <=> counts(s"__q_$c")).reduce(_ && _)
    df.join(counts, cond)
      .select(df.columns.map(df(_)) :+ col("__group_n"): _*)
      .withColumn("__k_kept", col("__group_n") >= k)
  }
}
