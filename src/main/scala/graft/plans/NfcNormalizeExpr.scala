package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization (canonical composition) — the
  * curation primitive exact dedup needs BEFORE keying: visually-identical
  * strings differing only in combining-mark encoding (`e` + U+0301 vs the
  * precomposed U+00E9) hash apart and silently survive exact dedup, a
  * real failure mode in web-crawled corpora (the same page scraped via
  * two toolchains keys differently). NFC is idempotent and
  * concatenation-stable for the full-string case, and both JVM
  * (`java.text.Normalizer`, the platform's canonical implementation) and
  * external engines (DuckDB `nfc_normalize`) implement the same Unicode
  * canonical-composition algorithm, so normalized keys reproduce
  * bit-for-bit cross-engine — the property the q160 gate checks.
  *
  * Shape: a straight static call inside whole-stage codegen (no UDF, no
  * boxing beyond the UTF8String↔String round-trip the JDK API forces —
  * the same cost class as the JDK-backed codec expressions). The
  * common-case fast path is inside the JDK: `Normalizer.normalize`
  * first RUNS the quick-check and returns the input reference for
  * already-NFC text (ASCII, most CJK), so the per-row cost on clean
  * corpora is a scan, not a rebuild.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Public: called from generated code. */
  def normalize(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** Column surface. */
  def apply(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
