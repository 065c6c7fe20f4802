package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC / NFKC / NFD) as a native expression —
  * Spark has no built-in, and the exact-dedup / tombstone / boilerplate
  * families are only as strong as their canonical form: real crawls
  * carry the same text precomposed and decomposed (é as U+00E9 or
  * e + U+0301), in full-width forms, and with compatibility variants,
  * all of which evade a byte-level fingerprint. `java.text.Normalizer`
  * is the JDK-public implementation of UAX #15; DuckDB's
  * `nfc_normalize` replays the NFC form, which is what keeps the
  * fingerprint chain oracle-checkable (NFKC/NFD have no DuckDB
  * counterpart — they are spec-verified instead).
  *
  * Scan-local, zero state; the fast path skips the String round-trip
  * entirely: `Normalizer.isNormalized` over the decoded chars is a
  * single pass, and crawl text is overwhelmingly already-NFC.
  *
  * Why NFC (not NFKC) in the default fingerprint chain: NFC is
  * canonical equivalence — the same abstract character sequence, byte
  * variants only — safe to collapse unconditionally. NFKC additionally
  * folds compatibility variants (full-width Ａ → A, ﬁ → fi), a LOSSY
  * curation choice a pipeline opts into per-corpus ([[NFKC]] is
  * exposed for exactly that).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.forms.contains(form),
    s"unsupported normalization form: $form")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = graft.expressions.UnicodeNormalize.normalize(
         |  $x, "$form");
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)

  override def prettyName: String = s"unicode_normalize_${form.toLowerCase}"
}

object UnicodeNormalize {

  private[expressions] val forms = Set("NFC", "NFKC", "NFD")

  /** NFC — canonical composition; the fingerprint chain's form. */
  def nfc(c: Column): Column = apply0(c, "NFC")

  /** NFKC — compatibility folding (full-width, ligatures); lossy. */
  def nfkc(c: Column): Column = apply0(c, "NFKC")

  /** NFD — canonical decomposition; spec/adversarial use. */
  def nfd(c: Column): Column = apply0(c, "NFD")

  private def apply0(c: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))

  /** Called from generated code — must stay public and static-shaped. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    val f = Normalizer.Form.valueOf(form)
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}
