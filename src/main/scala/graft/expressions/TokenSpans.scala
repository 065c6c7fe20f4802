package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token → annotation-span construction as ONE native O(n) pass — the
  * builder behind [[graft.ops.Nested.tokenAnnotations]].
  *
  * Input: `array<string>` of tokens. Output, per token i of the
  * single-space-joined text (the [[graft.functions.TextFns.tokens]]
  * contract — span_end − span_start = token length, consecutive spans
  * separated by one char):
  * `array<struct<span_start:int, span_end:int, label:string>>` where
  * label is the deterministic length class (<4 chars 'short', <8
  * 'mid', else 'long' — [[graft.ops.Nested.labelSql]] keeps the same
  * rule for the SQL-visible definition the oracle replays).
  *
  * Why a custom expression instead of the HOF forms (SURVEY §7.3 —
  * same justification tier as [[LongDot]]): every SQL-expressible
  * build is either quadratic or interpreted. An
  * `aggregate`+`array_append` fold copies the accumulator per token —
  * O(tokens²) bytes moved, ~20 GB for one 10⁵-token document — and
  * the truly-linear char-boundary scan
  * (`filter(sequence(1, length(txt)), …)`) runs one INTERPRETED
  * lambda per character (higher-order functions are CodegenFallback),
  * measured 7× slower than the fold at paragraph scale. This pass
  * allocates the offsets exactly once, walks the token array once,
  * and `doGenCode` emits a static call that keeps the surrounding
  * projection inside whole-stage codegen.
  *
  * Null semantics: null array → null; a null ELEMENT → null result
  * (a poisoned document, mirroring how `length(null)` would cascade
  * through the SQL fold — token streams from `filter(split(…))` never
  * contain nulls).
  */
case class TokenSpans(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = TokenSpans.spanArrayType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TokenSpans.build(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      // the loop lives in the static helper — one call, no lambda, so
      // the enclosing projection stays in whole-stage codegen
      s"""
         |${ev.value} = graft.expressions.TokenSpans.build($x);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenSpans =
    copy(child = newChild)

  override def prettyName: String = "token_spans"
}

object TokenSpans {

  val spanStructType: StructType = StructType(Seq(
    StructField("span_start", IntegerType, nullable = false),
    StructField("span_end", IntegerType, nullable = false),
    StructField("label", StringType, nullable = false)))

  val spanArrayType: ArrayType = ArrayType(spanStructType, containsNull = false)

  private val SHORT = UTF8String.fromString("short")
  private val MID = UTF8String.fromString("mid")
  private val LONG = UTF8String.fromString("long")

  /** One linear pass: running char offset, three-field struct per
    * token. Returns null on a null element (poisoned document).
    * Called from both interpreted eval and the generated code.
    */
  def build(tokens: ArrayData): GenericArrayData = {
    val n = tokens.numElements()
    val out = new Array[Any](n)
    var off = 0
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) return null
      val t = tokens.getUTF8String(i)
      val len = t.numChars()
      val label = if (len < 4) SHORT else if (len < 8) MID else LONG
      out(i) = new GenericInternalRow(
        Array[Any](off, off + len, label): Array[Any])
      off += len + 1
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point over an array<string> column. */
  def spans(tokens: Column): Column =
    ColumnBridge.column(TokenSpans(ColumnBridge.expression(tokens)))
}
