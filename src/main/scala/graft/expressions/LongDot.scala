package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer dot product of two array<bigint> columns — the inner loop of
  * cosine similarity over quantized embeddings (see
  * [[graft.ops.Similarity]]).
  *
  * Why a custom Catalyst expression instead of
  * `aggregate(zip_with(a, b, _*_), 0, _+_)`: higher-order functions are
  * evaluated interpreted (lambda variables block whole-stage codegen)
  * and `zip_with` materializes an intermediate array per row. For ANN
  * queries the dot product runs once per candidate *pair* — the hottest
  * loop in the engine at 10⁶–10⁹ pairs — so it is the one place where a
  * hand-written codegen loop is justified (SURVEY §7.3). `doGenCode`
  * emits a primitive long loop over the two `ArrayData` with no
  * allocation; semantics (including int64 overflow wrap-around) are
  * identical to the HOF form on every input this engine produces
  * (|q|≤~10⁴ ⇒ 4096-dim dot < 2^39).
  *
  * Null semantics match the HOF form exactly (so
  * [[graft.plans.RewriteHofDotProduct]] is a pure strength-reduction):
  * null if either array is null, if lengths differ (zip_with pads with
  * nulls, poisoning the sum), or if any element is null. Quantized
  * vectors never hit those cases.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $acc += $x.getLong($i) * $y.getLong($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "long_dot"
}

object LongDot {
  /** Column-API entry point: `dot(a, b)` over array<bigint> columns. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
