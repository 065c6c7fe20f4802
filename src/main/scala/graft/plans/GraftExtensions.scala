package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, EvalMode, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, NumericEvalContext, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.expressions.LongDot

/** Engine extensions (SURVEY §7.3): registered either via
  * `spark.sql.extensions=graft.plans.GraftExtensions` at session build,
  * or [[GraftExtensions.install]] on a live session.
  *
  * This is deliberately the engine's ONLY optimizer rule: reference
  * parity needs zero custom Catalyst (SURVEY §4) and the rest of the
  * extension surface composes stock operators. The one rule that earns
  * its place is a strength reduction no built-in rule performs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
}

object GraftExtensions {
  /** Register the rule on an existing session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDotProduct)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    }
}

/** Rewrites the SQL-expressible integer dot product
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, v) -> s + v)`
  * into the codegen'd [[LongDot]] expression.
  *
  * Why: higher-order functions evaluate interpreted (lambda variables
  * block whole-stage codegen) and `zip_with` materializes an
  * intermediate array per row — in the ANN hot path that is the
  * difference between an allocation-free primitive loop and per-pair
  * object churn. Users writing the portable SQL form get the fast path
  * automatically; [[LongDot]]'s null/length semantics match the HOF
  * form exactly, so this is a pure strength reduction.
  *
  * LEGACY arithmetic only: under ANSI mode an int64 overflow in the HOF
  * form throws (TRY yields null), while [[LongDot]] wraps around — for
  * arbitrary user input that is a semantics change, so ANSI/TRY
  * Multiply/Add are deliberately left alone. (The engine's own bounded
  * quantized vectors can't overflow, but the rule fires on any user
  * expression and must be safe unconditionally.)
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(m1: NamedLambdaVariable,
                m2: NamedLambdaVariable,
                NumericEvalContext(EvalMode.LEGACY, _)),
                Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _)),
            Literal(0L, LongType),
            LambdaFunction(Add(s1: NamedLambdaVariable,
              s2: NamedLambdaVariable,
              NumericEvalContext(EvalMode.LEGACY, _)),
              Seq(q1: NamedLambdaVariable, q2: NamedLambdaVariable), _),
            LambdaFunction(f: NamedLambdaVariable,
              Seq(ff: NamedLambdaVariable), _))
          if Set(m1.exprId, m2.exprId) == Set(p1.exprId, p2.exprId) &&
            Set(s1.exprId, s2.exprId) == Set(q1.exprId, q2.exprId) &&
            f.exprId == ff.exprId &&
            isLongArray(a) && isLongArray(b) =>
        LongDot(a, b)
    }
}
