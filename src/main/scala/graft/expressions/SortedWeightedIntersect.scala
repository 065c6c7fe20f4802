package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Weighted intersection sum over two SORTED key arrays — the
  * [[SortedIntersectCount]] discipline extended to weights: given a
  * document's sorted gram array `keysA` with ALIGNED per-gram weights
  * `weightsA` and a second document's sorted gram array `keysB`,
  * returns Σ weightsA(i) over the grams present in both. One merge
  * walk, no per-pair hash set, no per-pair gram shuffle — the
  * verification inner loop of IDF-weighted Jaccard rescoring (q261):
  * weights are a GLOBAL function of the gram (w = 10⁶ div df), so the
  * A-side weight of a matched gram IS the pair's weight, and the
  * union sum folds out of per-doc totals (Σ_A w + Σ_B w − Σ_{A∩B} w)
  * without ever materializing the union.
  *
  * REQUIRES both key arrays sorted ascending in Spark's string order
  * (binary UTF-8 — `sort_array` produces exactly this) and
  * `|keysA| = |weightsA|` (enforced). Null semantics match
  * [[SortedIntersectCount]]: null if any input array is null or a
  * null element is ENCOUNTERED during the walk; elements past the
  * point where one side is exhausted are never inspected.
  */
case class SortedWeightedIntersectSum(first: Expression,
    second: Expression, third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _),
          ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<bigint>, " +
          s"array<string>), got ${first.dataType.catalogString} / " +
          s"${second.dataType.catalogString} / " +
          s"${third.dataType.catalogString}")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, wa: Any, b: Any): Any =
    SortedWeightedIntersectSum.walk(a.asInstanceOf[ArrayData],
      wa.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, wa, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed =
         |  graft.expressions.SortedWeightedIntersectSum.walk($a, $wa, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((Long) $boxed).longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SortedWeightedIntersectSum =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "sorted_weighted_intersect_sum"
}

object SortedWeightedIntersectSum {

  /** Column-API entry point: Σ weightsA over keysA ∩ keysB. */
  def sum(keysA: Column, weightsA: Column, keysB: Column): Column =
    ColumnBridge.column(SortedWeightedIntersectSum(
      ColumnBridge.expression(keysA), ColumnBridge.expression(weightsA),
      ColumnBridge.expression(keysB)))

  /** Called from generated code and eval — boxed Long or null. */
  def walk(a: ArrayData, wa: ArrayData, b: ArrayData): java.lang.Long = {
    val na = a.numElements()
    val nb = b.numElements()
    require(wa.numElements() == na,
      s"sorted_weighted_intersect_sum: |keys|=$na but |weights|=" +
        s"${wa.numElements()} — the arrays must be aligned")
    var i = 0
    var j = 0
    var acc = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val av = a.getUTF8String(i)
      val bv = b.getUTF8String(j)
      val cmp = av.compareTo(bv)
      if (cmp == 0) {
        if (wa.isNullAt(i)) return null
        acc += wa.getLong(i)
        i += 1; j += 1
      } else if (cmp < 0) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
