package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection size of two SORTED array<bigint> columns — the
  * verification inner loop of the exact set-similarity family
  * ([[graft.ops.SetSimJoin]]): after the prefix filter nominates
  * candidate pairs, each pair's exact overlap is one merge walk over
  * its two sorted element arrays.
  *
  * Why a custom Catalyst expression instead of
  * `size(array_intersect(a, b))`: `array_intersect` is evaluated
  * interpreted, builds a hash set per CALL, and allocates the result
  * array just to count it — and verification runs once per candidate
  * pair, the second-hottest loop in the engine after [[LongDot]]
  * (measured: q192's char-shingle ground-truth fixture at sf0.1 spends
  * ~190 s in `array_intersect` verification; the merge walk removes
  * the allocation and the hashing and joins whole-stage codegen).
  * `doGenCode` emits a primitive two-pointer loop over the two
  * `ArrayData` with no allocation.
  *
  * REQUIRES both arrays sorted ascending (the callers build them with
  * `sort_array`); on unsorted input the count is undefined (it counts
  * order-compatible matches only). Null semantics: null if either
  * array is null, or if a null ELEMENT is encountered during the merge
  * walk — elements past the point where one side is exhausted are
  * never inspected, so e.g. [1,2,3] vs [5,null] returns 0, not null
  * (eval and codegen agree; the callers' hash arrays are never null,
  * so the distinction is defensive, not load-bearing).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
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
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < nx && j < ny) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { acc += 1L; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0; int $j = 0;
         |long $acc = 0L;
         |while ($i < $nx && $j < $ny) {
         |  if ($x.isNullAt($i) || $y.isNullAt($j)) {
         |    ${ev.isNull} = true;
         |    break;
         |  }
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $acc++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCount {
  /** Column-API entry point over two sorted array<bigint> columns. */
  def count(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCount(
        ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
