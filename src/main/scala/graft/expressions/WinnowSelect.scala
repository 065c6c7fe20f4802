package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03) as ONE native O(n) pass — the codegen tier of
  * [[graft.ops.Winnowing]], same justification class as [[TokenSpans]]
  * and [[SortedIntersectCount]]: the SQL form runs two INTERPRETED
  * O(w) higher-order folds per character position (HOFs are
  * CodegenFallback), the most allocation-intensive expression in the
  * engine — q214/q222, the two winnowing queries, were its #1/#3 idle
  * costs and uniquely GC-sensitive under a loaded driver. This pass
  * walks the document once.
  *
  * Output per input string: the DISTINCT selected L-grams, in first-
  * occurrence order — exactly `array_distinct` over the SQL form's
  * selected positions, bit-for-bit:
  *
  *  - gram hash = the repo's 60-bit md5 convention
  *    (`conv(substring(md5(gram), 1, 15), 16, 10)`), computed here as
  *    the first 60 bits of the raw digest — identical value, no hex
  *    string round-trip;
  *  - position j (1-based) is selected iff h(j) is the minimum of SOME
  *    full window of w consecutive gram hashes containing j, ties
  *    selecting every tied minimum — evaluated as the two-sided run
  *    test lrun(j) + rrun(j) ≥ min(w, n) − 1 with runs capped at w−1
  *    (see [[graft.ops.Winnowing]] for why this IS the paper's rule),
  *    computed in O(n) total via nearest-strictly-smaller-neighbor
  *    monotonic stacks instead of the per-position O(w) refolds:
  *    the consecutive ≥-run beside j ends exactly at the nearest
  *    strictly-smaller hash;
  *  - texts shorter than L select nothing (empty array); fewer than w
  *    grams fall back to the global minimum (the min(w, n) clamp).
  *
  * Character positions are CODE POINTS (Spark's `substring`/`length`
  * semantics on UTF8String), never UTF-16 units — the byte offset of
  * every code point is precomputed in one linear walk, so each gram's
  * md5 digests straight out of the document's byte array with no
  * per-gram substring materialization (one reused thread-local
  * MessageDigest, one 16-byte scratch buffer).
  *
  * Null semantics: null string → null array (callers explode, which
  * drops the row — same visible behavior as the SQL form's null
  * cascade).
  */
case class WinnowSelect(child: Expression, l: Int, w: Int)
    extends UnaryExpression {

  require(l >= 2 && w >= 1, s"bad winnowing params: L=$l w=$w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WinnowSelect.select(input.asInstanceOf[UTF8String], l, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      // the loop lives in the static helper — one call, no lambda, so
      // the enclosing projection stays in whole-stage codegen
      s"""
         |${ev.value} = graft.expressions.WinnowSelect.select($x, $l, $w);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)

  override def prettyName: String = "winnow_select"
}

object WinnowSelect {

  /** Column-API entry point: distinct selected L-grams of `text`. */
  def grams(text: Column, l: Int, w: Int): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expression(text), l, w))

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** One document's distinct selected grams (see class doc). Called
    * from generated code — must stay public and static-shaped.
    */
  def select(text: UTF8String, l: Int, w: Int): GenericArrayData = {
    if (text == null) return null
    val bytes = text.getBytes
    // code-point start offsets (Spark substring semantics): offs(i) =
    // byte offset of character i, offs(nChars) = bytes.length
    val nBytes = bytes.length
    var nChars = 0
    var b = 0
    while (b < nBytes) {
      b += UTF8String.numBytesForFirstByte(bytes(b))
      nChars += 1
    }
    if (nChars < l) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](nChars + 1)
    var i = 0
    b = 0
    while (b < nBytes) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(nChars) = nBytes

    // 60-bit md5 gram hashes (first 15 hex chars of the digest)
    val n = nChars - l + 1
    val hs = new Array[Long](n)
    val digest = md5.get()
    val out = new Array[Byte](16)
    var j = 0
    while (j < n) {
      digest.reset()
      digest.update(bytes, offs(j), offs(j + l) - offs(j))
      digest.digest(out, 0, 16)
      var v = 0L
      var k = 0
      while (k < 7) { v = (v << 8) | (out(k) & 0xffL); k += 1 }
      hs(j) = (v << 4) | ((out(7) & 0xf0L) >>> 4)
      j += 1
    }

    // nearest strictly-smaller neighbor on each side (monotonic
    // stack): the consecutive ≥-run beside j ends exactly there
    val stack = new Array[Int](n)
    val lrun = new Array[Int](n)
    var top = -1
    j = 0
    while (j < n) {
      while (top >= 0 && hs(stack(top)) >= hs(j)) top -= 1
      val prevSmaller = if (top >= 0) stack(top) else -1
      lrun(j) = math.min(j - prevSmaller - 1, w - 1)
      top += 1; stack(top) = j
      j += 1
    }
    val need = math.min(w, n) - 1
    val selected = new Array[Boolean](n)
    top = -1
    j = n - 1
    while (j >= 0) {
      while (top >= 0 && hs(stack(top)) >= hs(j)) top -= 1
      val nextSmaller = if (top >= 0) stack(top) else n
      val rrun = math.min(nextSmaller - j - 1, w - 1)
      selected(j) = lrun(j) + rrun >= need
      top += 1; stack(top) = j
      j -= 1
    }

    // distinct selected grams, first-occurrence order (array_distinct
    // parity); grams share the document's byte array — UTF8String
    // equality/hash are byte-wise, no copies until Spark serializes
    val seen = new java.util.LinkedHashSet[UTF8String]()
    j = 0
    while (j < n) {
      if (selected(j)) {
        seen.add(UTF8String.fromBytes(bytes, offs(j), offs(j + l) - offs(j)))
      }
      j += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }
}
