package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One (score, id) entry of a bounded top-k buffer; ordering is
  * (score desc, id asc) — a total order, so results are deterministic
  * under any partitioning and merge order.
  */
case class ScoredId(score: Long, id: Long)

/** Bounded top-k per group as a PARTIAL-AGGREGABLE typed
  * [[Aggregator]] (SURVEY §2.11 extension) — the at-scale replacement
  * for `row_number().over(partitionBy(g).orderBy(s desc)) <= k`:
  * the window form shuffles EVERY row to its group's partition and
  * sorts whole groups (a skewed group sorts its full mass on one
  * task); this aggregator keeps at most k entries per group per
  * partition, so map-side partials cut the shuffle to k·|groups|
  * rows and a hot group costs k per partition, not its row count.
  * Plans as ObjectHashAggregate with a partial stage — asserted in
  * PlanSpec — the same partial/final split every built-in aggregate
  * gets.
  *
  * The buffer is a sorted list capped at k (O(k) insert/merge —
  * fine for dashboard-sized k; a binary heap is the upgrade path for
  * large k), product-encoded so state serializes with Tungsten, no
  * kryo opacity.
  */
object TopK {

  /** Buffer wrapper: a product type so the whole state rides the
    * expression encoder.
    */
  case class Buf(items: Seq[ScoredId])

  class TopKAgg(k: Int) extends Aggregator[ScoredId, Buf, Seq[ScoredId]] {
    require(k >= 1, s"k must be >= 1: $k")

    private def better(a: ScoredId, b: ScoredId): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    override def zero: Buf = Buf(Nil)

    override def reduce(b: Buf, a: ScoredId): Buf = {
      // fast reject: full buffer and a no better than the current tail
      if (b.items.lengthCompare(k) >= 0 && !better(a, b.items.last)) b
      else {
        val (pre, post) = b.items.span(better(_, a))
        Buf((pre ++ (a +: post)).take(k))
      }
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      val out = scala.collection.mutable.ArrayBuffer.empty[ScoredId]
      var (l, r) = (b1.items, b2.items)
      while (out.size < k && (l.nonEmpty || r.nonEmpty)) {
        if (r.isEmpty || (l.nonEmpty && better(l.head, r.head))) {
          out += l.head; l = l.tail
        } else { out += r.head; r = r.tail }
      }
      Buf(out.toSeq)
    }

    override def finish(r: Buf): Seq[ScoredId] = r.items

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[ScoredId]] =
      ExpressionEncoder[Seq[ScoredId]]()
  }

  /** Column function: `topK(k)(scoreCol, idCol)` → array of (score,
    * id) structs, largest score first, (score desc, id asc) total
    * order.
    */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopKAgg(k), Encoders.product[ScoredId])
}
