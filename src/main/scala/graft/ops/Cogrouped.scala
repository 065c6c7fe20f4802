package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Input row for the typed cogroup surface. */
case class Ev(event_id: Long, user_id: Long, event_type: String, ms: Long)

/** Output row: a click attributed to its most recent prior signup. */
case class Attribution(event_id: Long, user_id: Long, click_ms: Long,
    signup_ms: Option[Long], signup_event: Option[Long])

/** Typed `KeyValueGroupedDataset.cogroup` surface (SURVEY §2.11 E84):
  * the Dataset API's escape hatch for per-key logic over TWO inputs —
  * here the as-of attribution q49 expresses with a running
  * `last(ignoreNulls)` window, re-expressed as an imperative two-
  * pointer merge of each user's time-sorted clicks and signups.
  *
  * Same single user-key shuffle as the window form (cogroup co-
  * partitions both sides in one exchange each); per-group buffering is
  * bounded by one user's events (session-scale — the q80 bound). The
  * declarative window form is preferred when it can express the logic
  * (it pipelines, this buffers); the cogroup form exists for merges
  * whose state machine SQL can't say — and is verified here against
  * the same DuckDB oracle as q49, the strongest typed-vs-declarative
  * parity statement the gate can make.
  */
object Cogrouped {

  /** For every click, the most recent signup at or before it in the
    * per-user `(ms, event_id)` total order — exactly q49's semantics.
    */
  def clickSignupAsof(events: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    val evs = events
      .select(col("event_id"), col("user_id"), col("event_type"), col("ms"))
      .as[Ev]
    val clicks = evs.filter(_.event_type == "click").groupByKey(_.user_id)
    val signups = evs.filter(_.event_type == "signup").groupByKey(_.user_id)
    clicks.cogroup(signups) { case (uid, cs, ss) =>
      val cArr = cs.toArray.sortBy(e => (e.ms, e.event_id))
      val sArr = ss.toArray.sortBy(e => (e.ms, e.event_id))
      var si = 0
      var lastS: Option[Ev] = None
      cArr.iterator.map { c =>
        while (si < sArr.length && (sArr(si).ms < c.ms ||
            (sArr(si).ms == c.ms && sArr(si).event_id < c.event_id))) {
          lastS = Some(sArr(si)); si += 1
        }
        Attribution(c.event_id, uid, c.ms,
          lastS.map(_.ms), lastS.map(_.event_id))
      }
    }.toDF()
  }
}
