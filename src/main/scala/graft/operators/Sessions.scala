package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: split each key's event stream into sessions
  * at inactivity gaps — the batch twin of the streaming sessionizer in
  * [[graft.streaming.EventStream]], and the standard prelude to
  * funnel/engagement analytics.
  *
  * The classic two-window form: a lag() marks rows that OPEN a session
  * (first event, or gap from the predecessor > maxGap), and a running
  * sum of those markers numbers the sessions — both windows share the
  * same (key, time) partitioning and sort, so the whole operator costs
  * ONE exchange + one per-key sort at any scale. Ties on the
  * timestamp are ordered by `tieCol` so session numbering is
  * deterministic.
  */
object Sessions {

  /** Per-event session assignment: input columns plus `session_seq`
    * (1-based per key, in time order). `maxGapMicros` is the
    * inactivity threshold: a gap STRICTLY greater than it opens a new
    * session (equal-to-gap events stay in session).
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, maxGapMicros: Long): DataFrame = {
    require(maxGapMicros >= 0, "maxGapMicros must be non-negative")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val opens = when(
      prev.isNull || unix_micros(col(tsCol)) - prev > maxGapMicros,
      1L).otherwise(0L)
    events.withColumn("session_seq",
      sum(opens).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** Session-level rollup: one row per (key, session) with bounds and
    * size. `aggs` appends caller metrics (e.g. sum of a value column)
    * to the standard (n_events, session_start, session_end) triple.
    */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, maxGapMicros: Long,
      aggs: Seq[Column] = Nil): DataFrame = {
    val all = Seq(count(lit(1)).as("n_events"),
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end")) ++ aggs
    sessionize(events, keyCol, tsCol, tieCol, maxGapMicros)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(all.head, all.tail: _*)
  }
}
