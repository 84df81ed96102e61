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

  /** Ordered funnel: for each key, the earliest time each step can be
    * reached respecting step order — step i's time is the min event
    * time of step i's type at-or-after step i-1's time (inclusive, so
    * simultaneous events can satisfy consecutive steps). Output: one
    * row per key that reached step 1, with `step_<i>_ts` columns
    * (NULL once the funnel breaks — later steps are NULL too, by
    * construction) and `depth` = number of steps reached.
    *
    * Scale: one filtered map-side-combined aggregation per step over
    * the (key, ts) projection — K small shuffles of narrow rows for a
    * K-step funnel, joined per key. No per-key event lists are ever
    * collected (the collect_list fold would hold a hot key's whole
    * history in one task).
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be unique")
    def stepCol(i: Int) = s"step_${i + 1}_ts"
    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as(stepCol(0)))
    for (i <- 1 until steps.size) {
      val reached = events.filter(col(typeCol) === steps(i))
        .select(col(keyCol), col(tsCol))
        .join(acc.select(col(keyCol), col(stepCol(i - 1))), keyCol)
        .filter(col(tsCol) >= col(stepCol(i - 1)))
        .groupBy(col(keyCol)).agg(min(col(tsCol)).as(stepCol(i)))
      acc = acc.join(reached, Seq(keyCol), "left")
    }
    val depth = steps.indices.map(i =>
      when(col(stepCol(i)).isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("depth", depth)
  }
}
