package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout}
import org.apache.spark.sql.Row

/** Structured Streaming surface (SURVEY §2.14: absent in the reference,
  * in scope as engine capability): the batch `events` queries
  * re-expressed as streams — `readStream` over a parquet directory,
  * watermarked tumbling/sliding windows, and a
  * `mapGroupsWithState` sessionizer for custom state.
  *
  * Scale: file-source streams partition per micro-batch like any scan;
  * the windowed aggregation is an incremental stateful agg (partial
  * per batch + state store), so state size is O(open windows x keys),
  * not O(events). The watermark bounds state: windows older than the
  * watermark close and evict.
  */
object EventStream {

  /** Streaming read of an events-shaped parquet directory. `maxFilesPerTrigger`
    * bounds micro-batch size (backpressure at scale).
    */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 4): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Tumbling-window count/sum per event_type with a watermark — the
    * streaming twin of the batch q16 hourly aggregation.
    */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding-window average value per event type. */
  def slidingAvg(events: DataFrame, window_ : String = "1 hour",
      slide: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide).as("w"), col("event_type"))
      .agg(avg(col("value")).as("avg_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("avg_value"))

  /** Streaming exact dedup: drop repeated keys within the watermark
    * horizon — the streaming twin of Dedup.exact for ingest pipelines
    * (re-delivered events, at-least-once sources). State holds one
    * entry per distinct key seen inside the horizon and evicts as
    * event time advances, so state is O(keys per horizon), not
    * O(stream); duplicates farther apart than the watermark are a
    * batch-dedup concern (Dedup.exact over the landed table).
    */
  def dedupeWithinWatermark(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-stream interval join (streaming last-hour attribution):
    * each LEFT event pairs with RIGHT events of the same key whose
    * event time lies in [leftTs - maxGap, leftTs]. Both sides carry
    * watermarks AND the join predicate carries the time bound —
    * that pair is what lets Spark evict right-side state older than
    * (watermark - maxGap) instead of buffering both streams forever;
    * an unbounded-condition stream-stream join is a state leak by
    * construction. Inner matches emit as soon as both rows arrive
    * (append mode), so a drained stream equals the batch join exactly.
    *
    * Callers pre-project the two sides to disjoint column names; the
    * join key is `keyCol` on both.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      watermark: String = "2 hours", maxGap: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermark).as("l")
    val r = right.withWatermark(rightTsCol, watermark).as("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTsCol") >=
          col(s"l.$leftTsCol") - expr(s"INTERVAL $maxGap") &&
        col(s"r.$rightTsCol") <= col(s"l.$leftTsCol"))
      .drop(col(s"r.$keyCol"))
  }

  final case class SessionState(count: Long, totalValue: Double,
      lastTs: Long)
  final case class SessionUpdate(user_id: Long, n_events: Long,
      total_value: Double, last_ts_s: Long)

  /** Per-user running-session state with mapGroupsWithState: each
    * micro-batch folds its events into the user's state and emits the
    * running aggregate. (No GroupStateTimeout: a processing-time
    * timeout under an AvailableNow trigger schedules empty micro-batches
    * forever; event-time session *windows* belong to the watermarked
    * aggregations above — this operator demos arbitrary keyed state.)
    */
  def sessionize(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events.select(col("user_id").cast("long"),
        col("ts").cast("long").as("ts_s"), col("value").cast("double"))
      .as[(Long, Long, Double)]
    typed.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[(Long, Long, Double)],
            state: GroupState[SessionState]) => {
          val batch = rows.toSeq
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
          val next = SessionState(prev.count + batch.size,
            prev.totalValue + batch.map(_._3).sum,
            math.max(prev.lastTs, batch.map(_._2).maxOption.getOrElse(0L)))
          state.update(next)
          SessionUpdate(uid, next.count, next.totalValue, next.lastTs)
        }).toDF()
  }

  /** Write a streaming frame to an in-memory table and drain all
    * available input (test/demo harness; swap for a real sink in prod).
    */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      outputMode: String = "update"): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
