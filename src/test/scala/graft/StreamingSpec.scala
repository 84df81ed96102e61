package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Structured Streaming over the events fixture: the streaming results
  * must equal their batch twins once the stream drains (availableNow),
  * which pins windowing/watermark semantics without wall-clock flakes.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", Some(4))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Events re-written as clean micros-timestamp parquet (the raw
    * fixture is TIMESTAMP(NANOS)) split over several files so the
    * file-source stream actually micro-batches.
    */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .repartition(6)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming tumbling window equals batch aggregation after drain") {
    val stream = EventStream.readEvents(spark, eventsDir, maxFilesPerTrigger = 2)
    EventStream.runToMemory(spark,
      EventStream.tumblingCounts(stream), "tumbling", outputMode = "complete")
    val got = spark.table("tumbling")
      .select("window_start", "event_type", "n", "total_value")
    val want = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
    assert(got.count() == want.count())
    // counts compare exactly; double sums only to tolerance (incremental
    // state-store accumulation reorders float addition vs batch)
    val joined = got.as("g").join(want.as("w"),
      col("g.window_start") === col("w.window_start") &&
        col("g.event_type") === col("w.event_type"))
    assert(joined.count() == want.count(), "same (window, type) keys")
    assert(joined.filter(col("g.n") =!= col("w.n")).isEmpty)
    assert(joined.filter(
      abs(col("g.total_value") - col("w.total_value")) > 1e-6).isEmpty)
  }

  test("sliding window emits overlapping windows") {
    val stream = EventStream.readEvents(spark, eventsDir)
    EventStream.runToMemory(spark,
      EventStream.slidingAvg(stream), "sliding", outputMode = "complete")
    val rows = spark.table("sliding")
    // 1h windows sliding by 30m: ~2 windows per event hour
    val tumbling = spark.table("tumbling").count()
    assert(rows.count() > tumbling)
  }

  test("mapGroupsWithState sessionizer accumulates per-user state") {
    val stream = EventStream.readEvents(spark, eventsDir, maxFilesPerTrigger = 2)
    EventStream.runToMemory(spark,
      EventStream.sessionize(spark, stream), "sessions", outputMode = "update")
    val last = spark.table("sessions")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
    val want = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    // every user's final session state saw all of that user's events
    val joined = last.join(want, "user_id")
      .filter(col("n_events") =!= col("n"))
    assert(joined.isEmpty, "state must accumulate every event per user")
    assert(last.count() == want.count())
  }
}
