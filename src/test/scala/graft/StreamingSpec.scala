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

  test("streaming dedup within watermark drops re-delivered events") {
    // duplicate every event (a re-delivering at-least-once source):
    // after the watermarked dedup, each event_id survives exactly once
    val dupDir = Files.createTempDirectory("graft-stream-dup").toString
    val base = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
    base.unionByName(base).repartition(6)
      .write.mode("overwrite").parquet(dupDir)
    // files hold arbitrary ts order, so micro-batches arrive wildly out
    // of event-time order: the watermark must exceed the fixture's full
    // span or out-of-order batches are dropped as late (the operator's
    // real contract — horizon >= max re-delivery delay)
    val stream = EventStream.readEvents(spark, dupDir, maxFilesPerTrigger = 2)
    EventStream.runToMemory(spark,
      EventStream.dedupeWithinWatermark(stream, Seq("event_id"), "90 days"),
      "deduped", outputMode = "append")
    val got = spark.table("deduped")
    assert(got.count() == base.count(),
      s"each event once: ${got.count()} vs ${base.count()}")
    assert(got.groupBy("event_id").count()
      .filter(col("count") > 1).isEmpty, "no key survives twice")
  }

  test("graft-table stream: drain over a table with two appends equals batch read") {
    import graft.engine.GraftTable
    import graft.streaming.GraftTableStream
    val loc = Files.createTempDirectory("graft-tstream").toString
    val n = Tables.nation(spark, "/root/testdata/sf0.001")
    val t = GraftTable.createAs(spark, loc, "nation_s",
      n.filter(col("n_nationkey") % 2 === 0))
    t.append(n.filter(col("n_nationkey") % 2 === 1))
    val stream = GraftTableStream.read(spark, loc)
    assert(stream.isStreaming)
    EventStream.runToMemory(spark, stream, "graft_stream", outputMode = "append")
    val got = spark.table("graft_stream")
    val want = t.read()
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("graft-table stream keeps its bound schema across mid-stream evolution") {
    import graft.engine.GraftTable
    import org.apache.spark.sql.Row
    val loc = Files.createTempDirectory("graft-evstream").toString
    import spark.implicits._
    val t = GraftTable.createAs(spark, loc, "ev",
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "n"))
    // schema evolves AFTER the source would bind: rename keeps the
    // field-id, a new column appears, and new data arrives under the
    // new schema — the stream must keep serving (id, name, n) by
    // field-id, not silently re-label new-schema columns positionally
    val src = new graft.streaming.GraftTableStreamSource(spark, loc)
    val bound = t.meta.currentSchema
    t.renameColumn("name", "label")
    t.addColumn("extra", "string")
    t.append(Seq((3L, "c", 30L, "x")).toDF("id", "label", "n", "extra"))
    // the source's batches keep the declared (bound) columns
    val end = src.getOffset.get
    val batch = src.getBatch(None, end)
    assert(batch.schema.fieldNames.toSeq == Seq("id", "name", "n"))
    // and the pinned-schema read maps post-evolution files by field-id
    // (the streaming frame itself cannot be collected outside a query)
    val lastId = t.meta.currentSnapshot.get.snapshotId
    val rows = t.readAppendsBetween(None, lastId, Some(bound))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)),
      s"field-id mapping must survive evolution: $rows")
  }

  test("graft-table stream resumes from checkpoint, delivering only new appends") {
    import graft.engine.GraftTable
    import graft.streaming.GraftTableStream
    import org.apache.spark.sql.streaming.Trigger
    val loc = Files.createTempDirectory("graft-tstream2").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val out = Files.createTempDirectory("graft-out").toString
    val n = Tables.nation(spark, "/root/testdata/sf0.001")
    val t = GraftTable.createAs(spark, loc, "nation_s2",
      n.filter(col("n_nationkey") % 2 === 0))
    def drain(): Unit = {
      val q = GraftTableStream.read(spark, loc).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val evens = spark.read.parquet(out).count()
    assert(evens == n.filter(col("n_nationkey") % 2 === 0).count())
    t.append(n.filter(col("n_nationkey") % 2 === 1))
    drain() // checkpointed offset: second drain must append ONLY the odds
    val all = spark.read.parquet(out)
    assert(all.count() == n.count())
    assert(all.exceptAll(n).isEmpty && n.exceptAll(all).isEmpty)
  }

  test("graft-table changes stream delivers CDC rows across upsert commits") {
    import spark.implicits._
    import graft.engine.GraftTable
    import graft.streaming.{GraftTableSink, GraftTableStream}
    import org.apache.spark.sql.streaming.Trigger
    val loc = Files.createTempDirectory("graft-cstream").toString
    val ckpt = Files.createTempDirectory("graft-cckpt").toString
    val t = GraftTable.create(spark, loc, "cdc_src",
      Seq("id" -> "long", "v" -> "string"),
      properties = Map("write.delete.mode" -> "merge-on-read"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    def drain(): Unit = {
      val q = GraftTableStream.readChanges(spark, loc).writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.synchronized {
            buf ++= df.collect().map(r =>
              (r.getLong(0), r.getString(1), r.getString(2)))
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      ()
    }
    // first drain = initial load: current state as inserts
    drain()
    assert(buf.toSet == Set((1L, "a", "insert"), (2L, "b", "insert")))
    buf.clear()
    // CDC commits: eq upsert replaces id=2, MoR delete removes id=1 —
    // the checkpointed second drain must deliver ONLY the delta, via
    // the accretive fast path (no rewrites crossed, no loud failure
    // like the appends-mode stream)
    val up = GraftTableSink.upsertBatchEq(t, Seq("id"), "cs")
    up(Seq((2L, "B")).toDF("id", "v"), 0L)
    t.delete(col("id") === 1L)
    drain()
    assert(buf.toSet == Set(
      (2L, "b", "delete"), (2L, "B", "insert"), (1L, "a", "delete")))
    buf.clear()
    // replay with the same checkpoint and no new commits: nothing
    drain()
    assert(buf.isEmpty)
  }

  test("changes stream re-binds CDC columns by field-id across a rename") {
    import spark.implicits._
    import graft.engine.GraftTable
    val loc = Files.createTempDirectory("graft-cev").toString
    val t = GraftTable.createAs(spark, loc, "cev",
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"),
      properties = Map("write.delete.mode" -> "merge-on-read"))
    val src = new graft.streaming.GraftTableStreamSource(spark, loc,
      mode = "changes")
    val o1 = src.getOffset.get
    assert(src.getBatch(None, o1).schema.fieldNames.toSeq ==
      Seq("id", "name", "_change_type"))
    // mid-stream evolution: rename, then CDC commits under the NEW name
    t.renameColumn("name", "label")
    t.delete(col("id") === 1L)
    t.append(Seq((3L, "c")).toDF("id", "label"))
    val o2 = src.getOffset.get
    // the CDC slice spans post-rename commits, yet the delivered columns
    // keep the BOUND name — resolved by field-id against the live schema
    // (analysis of the rebinding select throws here if the mapping broke)
    assert(src.getBatch(Some(o1), o2).schema.fieldNames.toSeq ==
      Seq("id", "name", "_change_type"))
    // a bound column dropped mid-stream must fail loudly, not re-label
    t.dropColumn("label")
    t.append(Seq(Tuple1(4L)).toDF("id"))
    val o3 = src.getOffset.get
    val e = intercept[Exception](src.getBatch(Some(o2), o3))
    assert(e.getMessage.contains("dropped mid-stream"))
  }

  test("maxSnapshotsPerTrigger paces the graft-table stream and survives restart") {
    import spark.implicits._
    import graft.engine.GraftTable
    import org.apache.spark.sql.streaming.Trigger
    val loc = Files.createTempDirectory("graft-rate").toString
    val ckpt = Files.createTempDirectory("graft-rate-ckpt").toString
    val t = GraftTable.create(spark, loc, "rated", Seq("id" -> "long"))
    (1L to 3L).foreach(i => t.append(Seq(i).toDF("id")))
    val batches =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    def drain(until: => Boolean): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("path", loc).option("maxSnapshotsPerTrigger", "1").load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          batches.synchronized {
            batches += id -> df.select("id").as[Long].collect().toSeq
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0L)).start()
      val deadline = System.currentTimeMillis() + 60000
      while (!batches.synchronized(until) &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      q.stop(); q.awaitTermination(30000)
      ()
    }
    def seen: Set[Long] = batches.flatMap(_._2).toSet
    drain(seen == Set(1L, 2L, 3L))
    // one snapshot per micro-batch: 3 snapshots -> 3 one-row batches
    assert(batches.size == 3, s"expected 3 paced batches, got $batches")
    assert(batches.forall(_._2.size == 1), s"pacing violated: $batches")
    batches.clear()
    // restart with a backlog: the persisted floor caps from at or above
    // the committed position, not from zero — so the stream stays paced
    // (never >1 snapshot per batch) and at most the one uncommitted
    // batch replays (at-least-once foreachBatch, as in any restart)
    (4L to 5L).foreach(i => t.append(Seq(i).toDF("id")))
    drain(Set(4L, 5L).subsetOf(seen))
    assert(batches.forall(_._2.size <= 1), s"pacing violated: $batches")
    assert(batches.flatMap(_._2).forall(_ >= 3L),
      s"committed snapshots re-delivered: $batches")
  }

  test("maxRowsPerTrigger / maxBytesPerTrigger pace by commit cost") {
    import spark.implicits._
    import graft.engine.GraftTable
    import org.apache.spark.sql.streaming.Trigger
    val loc = Files.createTempDirectory("graft-rate2").toString
    val t = GraftTable.create(spark, loc, "rated2", Seq("id" -> "long"))
    t.append((1L to 2L).toDF("id"))
    t.append((3L to 4L).toDF("id"))
    t.append((5L to 9L).toDF("id"))
    t.append(Seq(10L).toDF("id"))
    def drain(opts: Map[String, String]): Seq[Seq[Long]] = {
      val ckpt = Files.createTempDirectory("graft-rate2-ckpt").toString
      val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      val reader = spark.readStream.format("graft-table").option("path", loc)
      val q = opts.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
        .load().writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.synchronized {
            batches += df.select("id").as[Long].collect().sorted.toSeq
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0L)).start()
      val deadline = System.currentTimeMillis() + 60000
      while (!batches.synchronized(
          batches.flatten.toSet == (1L to 10L).toSet) &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      q.stop(); q.awaitTermination(30000)
      batches.synchronized(batches.filter(_.nonEmpty).toSeq)
    }
    // rows cap 4: commits of 2+2 rows coalesce, the 5-row commit is
    // over the cap but admits ALONE (progress guarantee), then 1
    assert(drain(Map("maxRowsPerTrigger" -> "4")) ==
      Seq(Seq(1L, 2L, 3L, 4L), Seq(5L, 6L, 7L, 8L, 9L), Seq(10L)))
    // bytes cap 1: every commit exceeds it, so each admits alone —
    // byte-based pacing at snapshot granularity
    assert(drain(Map("maxBytesPerTrigger" -> "1")) ==
      Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L, 6L, 7L, 8L, 9L), Seq(10L)))
  }

  test("graft-table stream fails loudly across a non-append commit") {
    import graft.engine.GraftTable
    import graft.streaming.GraftTableStream
    import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
    val loc = Files.createTempDirectory("graft-tstream3").toString
    val n = Tables.nation(spark, "/root/testdata/sf0.001")
    val t = GraftTable.createAs(spark, loc, "nation_s3", n)
    t.delete(col("n_nationkey") === 0) // CoW rewrite inside the range
    val ex = intercept[StreamingQueryException] {
      val q = GraftTableStream.read(spark, loc).writeStream
        .format("memory").queryName("graft_stream_bad")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(ex.getMessage.contains("not append") ||
      Option(ex.getCause).exists(_.getMessage.contains("not append")))
  }

  test("graft-table sink: streaming appends land as snapshots, replays are no-ops") {
    import spark.implicits._
    import graft.engine.GraftTable
    import graft.streaming.GraftTableSink
    val loc = Files.createTempDirectory("graft-tsink").toString
    val t = GraftTable.create(spark, loc, "sink_t",
      Seq("id" -> "long", "v" -> "string"))
    val fn = GraftTableSink.appendBatch(t, "q")
    // micro-batches 0 and 1 commit rows + batch-id watermark atomically
    fn(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    fn(Seq((3L, "c")).toDF("id", "v"), 1L)
    assert(t.read().count() == 3)
    assert(t.meta.properties("graft.streaming.q.batch-id") == "1")
    // a checkpoint-restart replay of batch 1 must not duplicate rows
    fn(Seq((3L, "c")).toDF("id", "v"), 1L)
    assert(t.read().count() == 3)
    assert(t.meta.snapshots.size == 2)
    // the next batch proceeds normally and survives interleaved DML
    t.delete(col("id") === 1L)
    fn(Seq((4L, "d")).toDF("id", "v"), 2L)
    assert(t.read().orderBy("id").select("id").as[Long].collect().toSeq ==
      Seq(2L, 3L, 4L))
    // end-to-end through a real streaming query
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    src.addData(100L, 101L)
    val q = src.toDF().select(col("value").as("id"),
        lit("s").as("v"))
      .writeStream
      .foreachBatch(GraftTableSink.appendBatch(t, "q2"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(t.read().count() == 5)
    assert(t.meta.properties.contains("graft.streaming.q2.batch-id"))
  }

  test("graft-table sink: streaming upsert replaces same-key rows, replays no-op") {
    import spark.implicits._
    import graft.engine.GraftTable
    import graft.streaming.GraftTableSink
    val loc = Files.createTempDirectory("graft-upsert").toString
    val t = GraftTable.create(spark, loc, "cdc_t",
      Seq("id" -> "long", "v" -> "string"))
    val up = GraftTableSink.upsertBatch(t, Seq("id"), "cdc")
    up(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    val dataAfter0 = t.meta.currentSnapshot.get.files.map(_.path).toSet
    up(Seq((2L, "B"), (3L, "c")).toDF("id", "v"), 1L)
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
    // merge-on-read: batch 0's files survive, the old copy of id=2 is
    // hidden by a positional delete
    val snap = t.meta.currentSnapshot.get
    assert(dataAfter0.subsetOf(snap.files.map(_.path).toSet))
    assert(snap.deleteFiles.nonEmpty)
    // checkpoint-restart replay of batch 1: nothing changes
    val snapsBefore = t.meta.snapshots.size
    up(Seq((2L, "B"), (3L, "c")).toDF("id", "v"), 1L)
    assert(t.meta.snapshots.size == snapsBefore)
    assert(t.read().count() == 3)
    // keys outside every file's range prune to a pure append
    up(Seq((100L, "z")).toDF("id", "v"), 2L)
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c"), (100L, "z")))
    // a batch carrying two rows for one key would create permanent
    // duplicates — rejected loudly, nothing committed
    intercept[IllegalArgumentException](t.upsertIfNewMarker(
      Seq((5L, "x"), (5L, "y")).toDF("id", "v"), Seq("id"),
      "graft.streaming.cdc.batch-id", 99L))
    assert(t.read().count() == 4)
    // NULL keys are null-safe (<=>): a NULL-keyed batch row REPLACES
    // the old NULL-keyed row — same semantics as the eq-delete variant
    up(Seq((Option.empty[java.lang.Long], "n1")).toDF("id", "v"), 3L)
    up(Seq((Option.empty[java.lang.Long], "n2")).toDF("id", "v"), 4L)
    val nulls = t.read().filter(col("id").isNull)
      .select("v").as[String].collect().toSeq
    assert(nulls == Seq("n2"))
    assert(t.read().count() == 5)
  }

  test("upsert on a hidden-partitioned table records the layout") {
    import spark.implicits._
    import graft.engine.GraftTable
    import graft.streaming.GraftTableSink
    val loc = Files.createTempDirectory("graft-upsert-part").toString
    val t = GraftTable.create(spark, loc, "cdc_p",
      Seq("id" -> "long", "typ" -> "string", "v" -> "string"),
      partition = Seq("typ" -> "identity"))
    val up = GraftTableSink.upsertBatch(t, Seq("id"), "p")
    up(Seq((1L, "x", "a"), (2L, "y", "b")).toDF("id", "typ", "v"), 0L)
    up(Seq((2L, "y", "B")).toDF("id", "typ", "v"), 1L)
    // every data file carries its partition value in the manifest
    assert(t.meta.currentSnapshot.get.files.forall(
      _.partitionValues.contains("typ")))
    assert(t.read().orderBy("id").as[(Long, String, String)].collect().toSeq ==
      Seq((1L, "x", "a"), (2L, "y", "B")))
    // metadata partition pruning still works over upserted data
    val pruned = t.readPruned(pv => pv.get("typ").forall(_ == "y"))
    assert(pruned.select("id").as[Long].collect().toSeq == Seq(2L))
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

  test("streaming incremental dedup: fingerprint index as a graft " +
      "table, one survivor per distinct text, replays absorbed") {
    import graft.engine.GraftTable
    import graft.pipeline.Dedup
    val docsDir = Files.createTempDirectory("graft-incdedup-src").toString
    // duplicated corpus split over files so texts recur ACROSS batches
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    base.unionByName(base.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 500000).as("doc_id"), col("text")))
      .repartition(6).write.mode("overwrite").parquet(docsDir)
    val loc = Files.createTempDirectory("graft-incdedup").toString
    val spark0 = spark
    import spark0.implicits._
    val idx = GraftTable.createAs(spark, s"$loc/idx", "fp_index",
      Seq.empty[String].toDF("fp"))
    val kept = GraftTable.createAs(spark, s"$loc/kept", "kept_docs",
      base.filter(lit(false)).withColumn("fp", md5(col("text"))))
    val q = spark.readStream.schema(spark.read.parquet(docsDir).schema)
      .option("maxFilesPerTrigger", 2).parquet(docsDir)
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame,
          batchId: Long) =>
        val seen = idx.read()
        val fresh = Dedup.exactIncremental(batch, "doc_id", "text",
          seen, "fp")
        // one commit per table; batch-id markers make replays no-ops
        kept.appendIfNewMarker(fresh, "graft.streaming.kept.batch-id",
          batchId)
        idx.appendIfNewMarker(fresh.select("fp"),
          "graft.streaming.idx.batch-id", batchId)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = kept.read()
    val nDistinct = base.select(md5(col("text"))).distinct().count()
    assert(out.count() === nDistinct,
      "exactly one survivor per distinct text across all batches")
    assert(out.select("fp").distinct().count() === nDistinct)
    assert(idx.read().count() === nDistinct, "index mirrors survivors")
  }

  test("stream-stream interval join drains to the exact batch join") {
    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("pts")),
      df.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("cts")))
    val (lp, lc) = sides(EventStream.readEvents(spark, eventsDir,
      maxFilesPerTrigger = 2))
    // the file source replays the month-long fixture in ARBITRARY file
    // order, so any watermark shorter than the span would (correctly)
    // drop late rows; a span-sized watermark makes the drain lossless
    // and the batch equality exact. Production uses a real disorder
    // bound and accepts the documented late-row eviction.
    EventStream.runToMemory(spark,
      EventStream.intervalJoin(lp, lc, "user_id", "pts", "cts",
        watermark = "45 days"),
      "attributed", outputMode = "append")
    val got = spark.table("attributed")
      .select("purchase_id", "click_id")
    val (bp, bc) = sides(Tables.events(spark, "/root/testdata/sf0.001"))
    val want = bp.join(bc,
        bp("user_id") === bc("user_id") &&
          col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
          col("cts") <= col("pts"))
      .select("purchase_id", "click_id")
    assert(got.count() > 0, "fixture must produce matches")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "drained stream join must equal the batch join")
  }

  test("curation projections run unchanged over a stream: normalize + " +
      "quality gate on streaming docs equal their batch twin") {
    // the per-doc curation stages are pure projections, so the SAME
    // operator objects drop onto a readStream with no code change —
    // the property that lets one pipeline definition serve both the
    // backfill (batch) and the live tail (streaming)
    val dir = Files.createTempDirectory("graft-stream-docs").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").repartition(4)
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(dir)
    def curate(df: org.apache.spark.sql.DataFrame) = {
      val cleaned = df.select(col("doc_id"),
        graft.pipeline.Curation.normalizeText(col("text")).as("text"))
      graft.pipeline.TextAnalysis.gopherFilter(cleaned, "doc_id", "text",
        minWords = 20, maxDupFrac = 0.6)
    }
    EventStream.runToMemory(spark, curate(stream), "curated",
      outputMode = "append")
    val got = spark.table("curated").orderBy("doc_id").collect().toSeq
    val want = curate(spark.read.parquet(dir)).orderBy("doc_id")
      .collect().toSeq
    assert(got == want, s"streaming gate diverged: ${got.size}/${want.size}")
    assert(got.nonEmpty)
  }

  test("continuously maintained aggregate: changes stream + " +
      "IncrementalAgg fold into a graft state table equals full " +
      "recompute across DML; replays and empty drains no-op") {
    import spark.implicits._
    import graft.engine.GraftTable
    import graft.operators.IncrementalAgg
    import graft.streaming.{GraftTableSink, GraftTableStream}
    import org.apache.spark.sql.streaming.Trigger
    val loc = Files.createTempDirectory("graft-magg-src").toString
    val ckpt = Files.createTempDirectory("graft-magg-ckpt").toString
    val keys = Seq("k"); val sums = Seq("x")
    val src = GraftTable.create(spark, loc, "agg_src",
      Seq("id" -> "long", "k" -> "string", "x" -> "long"),
      properties = Map("write.delete.mode" -> "merge-on-read"))
    val state = GraftTable.createAs(spark,
      Files.createTempDirectory("graft-magg-state").toString, "agg_state",
      IncrementalAgg.initial(src.read(), keys, sums).filter(lit(false)))
    def drain(): Unit = {
      val q = GraftTableStream.readChanges(spark, loc).writeStream
        .foreachBatch(GraftTableSink.maintainAggBatch(state, keys, sums,
          "magg"))
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      ()
    }
    def presented = IncrementalAgg.present(state.read(), keys, sums)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("n_rows"),
        Option(r.getAs[Any]("sum_x")))).toSet
    def full = src.read().groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("n"),
        Option(r.getAs[Any]("s")))).toSet

    // initial load bootstraps the state (incl. a NULL key group)
    src.append(Seq((1L, "a", Some(10L)), (2L, "a", None),
      (3L, null, Some(5L)), (4L, "b", Some(7L))).toDF("id", "k", "x"))
    drain()
    assert(presented == full)
    // CDC tier: upsert moves id=4's mass, MoR delete kills group "a"
    val up = GraftTableSink.upsertBatchEq(src, Seq("id"), "cdc")
    up(Seq((4L, "b", Some(100L))).toDF("id", "k", "x"), 0L)
    src.delete(col("k") === "a")
    drain()
    assert(presented == full)
    // dead group hidden by present, held as a zero row in the store
    assert(!presented.exists(_._1 == "a"))
    assert(state.read().filter(col("k") === "a")
      .select("n_rows").as[Long].collect().toSeq == Seq(0L))
    // nothing new: a drain with no commits leaves the state untouched
    val before = state.meta.currentSnapshot.get.snapshotId
    drain()
    assert(state.meta.currentSnapshot.get.snapshotId == before)
  }
}
