package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

/** TemporalJoins semantics + plan shape.
  *
  * Correctness is pinned twice: hand fixtures for the edge semantics
  * (inclusive <=, half-open [start,end), tie-break, tolerance, unmatched
  * rows) and a differential against the naive quadratic plan on the real
  * events fixture (the same SQL the DuckDB oracle runs). Plan pins hold
  * the reason these operators exist: the as-of join must compile to a
  * window over ONE exchange with NO join node, and the range join must
  * never fall into BroadcastNestedLoopJoin/CartesianProduct.
  */
class TemporalJoinsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", Some(4))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def asofFixture(): (DataFrame, DataFrame) = {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // matches r2 (exact tie at 10:00)
      (2L, "u1", ts("2024-01-01 09:30:00")), // matches r1
      (3L, "u1", ts("2024-01-01 08:00:00")), // before all rights -> null
      (4L, "u2", ts("2024-01-01 12:00:00")), // other key -> r4
      (5L, "u3", ts("2024-01-01 12:00:00"))  // key with no rights -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, "u1", ts("2024-01-01 09:00:00")),
      (102L, "u1", ts("2024-01-01 10:00:00")),
      (103L, "u1", ts("2024-01-01 10:00:00")), // same instant as 102: greater payload wins
      (104L, "u2", ts("2024-01-01 11:00:00"))
    ).toDF("rid", "user_id", "rts")
    (left, right)
  }

  test("asofJoin: inclusive match, per-key isolation, null when unmatched") {
    val (left, right) = asofFixture()
    val out = TemporalJoins.asofJoin(left, right, Seq("user_id"),
        "ts", "rts", Seq("rid"))
      .select("event_id", "asof_rid").orderBy("event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq === Seq(
      (1L, 103L), // equal-instant right visible; tie -> greatest (rts, rid)
      (2L, 101L),
      (3L, -1L),  // nothing at-or-before
      (4L, 104L),
      (5L, -1L))) // key never seen on the right
  }

  test("asofJoin: tolerance nulls out stale matches only") {
    val (left, right) = asofFixture()
    val out = TemporalJoins.asofJoin(left, right, Seq("user_id"),
        "ts", "rts", Seq("rid"),
        toleranceMicros = Some(45L * 60 * 1000000)) // 45 minutes
      .select("event_id", "asof_rid").orderBy("event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // event 2 is 30min after r1 (fresh); event 4 is 60min after r4 (stale)
    assert(out.toSeq === Seq(
      (1L, 103L), (2L, 101L), (3L, -1L), (4L, -1L), (5L, -1L)))
  }

  test("asofJoin: NULL keys never match (equi-join semantics), " +
      "null-key left rows survive unmatched") {
    import spark.implicits._
    val left = Seq((1L, Option("u1"), ts("2024-01-01 10:00:00")),
      (2L, None: Option[String], ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((101L, Option("u1"), ts("2024-01-01 09:00:00")),
      (102L, None: Option[String], ts("2024-01-01 09:00:00")))
      .toDF("rid", "user_id", "rts")
    val out = TemporalJoins.asofJoin(left, right, Seq("user_id"),
        "ts", "rts", Seq("rid"))
      .select("event_id", "asof_rid").orderBy("event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq === Seq((1L, 101L), (2L, -1L)),
      "a NULL key must not pair with a NULL-key right row")
  }

  test("asofJoin forward: nearest at-or-after, tolerance, tie to " +
      "greatest payload") {
    val (left, right) = asofFixture()
    val out = TemporalJoins.asofJoin(left, right, Seq("user_id"),
        "ts", "rts", Seq("rid"), direction = "forward")
      .select("event_id", "asof_rid").orderBy("event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq === Seq(
      (1L, 103L), // equal instant inclusive; tie -> greatest payload
      (2L, 103L), // next right after 09:30 is the 10:00 pair
      (3L, 101L), // first right at-or-after 08:00
      (4L, -1L),  // u2 has nothing at-or-after 12:00
      (5L, -1L)))
    val tol = TemporalJoins.asofJoin(left, right, Seq("user_id"),
        "ts", "rts", Seq("rid"), direction = "forward",
        toleranceMicros = Some(45L * 60 * 1000000))
      .select("event_id", "asof_rid").orderBy("event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // event 2 -> 10:00 is 30min ahead (fresh); event 3 -> 09:00 is
    // 60min ahead (stale, nulled)
    assert(tol.toSeq === Seq(
      (1L, 103L), (2L, 103L), (3L, -1L), (4L, -1L), (5L, -1L)))
  }

  test("asofJoin forward matches the naive join+row_number on real events") {
    val e = Tables.events(spark, sf)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val fast = TemporalJoins.asofJoin(purchases, clicks, Seq("user_id"),
        "ts", "ts", Seq("event_id"), direction = "forward")
      .select(col("event_id"), col("asof_event_id"))
    val naive = purchases.as("p").join(clicks.as("c"),
        col("c.user_id") === col("p.user_id") && col("c.ts") >= col("p.ts"),
        "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p.event_id"))
          .orderBy(col("c.ts").asc_nulls_last, col("c.event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("p.event_id").as("event_id"),
        col("c.event_id").as("asof_event_id"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("asofJoin matches the naive join+row_number plan on real events") {
    val e = Tables.events(spark, sf)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val fast = TemporalJoins.asofJoin(purchases, clicks, Seq("user_id"),
        "ts", "ts", Seq("event_id"))
      .select(col("event_id"), col("asof_event_id"))
    val naive = purchases.as("p").join(clicks.as("c"),
        col("c.user_id") === col("p.user_id") && col("c.ts") <= col("p.ts"),
        "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p.event_id"))
          .orderBy(col("c.ts").desc, col("c.event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("p.event_id").as("event_id"),
        col("c.event_id").as("asof_event_id"))
    assert(fast.count() === purchases.count(), "left-join semantics: one row per left")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("asofJoin plan: a window over one exchange, no join operator") {
    val (left, right) = asofFixture()
    val p = plan(TemporalJoins.asofJoin(left, right, Seq("user_id"),
      "ts", "rts", Seq("rid")))
    assert(p.contains("Window"), s"expected a window plan:\n$p")
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1, s"expected exactly one exchange:\n$p")
  }

  test("rangeJoinPoints: half-open bounds, keyed variant, inverted dropped") {
    import spark.implicits._
    val iv = Seq(
      (10L, "k1", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (11L, "k2", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (12L, "k1", ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00")) // empty
    ).toDF("iid", "k", "s", "e")
    val pt = Seq(
      (20L, "k1", ts("2024-01-01 10:00:00")), // == start: included
      (21L, "k1", ts("2024-01-01 11:00:00")), // == end: excluded
      (22L, "k1", ts("2024-01-01 10:59:59")),
      (23L, "k2", ts("2024-01-01 10:30:00")),
      (24L, "k1", ts("2024-01-01 12:00:00"))  // empty interval can't match
    ).toDF("pid", "k", "pts")
    val keyed = TemporalJoins.rangeJoinPoints(iv, "s", "e", pt, "pts",
        bucketWidthMicros = 15L * 60 * 1000000, keys = Seq("k"))
      .select("iid", "pid").orderBy("iid", "pid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(keyed.toSeq === Seq((10L, 20L), (10L, 22L), (11L, 23L)))
    // keyless: same intervals match points of any key
    val keyless = TemporalJoins.rangeJoinPoints(
        iv.drop("k"), "s", "e", pt.drop("k"), "pts",
        bucketWidthMicros = 15L * 60 * 1000000)
      .select("iid", "pid").orderBy("iid", "pid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(keyless.toSeq === Seq(
      (10L, 20L), (10L, 22L), (10L, 23L), (11L, 20L), (11L, 22L), (11L, 23L)))
  }

  test("rangeJoinPoints matches the naive inequality join; no pair dupes") {
    val e = Tables.events(spark, sf)
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("s"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("e"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("pts"))
    val fast = TemporalJoins.rangeJoinPoints(errors, "s", "e",
        purchases, "pts", bucketWidthMicros = 3600L * 1000000)
      .select("error_id", "purchase_id")
    val naive = errors.join(purchases,
        col("pts") >= col("s") && col("pts") < col("e"))
      .select("error_id", "purchase_id")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    assert(fast.count() === fast.distinct().count(),
      "binning must meet each pair exactly once")
  }

  test("rangeJoinIntervals: half-open overlap, touching excluded, " +
      "owner-bucket dedup, keys respected") {
    import spark.implicits._
    val l = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, "k1", ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")),
      (3L, "k2", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("lid", "k", "ls", "le")
    val r = Seq(
      (10L, "k1", ts("2024-01-01 10:30:00"), ts("2024-01-01 13:00:00")), // spans many buckets
      (11L, "k1", ts("2024-01-01 09:00:00"), ts("2024-01-01 10:00:00")), // touches 1: excluded
      (12L, "k2", ts("2024-01-01 10:59:59"), ts("2024-01-01 11:00:01"))
    ).toDF("rid", "k", "rs", "re")
    val got = TemporalJoins.rangeJoinIntervals(l, "ls", "le", r, "rs", "re",
        bucketWidthMicros = 15L * 60 * 1000000, keys = Seq("k"))
      .select("lid", "rid").orderBy("lid", "rid")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    // pair (1,10) and (2,10) share MANY 15-min buckets — exactly once each
    assert(got.toSeq === Seq((1L, 10L), (2L, 10L), (3L, 12L)))
  }

  test("rangeJoinIntervals matches the naive overlap join; no dupes") {
    val e = Tables.events(spark, sf)
    val l = e.filter(col("event_type") === "error")
      .select(col("event_id").as("lid"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("ls"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("le"))
    val r = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("rid"), col("ts").as("rs"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("re"))
    val fast = TemporalJoins.rangeJoinIntervals(l, "ls", "le", r, "rs",
        "re", bucketWidthMicros = 3600L * 1000000)
      .select("lid", "rid")
    val naive = l.join(r, col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    assert(fast.count() === fast.distinct().count(),
      "owner-bucket rule must emit each pair exactly once")
  }

  test("Sessions.sessionize: strict-gap opens, per-key numbering, " +
      "one exchange") {
    import spark.implicits._
    import graft.operators.Sessions
    val ev = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:30:00")), // gap == 30m: SAME session
      (3L, "u1", ts("2024-01-01 11:00:01")), // gap 30m+1s: new session
      (4L, "u2", ts("2024-01-01 10:00:00"))  // keys are independent
    ).toDF("event_id", "user_id", "ts")
    val got = Sessions.sessionize(ev, "user_id", "ts", "event_id",
        maxGapMicros = 30L * 60 * 1000000)
      .select("event_id", "session_seq").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 1L)))
    val p = Sessions.sessionize(ev, "user_id", "ts", "event_id", 1L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"both windows must share one exchange:\n$p")
    // stats roll up consistently
    val stats = Sessions.sessionStats(ev, "user_id", "ts", "event_id",
      30L * 60 * 1000000)
    assert(stats.agg(sum("n_events")).head.getLong(0) === 4L)
    assert(stats.count() === 3L)
  }

  test("Sessions.funnel: order respected, breaks stay NULL, " +
      "simultaneous steps allowed") {
    import spark.implicits._
    import graft.operators.Sessions
    val ev = Seq(
      // u1 completes in order; the early 'b' before 'a' must be ignored
      (1L, "u1", "b", ts("2024-01-01 09:00:00")),
      (2L, "u1", "a", ts("2024-01-01 10:00:00")),
      (3L, "u1", "b", ts("2024-01-01 11:00:00")),
      (4L, "u1", "c", ts("2024-01-01 12:00:00")),
      // u2 breaks at step b (its only b precedes a)
      (5L, "u2", "b", ts("2024-01-01 09:00:00")),
      (6L, "u2", "a", ts("2024-01-01 10:00:00")),
      (7L, "u2", "c", ts("2024-01-01 11:00:00")),
      // u3: a and b simultaneous — inclusive >= lets b count
      (8L, "u3", "a", ts("2024-01-01 10:00:00")),
      (9L, "u3", "b", ts("2024-01-01 10:00:00")),
      // u4 never does step a: absent from the output entirely
      (10L, "u4", "b", ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Sessions.funnel(ev, "user_id", "ts", "event_type",
        Seq("a", "b", "c"))
      .select("user_id", "depth").orderBy("user_id")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(got.toSeq === Seq(("u1", 3), ("u2", 1), ("u3", 2)))
  }

  test("rangeJoinPoints plan: an equi join, never a nested-loop product") {
    val e = Tables.events(spark, sf)
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("s"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("e"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("pts"))
    val p = plan(TemporalJoins.rangeJoinPoints(errors, "s", "e",
      purchases, "pts", bucketWidthMicros = 3600L * 1000000))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"range join must stay an equi join on the bucket id:\n$p")
  }
}
