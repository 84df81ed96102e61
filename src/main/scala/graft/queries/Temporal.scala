package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.TemporalJoins

/** Temporal join surface over the `events` fixture: backward as-of join
  * (last-touch attribution) and interval/point range join (error-window
  * correlation) — the two join shapes Spark has no native operator for
  * and a naive SQL translation plans as a per-key quadratic join or a
  * BroadcastNestedLoopJoin respectively. The implementations in
  * [[graft.operators.TemporalJoins]] are one-shuffle linear plans; the
  * oracles below spell out the naive SQL, so the correctness gate is
  * exactly "the fast plan equals the obvious plan".
  */
object Temporal {

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  val all: Seq[QueryDef] = Seq(

    // ---- Backward as-of join (last-touch attribution) ------------------
    // For every purchase, the same user's most recent click at-or-before
    // the purchase instant. The union+running-last plan shuffles once on
    // user_id; the oracle's LEFT JOIN + row_number is the quadratic
    // reference semantics.
    QueryDef(
      "q115_asof_attribution",
      (s, d) => {
        val e = ev(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        TemporalJoins.asofJoin(purchases, clicks, Seq("user_id"),
            leftTime = "ts", rightTime = "ts", rightPayload = Seq("event_id"))
          .withColumn("gap_us",
            unix_micros(col("ts")) - unix_micros(col("asof_ts")))
          .select(col("event_id"), col("user_id"), col("ts"),
            round(col("value"), 2).as("value"),
            col("asof_event_id"), col("asof_ts"), col("gap_us"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH p AS (
          SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase'
        ), c AS (
          SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'click'
        ), j AS (
          SELECT p.event_id, p.user_id, p.ts, p.value,
                 c.event_id AS asof_event_id, c.ts AS asof_ts,
                 row_number() OVER (PARTITION BY p.event_id
                   ORDER BY c.ts DESC, c.event_id DESC) AS rn
          FROM p LEFT JOIN c
            ON c.user_id = p.user_id AND c.ts <= p.ts
        )
        SELECT event_id, user_id, ts, round(value, 2) AS value,
               asof_event_id, asof_ts,
               CAST(date_diff('microsecond', asof_ts, ts) AS BIGINT)
                 AS gap_us
        FROM j WHERE rn = 1
        ORDER BY event_id
      """)),

    // ---- Range join (points within an interval, no equi key) -----------
    // Every purchase within +/- 1 hour of every error, across ALL users
    // — deliberately keyless, the shape Spark plans as a nested-loop
    // cross product. The bucketized plan meets each qualifying pair in
    // exactly one 1-hour bucket.
    QueryDef(
      "q116_error_window_join",
      (s, d) => {
        val e = ev(s, d)
        val errors = e.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"), col("ts").as("error_ts"),
            (col("ts") - expr("INTERVAL 1 HOUR")).as("win_start"),
            (col("ts") + expr("INTERVAL 1 HOUR")).as("win_end"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"))
        TemporalJoins.rangeJoinPoints(errors, "win_start", "win_end",
            purchases, "purchase_ts", bucketWidthMicros = 3600L * 1000000L)
          .select(col("error_id"), col("error_ts"), col("purchase_id"),
            col("purchase_ts"),
            (unix_micros(col("purchase_ts")) -
              unix_micros(col("error_ts"))).as("delta_us"))
          .orderBy(col("error_id"), col("purchase_id"))
      },
      Some("""
        SELECT e.event_id AS error_id, e.ts AS error_ts,
               p.event_id AS purchase_id, p.ts AS purchase_ts,
               CAST(date_diff('microsecond', e.ts, p.ts) AS BIGINT)
                 AS delta_us
        FROM events e JOIN events p
          ON e.event_type = 'error' AND p.event_type = 'purchase'
         AND p.ts >= e.ts - INTERVAL 1 HOUR
         AND p.ts <  e.ts + INTERVAL 1 HOUR
        ORDER BY error_id, purchase_id
      """)),

    // ---- Interval x interval overlap join ------------------------------
    // error windows overlapping purchase sessions, keyless: both sides
    // bin to 1-hour buckets and each pair is admitted only in the
    // bucket of max(start, start) — exactly-once without a distinct.
    QueryDef(
      "q125_interval_overlap_join",
      (s, d) => {
        val e = ev(s, d)
        val errors = e.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"),
            (col("ts") - expr("INTERVAL 1 HOUR")).as("ls"),
            (col("ts") + expr("INTERVAL 1 HOUR")).as("le"))
        val sessions = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("ts").as("rs"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("re"))
        TemporalJoins.rangeJoinIntervals(errors, "ls", "le",
            sessions, "rs", "re", bucketWidthMicros = 3600L * 1000000L)
          .select(col("error_id"), col("purchase_id"))
          .orderBy(col("error_id"), col("purchase_id"))
      },
      Some("""
        SELECT e.event_id AS error_id, p.event_id AS purchase_id
        FROM events e JOIN events p
          ON e.event_type = 'error' AND p.event_type = 'purchase'
         AND e.ts - INTERVAL 1 HOUR < p.ts + INTERVAL 30 MINUTE
         AND p.ts < e.ts + INTERVAL 1 HOUR
        ORDER BY error_id, purchase_id
      """)),

    // ---- Batch sessionization ------------------------------------------
    // gap-based sessions per user (4h inactivity threshold), rolled up
    // to per-session bounds/size/value. One exchange + one per-key
    // sort (the open-marker lag and the numbering sum share a window).
    QueryDef(
      "q128_sessionization",
      (s, d) => {
        import graft.operators.Sessions
        Sessions.sessionStats(ev(s, d), "user_id", "ts", "event_id",
            maxGapMicros = 4L * 3600 * 1000000,
            aggs = Seq(round(sum(col("value")), 2).as("total_value")))
          .orderBy(col("user_id"), col("session_seq"))
      },
      Some("""
        WITH o AS (
          SELECT user_id, ts, event_id, value,
                 lag(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev
          FROM events
        ), m AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN prev IS NULL
                        OR date_diff('microsecond', prev, ts)
                           > 14400000000 THEN 1
                      ELSE 0 END AS opens
          FROM o
        ), se AS (
          SELECT user_id, ts, value,
                 CAST(sum(opens) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
          FROM m
        )
        SELECT user_id, session_seq, CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end,
               round(sum(value), 2) AS total_value
        FROM se GROUP BY 1, 2
        ORDER BY user_id, session_seq
      """)),

    // ---- Ordered funnel -------------------------------------------------
    // earliest order-respecting reach times for signup -> view ->
    // click -> purchase per user; one narrow aggregation per step,
    // never a per-key event list. The oracle replays the same staged
    // min-at-or-after construction.
    QueryDef(
      "q129_funnel",
      (s, d) => graft.operators.Sessions.funnel(ev(s, d), "user_id",
          "ts", "event_type",
          Seq("signup", "view", "click", "purchase"))
        .orderBy(col("user_id")),
      Some("""
        WITH s1 AS (
          SELECT user_id, min(ts) AS step_1_ts FROM events
          WHERE event_type = 'signup' GROUP BY 1
        ), s2 AS (
          SELECT e.user_id, min(e.ts) AS step_2_ts
          FROM events e JOIN s1 USING (user_id)
          WHERE e.event_type = 'view' AND e.ts >= s1.step_1_ts GROUP BY 1
        ), s3 AS (
          SELECT e.user_id, min(e.ts) AS step_3_ts
          FROM events e JOIN s2 USING (user_id)
          WHERE e.event_type = 'click' AND e.ts >= s2.step_2_ts GROUP BY 1
        ), s4 AS (
          SELECT e.user_id, min(e.ts) AS step_4_ts
          FROM events e JOIN s3 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts >= s3.step_3_ts
          GROUP BY 1
        )
        SELECT s1.user_id, s1.step_1_ts, s2.step_2_ts, s3.step_3_ts,
               s4.step_4_ts,
               CAST(1 + (CASE WHEN s2.step_2_ts IS NOT NULL THEN 1 ELSE 0 END)
                      + (CASE WHEN s3.step_3_ts IS NOT NULL THEN 1 ELSE 0 END)
                      + (CASE WHEN s4.step_4_ts IS NOT NULL THEN 1 ELSE 0 END)
                 AS INT) AS depth
        FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
                LEFT JOIN s4 USING (user_id)
        ORDER BY user_id
      """)),

    // ---- Rolling event-time aggregates ---------------------------------
    // per-user trailing-hour count and mean over a RANGE frame on the
    // event time — one exchange + per-key sort; RANGE peers make the
    // result independent of tie order on both engines.
    QueryDef(
      "q130_rolling_aggregates",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600L * 1000000, 0)
        ev(s, d).select(col("event_id"), col("user_id"), col("ts"),
            count(lit(1)).over(w).as("n_1h"),
            round(avg(col("value")).over(w), 4).as("avg_1h"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, user_id, ts,
               CAST(count(*) OVER w AS BIGINT) AS n_1h,
               round(avg(value) OVER w, 4) AS avg_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY event_id
      """)),

    // ---- Cohort retention ----------------------------------------------
    // users cohorted by first-activity week; one row per (cohort week,
    // week offset) with the distinct users still active — two
    // map-side-combined aggregations and a per-user join, no event
    // ever carried past its (user, week) projection.
    QueryDef(
      "q131_cohort_retention",
      (s, d) => {
        val e = ev(s, d)
        val cohorts = e.groupBy(col("user_id"))
          .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
        val active = e.select(col("user_id"),
          date_trunc("week", col("ts")).as("week")).distinct()
        active.join(cohorts, "user_id")
          .groupBy(col("cohort_week"),
            (datediff(col("week").cast("date"),
              col("cohort_week").cast("date")) / 7).cast("int")
              .as("week_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""
        WITH cohorts AS (
          SELECT user_id,
                 CAST(date_trunc('week', min(ts)) AS TIMESTAMP)
                   AS cohort_week
          FROM events GROUP BY 1
        ), active AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
          FROM events
        )
        SELECT c.cohort_week,
               CAST(date_diff('day', CAST(c.cohort_week AS DATE),
                 CAST(a.week AS DATE)) / 7 AS INT) AS week_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM active a JOIN cohorts c USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort_week, week_offset
      """)),

    // ---- Time-series gap filling ---------------------------------------
    // dense hourly spine over the observed range (sequence() exploded
    // from ONE aggregate row — the spine is generated, never scanned),
    // left-joined to the hourly counts so silent hours appear as 0 —
    // the sparse->dense densification every reporting layer needs.
    QueryDef(
      "q134_gap_fill",
      (s, d) => {
        val e = ev(s, d).filter(col("event_type") === "error")
        val counts = e.groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"))
        val spine = e.agg(date_trunc("hour", min(col("ts"))).as("lo"),
            date_trunc("hour", max(col("ts"))).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"),
            expr("INTERVAL 1 HOUR"))).as("h"))
        spine.join(counts, Seq("h"), "left")
          .select(col("h"), coalesce(col("n"), lit(0L)).as("n"))
          .orderBy(col("h"))
      },
      Some("""
        WITH e AS (
          SELECT ts FROM events WHERE event_type = 'error'
        ), counts AS (
          SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
                 count(*) AS n
          FROM e GROUP BY 1
        ), spine AS (
          SELECT unnest(generate_series(
            CAST(date_trunc('hour', min(ts)) AS TIMESTAMP),
            CAST(date_trunc('hour', max(ts)) AS TIMESTAMP),
            INTERVAL 1 HOUR)) AS h
          FROM e
        )
        SELECT s.h, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        FROM spine s LEFT JOIN counts c USING (h)
        ORDER BY h
      """)))
}
