package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal join operators Spark lacks natively: backward as-of join and
  * interval/point range join. Both are built from relational primitives
  * the way a distributed engine should, not the way a laptop engine can
  * afford to:
  *
  *   - [[asofJoin]] never materializes the (left x matching-right)
  *     intermediate that the naive `JOIN .. ON r.t <= l.t` +
  *     `row_number` plan does (that join is quadratic per key when
  *     every right row precedes most left rows — exactly the common
  *     case). Instead both sides are interleaved into ONE stream per
  *     key and a running `last(ignoreNulls)` window carries the most
  *     recent right row forward: one shuffle on the key, linear work,
  *     bounded state (a single struct per row).
  *   - [[rangeJoinPoints]] replaces the cross-product that an
  *     inequality-only join plans as (BroadcastNestedLoopJoin — a
  *     scale killer with no equi key) with the classic binning trick:
  *     intervals explode to the fixed-width buckets they overlap,
  *     points hash to exactly one bucket, and the join becomes an
  *     equi-join on the bucket id. Because a point lives in exactly
  *     one bucket, each qualifying (interval, point) pair meets exactly
  *     once — no post-join distinct.
  *
  * At 100 TB: as-of cost is one hash exchange + per-key sort (same
  * shape as any keyed window; skewed keys salt the same way); range
  * join cost is |intervals| * (len/width + 1) exploded rows plus one
  * bucket-keyed exchange — pick `bucketWidth` near the typical
  * interval length so the explode factor stays ~2.
  */
object TemporalJoins {

  /** As-of join: for each left row, attach the nearest right row
    * at-or-before (`direction = "backward"`, the default — DuckDB /
    * pandas ASOF semantics) or at-or-after (`direction = "forward"`)
    * its `leftTime`, within the same `keys` group. Right columns
    * arrive prefixed with `rightPrefix`; unmatched left rows keep
    * NULLs.
    *
    * Determinism: if several right rows share (keys, rightTime), the
    * one with the greatest `rightPayload` struct wins (documented
    * tiebreak, mirrored in oracles as ORDER BY payload DESC).
    *
    * `toleranceMicros`: optional max allowed gap (leftTime - rightTime
    * backward, rightTime - leftTime forward); staler matches are
    * nulled out (the window still carries them — filtering AFTER the
    * window keeps the scan single-pass).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      toleranceMicros: Option[Long] = None,
      rightPrefix: String = "asof_",
      direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "asofJoin requires at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val rCols = rightTime +: rightPayload
    val lrowType = StructType(left.schema.fields)
    // NULL-key right rows are dropped so a NULL never matches a NULL —
    // equi-join semantics, not the window's null-grouping semantics
    // (a window would co-partition NULL keys and happily pair them).
    // NULL-key LEFT rows still come back, unmatched — left-join shape.
    val rightKeyed = keys.foldLeft(right)((d, k) => d.filter(col(k).isNotNull))
    val rp = rightKeyed.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        struct(rCols.map(col): _*).as("__rpay")): _*)
    val rpayType = rp.schema("__rpay").dataType
    val lp = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(rpayType).as("__rpay"),
        struct(left.columns.map(col): _*).as("__lrow")): _*)
    val mixed = rp.withColumn("__lrow", lit(null).cast(lrowType))
      .unionByName(lp)
    // Right rows (side 0) sort before left rows (side 1) at equal
    // timestamps, so an exactly-simultaneous right row is visible to
    // the left row — the inclusive contract in both directions. Among
    // equal-time right rows the payload struct orders them (last()
    // picks the greatest); left rows' null payload is irrelevant
    // because __side already separates the sides. Forward is the same
    // single-pass running-last, just over time DESCENDING: the nearest
    // right at-or-after is the last right seen walking down from +inf.
    val tOrd = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tOrd, col("__side").asc, col("__rpay").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = mixed
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val gap =
      if (direction == "backward")
        unix_micros(col("__t")) - unix_micros(col("__match")(rightTime))
      else
        unix_micros(col("__match")(rightTime)) - unix_micros(col("__t"))
    val gated = toleranceMicros match {
      case Some(tol) => carried.withColumn("__match",
        when(gap <= tol, col("__match")))
      case None => carried
    }
    gated.select(
      col("__lrow.*") +:
        rCols.map(c => col("__match")(c).as(rightPrefix + c)): _*)
  }

  /** Interval x point range join: every (interval, point) pair with
    * `start <= point < end` (half-open), optionally also matching on
    * equality `keys`. Output columns are the interval's then the
    * point's — callers project to disjoint names first.
    *
    * `bucketWidthMicros` is the binning granule: each interval joins
    * through ceil(len/width)+1 bucket rows, each point through exactly
    * one. No distinct pass is needed (a point's bucket is unique).
    */
  def rangeJoinPoints(intervals: DataFrame, startCol: String,
      endCol: String, points: DataFrame, pointCol: String,
      bucketWidthMicros: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidthMicros > 0, "bucketWidthMicros must be positive")
    val w = lit(bucketWidthMicros)
    // half-open [start, end): the last covered bucket holds end - 1us;
    // empty/inverted intervals produce an empty sequence via the guard
    val iv = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("__bkt", explode(sequence(
        floor(unix_micros(col(startCol)) / w),
        floor((unix_micros(col(endCol)) - 1) / w))))
    val pt = points.withColumn("__bkt",
      floor(unix_micros(col(pointCol)) / w))
    iv.join(pt, Seq("__bkt") ++ keys)
      .filter(col(pointCol) >= col(startCol) &&
        col(pointCol) < col(endCol))
      .drop("__bkt")
  }

  /** Interval x interval overlap join: every (left, right) pair of
    * half-open intervals with `lStart < rEnd AND rStart < lEnd`,
    * optionally also matching on equality `keys`. Same binning as
    * [[rangeJoinPoints]], but BOTH sides explode — so a pair can share
    * many buckets. Instead of a post-join distinct (a full shuffle of
    * the output), each pair is counted only in its OWNER bucket, the
    * one holding max(lStart, rStart): exactly one bucket qualifies per
    * pair (the later interval's first bucket is always a shared bucket
    * of an overlapping pair), so the join emits each pair exactly once
    * by construction.
    */
  def rangeJoinIntervals(left: DataFrame, lStartCol: String,
      lEndCol: String, right: DataFrame, rStartCol: String,
      rEndCol: String, bucketWidthMicros: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidthMicros > 0, "bucketWidthMicros must be positive")
    val w = lit(bucketWidthMicros)
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(s) < col(e))
        .withColumn("__bkt", explode(sequence(
          floor(unix_micros(col(s)) / w),
          floor((unix_micros(col(e)) - 1) / w))))
    val l = binned(left, lStartCol, lEndCol)
    val r = binned(right, rStartCol, rEndCol)
    l.join(r, Seq("__bkt") ++ keys)
      .filter(col(lStartCol) < col(rEndCol) &&
        col(rStartCol) < col(lEndCol) &&
        col("__bkt") === floor(
          greatest(unix_micros(col(lStartCol)),
            unix_micros(col(rStartCol))) / w))
      .drop("__bkt")
  }
}
