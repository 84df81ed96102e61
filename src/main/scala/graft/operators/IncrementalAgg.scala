package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (incremental view maintenance) for
  * grouped count/sum aggregates over a versioned table's changelog:
  * keep `SELECT k, count(*), sum(x) ... GROUP BY k` up to date by
  * folding in only the rows that CHANGED between two snapshots.
  *
  * At 100 TB this is the difference between re-scanning the table per
  * refresh and touching O(changed rows) + O(#groups): [[delta]] reads
  * the manifest-diff changelog (a pure append reads just the new
  * files), and [[merge]] joins the delta against the aggregate STATE —
  * the state is #groups rows, unrelated to table size.
  *
  * Only invertible aggregates qualify: count and sum have exact
  * inverses under deletes (+1/-1, +x/-x), so any interleaving of
  * appends, CoW/MoR DELETE/UPDATE, and MERGE maintains exactly.
  * min/max are deliberately absent — a delete of the current min
  * forces a rescan of the group, which is no longer incremental.
  *
  * SQL null semantics are preserved by carrying, per summed column, a
  * non-null count alongside the running sum: `sum(x)` over a group
  * whose every live x is NULL must present as NULL, which the running
  * sum alone cannot distinguish from a true zero. Group keys may be
  * NULL (SQL groups them); [[merge]] joins null-safely so the NULL
  * group folds like any other. A group whose live count reaches zero
  * leaves the state entirely — exactly the row GROUP BY would no
  * longer emit.
  *
  * State schema: keys ++ (`n_rows`, and per summed column `c`:
  * `sum_c`, `nn_c`). [[present]] projects the user-facing view.
  */
object IncrementalAgg {

  private def sign = when(
    col("_change_type").isin("insert", "update_postimage"), 1L)
    .otherwise(-1L)

  /** Net aggregate change from a changelog slice
    * ([[graft.engine.GraftTable.changelog]] output: `_change_type` +
    * data columns; update pre/post images are just their delete/insert
    * signs). One partial-aggregated groupBy over O(changed rows).
    */
  def delta(changes: DataFrame, keys: Seq[String],
      sums: Seq[String]): DataFrame = {
    val aggs =
      sum(sign).as("n_rows") +:
        sums.flatMap(c => Seq(
          sum(when(col(c).isNotNull, sign * col(c))).as(s"sum_$c"),
          sum(when(col(c).isNotNull, sign)).as(s"nn_$c")))
    changes.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a [[delta]] into the aggregate state: null-safe full-outer
    * merge on the group keys, component-wise addition, dead groups
    * (live count 0) dropped. Shuffles only state ∪ delta — O(#groups +
    * changed groups) rows, never the base table.
    */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String],
      sums: Seq[String]): DataFrame =
    merge(state, delta, keys, sums, dropDead = true)

  /** `dropDead = false` keeps zero-count groups as explicit rows — the
    * shape a KEYED-UPSERT state store needs (an upsert can replace a
    * group's row but not remove it; [[present]] filters the zeros).
    */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String],
      sums: Seq[String], dropDead: Boolean): DataFrame = {
    val s = state.alias("s"); val d = delta.alias("d")
    val on = keys.map(k => col(s"s.$k") <=> col(s"d.$k")).reduce(_ && _)
    val keyCols = keys.map(k =>
      // either side may be absent for a group; the null-safe join key
      // means a present side's value (possibly NULL) is authoritative
      when(col("d.n_rows").isNotNull, col(s"d.$k"))
        .otherwise(col(s"s.$k")).as(k))
    def add(c: String) =
      (coalesce(col(s"s.$c"), lit(0L)) + coalesce(col(s"d.$c"), lit(0L))).as(c)
    val valCols = add("n_rows") +:
      sums.flatMap(c => Seq(add(s"sum_$c"), add(s"nn_$c")))
    val merged = s.join(d, on, "full_outer")
      .select((keyCols ++ valCols): _*)
    if (dropDead) merged.filter(col("n_rows") > 0) else merged
  }

  /** Rows a keyed-upsert state store must write to absorb `d`: the
    * touched slice of the stored state (null-safe semi-join against
    * the delta's keys — O(changed groups) out of O(#groups)) merged
    * with the delta, dead groups kept as zero rows (an upsert cannot
    * remove a key; [[present]] hides them). Shared by the streaming
    * sink and [[refresh]].
    */
  def foldDelta(stateDf: DataFrame, d: DataFrame,
      keys: Seq[String], sums: Seq[String]): DataFrame = {
    val touched = stateDf.join(broadcast(d.select(keys.map(col): _*)),
      keys.map(k => stateDf(s"`$k`") <=> d(s"`$k`")).reduce(_ && _),
      "left_semi")
    merge(touched, d, keys, sums, dropDead = false)
  }

  /** REFRESH MATERIALIZED VIEW, one call: fold the base table's
    * changelog SINCE THE LAST REFRESH into a maintained-aggregate
    * state table. The last-applied base snapshot rides on the state
    * table itself (`graft.agg.<name>.from-snapshot`), committed
    * atomically with the fold through the upsert's marker machinery —
    * a crashed/replayed refresh can never double-apply, and a
    * concurrent refresher returns false whether it loses the marker
    * race (saw the winner's marker first) or the commit race (its
    * upsert hit the winner's snapshot mid-flight — the engine's
    * concurrent-commit conflict, caught here and surfaced as the same
    * retryable false). First call bootstraps from the full changelog
    * (creation → now).
    *
    * O(changed rows) + O(touched groups) per call; the base table is
    * never rescanned after bootstrap. If the recorded from-snapshot
    * was expired/rolled back on the base, the changelog fails loudly —
    * clear the state table and re-bootstrap.
    *
    * Returns true when a fold was applied, false when already current
    * (or the base has no snapshot yet).
    */
  def refresh(base: graft.engine.GraftTable, state: graft.engine.GraftTable,
      keys: Seq[String], sums: Seq[String],
      name: String = "default"): Boolean = {
    val markerKey = s"graft.agg.$name.refresh"
    val fromKey = s"graft.agg.$name.from-snapshot"
    val sm = state.meta
    val target = base.meta.currentSnapshot.map(_.snapshotId) match {
      case None => return false
      case Some(t) => t
    }
    val from = sm.properties.get(fromKey).map(_.toLong)
    if (from.contains(target)) return false
    // snapshot ids are random — the monotonic marker is a refresh
    // counter; the applied snapshot rides as an extra property of the
    // SAME atomic commit
    val next = sm.properties.get(markerKey).map(_.toLong + 1).getOrElse(0L)
    val d = delta(base.changelog(from, target), keys, sums)
    try state.upsertIfNewMarker(foldDelta(state.read(), d, keys, sums),
      keys, markerKey, next, Map(fromKey -> target.toString))
    catch {
      // a commit landing on the state table between state.read() and
      // the upsert's commit is the engine's concurrent-commit conflict
      // — for a refresher that just means "someone else moved the
      // state, re-run": same retryable false as losing the marker race
      case _: graft.engine.ConcurrentCommitException => false
    }
  }

  /** Bootstrap state by a one-time full aggregation of the base (the
    * only O(table) step; every refresh after is [[delta]]+[[merge]]).
    */
  def initial(base: DataFrame, keys: Seq[String],
      sums: Seq[String]): DataFrame =
    delta(base.withColumn("_change_type", lit("insert")), keys, sums)

  // -------- MIN/MAX maintenance with rescan-on-invalidation ---------
  //
  // min/max are NOT invertible under deletes — removing the row that
  // holds a group's extreme says nothing about the runner-up — which
  // is why delta/merge above exclude them. The *WithExtremes family
  // maintains them anyway, with the only sound incremental contract:
  //   - inserts fold as least/greatest in O(changed rows), exactly
  //     like count/sum — the append-dominated flow never rescans;
  //   - a batch whose DELETES touch a group's recorded extreme
  //     (deleted value <= stored min or >= stored max) INVALIDATES
  //     that group, and only invalidated groups re-aggregate from the
  //     post-change base, restricted by a broadcast semi-join on the
  //     flagged keys.
  // At 100 TB the rescan term is zero for pure appends and bounded by
  // the invalidated groups' slice otherwise (with key-clustered files,
  // manifest bounds prune the rescan to those groups' files). NULLs
  // never participate (SQL min/max semantics): an all-NULL group keeps
  // NULL extremes, and deleting a NULL row invalidates nothing.

  /** [[delta]] plus per-extreme-column fold inputs: inserted-side
    * least/greatest and deleted-side least/greatest per group, from
    * one partial-aggregated pass over the changelog slice.
    */
  def deltaWithExtremes(changes: DataFrame, keys: Seq[String],
      sums: Seq[String], exts: Seq[String]): DataFrame = {
    val ins = col("_change_type").isin("insert", "update_postimage")
    val aggs =
      sum(sign).as("n_rows") +:
        (sums.flatMap(c => Seq(
          sum(when(col(c).isNotNull, sign * col(c))).as(s"sum_$c"),
          sum(when(col(c).isNotNull, sign)).as(s"nn_$c"))) ++
        exts.flatMap(c => Seq(
          min(when(ins, col(c))).as(s"ins_min_$c"),
          max(when(ins, col(c))).as(s"ins_max_$c"),
          min(when(!ins, col(c))).as(s"del_min_$c"),
          max(when(!ins, col(c))).as(s"del_max_$c"))))
    changes.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a [[deltaWithExtremes]] into combined state (keys, n_rows,
    * sum/nn per summed column, min/max per extreme column). `base` is
    * the POST-change base table read, consulted only for invalidated
    * groups. Dead groups (live count 0) leave the state.
    */
  def mergeWithExtremes(state: DataFrame, delta: DataFrame,
      keys: Seq[String], sums: Seq[String], exts: Seq[String],
      base: DataFrame): DataFrame =
    mergeWithExtremes(state, delta, keys, sums, exts, base, dropDead = true)

  /** `dropDead = false` keeps zero-count groups as explicit rows (the
    * keyed-upsert state-store shape, like [[merge]]'s twin) — with
    * their extremes NULLED: min/max are not invertible, so a revived
    * group folding `least(stale_min, …)` would resurrect a deleted
    * extreme. A dead group's extremes are simply gone.
    */
  def mergeWithExtremes(state: DataFrame, delta: DataFrame,
      keys: Seq[String], sums: Seq[String], exts: Seq[String],
      base: DataFrame, dropDead: Boolean): DataFrame = {
    val s = state.alias("s"); val d = delta.alias("d")
    val on = keys.map(k => col(s"s.$k") <=> col(s"d.$k")).reduce(_ && _)
    val keyCols = keys.map(k =>
      when(col("d.n_rows").isNotNull, col(s"d.$k"))
        .otherwise(col(s"s.$k")).as(k))
    def add(c: String) =
      (coalesce(col(s"s.$c"), lit(0L)) + coalesce(col(s"d.$c"), lit(0L))).as(c)
    val valCols = add("n_rows") +:
      sums.flatMap(c => Seq(add(s"sum_$c"), add(s"nn_$c")))
    // tentative extremes fold the INSERT side only; the delete side
    // sets the per-group invalidation flag instead
    val extCols = exts.flatMap(c => Seq(
      least(col(s"s.min_$c"), col(s"d.ins_min_$c")).as(s"min_$c"),
      greatest(col(s"s.max_$c"), col(s"d.ins_max_$c")).as(s"max_$c")))
    val invalid = exts.map(c =>
      (col(s"s.min_$c").isNotNull && col(s"d.del_min_$c").isNotNull &&
        col(s"d.del_min_$c") <= col(s"s.min_$c")) ||
      (col(s"s.max_$c").isNotNull && col(s"d.del_max_$c").isNotNull &&
        col(s"d.del_max_$c") >= col(s"s.max_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val merged0 = s.join(d, on, "full_outer")
      .select((keyCols ++ valCols ++ extCols :+ invalid.as("__invalid")): _*)
    val merged = if (dropDead) merged0.filter(col("n_rows") > 0) else merged0
    // per-group rescan, only where a delete touched a recorded extreme
    // AND the group is still alive (a dead group has no base rows):
    // semi-join the post-change base on the flagged keys (broadcast —
    // invalidations are a slice of the batch's groups)
    val flagged = merged0.filter(col("__invalid") && col("n_rows") > 0)
      .select(keys.map(col): _*).alias("f")
    val bOn = keys.map(k => col(s"b.$k") <=> col(s"f.$k")).reduce(_ && _)
    val rAggs = exts.flatMap(c => Seq(
      min(col(c)).as(s"rmin_$c"), max(col(c)).as(s"rmax_$c")))
    val rescanned = base.alias("b")
      .join(broadcast(flagged), bOn, "left_semi")
      .groupBy(keys.map(col): _*)
      .agg(rAggs.head, rAggs.tail: _*)
      .alias("r")
    val m2 = merged.alias("m")
    val rOn = keys.map(k => col(s"m.$k") <=> col(s"r.$k")).reduce(_ && _)
    def pick(c: String, r: String) =
      when(col("m.n_rows") <= 0, lit(null))
        .when(col("m.__invalid"), col(s"r.$r"))
        .otherwise(col(s"m.$c"))
    val out = m2.join(rescanned, rOn, "left_outer")
      .select((keys.map(k => col(s"m.$k").as(k)) ++
        (col("m.n_rows").as("n_rows") +:
          sums.flatMap(c => Seq(col(s"m.sum_$c").as(s"sum_$c"),
            col(s"m.nn_$c").as(s"nn_$c")))) ++
        exts.flatMap(c => Seq(
          pick(s"min_$c", s"rmin_$c").as(s"min_$c"),
          pick(s"max_$c", s"rmax_$c").as(s"max_$c")))): _*)
    out
  }

  /** REFRESH for the combined state (count/sum + extremes): the same
    * marker machinery as [[refresh]], with the rescan basis pinned to
    * the SAME base snapshot the changelog slice ends at
    * (`readAsOfVersion(target)`), so an invalidated group's re-read
    * can never see commits the fold hasn't applied. This one-call
    * form is deliberately the only extremes-maintenance seat — a
    * foreachBatch sink can't pin its rescan to the micro-batch's
    * snapshot boundary (the CDC batch carries no snapshot id), and an
    * unpinned rescan tears extremes ahead of counts mid-stream.
    */
  def refreshWithExtremes(base: graft.engine.GraftTable,
      state: graft.engine.GraftTable, keys: Seq[String],
      sums: Seq[String], exts: Seq[String],
      name: String = "default"): Boolean = {
    val markerKey = s"graft.agg.$name.refresh"
    val fromKey = s"graft.agg.$name.from-snapshot"
    val sm = state.meta
    val target = base.meta.currentSnapshot.map(_.snapshotId) match {
      case None => return false
      case Some(t) => t
    }
    val from = sm.properties.get(fromKey).map(_.toLong)
    if (from.contains(target)) return false
    val next = sm.properties.get(markerKey).map(_.toLong + 1).getOrElse(0L)
    val d = deltaWithExtremes(base.changelog(from, target), keys, sums, exts)
    val stateDf = state.read()
    val touched = stateDf.join(broadcast(d.select(keys.map(col): _*)),
      keys.map(k => stateDf(s"`$k`") <=> d(s"`$k`")).reduce(_ && _),
      "left_semi")
    val folded = mergeWithExtremes(touched, d, keys, sums, exts,
      base.readAsOfVersion(target), dropDead = false)
    try state.upsertIfNewMarker(folded, keys, markerKey, next,
      Map(fromKey -> target.toString))
    catch {
      case _: graft.engine.ConcurrentCommitException => false
    }
  }

  /** Bootstrap the combined state (count/sum + extremes) by one full
    * aggregation of the base.
    */
  def initialWithExtremes(base: DataFrame, keys: Seq[String],
      sums: Seq[String], exts: Seq[String]): DataFrame =
    deltaWithExtremes(base.withColumn("_change_type", lit("insert")),
      keys, sums, exts)
      .select((keys.map(col) :+ col("n_rows")) ++
        (sums.flatMap(c => Seq(col(s"sum_$c"), col(s"nn_$c"))) ++
        exts.flatMap(c => Seq(col(s"ins_min_$c").as(s"min_$c"),
          col(s"ins_max_$c").as(s"max_$c")))): _*)

  /** User-facing view of the combined state: [[present]]'s columns
    * plus min/max per extreme column (already NULL-correct — an
    * all-NULL group carries NULL extremes).
    */
  def presentWithExtremes(state: DataFrame, keys: Seq[String],
      sums: Seq[String], exts: Seq[String]): DataFrame =
    state.filter(col("n_rows") > 0)
      .select((keys.map(col) :+ col("n_rows")) ++
        (sums.map(c =>
          when(col(s"nn_$c") > 0, col(s"sum_$c")).as(s"sum_$c")) ++
        exts.flatMap(c => Seq(col(s"min_$c"), col(s"max_$c")))): _*)

  /** User-facing view of the state: count plus SQL-semantics sums
    * (NULL when no live non-null value remains in the group); zero-count
    * rows a keyed-upsert store keeps (`dropDead = false`) are hidden —
    * GROUP BY would not emit them.
    */
  def present(state: DataFrame, keys: Seq[String],
      sums: Seq[String]): DataFrame =
    state.filter(col("n_rows") > 0)
      .select((keys.map(col) :+ col("n_rows")) ++
        sums.map(c =>
          when(col(s"nn_$c") > 0, col(s"sum_$c")).as(s"sum_$c")): _*)
}
