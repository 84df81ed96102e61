package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.engine.GraftTable

/** Structured Streaming SINK for graft tables — the writing twin of
  * [[GraftTableStreamSource]], completing the loop the reference
  * approximates with repeated batch INSERTs (Pyspark_Notebook.ipynb
  * cells 11/22/27):
  *
  *   df.writeStream
  *     .foreachBatch(GraftTableSink.appendBatch(table, "events"))
  *     .option("checkpointLocation", ...)
  *     .start()
  *
  * Exactly-once across micro-batch replays: foreachBatch re-delivers
  * the in-flight batch after a checkpoint restart, so each batch
  * commits its rows AND its batch id (as table property
  * `graft.streaming.<name>.batch-id`) in ONE atomic metadata commit
  * ([[GraftTable.appendIfNewMarker]]); a replayed or stale batch id is
  * a no-op. One writer per (table, name) stream — concurrent OTHER
  * writers (batch appends, DML) are absorbed by the optimistic-commit
  * rebase, like any append.
  *
  * Scale design: a micro-batch append touches only its own new files —
  * commit cost is O(batch), independent of table size.
  */
object GraftTableSink {

  /** foreachBatch function appending each micro-batch to `table`,
    * idempotent per `name`'s batch-id watermark.
    */
  def appendBatch(table: GraftTable, name: String): (DataFrame, Long) => Unit = {
    require(name.nonEmpty, "sink name must be non-empty")
    (batch: DataFrame, batchId: Long) => {
      table.appendIfNewMarker(batch, s"graft.streaming.$name.batch-id", batchId)
      ()
    }
  }

  /** foreachBatch function UPSERTING each micro-batch by `keyCols` —
    * streaming CDC apply: batch rows replace same-key table rows
    * (merge-on-read positional deletes + append), the whole apply +
    * batch-id watermark in one atomic commit, replays no-ops. The
    * batch must carry at most one row per key (aggregate upstream —
    * e.g. `latest by timestamp` — before the sink).
    */
  def upsertBatch(table: GraftTable, keyCols: Seq[String],
      name: String): (DataFrame, Long) => Unit = {
    require(name.nonEmpty, "sink name must be non-empty")
    (batch: DataFrame, batchId: Long) => {
      table.upsertIfNewMarker(batch, keyCols,
        s"graft.streaming.$name.batch-id", batchId)
      ()
    }
  }

  /** The EQUALITY-delete upsert variant: commits are O(batch) — no join
    * against existing data at write time (the key match defers to
    * readers; compact periodically to reclaim read cost). Prefer this
    * for high-frequency CDC streams, [[upsertBatch]] when reads
    * dominate between compactions.
    */
  def upsertBatchEq(table: GraftTable, keyCols: Seq[String],
      name: String): (DataFrame, Long) => Unit = {
    require(name.nonEmpty, "sink name must be non-empty")
    (batch: DataFrame, batchId: Long) => {
      table.upsertEqIfNewMarker(batch, keyCols,
        s"graft.streaming.$name.batch-id", batchId)
      ()
    }
  }

  /** Continuously maintained aggregate: a foreachBatch function for a
    * `changes`-mode stream ([[GraftTableStream.readChanges]]) that
    * folds each CDC micro-batch into a grouped count/sum state table
    * via [[graft.operators.IncrementalAgg]] — a materialized GROUP BY
    * view that stays live across the source's appends, deletes,
    * updates, and upserts without ever rescanning the source.
    *
    *   state schema: keys ++ (n_rows, and per sum col c: sum_c, nn_c)
    *   read it with IncrementalAgg.present(state.read(), keys, sums)
    *
    * The initial-load batch (current rows as inserts) bootstraps the
    * state, so a fresh checkpoint against an existing source needs no
    * separate backfill. Per batch: delta over O(batch) rows, a
    * semi-join picking the touched groups out of the O(#groups)
    * state, and one keyed upsert carrying the merged rows + batch-id
    * watermark atomically — replays no-op. Dead groups persist as
    * zero-count rows (an upsert cannot remove a key); `present`
    * hides them, and a periodic compaction can physically drop them.
    */
  def maintainAggBatch(state: GraftTable, keys: Seq[String],
      sums: Seq[String], name: String): (DataFrame, Long) => Unit = {
    require(name.nonEmpty, "sink name must be non-empty")
    import graft.operators.IncrementalAgg
    (changes: DataFrame, batchId: Long) => {
      val d = IncrementalAgg.delta(changes, keys, sums)
      state.upsertIfNewMarker(
        IncrementalAgg.foldDelta(state.read(), d, keys, sums),
        keys, s"graft.streaming.$name.batch-id", batchId)
      ()
    }
  }
}
