package graft.catalog

import org.apache.spark.sql.SparkSession
import graft.tableformat.{MetadataIO, TableMetadata}

/** SQL-surface transactions: `BEGIN TRANSACTION; <DML...>; COMMIT` —
  * the multi-statement seam over [[GraftCatalog.transactOps]], so the
  * two-table publish a warehouse user writes as plain SQL commits
  * through ONE atomic catalog CAS:
  *
  *   BEGIN TRANSACTION;
  *   INSERT INTO graft.db.corpus SELECT ...;
  *   INSERT INTO graft.db.fp_index SELECT ...;
  *   COMMIT;
  *
  * While a transaction is open on the session, graft INSERT / DELETE /
  * UPDATE commands STAGE their work here (data files written
  * immediately — invisible until referenced, the same order every
  * commit uses) instead of committing; COMMIT publishes every staged
  * op in one claim set with one shared commit timestamp, ROLLBACK
  * discards (the staged files become GC-able orphans). Catalog-
  * arbitrated backends only — COMMIT on a bare store refuses loudly,
  * like every multi-document transaction.
  *
  * Scope, stated plainly: DML only (INSERT INTO, DELETE, UPDATE,
  * MERGE — staged rewrites abort on a racing commit,
  * [[graft.engine.GraftTable.stageDelete]]'s contract). A table may
  * appear in SEVERAL statements: each statement past the first plans
  * against the transaction's PREVIEW of that table (the prior staged
  * transforms applied in order) and the statements compose into ONE
  * claim-set slot at COMMIT. DDL / CTAS / TRUNCATE / INSERT OVERWRITE
  * inside an open transaction refuse loudly rather than silently
  * committing outside it. Reads inside the transaction are
  * READ-YOUR-OWN-WRITES: a SELECT of a staged table resolves against
  * the preview metadata ([[previewFor]], wired through the relation
  * swap in [[ResolveGraftRelations]]), so sequential SQL semantics
  * hold; metadata tables (history/snapshots/refs) keep showing
  * committed state — staged work is not a snapshot yet.
  */
object GraftSqlTransactions {

  private final case class Staged(location: String, statement: String,
      f: (TableMetadata, Long) => TableMetadata)

  /** Per-session transaction state. ALL mutation happens inside
    * `state.synchronized` — Spark sessions are routinely shared across
    * threads, and two threads staging into one open transaction must
    * both land (or refuse cleanly), never corrupt the list. `closed`
    * marks the COMMIT/ROLLBACK point: a stager racing past it refuses
    * loudly instead of appending into a buffer whose snapshot was
    * already taken (the op would silently vanish). `previews` holds,
    * per table location, the metadata produced by applying the staged
    * transforms so far — the read-your-own-writes source and the
    * planning base for follow-up statements on the same table.
    */
  private final class TxState {
    val ops = scala.collection.mutable.ArrayBuffer.empty[Staged]
    val previews =
      scala.collection.mutable.LinkedHashMap.empty[String, TableMetadata]
    var closed = false
  }

  // session-keyed so independent SparkSessions (tests, notebooks
  // sharing a JVM) can't observe each other's open transaction; weak
  // so a dropped session can't pin its buffer
  private val open = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, TxState]())

  def active(session: SparkSession): Boolean = open.containsKey(session)

  /** The transaction's PREVIEW metadata for a location — what reads
    * and follow-up statements inside the transaction plan against.
    * None when no open transaction has staged that table.
    */
  private[catalog] def previewFor(session: SparkSession,
      location: String): Option[TableMetadata] = {
    val st = open.get(session)
    if (st == null) None else st.synchronized(st.previews.get(location))
  }

  def begin(session: SparkSession): Unit = {
    require(!active(session),
      "a transaction is already open on this session — COMMIT or " +
        "ROLLBACK it first (nested transactions are not supported)")
    open.put(session, new TxState)
  }

  /** Called by the DML commands when a transaction is open.
    * `stagedAgainst` is the metadata the statement planned against
    * (the prior preview, or live metadata for the table's first
    * statement); the new preview is the transform applied to it.
    */
  private[catalog] def stage(session: SparkSession, location: String,
      statement: String, stagedAgainst: TableMetadata,
      f: (TableMetadata, Long) => TableMetadata): Unit = {
    val st = open.get(session)
    require(st != null, "no open transaction")
    st.synchronized {
      require(!st.closed,
        "transaction already closed by a concurrent COMMIT/ROLLBACK — " +
          s"$statement on $location was not staged")
      st.ops += Staged(location, statement, f)
      // preview timestamps/snapshot ids are preview-only; COMMIT
      // re-applies the chain with the shared transaction timestamp
      st.previews(location) = f(stagedAgainst, System.currentTimeMillis())
    }
  }

  /** Statements with no staged form refuse inside a transaction
    * instead of silently committing outside it.
    */
  private[catalog] def refuse(session: SparkSession, what: String): Unit =
    require(!active(session),
      s"$what is not supported inside BEGIN TRANSACTION — " +
        "COMMIT or ROLLBACK first")

  /** Publish the staged set atomically. Returns the number of staged
    * ops committed (0 = empty transaction, nothing written). On ANY
    * failure (conflict, bare-store refusal) the transaction is closed
    * and its staged ops discarded — a retry re-runs the statements.
    */
  def commit(session: SparkSession): Int = {
    val st = open.remove(session)
    require(st != null, "COMMIT without an open transaction")
    val ops = st.synchronized { st.closed = true; st.ops.toVector }
    if (ops.isEmpty) return 0
    // compose per-location chains in statement order: each table gets
    // ONE claim-set slot whose transform applies its statements
    // sequentially — the first link validates the real base snapshot,
    // later links were planned against the chain's preview (stage's
    // contract) and skip revalidation. The chain's intermediate
    // snapshots are then COLLAPSED: one published snapshot per table
    // per transaction, stamped with the shared timestamp, so
    // transaction-consistent time travel holds (no probe instant can
    // fall between a table's own statements) and incremental consumers
    // see the transaction as one commit.
    val byLoc = scala.collection.mutable.LinkedHashMap
      .empty[String, (TableMetadata, Long) => TableMetadata]
    ops.foreach { s =>
      byLoc(s.location) = byLoc.get(s.location) match {
        case None    => s.f
        case Some(g) => collapsed((cur, ts) => s.f(g(cur, ts), ts))
      }
    }
    val sharedTs = new java.util.concurrent.atomic.AtomicLong(0L)
    MetadataIO.commitAll(byLoc.toSeq.zipWithIndex.map { case ((loc, f), i) =>
      loc -> ((cur: TableMetadata) => {
        if (i == 0) sharedTs.set(System.currentTimeMillis())
        f(cur, sharedTs.get)
      })
    })
    ops.size
  }

  /** Splice a multi-statement chain's intermediate snapshots out of
    * the committed metadata: the chain's FINAL state becomes one
    * snapshot re-parented onto the pre-transaction tip, its timestamp
    * the shared transaction instant (strictly monotonic vs the real
    * history only — the spliced intermediates never publish), and its
    * `added-*` summary recomputed against the pre-transaction file set
    * so incremental consumers price the transaction as the one commit
    * it observably is.
    */
  private def collapsed(chain: (TableMetadata, Long) => TableMetadata)
      : (TableMetadata, Long) => TableMetadata = (cur, ts) => {
    val end = chain(cur, ts)
    val added = end.snapshots.drop(cur.snapshots.size)
    if (added.size <= 1) end
    else {
      val last = added.last
      val now = math.max(ts, math.max(
        cur.snapshots.map(_.timestampMs).maxOption.getOrElse(Long.MinValue),
        cur.snapshotLog.map(_.timestampMs).maxOption.getOrElse(Long.MinValue))
        + 1)
      val curKnown = cur.currentSnapshot
        .map(s => (s.files ++ s.deleteFiles).map(_.path).toSet)
        .getOrElse(Set.empty[String])
      val addedFiles = last.inlineFiles.filterNot(f => curKnown(f.path))
      val merged = last.copy(
        parentId = cur.currentSnapshotId, timestampMs = now,
        summary = last.summary ++ Map(
          "added-data-files" -> addedFiles.size.toString,
          "added-records" -> addedFiles.map(_.recordCount).sum.toString,
          "added-files-size-bytes" ->
            addedFiles.map(_.fileSizeBytes).sum.toString))
      end.copy(
        currentSnapshotId = Some(merged.snapshotId),
        snapshots = cur.snapshots :+ merged,
        snapshotLog = cur.snapshotLog :+
          graft.tableformat.SnapshotLogEntry(now, merged.snapshotId))
    }
  }

  /** Discard the staged set (data files already written become
    * orphans for GC). Returns how many ops were discarded.
    */
  def rollback(session: SparkSession): Int = {
    val st = open.remove(session)
    require(st != null, "ROLLBACK without an open transaction")
    st.synchronized { st.closed = true; st.ops.size }
  }

  private val BeginRe = "(?is)^\\s*BEGIN\\s+TRANSACTION\\s*;?\\s*$".r
  private val CommitRe = "(?is)^\\s*COMMIT(\\s+TRANSACTION)?\\s*;?\\s*$".r
  private val RollbackRe =
    "(?is)^\\s*ROLLBACK(\\s+TRANSACTION)?\\s*;?\\s*$".r

  /** Parser hook ([[GraftSqlParser]]): claim the three transaction
    * statements. Spark has no COMMIT/ROLLBACK of its own, and BEGIN is
    * claimed only in its `BEGIN TRANSACTION` form so SQL-scripting
    * `BEGIN ... END` blocks stay Spark's.
    */
  private[catalog] def intercept(sqlText: String)
      : Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] =
    sqlText match {
      case BeginRe()       => Some(GraftBeginTransactionCommand())
      case CommitRe(_)     => Some(GraftCommitTransactionCommand())
      case RollbackRe(_)   => Some(GraftRollbackTransactionCommand())
      case _               => None
    }
}

final case class GraftBeginTransactionCommand()
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    GraftSqlTransactions.begin(session)
    Nil
  }
}

final case class GraftCommitTransactionCommand()
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    GraftSqlTransactions.commit(session)
    Nil
  }
}

final case class GraftRollbackTransactionCommand()
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    GraftSqlTransactions.rollback(session)
    Nil
  }
}
