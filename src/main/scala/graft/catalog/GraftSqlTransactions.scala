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
  * Scope, stated plainly: DML only (INSERT INTO, DELETE, UPDATE —
  * each table at most once per transaction; staged rewrites abort on a
  * racing commit, [[graft.engine.GraftTable.stageDelete]]'s contract).
  * DDL / CTAS / TRUNCATE / MERGE inside an open transaction refuse
  * loudly rather than silently committing outside it. Reads inside
  * the transaction see the PRE-transaction state — there is no
  * read-your-own-writes buffer, matching the snapshot-isolation model
  * everywhere else in the engine.
  */
object GraftSqlTransactions {

  private final case class Staged(location: String, statement: String,
      f: (TableMetadata, Long) => TableMetadata)

  // session-keyed so independent SparkSessions (tests, notebooks
  // sharing a JVM) can't observe each other's open transaction; weak
  // so a dropped session can't pin its buffer
  private val open = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.ArrayBuffer[Staged]]())

  def active(session: SparkSession): Boolean = open.containsKey(session)

  def begin(session: SparkSession): Unit = {
    require(!active(session),
      "a transaction is already open on this session — COMMIT or " +
        "ROLLBACK it first (nested transactions are not supported)")
    open.put(session, scala.collection.mutable.ArrayBuffer.empty)
  }

  /** Called by the DML commands when a transaction is open. */
  private[catalog] def stage(session: SparkSession, location: String,
      statement: String,
      f: (TableMetadata, Long) => TableMetadata): Unit = {
    val buf = open.get(session)
    require(buf != null, "no open transaction")
    require(!buf.exists(_.location == location),
      s"transaction already touches $location — a transaction may " +
        "touch each table once (combine the statements)")
    buf += Staged(location, statement, f)
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
    val buf = open.remove(session)
    require(buf != null, "COMMIT without an open transaction")
    if (buf.isEmpty) return 0
    val sharedTs = new java.util.concurrent.atomic.AtomicLong(0L)
    MetadataIO.commitAll(buf.toSeq.zipWithIndex.map { case (s, i) =>
      s.location -> ((cur: TableMetadata) => {
        if (i == 0) sharedTs.set(System.currentTimeMillis())
        s.f(cur, sharedTs.get)
      })
    })
    buf.size
  }

  /** Discard the staged set (data files already written become
    * orphans for GC). Returns how many ops were discarded.
    */
  def rollback(session: SparkSession): Int = {
    val buf = open.remove(session)
    require(buf != null, "ROLLBACK without an open transaction")
    buf.size
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
