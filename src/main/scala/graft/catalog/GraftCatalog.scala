package graft.catalog

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.GraftTable
import graft.tableformat.MetadataIO

/** One operation inside a multi-table transaction
  * ([[GraftCatalog.transactOps]]): an append, a copy-on-write
  * DELETE/UPDATE, or a copy-on-write MERGE against one table.
  */
sealed trait TxOp { def table: GraftTable }
object Tx {
  final case class Append(table: GraftTable,
      df: org.apache.spark.sql.DataFrame) extends TxOp
  final case class Delete(table: GraftTable,
      cond: org.apache.spark.sql.Column) extends TxOp
  final case class Update(table: GraftTable,
      cond: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column]) extends TxOp
  /** The CDC-upsert shape: MERGE the batch into the fact AND append
    * its index rows in one claim set ([[graft.engine.GraftTable.merge]]
    * semantics, copy-on-write targets only).
    */
  final case class Merge(table: GraftTable,
      source: org.apache.spark.sql.DataFrame,
      on: org.apache.spark.sql.Column,
      matched: Seq[graft.engine.MergeMatchedClause],
      notMatched: Seq[graft.engine.MergeInsertClause],
      notMatchedBySource: Seq[graft.engine.MergeMatchedClause] = Nil,
      targetAlias: Option[String] = None) extends TxOp
}

/** Two-level `graft.<db>.<table>` namespace over a warehouse directory —
  * the reference addresses everything as `iceberg.employee_db.employee`
  * (apiv15.py:65) through a Hadoop catalog whose filesystem layout IS
  * the catalog; same here: db = directory, table = subdirectory with
  * `metadata/version-hint.text`.
  *
  * SQL-text surface: `sql()` resolves `graft.db.table` identifiers
  * (optionally suffixed `FOR SYSTEM_TIME AS OF '<ts>'` / `VERSION AS OF
  * <id>`, the reference's time-travel syntax, apiv15.py:154-157 and
  * notebook cells 42/45) into registered temp views and delegates to
  * `spark.sql` — queries, joins, DDL-free SELECTs all work unchanged.
  * Catalog ops are directory/metadata-only: nothing here reads data
  * files, so SHOW/DESCRIBE stay O(#tables) at any scale.
  */
final class GraftCatalog(val spark: SparkSession, val warehouse: String) {

  // point native SQL resolution (GraftExtensions) at this warehouse;
  // with several catalogs in one session the most recent wins — the
  // sql() rewrite below is warehouse-explicit and unaffected
  spark.conf.set("spark.graft.warehouse", warehouse)

  @volatile private var currentDb: Option[String] = None

  // ---------------------------------------------------------- D1: CREATE DB

  def createDatabase(db: String): Unit = {
    require(db.matches("[A-Za-z0-9_]+"), s"bad database name $db")
    Files.createDirectories(Paths.get(warehouse, db))
  }

  def use(db: String): Unit = {
    require(Files.isDirectory(Paths.get(warehouse, db)), s"no database $db")
    currentDb = Some(db)
  }

  // ------------------------------------------------------------- D7: SHOW

  def listDatabases(): Seq[String] =
    if (!Files.isDirectory(Paths.get(warehouse))) Nil
    else {
      val s = Files.list(Paths.get(warehouse)) // must close: directory fd
      try s.iterator().asScala
        .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq.sorted
      finally s.close()
    }

  def listTables(db: String): Seq[String] = {
    val d = Paths.get(warehouse, db)
    if (!Files.isDirectory(d)) Nil
    else {
      val s = Files.list(d) // must close: directory fd
      try s.iterator().asScala
        .filter(p => MetadataIO.exists(p.toString))
        .map(_.getFileName.toString).toSeq.sorted
      finally s.close()
    }
  }

  def showDatabases(): DataFrame = {
    import spark.implicits._
    listDatabases().toDF("namespace")
  }

  def showTables(db: String): DataFrame = {
    import spark.implicits._
    listTables(db).map(t => (db, t)).toDF("namespace", "tableName")
  }

  // --------------------------------------------------------- table access

  def location(db: String, table: String): String =
    Paths.get(warehouse, db, table).toString

  def table(db: String, name: String): GraftTable =
    GraftTable.load(spark, location(db, name))

  def tableExists(db: String, name: String): Boolean =
    MetadataIO.exists(location(db, name))

  def createTable(db: String, name: String, fields: Seq[(String, String)],
      partition: Seq[(String, String)] = Nil,
      properties: Map[String, String] = Map.empty): GraftTable = {
    createDatabase(db)
    GraftTable.create(spark, location(db, name), s"$db.$name", fields,
      partition, properties)
  }

  def createTableAs(db: String, name: String, df: DataFrame,
      partition: Seq[(String, String)] = Nil): GraftTable = {
    createDatabase(db)
    GraftTable.createAs(spark, location(db, name), s"$db.$name", df, partition)
  }

  // ----------------------------------------------- multi-table transaction

  /** MULTI-TABLE TRANSACTION — commit appends to several tables
    * atomically: every batch's data files are written first (invisible
    * until referenced), then ONE catalog CAS claims every table's next
    * version together ([[graft.tableformat.FileIO.claimAll]]). A reader
    * can never observe one table's commit without the others' — the
    * LLM-pipeline shape this exists for is publishing a corpus table
    * and its fingerprint/dedup index in lockstep, where a corpus-only
    * commit would let a concurrent dedup pass miss documents. Only the
    * catalog-arbitrated backend supports it (the Iceberg REST-catalog
    * capability); bare conditional-PUT/POSIX stores refuse loudly.
    * Returns the committed version per table, in input order.
    */
  def transact(ops: (GraftTable, DataFrame)*): Seq[Int] =
    transactOps(ops.map { case (t, df) => Tx.Append(t, df) })

  /** MULTI-TABLE TRANSACTION over mixed operations — appends AND
    * row-level DML (copy-on-write rewrites, or positional delete
    * files + appended copies on merge-on-read tables): the
    * dedup-pipeline shape that motivated
    * transactions needs the delete half (a sweep that CoW-deletes
    * corpus rows must retract the matching index rows atomically, or
    * a reader joins a shrunken corpus against a stale index). Every
    * operation's data files are written FIRST (rewrites included —
    * invisible until referenced), then one atomic catalog CAS claims
    * every table's next version together; DML transforms re-validate
    * their base snapshot at claim time and abort loudly on a racing
    * commit ([[GraftTable.stageDelete]]'s conflict contract). One
    * shared commit timestamp across the set (refreshed per retry by
    * the first transform) keeps `TIMESTAMP AS OF` transaction-
    * consistent: no probe instant falls between one transaction's
    * per-table snapshots — including against a skewed-forward racer
    * whose stamp outpaces the wall clock: a slot whose claim-time
    * history sits above the chosen instant lifts the WHOLE set's
    * instant past it ([[SharedInstant]]), never just its own stamp.
    */
  def transactOps(ops: Seq[TxOp]): Seq[Int] = {
    require(ops.nonEmpty, "empty transaction")
    val staged = ops.map {
      case Tx.Append(t, df)       => t -> t.stageAppend(df)
      case Tx.Delete(t, cond)     => t -> t.stageDelete(cond)
      case Tx.Update(t, cond, as) => t -> t.stageUpdate(cond, as)
      case Tx.Merge(t, src, on, m, nm, nms, al) =>
        t -> t.stageMerge(src, on, m, nm, nms, al)
    }
    val floor = new java.util.concurrent.atomic.AtomicLong(0L)
    val sharedTs = new java.util.concurrent.atomic.AtomicLong(0L)
    SharedInstant.withFloorRetries(floor) { () =>
      MetadataIO.commitAll(staged.zipWithIndex.map { case ((t, f), i) =>
        t.location -> ((cur: graft.tableformat.TableMetadata) => {
          if (i == 0) sharedTs.set(SharedInstant.stampAbove(floor))
          if (staged.size > 1) SharedInstant.check(cur, sharedTs.get)
          f(cur, sharedTs.get)
        })
      })
    }
  }

  /** Exactly-once MULTI-TABLE publish — the streaming `foreachBatch`
    * shape: append every table's batch AND record
    * `markerKey -> markerValue` on every table in the SAME atomic
    * claim set; return false (nothing written) when the marker is
    * already at or past `markerValue`. Because the set commits
    * atomically, a crash or micro-batch REPLAY can never leave rows or
    * markers on a subset of the tables: the replay either redoes the
    * whole set or skips it whole. This is the transactional upgrade of
    * the per-table appendIfNewMarker composition, which until now
    * could expose a corpus batch whose index batch hadn't landed yet.
    */
  def transactIfNewMarker(markerKey: String, markerValue: Long,
      ops: (GraftTable, DataFrame)*): Boolean =
    transactOpsIfNewMarker(markerKey, markerValue,
      ops.map { case (t, df) => Tx.Append(t, df) })

  /** Exactly-once [[transactOps]] — the `foreachBatch` SWEEP shape: a
    * streaming dedup pass that CoW-deletes corpus rows and retracts
    * their index rows must survive micro-batch replay without
    * re-deleting or half-applying. The op set and
    * `markerKey -> markerValue` publish on every table in the SAME
    * atomic claim set; a batch already at-or-past the marker skips
    * WHOLE (checked before any file is written). Returns whether the
    * ops were committed.
    */
  def transactOpsIfNewMarker(markerKey: String, markerValue: Long,
      ops: Seq[TxOp]): Boolean = {
    require(ops.nonEmpty, "empty transaction")
    def seen(m: graft.tableformat.TableMetadata): Boolean =
      m.properties.get(markerKey).exists(_.toLong >= markerValue)
    // common replay path: skip before staging writes anything
    if (ops.exists(o => seen(o.table.meta))) return false
    val staged = ops.map {
      case Tx.Append(t, df)       => t -> t.stageAppend(df)
      case Tx.Delete(t, cond)     => t -> t.stageDelete(cond)
      case Tx.Update(t, cond, as) => t -> t.stageUpdate(cond, as)
      case Tx.Merge(t, src, on, m, nm, nms, al) =>
        t -> t.stageMerge(src, on, m, nm, nms, al)
    }
    val floor = new java.util.concurrent.atomic.AtomicLong(0L)
    val sharedTs = new java.util.concurrent.atomic.AtomicLong(0L)
    final class SeenMarker extends RuntimeException
    try {
      SharedInstant.withFloorRetries(floor) { () =>
        MetadataIO.commitAll(staged.zipWithIndex.map { case ((t, f), i) =>
          t.location -> ((cur: graft.tableformat.TableMetadata) => {
            if (seen(cur)) throw new SeenMarker // a racer published it
            if (i == 0) sharedTs.set(SharedInstant.stampAbove(floor))
            if (staged.size > 1) SharedInstant.check(cur, sharedTs.get)
            val next = f(cur, sharedTs.get)
            next.copy(properties =
              next.properties + (markerKey -> markerValue.toString))
          })
        })
      }
      true
    } catch { case _: SeenMarker => false }
  }

  /** [[transact]] for arbitrary metadata transforms (DDL, property
    * flips, snapshot surgery) — the raw form: each table's transform
    * re-runs against fresh metadata on contention, and the whole set
    * commits through one atomic claim.
    */
  def transactTransforms(
      ops: Seq[(GraftTable, graft.tableformat.TableMetadata =>
        graft.tableformat.TableMetadata)]): Seq[Int] =
    MetadataIO.commitAll(ops.map { case (t, f) => t.location -> f })

  /** [[transactTransforms]] admitting VIEW redefinitions into the same
    * atomic claim set — the DDL + view-repair shape: a column rename
    * and the dependent view's new SQL publish TOGETHER, so no reader
    * window exists where the renamed table pairs with the stale
    * definition (late-binding expansion would throw an analysis error
    * for every reader inside that window). View ops are keyed
    * `"db.view"`; each transform receives the current [[ViewMetadata]]
    * and typically appends a [[ViewVersion]] — note the new SQL can't
    * be ANALYZED until the paired DDL commits, so its definition-time
    * schema is carried by the caller (for a source-column rename the
    * view's output schema is unchanged). Catalog-arbitrated backends
    * only, like every multi-document transaction.
    */
  def transactTransforms(
      tableOps: Seq[(GraftTable, graft.tableformat.TableMetadata =>
        graft.tableformat.TableMetadata)],
      viewOps: Seq[(String, ViewMetadata => ViewMetadata)]): Seq[Int] = {
    val slots: Seq[() => graft.tableformat.MetadataIO.PreparedSlot] =
      tableOps.map { case (t, f) =>
        () => MetadataIO.prepareTableSlot(t.location, f)
      } ++ viewOps.map { case (name, f) =>
        val parts = name.split("\\.", 2)
        require(parts.length == 2, s"view ops are keyed db.view, got $name")
        val loc = Paths.get(warehouse, parts(0), parts(1)).toString
        require(ViewIO.exists(loc), s"no view $name under $warehouse")
        () => ViewIO.prepareSlot(loc, f)
      }
    MetadataIO.commitSlots(slots)
  }

  // --------------------------------------------------------- D8: DESCRIBE

  /** DESCRIBE TABLE: column name / type / field-id rows. */
  def describe(db: String, name: String): DataFrame = {
    import spark.implicits._
    table(db, name).meta.currentSchema.fields
      .map(f => (f.name, f.dataType, f.id)).toDF("col_name", "data_type", "field_id")
  }

  /** DESCRIBE EXTENDED: schema rows plus metadata section (properties,
    * partition spec, current snapshot), mirroring the notebook's
    * DESCRIBE EXTENDED output shape (cells 15/20/69).
    */
  def describeExtended(db: String, name: String): DataFrame = {
    import spark.implicits._
    val m = table(db, name).meta
    val schemaRows = m.currentSchema.fields.map(f =>
      (f.name, f.dataType, s"field-id ${f.id}"))
    val partRows = m.currentSpec.fields.map(pf =>
      (s"# Partition ${pf.name}", pf.transform, s"source-id ${pf.sourceId}"))
    val metaRows = Seq(
      ("# Metadata", "", ""),
      ("Name", m.name, ""),
      ("Location", m.location, ""),
      ("Format-version", m.formatVersion.toString, ""),
      ("Current-snapshot", m.currentSnapshotId.map(_.toString).getOrElse("none"), ""),
      ("Snapshots", m.snapshots.size.toString, "")) ++
      m.properties.toSeq.sortBy(_._1).map { case (k, v) => (k, v, "property") }
    (schemaRows ++ partRows ++ metaRows).toDF("col_name", "data_type", "comment")
  }

  // ------------------------------------------------- SQL-text entry point

  // suffixes are SQL keywords — case-insensitive like every other
  // SQL surface (the (?i) group applies to the keywords only; table
  // identifiers stay case-preserving)
  private val qualified =
    """graft\.([A-Za-z0-9_]+)\.([A-Za-z0-9_]+)((?i:\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+)'([^']+)'|(?i:\s+VERSION\s+AS\s+OF\s+)(\d+))?""".r

  // single-quoted SQL string literals ('' = escaped quote): rewriting
  // must never touch graft.db.t occurrences INSIDE them — a predicate
  // like src_name = 'graft.db.t' would silently match nothing
  private val sqlStringLiteral = """'(?:[^']|'')*'""".r

  /** Run SQL text containing `graft.db.table` references (with optional
    * time-travel suffixes). Each distinct (table, travel) reference is
    * materialized as ONE temp view — repeated occurrences (e.g. a
    * qualified column `graft.db.t.c` alongside `FROM graft.db.t`)
    * rewrite to the same name, so qualifiers keep resolving. The
    * rewritten text goes to spark.sql so Catalyst handles everything
    * else (joins, aggregates, windows...). String literals pass
    * through untouched.
    */
  def sql(query: String): DataFrame = spark.sql(rewriteSql(query))

  /** The literal only attaches to the rewrite segment when what
    * precedes `AS OF` is OUR time-travel form on a graft-qualified
    * reference — anchoring to the reference pattern keeps every OTHER
    * `AS OF` literal (e.g. Spark-native `TIMESTAMP AS OF` on a
    * non-graft table whose timestamp text happens to contain
    * `graft.db.t`) protected like any ordinary string.
    */
  private val graftAsOfPrefix =
    ("""(?is).*graft\.[A-Za-z0-9_]+\.[A-Za-z0-9_]+""" +
      """\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s*$""").r

  /** The text-rewrite half of [[sql]], separated so specs can pin
    * exactly what is (and is not) rewritten without executing the
    * result.
    */
  private[graft] def rewriteSql(query: String): String = {
    val views = scala.collection.mutable.Map[String, String]()
    def rewriteSegment(seg: String): String =
      qualified.replaceAllIn(seg, m => {
        val (db, tbl) = (m.group(1), m.group(2))
        val travel = Option(m.group(3)).getOrElse("")
        views.getOrElseUpdate(s"$db.$tbl${travel.toUpperCase}", {
          val t = table(db, tbl)
          val df = (Option(m.group(4)), Option(m.group(5))) match {
            case (Some(ts), _) => t.readAsOfTime(parseTs(ts))
            case (_, Some(v))  => t.readAsOfVersion(v.toLong)
            // plain reads take the session's transaction view (staged
            // preview / begin-time pin) like the native-SQL path —
            // cat.sql() inside an open transaction must not leak live
            // state past the snapshot-isolation contract
            case _ =>
              GraftSqlTransactions.readView(spark, t.location, t.meta) match {
                case Some(pm) => t.readPreview(pm)
                case None     => t.read()
              }
          }
          val view = s"graft_${db}_${tbl}_${views.size}"
          df.createOrReplaceTempView(view)
          view
        })
      })
    // walk literal and non-literal segments: rewrite only outside
    // quotes (the time-travel suffix's own quoted timestamp is inside
    // `qualified` itself, so it still matches when the reference
    // STARTS outside a literal)
    val out = new StringBuilder
    var last = 0
    for (m <- sqlStringLiteral.findAllMatchIn(query)) {
      val pre = query.substring(last, m.start)
      // a literal directly preceded by OUR qualified time-travel form
      // is its timestamp — keep it attached to the preceding segment
      // so the qualified regex sees the whole reference
      if (graftAsOfPrefix.matches(pre)) {
        out ++= rewriteSegment(query.substring(last, m.end))
      } else {
        out ++= rewriteSegment(pre)
        out ++= m.matched
      }
      last = m.end
    }
    out ++= rewriteSegment(query.substring(last))
    out.toString
  }

  /** Timestamps/dates in SQL text are interpreted in UTC, matching the
    * pinned session timezone — java.sql.Timestamp.valueOf would use the
    * JVM default zone and shift results between hosts. One shared
    * parser ([[GraftSqlTransactions.parseTsUtc]]) keeps every AS OF
    * surface accepting the same formats.
    */
  private def parseTs(s: String): Long =
    GraftSqlTransactions.parseTsUtc(s)
}
