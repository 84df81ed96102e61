package graft.catalog

import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}
import graft.tableformat.FileIO.io
import graft.tableformat.MetadataIO.CommitConflictException

/** Persistent SQL views over graft tables — the Iceberg view spec's
  * shape, re-expressed in the warehouse's JSON metadata idiom.
  *
  * A view directory holds `metadata/vN.view.json` + `view-hint.text`
  * (the table layout's H1 pattern with a distinct filename family, so a
  * location is provably a table XOR a view). The document is a full
  * replacement per DDL commit — views are tiny (SQL text + lineage),
  * so the table format's manifest-layering concern does not apply.
  *
  * Semantics follow Iceberg views:
  *   - LATE BINDING: the stored SQL re-analyzes at every read, so a
  *     view over `t` sees t's current schema/snapshot; the schema
  *     recorded per version is the definition-time shape (DESCRIBE,
  *     drift detection), never a pin.
  *   - VERSIONED: CREATE OR REPLACE appends a [[ViewVersion]] and moves
  *     `currentVersionId`; prior versions stay readable via
  *     `VERSION AS OF n` on the view name, and the version list is the
  *     audit trail (who-changed-what for pipeline defs).
  *   - each version records its definition-time catalog + namespace, so
  *     unqualified table names in the stored SQL resolve where the
  *     author meant, not where the reader happens to sit.
  *
  * Commit protocol: same write-then-link claim as table metadata —
  * concurrent CREATE OR REPLACE of one view cannot lose an update.
  */
final case class ViewVersion(
    versionId: Int,
    timestampMs: Long,
    sql: String,
    schemaJson: String,
    defaultCatalog: String,
    defaultNamespace: Vector[String],
    queryColumnNames: Vector[String] = Vector.empty,
    columnAliases: Vector[String] = Vector.empty,
    columnComments: Vector[String] = Vector.empty)

final case class ViewMetadata(
    name: String,
    currentVersionId: Int,
    versions: Vector[ViewVersion],
    properties: Map[String, String] = Map.empty) {
  def current: ViewVersion =
    versions.find(_.versionId == currentVersionId).getOrElse(
      sys.error(s"view $name: currentVersionId $currentVersionId " +
        "names no recorded version"))
  def version(id: Int): Option[ViewVersion] =
    versions.find(_.versionId == id)
}

/** DSv2 handle for a stored view (one version of it — the current one
  * for plain reads, a pinned one under `VERSION AS OF`). Carries the
  * stored SQL + definition-time resolution context; the analyzer (or
  * [[ResolveGraftRelations]]'s fallback) expands it late-binding.
  */
final case class GraftViewHandle(meta: ViewMetadata, v: ViewVersion)
    extends org.apache.spark.sql.connector.catalog.View {
  override def name(): String = meta.name
  override def query(): String = v.sql
  override def currentCatalog(): String = v.defaultCatalog
  override def currentNamespace(): Array[String] = v.defaultNamespace.toArray
  override def schema(): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.DataType.fromJson(v.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
  override def queryColumnNames(): Array[String] = v.queryColumnNames.toArray
  override def columnAliases(): Array[String] = v.columnAliases.toArray
  override def columnComments(): Array[String] = v.columnComments.toArray
  override def properties(): java.util.Map[String, String] = {
    import scala.jdk.CollectionConverters._
    java.util.Collections.unmodifiableMap(meta.properties.asJava)
  }
}

object ViewIO {

  private implicit val formats: Formats = DefaultFormats

  private def metadataDir(location: String): String =
    s"$location/metadata"
  def hintPath(location: String): String =
    s"${metadataDir(location)}/view-hint.text"
  private def docPath(location: String, version: Int): String =
    s"${metadataDir(location)}/v$version.view.json"

  def exists(location: String): Boolean = io.exists(hintPath(location))

  /** Hint is advisory (it can trail a racing writer's claim): probe
    * forward to the highest claimed document, as table reads do.
    */
  private def currentDocVersion(location: String): Option[Int] = {
    val hinted = try io.readString(hintPath(location)).trim.toIntOption
      catch { case _: java.io.IOException => None }
    hinted.map { h =>
      var v = math.max(h, 1)
      while (io.exists(docPath(location, v + 1))) v += 1
      v
    }
  }

  def read(location: String): ViewMetadata = readWithVersion(location)._1

  /** [[read]] returning the DOCUMENT version it read — the seam
    * transaction pinning/revalidation needs: the doc version moves on
    * EVERY commit (redefinitions AND metadata-only property/retention
    * commits), unlike `currentVersionId`, which only a redefinition
    * advances.
    */
  private[catalog] def readWithVersion(location: String): (ViewMetadata, Int) = {
    val v = currentDocVersion(location).getOrElse(
      sys.error(s"no view-hint.text under $location"))
    (JsonMethods.parse(io.readString(docPath(location, v)))
      .extract[ViewMetadata], v)
  }

  /** The current committed DOCUMENT version (0 = no view yet). */
  private[catalog] def docVersionOf(location: String): Int =
    currentDocVersion(location).getOrElse(0)

  /** Claim the next document slot atomically; conflict = a racer won. */
  def commit(location: String, meta: ViewMetadata): Unit = {
    val next = currentDocVersion(location).getOrElse(0) + 1
    val doc = Serialization.writePretty(meta)
    if (!io.claim(docPath(location, next), doc))
      throw new CommitConflictException(location, next)
    // advance-only hint swap (same contract as table hints)
    io.replaceAtomic(hintPath(location), next.toString)
    // view-creation half of the rename handshake (tables do the same —
    // see GraftTable.withdrawIfRenameClaimed): a copy-based renameView
    // that claimed this location between the caller's existence check
    // and this first commit would clobber the fresh view mid-copy.
    // Post-commit re-check → withdraw the unacknowledged view; a
    // rename claiming AFTER this point aborts on its own emptiness
    // check seeing the visible document. Only the CREATE commit pays
    // the exists() probe. OWNERSHIP-CHECKED like the table twin: the
    // withdraw deletes only a v1 document it can prove it wrote — if
    // the rename's copy already REPLACE-wrote its source's v1 here,
    // deleting it would leave the renamed view missing its v1 (the
    // rename's pre-completion re-verify is the other half of the fix).
    if (next == 1 && io.exists(s"$location/" +
        graft.tableformat.ObjectStoreFileIO.RenameClaimMarker)) {
      val owned =
        try io.readString(docPath(location, 1)) == doc
        catch { case _: Exception => false }
      if (owned) {
        io.delete(hintPath(location))
        io.delete(docPath(location, 1))
      }
      throw new IllegalArgumentException(
        s"$location became a rename destination during view creation; " +
          "the create was withdrawn — retry after the rename settles")
    }
  }

  /** A view REDEFINITION as a mixed-transaction claim slot
    * ([[graft.tableformat.MetadataIO.commitSlots]]): lets DDL and the
    * dependent view's repair publish through ONE atomic claim set —
    * e.g. a column rename plus the view SQL that names the new column,
    * with no reader window seeing one without the other. Only existing
    * views participate (the v1 create-vs-rename handshake stays on the
    * single-commit path, where its withdraw protocol lives); the
    * transform re-runs against fresh metadata on contention.
    */
  def prepareSlot(location: String,
      transform: ViewMetadata => ViewMetadata)
      : graft.tableformat.MetadataIO.PreparedSlot = {
    val next = currentDocVersion(location).getOrElse(sys.error(
      s"transactional view ops need an existing view at $location")) + 1
    val doc = Serialization.writePretty(transform(read(location)))
    graft.tableformat.MetadataIO.PreparedSlot(
      docPath(location, next), doc, location, next,
      () => io.replaceAtomic(hintPath(location), next.toString))
  }

  def drop(location: String): Boolean = {
    if (!exists(location)) return false
    io.deleteTree(location)
    true
  }

  /** View-version retention — the view twin of snapshot expiry: a
    * pipeline definition that is CREATE-OR-REPLACEd daily accretes a
    * version per run and `graft.db.v.versions` grows without bound.
    * Drops every recorded [[ViewVersion]] except the newest `keepLast`
    * and any with `timestampMs >= olderThanMs`; the CURRENT version
    * always survives (so SHOW CREATE and plain reads are unaffected).
    * `VERSION AS OF` an expired id then fails loudly, listing the
    * survivors — same contract as time travel to an expired snapshot.
    * Returns the dropped version ids (empty = nothing to do, no
    * commit). Concurrency: goes through [[commit]]'s claim, so a
    * racing REPLACE surfaces as the usual commit conflict.
    */
  def expireVersions(location: String, keepLast: Int,
      olderThanMs: Long = Long.MaxValue): Vector[Int] = {
    require(keepLast >= 1, "must retain at least the current version")
    val cur = read(location)
    val newest = cur.versions.sortBy(-_.versionId).take(keepLast)
      .map(_.versionId).toSet
    val keep = cur.versions.filter(v => newest(v.versionId) ||
      v.timestampMs >= olderThanMs).map(_.versionId).toSet +
      cur.currentVersionId
    val dropped = cur.versions.map(_.versionId).filterNot(keep).toVector
    if (dropped.isEmpty) return Vector.empty
    commit(location,
      cur.copy(versions = cur.versions.filter(v => keep(v.versionId))))
    dropped
  }
}
