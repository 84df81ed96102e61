package graft.tableformat

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** JSON persistence for TableMetadata: metadata/vN.metadata.json plus
  * version-hint.text (the reference's layout — apiv15.py:41-43 reads the
  * hint, then v{N}.metadata.json; SURVEY.md H1).
  *
  * Concurrency model — OPTIMISTIC, never last-writer-wins:
  *   - each version file is claimed atomically (content fully written to
  *     a temp file, then hard-linked into place: link(2) fails if the
  *     target exists, so a visible vN.metadata.json is always complete
  *     AND uniquely owned). Two writers racing from the same base both
  *     try to claim v(N+1); exactly one wins, the loser sees
  *     [[CommitConflictException]];
  *   - [[commitRetry]] is the read-transform-write loop DML/DDL commit
  *     through: on conflict the transform re-runs against the freshly
  *     read metadata, so rebase policy lives with the operation (appends
  *     rebase unconditionally; rewrites require the base snapshot
  *     unchanged — see GraftTable.commitSnapshot);
  *   - the hint file is exactly that — a hint. It swaps atomically and
  *     only ever ADVANCES under this writer, but a racing pair can still
  *     land hint writes out of order, so [[currentVersion]] probes
  *     forward from the hint to the highest version actually claimed
  *     (O(1) probes when the hint is current; readers therefore never
  *     miss a committed snapshot behind a stale hint).
  *
  * The reference is a single Flask process over a local catalog
  * (apiv15.py:24-25) and never hits this; a multi-writer deployment
  * does, immediately.
  */
object MetadataIO {

  /** Snapshots serialize in one of two shapes: sealed (a
    * `manifestList` pointer — what [[commit]] always writes) or
    * legacy/inline (`files`/`deleteFiles` arrays — accepted on read so
    * pre-layering documents and hand-built fixtures keep working).
    * The `location` hydration field never serializes.
    */
  private object SnapshotSerializer extends CustomSerializer[Snapshot](fmts => (
    { case j: JObject =>
        Snapshot(
          snapshotId = (j \ "snapshotId").extract[Long],
          parentId = (j \ "parentId").extractOpt[Long],
          timestampMs = (j \ "timestampMs").extract[Long],
          operation = (j \ "operation").extract[String],
          schemaId = (j \ "schemaId").extract[Int],
          specId = (j \ "specId").extract[Int],
          inlineFiles = (j \ "files")
            .extractOrElse[Vector[DataFileEntry]](Vector.empty),
          summary = (j \ "summary")
            .extractOrElse[Map[String, String]](Map.empty),
          inlineDeleteFiles = (j \ "deleteFiles")
            .extractOrElse[Vector[DataFileEntry]](Vector.empty),
          manifestList = (j \ "manifestList").extractOpt[String])
    },
    { case s: Snapshot =>
        val core: List[JField] = List(
          "snapshotId" -> JLong(s.snapshotId),
          "parentId" -> s.parentId.map(JLong(_)).getOrElse(JNothing),
          "timestampMs" -> JLong(s.timestampMs),
          "operation" -> JString(s.operation),
          "schemaId" -> JInt(s.schemaId),
          "specId" -> JInt(s.specId),
          "summary" -> Extraction.decompose(s.summary))
        val inventory: List[JField] = s.manifestList match {
          case Some(rel) => List("manifestList" -> JString(rel))
          case None => List(
            "files" -> Extraction.decompose(s.inlineFiles),
            "deleteFiles" -> Extraction.decompose(s.inlineDeleteFiles))
        }
        JObject(core ++ inventory: _*)
    }
  ))

  implicit private val formats: Formats = DefaultFormats + SnapshotSerializer

  /** A racing writer claimed the version this commit targeted. */
  final class CommitConflictException(location: String, version: Int)
      extends RuntimeException(
        s"concurrent commit: v$version already claimed under $location")

  /** One prepared, not-yet-claimed document of a mixed transaction
    * (table commits and view commits share the claim primitives, so
    * one atomic claim set can hold both — see [[commitSlots]]).
    * `onWin` runs post-claim bookkeeping (hint advance, metadata
    * trimming) once the WHOLE set is claimed.
    */
  private[graft] final case class PreparedSlot(path: String,
      content: String, location: String, next: Int, onWin: () => Unit)

  import FileIO.io

  private def metadataDir(location: String): String = s"$location/metadata"
  private def hintPath(location: String): String =
    s"${metadataDir(location)}/version-hint.text"

  /** Highest committed version: hint, then probe forward past any
    * versions whose hint write lost an ordering race.
    */
  def currentVersion(location: String): Option[Int] = {
    val p = hintPath(location)
    if (!io.exists(p)) return None
    var v = io.readString(p).trim.toInt
    while (io.exists(metadataPath(location, v + 1))) v += 1
    Some(v)
  }

  def metadataPath(location: String, version: Int): String =
    s"${metadataDir(location)}/v$version.metadata.json"

  private def versionOfLogFile(e: MetadataLogEntry): Int =
    e.file.stripPrefix("v").stripSuffix(".metadata.json").toIntOption
      .getOrElse(sys.error(s"unparseable metadata log entry ${e.file}"))

  /** The metadata DOCUMENT version this instance was read at — the
    * same lineage `prepare` claims (last metadataLog entry), so it
    * moves on EVERY commit, snapshot-producing or metadata-only.
    * Transaction base revalidation pins this, not the snapshot id: a
    * racing schema evolution or property commit changes no snapshot
    * but must still abort a transaction planned against the old doc.
    */
  private[graft] def docVersion(m: TableMetadata): Int =
    m.metadataLog.lastOption.map(versionOfLogFile).getOrElse(0)

  def read(location: String): TableMetadata = {
    val v = currentVersion(location)
      .getOrElse(sys.error(s"no version-hint.text under $location"))
    readVersion(location, v)
  }

  // Parsed-document reuse. Version documents are immutable once
  // claimed, BUT a dropped-and-recreated table reuses the same
  // (location, version) coordinates with different content — so a
  // coordinate-keyed cache alone would serve the dead table's
  // metadata. The bytes therefore load from storage on EVERY read
  // (which is also what keeps multi-writer freshness: currentVersion
  // probes the hint first) and the cache is only consulted when the
  // raw JSON is byte-identical to what was parsed before — airtight,
  // no lineage or invalidation protocol needed. What it saves is the
  // expensive part: the reflection parse, the per-read hydration
  // copies, and above all the snapshots' LAZY inventory views — a
  // read-hot table materializes its 10⁶-entry file list once per
  // version instead of once per read. Entry vectors inside are shared
  // with the manifest entry cache, not duplicated.
  private val docCache =
    new java.util.LinkedHashMap[String, (String, TableMetadata)](
      32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, TableMetadata)]) =
        size() > 64
    }

  /** Test hook (see Manifests.clearCachesForTesting, which calls this
    * too): drop parsed-document state so a spec can measure or mangle
    * cold reads.
    */
  private[graft] def clearDocCacheForTesting(): Unit =
    docCache.synchronized(docCache.clear())

  def readVersion(location: String, version: Int): TableMetadata = {
    val key = s"$location#$version"
    val json = io.readString(metadataPath(location, version))
    docCache.synchronized(Option(docCache.get(key))) match {
      case Some((raw, doc)) if raw == json => return doc
      case _ => ()
    }
    val parsed = JsonMethods.parse(json).extract[TableMetadata]
    // hydrate with the location the document was READ from (not its
    // recorded one — a moved/renamed table resolves its relative
    // manifest paths under the new root). The TOP-LEVEL location heals
    // too, not just the snapshots': commit() claims the next version
    // under meta.location, so a table whose physical rename completed
    // but whose location-rewrite commit didn't (crash between the two
    // in renameTable) would otherwise send its NEXT commit to the old,
    // now-empty directory — silently forking the table. (Surfaced by
    // the crash-point fuzz.)
    val m = parsed.copy(location = location, snapshots =
      parsed.snapshots.map(_.copy(location = location)))
    // lineage heal: commit() claims (last metadataLog version)+1, so a
    // document whose log predates the file it was read from (hand-
    // written or externally imported metadata) must surface its true
    // read version or its next commit would target an old, taken slot
    val healed =
      if (m.metadataLog.lastOption.exists(e =>
        versionOfLogFile(e) >= version)) m
      else m.copy(metadataLog = m.metadataLog :+
        MetadataLogEntry(System.currentTimeMillis(),
          s"v$version.metadata.json"))
    docCache.synchronized(docCache.put(key, (json, healed)))
    healed
  }

  def exists(location: String): Boolean = io.exists(hintPath(location))

  /** Single-attempt commit: claim the next version atomically, then
    * advance the hint. Throws [[CommitConflictException]] if a racing
    * writer claimed the version first — callers that can rebase use
    * [[commitRetry]] instead.
    */
  /** Seal every snapshot still carrying inline file lists into
    * manifest side-files (see [[Manifests.seal]]), parents before
    * children so structural sharing finds the parent's manifests.
    * Construction order already guarantees child timestamps strictly
    * after parents (withSnapshot's monotonic clock), so a timestamp
    * sort is a topological order.
    */
  private def sealAll(meta: TableMetadata): TableMetadata = {
    if (meta.snapshots.forall(_.manifestList.isDefined)) return meta
    val byId = scala.collection.mutable.Map.from(
      meta.snapshots.map(s => s.snapshotId -> s))
    meta.snapshots.sortBy(_.timestampMs).foreach { s =>
      if (s.manifestList.isEmpty)
        byId(s.snapshotId) =
          Manifests.seal(meta, byId(s.snapshotId),
            s.parentId.flatMap(byId.get))
    }
    meta.copy(snapshots = meta.snapshots.map(s => byId(s.snapshotId)))
  }

  def commit(metaRaw: TableMetadata): Int = commitWithContent(metaRaw)._1

  /** [[commit]], also returning the exact serialized document that was
    * claimed. CREATE's rename handshake needs it: the post-commit
    * withdraw must prove the v1 document it is about to delete is the
    * one THIS create wrote — not a racing rename's copy of its source
    * (see GraftTable.withdrawIfRenameClaimed).
    */
  private[graft] def commitWithContent(metaRaw: TableMetadata)
      : (Int, String) = {
    val p = prepare(metaRaw)
    // the FileIO claim primitive: the document becomes visible complete
    // and uniquely owned, or not at all — a reader can never observe a
    // torn vN file and a racing writer can never silently clobber one
    if (!io.claim(metadataPath(p.meta.location, p.next), p.content))
      throw new CommitConflictException(p.meta.location, p.next)
    finish(p)
    (p.next, p.content)
  }

  /** A commit, serialized and versioned but not yet claimed — the unit
    * [[commitWithContent]] claims singly and [[commitAll]] claims as an
    * atomic set.
    */
  private final case class Prepared(meta: TableMetadata, next: Int,
      content: String, dropped: Vector[MetadataLogEntry])

  private def prepare(metaRaw: TableMetadata): Prepared = {
    val meta = sealAll(metaRaw)
    // The claim version comes from the metadata's OWN lineage — the last
    // metadataLog entry is the version this document was read at — NOT
    // from currentVersion(): deriving it from the directory would let a
    // writer that read vN claim v(N+2) after a racer landed v(N+1),
    // committing a document that silently drops the racer's changes
    // (the exact lost update the claim protocol exists to prevent).
    val next = meta.metadataLog.lastOption.map(versionOfLogFile).getOrElse(0) + 1
    val fullLog = meta.metadataLog :+
      MetadataLogEntry(System.currentTimeMillis(), s"v$next.metadata.json")
    // bounded metadata history (Iceberg's
    // write.metadata.previous-versions-max, default 100): a long-running
    // CDC table commits forever, and an unbounded log means every
    // commit rewrites an ever-growing document. Trimming keeps the
    // NEWEST entries, so the claim protocol above (next = last entry's
    // version + 1) is unaffected.
    val maxPrev = meta.properties
      .get("write.metadata.previous-versions-max")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(100)
    val keptLog =
      if (fullLog.size > maxPrev + 1) fullLog.takeRight(maxPrev + 1)
      else fullLog
    val dropped = fullLog.dropRight(keptLog.size)
    val withLog = meta.copy(metadataLog = keptLog)
    Prepared(withLog, next, Serialization.writePretty(withLog), dropped)
  }

  /** Post-claim bookkeeping: advance the hint, then physically delete
    * trimmed-out metadata documents when opted in (Iceberg's
    * write.metadata.delete-after-commit.enabled). Time travel by
    * SNAPSHOT is unaffected — snapshots live in the current document;
    * only readVersion() of the deleted document numbers stops working,
    * the same trade Iceberg makes. Best-effort: a failed unlink leaves
    * an orphan document, never a broken table.
    */
  private def finish(p: Prepared): Unit = {
    advanceHint(p.meta.location, p.next)
    if (p.meta.properties.get("write.metadata.delete-after-commit.enabled")
        .contains("true"))
      p.dropped.foreach { e =>
        try io.delete(metadataPath(p.meta.location, versionOfLogFile(e)))
        catch { case _: java.io.IOException => () }
      }
  }

  /** MULTI-TABLE TRANSACTION: apply each location's transform to its
    * freshly read metadata and commit every next-version document in
    * ONE atomic claim set ([[FileIO.claimAll]] — a single catalog CAS
    * on the catalog backend, a refusal on bare stores). All commits
    * land or none do, and readers can never observe a subset: the CAS
    * is the commit for the whole set, and per-slot healing makes each
    * claimed document readable even if the winner crashed before
    * publishing it. On contention (any slot already claimed) every
    * transform re-runs against fresh metadata, same rebase contract as
    * [[commitRetry]]. Returns the committed version per location, in
    * input order.
    */
  def commitAll(ops: Seq[(String, TableMetadata => TableMetadata)],
      attempts: Int = 20): Seq[Int] = {
    require(ops.map(_._1).distinct.size == ops.size,
      "a transaction may touch each table once (compose the transforms)")
    commitSlots(ops.map { case (loc, transform) =>
      () => prepareTableSlot(loc, transform)
    }, attempts)
  }

  /** One TABLE commit as a mixed-transaction claim slot. */
  private[graft] def prepareTableSlot(loc: String,
      transform: TableMetadata => TableMetadata): PreparedSlot = {
    val p = prepare(transform(read(loc)))
    PreparedSlot(metadataPath(p.meta.location, p.next), p.content,
      p.meta.location, p.next, () => finish(p))
  }

  /** The generic heart of [[commitAll]]: commit an arbitrary SLOT SET
    * atomically. Tables and VIEWS route their documents through the
    * same claim primitives, so a slot set can mix them — the DDL +
    * dependent-view-repair shape (see
    * [[graft.catalog.GraftCatalog.transactTransforms]]) publishes a
    * column rename and the view's redefinition together, closing the
    * reader window that would otherwise see the renamed table with the
    * stale view SQL. Each preparation thunk re-runs against fresh
    * state on contention (the commitRetry rebase contract); the
    * terminal conflict names the slot that actually lost. Returns each
    * slot's committed version, in input order.
    */
  private[graft] def commitSlots(preps: Seq[() => PreparedSlot],
      attempts: Int = 20): Seq[Int] = {
    require(preps.nonEmpty, "empty transaction")
    var n = 0
    while (true) {
      val slots = preps.map(_())
      require(slots.map(_.path).distinct.size == slots.size,
        "a transaction may touch each document once (compose the transforms)")
      io.claimAll(slots.map(s => s.path -> s.content)) match {
        case ClaimAllWon =>
          slots.foreach(_.onWin())
          return slots.map(_.next)
        case ClaimAllLost(slot) =>
          n += 1
          if (n >= attempts) {
            // name the document that ACTUALLY conflicted (the backend
            // reports the losing slot) — a contended transaction's
            // terminal error pointing at an arbitrary member misdirects
            // whoever debugs it
            val loser = slot.flatMap(s => slots.find(_.path == s))
              .getOrElse(slots.head)
            throw new CommitConflictException(loser.location, loser.next)
          }
          Thread.sleep(1L + scala.util.Random.nextInt(1 << math.min(n, 5)))
      }
    }
    Seq.empty // unreachable
  }

  /** Optimistic read-transform-write: `transform` re-runs against the
    * latest metadata on every attempt, so each operation's rebase
    * policy (or refusal — throwing from `transform` aborts the loop)
    * decides what a concurrent commit means for it. Snapshots are never
    * lost: the commit either lands on top of the racing one or fails
    * loudly after `attempts` conflicts.
    */
  def commitRetry(location: String, attempts: Int = 20)(
      transform: TableMetadata => TableMetadata): Int = {
    var n = 0
    while (true) {
      val cur = read(location)
      try return commit(transform(cur))
      catch {
        case e: CommitConflictException =>
          n += 1
          if (n >= attempts) throw e
          // jittered exponential backoff de-synchronizes symmetric
          // racers (two writers in lockstep could otherwise trade
          // conflicts for many rounds)
          Thread.sleep(1L + scala.util.Random.nextInt(1 << math.min(n, 5)))
      }
    }
    -1 // unreachable
  }

  /** Atomic hint swap that only ever advances this hint. A racing pair
    * can still interleave check-and-move; the forward probe in
    * [[currentVersion]] heals any transient regression.
    */
  private def advanceHint(location: String, next: Int): Unit = {
    val p = hintPath(location)
    val stale = io.exists(p) && io.readString(p).trim.toInt >= next
    if (!stale) io.replaceAtomic(p, next.toString)
  }
}
