package graft.tableformat

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths,
  StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Storage seam for everything the table format persists — metadata
  * documents, manifests, manifest lists, view documents, hint files —
  * and for the engine's physical file maintenance (orphan GC, CoW
  * cleanup, footer sizing). The reference's own deployment targets
  * object storage (docker-compose.yml:47 configures S3FileIO against
  * MinIO), where link(2) and atomic rename do not exist; this interface
  * is the one place a deployment swaps the strategy.
  *
  * Contract (all paths are absolute strings; parent "directories" are
  * created implicitly by writes — object stores have no directories):
  *
  *   - [[claim]] is the COMMIT PRIMITIVE: atomically create `path` with
  *     `content` iff nothing exists there; `false` means a racer owns
  *     the slot. A path that becomes visible is complete — readers can
  *     never observe a torn file. Local impl: full write to a temp
  *     file, then link(2) (EEXIST = lost the race). Object stores:
  *     conditional PUT — `If-None-Match: *` on S3 (supported natively
  *     since 2024) and Azure Blob, `x-goog-if-generation-match: 0` on
  *     GCS. A store without conditional PUT cannot run this protocol
  *     against bare storage and needs a catalog service to arbitrate
  *     commits (the Iceberg REST-catalog strategy) — implement claim
  *     against the catalog's compare-and-swap instead.
  *   - [[replaceAtomic]] swaps a whole file so readers see old or new,
  *     never a tear. Local: temp + ATOMIC_MOVE. Object stores: a PUT
  *     is already atomic per key.
  *   - [[listRecursive]] returns only regular FILES (object-store LIST
  *     semantics: every key is a file).
  *   - reads of a just-claimed path must see its content
  *     (read-after-write consistency — S3/GCS/Azure all provide it).
  *
  * Parquet data I/O does NOT route through here: the engine reads and
  * writes data files via Spark → Hadoop FileSystem, which already has
  * production object-store connectors (s3a, gs, abfs). This seam
  * covers exactly the bytes the metadata layer moves itself.
  */
/** Outcome of [[FileIO.recoverRename]]: which way a crashed rename was
  * resolved, and the source location it was moving from.
  */
sealed trait RenameRecovery { def fromDir: String }
/** The copy phase had completed (completion marker present): the
  * destination is whole, so recovery finished deleting the source.
  */
final case class RenameRolledForward(fromDir: String) extends RenameRecovery
/** The copy phase was still in flight: the destination's partial
  * copies were deleted; the source remains the table, untouched.
  */
final case class RenameRolledBack(fromDir: String) extends RenameRecovery

/** Outcome of [[FileIO.claimAll]]: won the whole slot set, or lost —
  * with the conflicting slot named when the backend can tell, so a
  * contended multi-table transaction's terminal error can point at the
  * table that actually conflicted instead of an arbitrary member.
  */
sealed trait ClaimAllResult
case object ClaimAllWon extends ClaimAllResult
final case class ClaimAllLost(conflictSlot: Option[String])
    extends ClaimAllResult

trait FileIO {
  def readString(path: String): String
  /** Line iterator for JSON-lines manifests. */
  def readLines(path: String): Vector[String]
  /** Non-atomic write for immutable side files whose VISIBILITY is
    * governed elsewhere (a manifest is unreachable until the metadata
    * document pointing at it commits via [[claim]]).
    */
  def writeString(path: String, content: String): Unit
  def exists(path: String): Boolean
  def size(path: String): Long
  /** Last-modified epoch millis (object stores: the key's
    * Last-Modified). Powers orphan GC's in-flight-write guard.
    */
  def modifiedMs(path: String): Long
  /** Delete if present; `false` when nothing was there. */
  def delete(path: String): Boolean
  /** Immediate children of a directory (files and prefixes), absolute
    * paths; empty when the directory does not exist.
    */
  def listDir(dir: String): Vector[String]
  /** Every regular file under `dir`, recursively; empty when absent. */
  def listRecursive(dir: String): Vector[String]
  /** Recursive removal of a location (drop table/view). */
  def deleteTree(dir: String): Unit
  /** Atomic create-if-absent; see the trait doc. */
  def claim(path: String, content: String): Boolean
  /** Atomic full-file replace; see the trait doc. */
  def replaceAtomic(path: String, content: String): Unit
  /** Atomically claim EVERY (path, content) slot, or none — the
    * MULTI-TABLE TRANSACTION primitive (commit two tables' next
    * versions together or not at all). Only a catalog-arbitrated
    * backend can provide it: one CAS at the catalog covers the whole
    * slot set, so readers never observe one table's commit without the
    * others'. Bare stores (conditional PUT, POSIX link) have no atomic
    * multi-key claim — sequential claims with rollback would both leak
    * a transient single-table commit to readers and delete a version
    * document a reader may already have seen — so the default REFUSES,
    * mirroring Iceberg, where multi-table transactions are a
    * REST-catalog capability.
    */
  def claimAll(entries: Seq[(String, String)]): ClaimAllResult =
    throw new UnsupportedOperationException(
      "multi-table transactions require catalog commit arbitration " +
        "(GRAFT_FILEIO=catalog:<port>); bare stores have no atomic " +
        "multi-key claim")
  /** Commit slots currently CLAIMED at the arbiter for paths under
    * `prefix` — catalog backends only (bare stores have no slot state
    * beyond the keys themselves, hence the empty default). The rename
    * protocol consults this at its destination: a claimed slot whose
    * publish PUT hasn't landed is a committed table version no key
    * LIST can see.
    */
  private[tableformat] def claimedSlotsUnder(prefix: String): Vector[String] =
    Vector.empty
  /** Byte-exact single-file copy; `dst` is overwritten if present and
    * becomes visible complete or not at all (readers never observe a
    * torn copy). Data files are binary — the bytes must never
    * round-trip through strings. Real object stores provide this
    * SERVER-SIDE (S3 CopyObject, GCS rewrite, Azure Copy Blob), so the
    * engine's physical maintenance that moves whole files — clone
    * rehoming, copy-based rename — must route through this seam: a raw
    * java.nio copy would both assume POSIX atomic-move (which object
    * stores lack) and stage in-flight bytes inside the key namespace,
    * where a concurrent LIST would see them as phantom keys.
    */
  def copy(src: String, dst: String): Unit
  /** Move every key under `fromDir` to the same relative key under
    * `toDir` (ALTER TABLE/VIEW RENAME). Fails if the destination
    * already holds anything; the destination check-and-take is ATOMIC
    * on every backend (POSIX: mkdir(2) claim + one rename(2); object
    * stores: a conditional-PUT/CAS claim marker — see
    * ObjectStoreFileIO.renameVia). Object stores still have no rename
    * primitive, so the move itself is COPY per key then DELETE (what
    * Hadoop s3a does) staged behind claim/completion markers: a crash
    * at any point is detected and repaired by [[recoverRename]], and
    * pointer-file ordering keeps either location from ever resolving
    * to a table whose version files are missing.
    */
  def rename(fromDir: String, toDir: String): Unit
  /** Repair a crashed non-atomic [[rename]] whose DESTINATION was
    * `dir`, using the markers the copy protocol staged there: claim
    * marker present + completion marker present → roll FORWARD (finish
    * deleting the source — the destination is already whole); claim
    * marker alone → roll BACK (delete the partial destination copies —
    * the source is still intact, because source deletion only starts
    * after the completion marker lands). `olderThanMs` guards against
    * repairing a rename that is still RUNNING: markers younger than
    * the window are left alone (pass 0 in single-writer contexts /
    * tests). POSIX backends rename atomically in one rename(2) — there
    * is never anything to recover, hence the default no-op.
    */
  def recoverRename(dir: String, olderThanMs: Long = 0L)
      : Option[RenameRecovery] = None
}

/** POSIX implementation — the link(2) commit protocol the engine has
  * always used, now behind the seam.
  */
object LocalFileIO extends FileIO {
  private def p(s: String): Path = Paths.get(s)

  override def readString(path: String): String = Files.readString(p(path))

  override def readLines(path: String): Vector[String] =
    Files.readAllLines(p(path)).asScala.toVector

  override def writeString(path: String, content: String): Unit = {
    val t = p(path)
    if (t.getParent != null) Files.createDirectories(t.getParent)
    Files.writeString(t, content)
  }

  override def exists(path: String): Boolean = Files.exists(p(path))

  override def size(path: String): Long = Files.size(p(path))

  override def modifiedMs(path: String): Long =
    Files.getLastModifiedTime(p(path)).toMillis

  override def delete(path: String): Boolean = Files.deleteIfExists(p(path))

  override def listDir(dir: String): Vector[String] = {
    val d = p(dir)
    if (!Files.isDirectory(d)) Vector.empty
    else {
      val s = Files.list(d) // must close: holds a directory fd
      try s.iterator().asScala.map(_.toString).toVector
      finally s.close()
    }
  }

  override def listRecursive(dir: String): Vector[String] = {
    val d = p(dir)
    if (!Files.exists(d)) Vector.empty
    else {
      val s = Files.walk(d) // must close: walk holds directory fds
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(_.toString).toVector
      finally s.close()
    }
  }

  override def deleteTree(dir: String): Unit = {
    val d = p(dir)
    if (Files.exists(d)) {
      val s = Files.walk(d)
      val paths = try s.iterator().asScala.toVector.reverse
        finally s.close()
      paths.foreach(Files.deleteIfExists(_))
    }
  }

  override def claim(path: String, content: String): Boolean = {
    val target = p(path)
    Files.createDirectories(target.getParent)
    // write-then-link: the temp file carries the COMPLETE content
    // before the link makes it visible, and link(2) is an atomic
    // create-if-absent — a reader can never observe a torn file and a
    // racing writer can never silently clobber one
    val tmp = Files.createTempFile(target.getParent,
      s".${target.getFileName}-", ".tmp")
    try {
      Files.writeString(tmp, content)
      try { Files.createLink(target, tmp); true }
      catch { case _: FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  override def replaceAtomic(path: String, content: String): Unit = {
    val target = p(path)
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(target.getParent,
      s".${target.getFileName}-", ".tmp")
    try {
      Files.writeString(tmp, content)
      Files.move(tmp, target,
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(tmp)
  }

  override def copy(src: String, dst: String): Unit = {
    val d = p(dst)
    if (d.getParent != null) Files.createDirectories(d.getParent)
    // temp + atomic move: a crashed copy never leaves a torn file a
    // resumed caller would trust by its (wrong) size
    val tmp = Files.createTempFile(d.getParent,
      s".${d.getFileName}-", ".tmp")
    try {
      Files.copy(p(src), tmp, StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, d,
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(tmp)
  }

  override def rename(fromDir: String, toDir: String): Unit = {
    val to = p(toDir)
    if (to.getParent != null) Files.createDirectories(to.getParent)
    // atomic destination claim: NIO's no-replace move is
    // check-then-rename (two racers can pass the check and rename over
    // each other); mkdir(2) IS atomic-exclusive, so the empty claim
    // dir arbitrates and the move then replaces it atomically
    Files.createDirectory(to) // throws FileAlreadyExistsException to losers
    try Files.move(p(fromDir), to,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    catch {
      case e: Throwable =>
        // a failed move must not leave the empty claim directory
        // poisoning the destination (every later rename/create there
        // would throw FileAlreadyExistsException for a location with
        // no table); if the move partially/fully landed the delete
        // fails on non-empty and the original error still propagates
        try Files.deleteIfExists(to)
        catch { case _: java.io.IOException => () }
        throw e
    }
  }
}

/** Object-store-semantics backend: the STRICT S3/GCS/Azure contract,
  * emulated over the local filesystem so the whole engine test matrix
  * can run against it (the reference's own deployment is S3FileIO on
  * MinIO — docker-compose.yml:47,50). Purpose: surface hidden POSIX
  * assumptions in the metadata layer, not to be a performance path.
  *
  * Semantics enforced at the interface (each a real difference from
  * POSIX that has broken lakehouse code in the wild):
  *   - FLAT KEY NAMESPACE: only keys (regular files) exist. A
  *     directory is never an object — [[exists]]/[[size]]/
  *     [[modifiedMs]]/[[delete]] on a directory behave as NoSuchKey
  *     (false / throw / false), even when the local dir is physically
  *     present (e.g. a skeleton left by [[deleteTree]] or created by
  *     a parquet writer).
  *   - LIST derives from keys: [[listDir]] is a prefix+delimiter LIST
  *     (immediate child keys plus common prefixes that contain at
  *     least one key somewhere below); an "empty directory" is
  *     invisible. [[listRecursive]] returns keys only.
  *   - [[deleteTree]] is LIST + per-key DELETE — object stores have no
  *     recursive rm. Local dir skeletons may remain; per the flat-key
  *     rule they are invisible through this interface.
  *   - [[modifiedMs]] truncates to SECONDS: S3's Last-Modified is an
  *     HTTP date with second resolution, so any guard comparing
  *     mtimes (orphan GC's in-flight window) must survive sub-second
  *     truncation.
  *   - [[writeString]]/[[replaceAtomic]] are PUTs: atomic per key
  *     (readers see old or new, never a tear), overwrite allowed.
  *   - [[claim]] is a CONDITIONAL PUT (`If-None-Match: *`): atomic
  *     create-if-absent with full content. The store provides this
  *     server-side; the emulation realizes the same guarantee with
  *     the local kernel's atomic create (write-complete temp +
  *     link(2)) — an implementation detail of the fake "server",
  *     invisible at the interface, which never exposes link/rename.
  *
  * NOT modeled (knowingly): eventual consistency (all three majors
  * are strongly consistent since 2020-2024), multipart-upload
  * partial-object states (a PUT here is all-or-nothing, matching what
  * a completed upload exposes), and request throttling.
  */
final class ObjectStoreFileIO extends FileIO {
  import ObjectStoreFileIO.Staging
  private def p(s: String): Path = Paths.get(s)
  // In-flight PUT bytes live under a staging directory OUTSIDE the
  // emulated key namespace: a real store exposes NOTHING for an
  // incomplete upload, so the temp must not be observable as a
  // phantom key through exists/LIST while it is being written.
  private def inStaging(path: Path): Boolean = {
    var q = path
    while (q != null) {
      if (q.getFileName != null && q.getFileName.toString == Staging)
        return true
      q = q.getParent
    }
    false
  }
  private def requireKey(path: String): Path = {
    val t = p(path)
    if (inStaging(t) || !Files.isRegularFile(t))
      throw new java.nio.file.NoSuchFileException(s"NoSuchKey: $path")
    t
  }
  private def stagedTmp(target: Path): Path = {
    // a key whose own path crosses the staging namespace would succeed
    // on write and then be invisible/unreadable — reject it up front
    if (inStaging(target)) throw new IllegalArgumentException(
      s"'$Staging' is a reserved name in the emulated key namespace: $target")
    val dir = target.getParent.resolve(Staging)
    Files.createDirectories(dir)
    // self-healing: a crashed process's orphaned temps live outside
    // the key namespace where no maintenance path can see them — sweep
    // stale ones (>1h; any live PUT finishes in seconds) whenever a
    // new PUT touches the same staging dir
    try {
      val cutoff = System.currentTimeMillis() - 3600L * 1000
      val s = Files.list(dir)
      val stale = try s.iterator().asScala.filter(q =>
        Files.isRegularFile(q) &&
          Files.getLastModifiedTime(q).toMillis < cutoff).toVector
      finally s.close()
      stale.foreach(q => try Files.deleteIfExists(q) catch {
        case _: java.io.IOException => ()
      })
    } catch { case _: java.io.IOException => () }
    Files.createTempFile(dir, s"${target.getFileName}-", ".put")
  }

  /** Every regular file under `root` OUTSIDE staging subtrees, never
    * descending into them — a LIST racing an in-flight PUT must not
    * fail because the walker statted a temp that vanished mid-walk
    * (a real store's LIST never errors on a concurrent upload).
    */
  private def walkKeys(root: Path): Vector[String] = {
    val out = Vector.newBuilder[String]
    Files.walkFileTree(root, new java.nio.file.SimpleFileVisitor[Path] {
      import java.nio.file.{FileVisitResult, attribute}
      override def preVisitDirectory(d: Path,
          a: attribute.BasicFileAttributes): FileVisitResult =
        if (d.getFileName != null && d.getFileName.toString == Staging)
          FileVisitResult.SKIP_SUBTREE
        else FileVisitResult.CONTINUE
      override def visitFile(f: Path,
          a: attribute.BasicFileAttributes): FileVisitResult = {
        if (a.isRegularFile) out += f.toString
        FileVisitResult.CONTINUE
      }
      override def visitFileFailed(f: Path,
          e: java.io.IOException): FileVisitResult =
        FileVisitResult.CONTINUE // vanished mid-walk = not a key
    })
    out.result()
  }

  override def readString(path: String): String =
    Files.readString(requireKey(path))

  override def readLines(path: String): Vector[String] =
    Files.readAllLines(requireKey(path)).asScala.toVector

  override def writeString(path: String, content: String): Unit = {
    // PUT: atomic per key, overwrite allowed, implicit "directories";
    // the in-flight bytes stage outside the key namespace (stagedTmp
    // creates the parent chain)
    val t = p(path)
    val tmp = stagedTmp(t)
    try {
      Files.writeString(tmp, content)
      Files.move(tmp, t,
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(tmp)
  }

  override def exists(path: String): Boolean = {
    val t = p(path)
    !inStaging(t) && Files.isRegularFile(t)
  }

  override def size(path: String): Long = Files.size(requireKey(path))

  override def modifiedMs(path: String): Long =
    Files.getLastModifiedTime(requireKey(path)).toMillis / 1000L * 1000L

  override def delete(path: String): Boolean = {
    val t = p(path)
    !inStaging(t) && Files.isRegularFile(t) && Files.deleteIfExists(t)
  }

  override def listDir(dir: String): Vector[String] = {
    // LIST prefix=dir/ delimiter=/: child keys + common prefixes that
    // hold at least one key below. Never trusts directory entries —
    // an empty local dir is not a prefix because no key has it.
    val d = p(dir)
    if (inStaging(d) || !Files.isDirectory(d)) Vector.empty
    else {
      val s = Files.list(d)
      val children = try s.iterator().asScala.toVector finally s.close()
      children.flatMap { c =>
        if (c.getFileName.toString == Staging) None
        else if (Files.isRegularFile(c)) Some(c.toString)
        else if (Files.isDirectory(c) && hasKeyBelow(c)) Some(c.toString)
        else None
      }
    }
  }

  private def hasKeyBelow(d: Path): Boolean = walkKeys(d).nonEmpty

  override def listRecursive(dir: String): Vector[String] = {
    val d = p(dir)
    if (inStaging(d) || !Files.exists(d)) Vector.empty
    else walkKeys(d)
  }

  override def deleteTree(dir: String): Unit = {
    // LIST + per-key DELETE, keys in parallel (a real store batches —
    // S3 DeleteObjects takes 1000 keys per request — and a
    // million-key DROP TABLE must not be a serial driver loop). Then
    // best-effort removal of the local dir skeletons purely as disk
    // hygiene — a real store would have nothing left; the flat-key
    // interface above can't see them either way.
    locally {
      import scala.collection.parallel.CollectionConverters._
      listRecursive(dir).par.foreach(k => Files.deleteIfExists(p(k)))
    }
    val d = p(dir)
    // best-effort skeleton + staging-debris sweep (disk hygiene only —
    // nothing here is visible through the interface); tolerate races
    if (Files.exists(d)) try {
      val s = Files.walk(d)
      val dirs = try s.iterator().asScala.toVector.reverse finally s.close()
      dirs.foreach(q => try Files.deleteIfExists(q) catch {
        case _: java.io.IOException => ()
      })
    } catch { case _: java.io.IOException | _: java.io.UncheckedIOException => () }
  }

  override def claim(path: String, content: String): Boolean = {
    // conditional PUT (If-None-Match: *), emulated server-side: the
    // temp carries COMPLETE content before the atomic create-if-absent,
    // and stages outside the key namespace like every PUT
    val target = p(path)
    val tmp = stagedTmp(target)
    try {
      Files.writeString(tmp, content)
      try { Files.createLink(target, tmp); true }
      catch { case _: FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  override def replaceAtomic(path: String, content: String): Unit =
    writeString(path, content)

  override def copy(src: String, dst: String): Unit = {
    // server-side COPY (S3 CopyObject): atomic per destination key like
    // any PUT; the source must be a visible key, and the in-flight
    // bytes stage OUTSIDE the key namespace — a concurrent LIST never
    // sees a phantom key for a copy in progress
    val s = requireKey(src)
    val d = p(dst)
    val tmp = stagedTmp(d)
    try {
      Files.copy(s, tmp, StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, d,
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(tmp)
  }

  override def rename(fromDir: String, toDir: String): Unit =
    renameVia(this, fromDir, toDir)

  override def recoverRename(dir: String, olderThanMs: Long = 0L)
      : Option[RenameRecovery] = recoverRenameVia(this, dir, olderThanMs)

  /** Test hook: simulate a process crash at a named point inside
    * [[renameVia]] by throwing — the on-disk state is exactly what a
    * kill at that instant leaves (markers included, no cleanup).
    * Points: "mid-copy" (after the first key copied), "before-complete"
    * (all keys copied, completion marker not yet written),
    * "after-complete" (completion marker written, source still intact),
    * "mid-unmark" (claim marker deleted, completion marker still
    * standing — the debris-only window).
    */
  private[graft] var renameCrashPoint: Option[String] = None
  private def crashIfAt(point: String): Unit =
    if (renameCrashPoint.contains(point))
      throw new IllegalStateException(s"simulated crash at $point")

  /** Test hook: runs after the copy phase, before the handshake
    * re-verify — the window where a racing create's withdraw can have
    * deleted a destination key this rename copied (see the re-verify
    * note in [[renameVia]]).
    */
  private[graft] var renameHandshakeHookForTesting: Option[() => Unit] = None

  /** The object-store rename protocol, with commit arbitration routed
    * through `arbiter` (this instance for bare conditional-PUT stores;
    * the [[CatalogFileIO]] wrapper for catalog-CAS stores, so the
    * destination claim and the per-key source deletes keep the
    * catalog's slot state consistent). Object stores have no rename —
    * it is COPY per key then DELETE (what Hadoop s3a does) — so the
    * protocol makes each non-atomic phase crash-recoverable:
    *
    *   1. CLAIM: conditional-PUT a claim marker at the destination
    *      recording the source — the ATOMIC arbitration ADVICE r14
    *      named (two racing renames, or a rename racing a re-rename,
    *      can no longer both pass an exists check and interleave
    *      copies); then verify the destination holds no other keys.
    *   2. COPY every key through the [[copy]] seam (byte-exact,
    *      server-side on a real store — data files are binary and must
    *      never round-trip through strings), plain keys in parallel,
    *      POINTER FILES LAST (version-hint/view-hint): a reader can
    *      never resolve the destination before the versions it points
    *      at are all present.
    *   3. COMPLETION marker: from here the destination is whole and
    *      recovery rolls FORWARD.
    *   4. DELETE the source, pointers FIRST (readers stop resolving
    *      the old location before any version file disappears).
    *   5. UNMARK — claim marker FIRST, then completion marker: a crash
    *      between the two leaves inert done-without-claim debris,
    *      never a claim-without-done state that recovery would
    *      misread as an incomplete copy and roll back.
    *
    * A crash in 2 leaves claim-only → [[recoverRenameVia]] rolls back
    * (destination copies deleted; the untouched source remains the
    * table). A crash in 4-5 leaves both markers → recovery rolls
    * forward (finishes the source delete). The window where both
    * locations hold a complete table (between 2's last copy and 4's
    * first delete) is inherent to copy-based rename; the claim marker
    * keeps it exclusive to ONE rename and recovery resolves it
    * deterministically.
    */
  private[tableformat] def renameVia(arbiter: FileIO, fromDir: String,
      toDir: String): Unit = {
    import ObjectStoreFileIO.{RenameClaimMarker, RenameDoneMarker}
    val claimKey = s"$toDir/$RenameClaimMarker"
    val doneKey = s"$toDir/$RenameDoneMarker"
    if (!arbiter.claim(claimKey, fromDir))
      throw new FileAlreadyExistsException(
        s"rename destination already claimed: $toDir (a concurrent or " +
          "crashed rename holds the marker; recoverRename repairs a " +
          "crashed one)")
    // a stale completion marker can survive a PRIOR rename that crashed
    // between its two unmark deletes (claim first, then done — see
    // below); left standing it would mislead a crash of THIS rename
    // into rolling forward before the copy completed
    delete(doneKey)
    // the emptiness check ignores COMMIT-STAGING artifacts: on the
    // catalog backend every claim (including the destination claim the
    // LOSING rename just made) transiently stages its document under
    // `<dir>/.commit-staging/` before the CAS — a racer's staged bytes
    // are protocol debris, not a table, and counting them made BOTH of
    // two racing renames abort (winner saw the loser's staged doc).
    // Real conflicts stay covered: a table here has version documents
    // and a hint, and an in-flight CREATE is arbitrated by the claim
    // marker plus create's own post-commit withdraw handshake.
    if (listRecursive(toDir).exists(k => k != claimKey && k != doneKey &&
        !k.contains(s"/${ObjectStoreFileIO.CommitStaging}/"))) {
      arbiter.delete(claimKey)
      throw new FileAlreadyExistsException(
        s"rename destination not empty: $toDir")
    }
    val keys = listRecursive(fromDir)
    val (pointers, plain) = keys.partition(isPointerKey)
    // COPY phase, through the [[copy]] seam (server-side COPY on a real
    // store — never raw java.nio). Plain keys are order-independent and
    // copy in PARALLEL: a million-key table rename must saturate the
    // store's concurrency, not run a serial driver loop (on a real
    // cluster this is where a distributed copy job plugs in; the
    // protocol — claim, copy-all-pointers-last, complete — is the
    // same). The protocol's only ordering constraint is POINTERS LAST,
    // so the pointer group stays serial after the parallel group
    // completes. The first plain key copies alone so the mid-copy crash
    // hook stays deterministic ("exactly one key landed").
    def copyKey(k: String): Unit =
      copy(k, s"$toDir/${k.stripPrefix(fromDir).stripPrefix("/")}")
    plain.headOption.foreach { k => copyKey(k); crashIfAt("mid-copy") }
    locally {
      import scala.collection.parallel.CollectionConverters._
      plain.drop(1).par.foreach(copyKey)
    }
    pointers.foreach(copyKey)
    // HANDSHAKE RE-VERIFY: a CREATE racing this rename withdraws by
    // deleting the destination's v1 document / hint pointer, and its
    // delete can land on OUR copy — the withdraw's ownership check
    // (GraftTable.withdrawIfRenameClaimed) closes most of that window
    // from the create's side; this re-copy closes it from the rename's
    // side, so an acknowledged rename is never missing a key. The
    // source is still intact here (deletion starts only after the
    // completion marker), so a re-copy is always possible. O(1) per
    // rename: only the keys a withdraw ever touches.
    renameHandshakeHookForTesting.foreach(_())
    keys.filter(k => isPointerKey(k) ||
        k.endsWith("/v1.metadata.json") || k.endsWith("/v1.view.json"))
      .foreach { k =>
        if (!exists(s"$toDir/${k.stripPrefix(fromDir).stripPrefix("/")}"))
          copyKey(k)
      }
    crashIfAt("before-complete")
    writeString(doneKey, fromDir)
    crashIfAt("after-complete")
    // source delete: POINTERS FIRST (readers stop resolving the old
    // location before any version file disappears), serially — then
    // the order-free plain keys in parallel (same saturation argument
    // as the copy phase; a crash mid-way is rolled forward by recovery
    // whatever subset survived)
    pointers.foreach(arbiter.delete)
    locally {
      import scala.collection.parallel.CollectionConverters._
      plain.par.foreach(k => arbiter.delete(k))
    }
    deleteTree(fromDir)
    // unmark ORDER MATTERS: claim first. A crash between the two
    // deletes then leaves done-without-claim — inert debris recovery
    // sweeps — whereas done-first would leave claim-without-done,
    // which recovery reads as "copy incomplete" and ROLLS BACK,
    // deleting the fully-renamed table after its source is gone.
    arbiter.delete(claimKey)
    crashIfAt("mid-unmark")
    delete(doneKey)
  }

  /** Pointer files resolve a location into a table/view; everything
    * else is only reachable THROUGH them. Copying pointers last /
    * deleting them first is what keeps readers from ever observing a
    * resolvable location whose version files are missing.
    */
  private def isPointerKey(k: String): Boolean =
    k.endsWith("/version-hint.text") || k.endsWith("/view-hint.text")

  private[tableformat] def recoverRenameVia(arbiter: FileIO, dir: String,
      olderThanMs: Long): Option[RenameRecovery] = {
    import ObjectStoreFileIO.{RenameClaimMarker, RenameDoneMarker}
    val claimKey = s"$dir/$RenameClaimMarker"
    val doneKey = s"$dir/$RenameDoneMarker"
    if (!exists(claimKey)) {
      // done-without-claim: the rename COMPLETED and crashed between
      // its two unmark deletes (claim goes first) — inert debris
      delete(doneKey)
      return None
    }
    // age guard: a marker younger than the window may belong to a
    // rename still RUNNING — repairing it would corrupt a live move
    if (olderThanMs > 0 &&
        modifiedMs(claimKey) > System.currentTimeMillis() - olderThanMs)
      return None
    val from = readString(claimKey).trim
    if (exists(doneKey)) {
      // copy phase completed: destination is whole — roll forward by
      // finishing the source delete (pointers first, as rename does;
      // plain keys in parallel, as rename does)
      val (pointers, plain) = listRecursive(from).partition(isPointerKey)
      pointers.foreach(arbiter.delete)
      locally {
        import scala.collection.parallel.CollectionConverters._
        plain.par.foreach(k => arbiter.delete(k))
      }
      deleteTree(from)
      arbiter.delete(claimKey) // claim first — see renameVia's unmark note
      delete(doneKey)
      Some(RenameRolledForward(from))
    } else {
      // copy phase incomplete: the destination holds partial copies
      // and the source is still the intact table — roll back (the
      // copies were plain PUTs, never claimed: no slots to release)
      locally {
        import scala.collection.parallel.CollectionConverters._
        listRecursive(dir).filter(k => k != claimKey && k != doneKey)
          .par.foreach(k => delete(k))
      }
      arbiter.delete(claimKey)
      Some(RenameRolledBack(from))
    }
  }
}

object ObjectStoreFileIO {
  /** Name of the staging directory PUT temps live under — an
    * emulation artifact outside the key namespace, invisible to every
    * interface method.
    */
  private[tableformat] val Staging = ".os-staging"
  /** Rename-protocol marker keys at the DESTINATION location: the
    * claim marker (content = source dir) arbitrates the destination
    * and flags an in-flight/crashed rename; the completion marker
    * records that every key was copied, flipping recovery from
    * roll-back to roll-forward. Visible to the engine ([[private]]
    * to graft) so the integrity audit can report a crashed rename as
    * a finding and `maintain` can invoke the repair.
    */
  private[graft] val RenameClaimMarker = ".rename-claim"
  /** Directory name the catalog backend stages commit documents under
    * (see CatalogFileIO.stagedDocKey) — shared so the rename protocol's
    * destination-emptiness check can recognize a racer's transient
    * staged bytes as protocol debris rather than table contents.
    */
  private[graft] val CommitStaging = ".commit-staging"
  private[graft] val RenameDoneMarker = ".rename-complete"
}

/** Commit arbitration for stores WITHOUT conditional PUT — the Iceberg
  * REST-catalog strategy named in [[FileIO.claim]]'s contract: an
  * external catalog service CASes the commit slot; storage contributes
  * only plain atomic-per-key PUT. [[CatalogCommitServer]] is the toy
  * catalog — a loopback TCP service holding the claimed-slot set, so
  * arbitration works ACROSS PROCESSES (the cross-process commit-race
  * test runs through it).
  *
  * Protocol, one line per connection (fields tab-separated — paths may
  * contain spaces):
  *   - `CLAIM <path>\t<docKey>` → `WIN` (first claimant) or `LOSE`.
  *     The CAS records WHERE the already-durable document lives
  *     (`docKey`), which is what makes the commit recoverable: see the
  *     REST-commit shape on [[CatalogFileIO.claim]];
  *   - `LOOKUP <path>` → `DOC\t<docKey>` or `NONE` — the recorded
  *     document key for a claimed slot (healing reads it to finish a
  *     crashed winner's publish);
  *   - `CLAIMALL <p1>\t<d1>\t<p2>\t<d2>…` → `WIN`/`LOSE` — claim every
  *     slot or none, atomically (multi-table transactions);
  *   - `LISTPREFIX <prefix>` → `PATHS[\t<p>…]` — claimed slots under a
  *     location (rename's pre-copy heal of unpublished commits);
  *   - `RELEASE <path>` → `OK` — frees one slot;
  *   - `RELEASEPREFIX <prefix>` → `OK` — frees every slot under a
  *     location (DROP TABLE/VIEW: a real catalog deletes the table's
  *     entry on drop, freeing the identifier for re-creation — an
  *     append-only slot set would make a dropped location permanently
  *     uncreatable, which the ViewSpec drop-and-replay round-trip
  *     surfaces immediately).
  * A live table's slots are claimed once, ever; release happens only
  * through the deletion paths.
  */
final class CatalogCommitServer {
  private val server = new java.net.ServerSocket(0, 64,
    java.net.InetAddress.getLoopbackAddress)
  // slot path → docKey of the durable document the winner registered
  private val claimed =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  val port: Int = server.getLocalPort

  /** Test hook: process the next CLAIM/CLAIMALL normally but drop the
    * response (close the socket without writing) — the ambiguous-
    * outcome window a real network can produce after the server has
    * already recorded the claim.
    */
  @volatile private[graft] var dropNextClaimResponseForTesting = false

  private val acceptLoop = new Thread(() => {
    try while (!server.isClosed) {
      val sock = server.accept()
      // per-connection handling is tiny (one line in, one word out);
      // a thread per connection keeps the toy simple and race-free
      new Thread(() => {
        try {
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
          val out = sock.getOutputStream
          val line = in.readLine()
          val resp = line match {
            case null => "LOSE\n"
            case l if l.startsWith("CLAIM ") =>
              val body = l.substring(6)
              val tab = body.indexOf('\t')
              val (path, docKey) =
                if (tab < 0) (body, "") else (body.take(tab), body.drop(tab + 1))
              // frame validation: fields are tab-delimited with no
              // escaping, so a docKey carrying another tab means the
              // CLIENT's path embedded one and the frame is ambiguous —
              // refuse loudly rather than record a mis-split slot
              if (path.isEmpty || docKey.contains('\t')) "ERR\tbad-frame\n"
              else
                // synchronized (not bare putIfAbsent): a single-slot
                // claim must not interleave between a CLAIMALL's
                // all-absent check and its puts
                claimed.synchronized {
                  if (claimed.putIfAbsent(path, docKey) == null) "WIN\n"
                  else "LOSE\n"
                }
            case l if l.startsWith("CLAIMALL ") =>
              // multi-table transaction: `CLAIMALL p1\td1\tp2\td2…` —
              // claim EVERY slot or none, atomically (one monitor holds
              // the whole check-then-put); this single CAS is what
              // makes a two-table commit all-or-nothing. A lost CAS
              // names the first conflicting slot so the client's
              // terminal conflict error can point at the right table.
              val parts = l.substring(9).split('\t')
              if (parts.length < 2 || parts.length % 2 != 0 ||
                  parts.exists(_.isEmpty)) "ERR\tbad-frame\n"
              else {
                val pairs = parts.grouped(2).map(a => (a(0), a(1))).toVector
                claimed.synchronized {
                  pairs.find(p => claimed.containsKey(p._1)) match {
                    case Some((slot, _)) => s"LOSE\t$slot\n"
                    case None =>
                      pairs.foreach(p => claimed.put(p._1, p._2)); "WIN\n"
                  }
                }
              }
            case l if l.startsWith("LOOKUP ") =>
              claimed.get(l.substring(7)) match {
                case null => "NONE\n"
                case doc  => s"DOC\t$doc\n"
              }
            case l if l.startsWith("LISTPREFIX ") =>
              // claimed slots under a location — rename's pre-copy heal
              // enumerates these to publish any commit that won its CAS
              // but crashed before the publish PUT (the copy phase moves
              // KEYS; an unpublished document isn't a key yet)
              val pfx = l.substring(11)
              val hits = {
                val b = Vector.newBuilder[String]
                claimed.forEach((k, _) =>
                  if (k == pfx || k.startsWith(pfx + "/")) b += k)
                b.result()
              }
              ("PATHS" +: hits).mkString("\t") + "\n"
            case l if l.startsWith("RELEASE ") =>
              claimed.remove(l.substring(8)); "OK\n"
            case l if l.startsWith("RELEASEPREFIX ") =>
              val p = l.substring(14)
              claimed.keySet.removeIf(k => k == p || k.startsWith(p + "/"))
              "OK\n"
            case _ => "LOSE\n"
          }
          val drop = dropNextClaimResponseForTesting && line != null &&
            (line.startsWith("CLAIM ") || line.startsWith("CLAIMALL "))
          if (drop) dropNextClaimResponseForTesting = false
          else { out.write(resp.getBytes("UTF-8")); out.flush() }
        } catch { case _: java.io.IOException => () }
        finally sock.close()
      }).start()
    } catch { case _: java.io.IOException => () /* closed */ }
  }, "graft-catalog-commit-server")
  acceptLoop.setDaemon(true)
  acceptLoop.start()

  def close(): Unit = server.close()
}

/** FileIO for a store without conditional PUT: every operation is the
  * plain object-store contract ([[ObjectStoreFileIO]]); [[claim]]
  * routes its atomicity through a [[CatalogCommitServer]] CAS using
  * the REAL REST-catalog commit shape (Iceberg's): the document is
  * made durable FIRST under a never-contended unique key, and the CAS
  * — which records that key — is the commit itself. A winner that
  * crashes before publishing the document at its canonical path no
  * longer wedges the table: the content already exists, the catalog
  * knows where, and the NEXT writer's losing claim heals the slot by
  * publishing it (see [[claim]]); a crash before the CAS leaves only
  * an orphan staged file, swept with the table's other orphans.
  */
final class CatalogFileIO(host: String, port: Int) extends FileIO {
  private val store = new ObjectStoreFileIO
  /** Test hook: the underlying store, so specs can arm its rename
    * crash points through this wrapper.
    */
  private[graft] def storeForTesting: ObjectStoreFileIO = store

  private def send(cmd: String): String = {
    val sock = new java.net.Socket(host, port)
    try {
      sock.getOutputStream.write(s"$cmd\n".getBytes("UTF-8"))
      sock.getOutputStream.flush()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
      in.readLine()
    } finally sock.close()
  }

  /** [[send]] for the CLAIM/CLAIMALL round-trips, where a transport
    * failure is AMBIGUOUS (the server records the claim before writing
    * the response, so a dropped connection may hide a WIN): None =
    * outcome unknown, resolve via LOOKUP — never assume LOSE.
    */
  private def sendOpt(cmd: String): Option[String] =
    try Option(send(cmd)) catch { case _: java.io.IOException => None }

  /** The wire protocol frames commands as one tab-delimited line with
    * no escaping — a path carrying a tab or newline would mis-frame
    * the command (the server would record a mis-split slot). Locations
    * are engine-generated, so this is a loud refusal, not a feature.
    */
  private def requireFrameSafe(path: String): Unit =
    require(!path.exists(c => c == '\t' || c == '\n' || c == '\r'),
      s"path not representable on the catalog wire protocol " +
        s"(embedded tab/newline): ${path.replace("\t", "\\t")
          .replace("\n", "\\n").replace("\r", "\\r")}")

  /** The docKey the catalog has recorded for a slot, if claimed. Used
    * to resolve an ambiguous CLAIM outcome — so this one must NOT
    * swallow transport errors: with the claim outcome unknown, a
    * failed LOOKUP means the commit outcome is unknowable right now
    * and the caller must fail loudly rather than guess.
    */
  private def recordedDoc(path: String): Option[String] =
    send(s"LOOKUP $path") match {
      case s if s != null && s.startsWith("DOC\t") => Some(s.substring(4))
      case _ => None
    }

  /** Test hook: throw right after winning the CAS, before the publish
    * PUT — the exact crash window the REST-commit shape exists to
    * close. Disk + catalog state is what a kill there leaves.
    */
  private[graft] var crashAfterCasForTesting: Boolean = false

  /** Test hook: throw after the FIRST slot's publish PUT inside a
    * multi-table [[claimAll]] — the mid-publish-loop window where one
    * table's canonical document is visible as a key and the rest are
    * staged-only (readable only through per-slot healing).
    */
  private[graft] var crashMidPublishForTesting: Boolean = false

  /** Unique, never-contended staging key beside the slot: same table
    * location (deleteTree/drop cleans it; orphan GC's name filters
    * never match it), unique suffix so no two commits ever collide on
    * it.
    */
  private def stagedDocKey(path: String): String = {
    val slash = path.lastIndexOf('/')
    val (dir, name) = (path.take(slash), path.drop(slash + 1))
    s"$dir/${ObjectStoreFileIO.CommitStaging}/$name.${java.util.UUID.randomUUID()}"
  }

  override def claim(path: String, content: String): Boolean = {
    // REST-catalog commit shape: 1. the document lands durable under a
    // unique staged key (plain PUT, uncontended by construction);
    // 2. the catalog CAS — recording the staged key — IS the commit;
    // 3. the winner publishes the bytes at the canonical path and
    // drops the staging copy. A crash between 2 and 3 is recoverable
    // by ANYONE (the content is durable and the catalog knows where),
    // and losers do exactly that before reporting the conflict — so
    // the very next writer both heals the crashed commit and rebases
    // onto it.
    requireFrameSafe(path)
    val docKey = stagedDocKey(path)
    store.writeString(docKey, content)
    def won(): Boolean = {
      if (crashAfterCasForTesting)
        throw new IllegalStateException(
          "simulated crash between catalog CAS and publish PUT")
      store.writeString(path, content)
      store.delete(docKey)
      true
    }
    def lost(): Boolean = {
      store.delete(docKey)
      healUnpublished(path)
      false
    }
    sendOpt(s"CLAIM $path\t$docKey") match {
      case Some("WIN") => won()
      case Some(_)     => lost()
      case None =>
        // AMBIGUOUS: the connection failed, but the server records the
        // claim BEFORE responding — deleting the staged doc on a hidden
        // WIN would leave the slot claimed with a dangling docKey,
        // wedging the table until manual RELEASE. LOOKUP resolves it:
        recordedDoc(path) match {
          case Some(d) if d == docKey => won() // hidden WIN: finish it
          case Some(_)                => lost() // another writer owns it
          case None =>
            // nothing recorded — the claim line never reached the
            // server, unless its handler thread is still parked before
            // the put. Re-probe once after a beat to close that
            // window, then treat persistent NONE as a lost claim. The
            // staged doc is deliberately RETAINED: should the claim
            // still land late, any reader's heal publishes from it;
            // if not, it is swept with the table's orphans.
            Thread.sleep(50L)
            recordedDoc(path) match {
              case Some(d) if d == docKey => won()
              case Some(_)                => lost()
              case None                   => false
            }
        }
    }
  }

  /** Multi-table transaction: the same REST commit shape as [[claim]],
    * lifted to a slot SET — every document lands durable under its
    * unique staged key first, then ONE catalog CAS (`CLAIMALL`) claims
    * all the slots or none. The CAS is the commit for the whole set:
    * a winner that crashes before publishing any subset of the
    * documents is healed per-slot exactly like a single-table commit
    * (readers' exists-probe and the next writer's losing claim both
    * consult the catalog, which knows every staged key), so no reader
    * can observe one table's commit without the others'.
    */
  override def claimAll(entries: Seq[(String, String)]): ClaimAllResult = {
    require(entries.nonEmpty, "empty transaction")
    entries.foreach { case (path, _) => requireFrameSafe(path) }
    val staged = entries.map { case (path, content) =>
      val docKey = stagedDocKey(path)
      store.writeString(docKey, content)
      (path, content, docKey)
    }
    val cmd = "CLAIMALL " +
      staged.map { case (p, _, k) => s"$p\t$k" }.mkString("\t")
    def won(): ClaimAllResult = {
      if (crashAfterCasForTesting)
        throw new IllegalStateException(
          "simulated crash between catalog CAS and publish PUTs")
      staged.zipWithIndex.foreach { case ((path, content, docKey), i) =>
        store.writeString(path, content)
        store.delete(docKey)
        if (crashMidPublishForTesting && i == 0)
          throw new IllegalStateException(
            "simulated crash between per-slot publish PUTs")
      }
      ClaimAllWon
    }
    def lost(slot: Option[String]): ClaimAllResult = {
      staged.foreach { case (_, _, docKey) => store.delete(docKey) }
      entries.foreach { case (path, _) => healUnpublished(path) }
      ClaimAllLost(slot)
    }
    // CLAIMALL is atomic server-side, so ONE slot's recorded docKey
    // resolves an ambiguous outcome for the whole set: either every
    // slot records our staged keys (hidden WIN) or none do.
    def resolve(): ClaimAllResult = recordedDoc(staged.head._1) match {
      case Some(d) if d == staged.head._3 => won()
      case Some(_)                        => lost(Some(staged.head._1))
      case None =>
        // persistent NONE = the CAS never registered (same retained-
        // staged-docs contract as the single-slot claim: a late-landing
        // CAS is healable from the staged docs; otherwise orphan-swept)
        ClaimAllLost(None)
    }
    sendOpt(cmd) match {
      case Some("WIN") => won()
      case Some(resp) if resp != null && resp.startsWith("LOSE\t") =>
        lost(Some(resp.substring(5)))
      case Some(_) => lost(None)
      case None    => Thread.sleep(50L); resolve()
    }
  }

  /** A claimed slot whose canonical path is missing is a crashed
    * winner's commit: publish the registered document for it (PUTs are
    * idempotent here — every healer and a slow winner all write the
    * same committed bytes), so readers' forward probe and the caller's
    * commit retry both see the version the catalog says exists.
    *
    * Until healed, the crashed commit's DATA files are unreferenced by
    * any visible version — exactly the in-flight-write window orphan
    * GC's age guard exists for (GraftTable.removeOrphanFiles,
    * `older_than` default 3 days): an aged GC never reclaims them
    * before any plausible heal. The staged DOCUMENT itself is likewise
    * GC-protected while its canonical version is missing.
    */
  private def healUnpublished(path: String): Unit =
    if (!store.exists(path)) send(s"LOOKUP $path") match {
      case s if s != null && s.startsWith("DOC\t") =>
        val docKey = s.substring(4)
        if (docKey.nonEmpty && store.exists(docKey))
          try store.writeString(path, store.readString(docKey))
          catch { case _: java.io.IOException => () } // raced: another healer finished
      case _ => ()
    }

  override def readString(path: String): String = store.readString(path)
  override def readLines(path: String): Vector[String] = store.readLines(path)
  override def writeString(path: String, content: String): Unit =
    store.writeString(path, content)
  /** Version-document paths heal on an exists miss: readers probe
    * forward from the hint (MetadataIO.currentVersion / ViewIO), and
    * the probe's terminal miss is exactly where a crashed winner's
    * unpublished commit hides — one catalog LOOKUP there makes the
    * commit READ-visible without waiting for the next writer, the same
    * way a real REST catalog's readers see the current pointer on
    * every table load. Cost: one round-trip per metadata read (probes
    * always end in a miss); non-version paths (data files, manifests —
    * the high-volume exists traffic) never pay it.
    */
  override def exists(path: String): Boolean =
    store.exists(path) ||
      (CatalogFileIO.VersionDoc.matches(path) && {
        healUnpublished(path); store.exists(path)
      })
  override def size(path: String): Long = store.size(path)
  override def modifiedMs(path: String): Long = store.modifiedMs(path)
  // deletions free the catalog's commit slots (a real catalog deletes
  // the table entry on drop) — otherwise a dropped location could
  // never be re-created
  override def delete(path: String): Boolean = {
    send(s"RELEASE $path"); store.delete(path)
  }
  // rename routes its destination claim AND its per-key source deletes
  // through THIS instance (the arbiter) so the destination is CASed at
  // the catalog — not via the store's conditional PUT, which this
  // backend's premise says does not exist — and the moved-away
  // location's slots free as its keys delete; the prefix release then
  // sweeps anything left (a later CREATE at the old location must be
  // able to claim v1 again — a real catalog updates the table entry's
  // identifier on rename)
  override private[tableformat] def claimedSlotsUnder(
      prefix: String): Vector[String] =
    send(s"LISTPREFIX $prefix") match {
      case s if s != null && s.startsWith("PATHS") =>
        s.split('\t').drop(1).filter(_.nonEmpty).toVector
      case _ => Vector.empty
    }

  override def rename(fromDir: String, toDir: String): Unit = {
    // PRE-COPY HEAL: a commit that won its CAS but crashed before the
    // publish PUT is readable only through the catalog's slot record —
    // and the copy phase moves KEYS, so an unpublished version document
    // would not travel, and the prefix release below would then destroy
    // the only pointer to its staged bytes: the moved table would
    // silently lose its latest committed version. Publish every claimed
    // slot under the source first (no-op when all are published).
    claimedSlotsUnder(fromDir).foreach(healUnpublished)
    // DESTINATION claimed slots = a commit landed there (a create that
    // crashed or stalled between its CAS and publish PUT): the key LIST
    // inside renameVia cannot see it, the rename would proceed, and the
    // slow winner's later publish PUT would clobber the renamed table's
    // copied document — with its marker-gated withdraw never firing.
    // HEAL-THEN-REFUSE: publish the claimed document (so the committed
    // version survives as a real key any retry's emptiness check sees)
    // and abort. Rename-protocol marker slots are renameVia's own
    // arbitration, handled by its claim — not destination contents.
    val claimedAtDest = claimedSlotsUnder(toDir).filterNot(k =>
      k.endsWith("/" + ObjectStoreFileIO.RenameClaimMarker) ||
        k.endsWith("/" + ObjectStoreFileIO.RenameDoneMarker))
    if (claimedAtDest.nonEmpty) {
      claimedAtDest.foreach(healUnpublished)
      throw new FileAlreadyExistsException(
        s"rename destination not empty: $toDir holds claimed commit " +
          s"slots (${claimedAtDest.head})")
    }
    store.renameVia(this, fromDir, toDir)
    send(s"RELEASEPREFIX $fromDir")
  }
  override def recoverRename(dir: String, olderThanMs: Long = 0L)
      : Option[RenameRecovery] = {
    val r = store.recoverRenameVia(this, dir, olderThanMs)
    // roll-forward finishes deleting the SOURCE: free its slots too
    r.collect { case RenameRolledForward(from) =>
      send(s"RELEASEPREFIX $from")
    }
    r
  }
  override def listDir(dir: String): Vector[String] = store.listDir(dir)
  override def listRecursive(dir: String): Vector[String] =
    store.listRecursive(dir)
  override def deleteTree(dir: String): Unit = {
    send(s"RELEASEPREFIX $dir"); store.deleteTree(dir)
  }
  override def replaceAtomic(path: String, content: String): Unit =
    store.replaceAtomic(path, content)
  override def copy(src: String, dst: String): Unit = store.copy(src, dst)
}

object CatalogFileIO {
  /** Table/view version documents — the only paths whose exists-miss
    * consults the catalog for an unpublished commit.
    */
  private val VersionDoc =
    """.*/v\d+\.(metadata|view)\.json""".r
}

object FileIO {
  @volatile private var current: FileIO = LocalFileIO

  /** The installed backend. Resolved per call (not captured) so an
    * [[install]] applies to every subsequent operation.
    */
  def io: FileIO = current

  /** Swap the storage backend (tests, object-store deployments).
    * JVM-global by design: metadata paths cross module boundaries
    * (catalog → engine → tableformat) as plain strings, and a mixed
    * backend would corrupt the commit protocol.
    */
  def install(impl: FileIO): Unit = { current = impl }

  /** Install the backend named by the `GRAFT_FILEIO` env var:
    * `objectstore`, `catalog:<port>` (loopback [[CatalogCommitServer]]),
    * anything else / unset keeps [[LocalFileIO]]. Forked child JVMs
    * (the cross-process commit-race tests) call this at startup so
    * both sides of the race run the same storage semantics.
    */
  def installFromEnv(): Unit =
    // blank = unset (a shell wrapper's `GRAFT_FILEIO=` means "default",
    // not "crash the session")
    sys.env.get("GRAFT_FILEIO").map(_.trim).filter(_.nonEmpty)
      .foreach(installNamed)

  /** [[installFromEnv]]'s parser, callable directly (tests, embedders). */
  def installNamed(name: String): Unit = name match {
    case "objectstore" => install(new ObjectStoreFileIO)
    case "local"       => install(LocalFileIO)
    case s if s.startsWith("catalog:") =>
      install(new CatalogFileIO("127.0.0.1", s.stripPrefix("catalog:").toInt))
    case other =>
      // the env var selects the COMMIT PROTOCOL — an explicit but
      // unrecognized value must fail fast, not silently run the POSIX
      // link(2) protocol on what the operator believes is object store
      throw new IllegalArgumentException(
        s"GRAFT_FILEIO='$other' not recognized; use 'objectstore', " +
          "'catalog:<port>', or 'local'")
  }
}
