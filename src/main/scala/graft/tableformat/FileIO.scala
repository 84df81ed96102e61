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
}
