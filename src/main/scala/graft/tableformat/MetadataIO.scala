package graft.tableformat

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** JSON persistence for TableMetadata: metadata/vN.metadata.json plus
  * version-hint.text (the reference's layout — apiv15.py:41-43 reads the
  * hint, then v{N}.metadata.json; SURVEY.md H1).
  *
  * Commits are last-step-atomic: the new metadata JSON is fully written
  * before the hint is swapped via atomic move, so a reader never observes
  * a torn document. Single-writer assumption (as in the reference,
  * single-user local catalog) — documented, not enforced.
  */
object MetadataIO {
  implicit private val formats: Formats = DefaultFormats

  private def metadataDir(location: String): Path = Paths.get(location, "metadata")
  private def hintPath(location: String): Path =
    metadataDir(location).resolve("version-hint.text")

  def currentVersion(location: String): Option[Int] = {
    val p = hintPath(location)
    if (Files.exists(p)) Some(Files.readString(p).trim.toInt) else None
  }

  def metadataPath(location: String, version: Int): Path =
    metadataDir(location).resolve(s"v$version.metadata.json")

  def read(location: String): TableMetadata = {
    val v = currentVersion(location)
      .getOrElse(sys.error(s"no version-hint.text under $location"))
    readVersion(location, v)
  }

  def readVersion(location: String, version: Int): TableMetadata = {
    val json = Files.readString(metadataPath(location, version))
    JsonMethods.parse(json).extract[TableMetadata]
  }

  def exists(location: String): Boolean = Files.exists(hintPath(location))

  /** Write metadata as the next version and swap the hint atomically.
    * Returns the committed version number.
    */
  def commit(meta: TableMetadata): Int = {
    val dir = metadataDir(meta.location)
    Files.createDirectories(dir)
    val next = currentVersion(meta.location).getOrElse(0) + 1
    val withLog = meta.copy(metadataLog = meta.metadataLog :+
      MetadataLogEntry(System.currentTimeMillis(), s"v$next.metadata.json"))
    // CREATE_NEW: two writers racing from the same base version both try
    // to write v(N+1) — the loser fails loudly instead of clobbering
    // (commits are last-writer-FAILS, never last-writer-wins)
    Files.writeString(metadataPath(meta.location, next),
      Serialization.writePretty(withLog),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    val tmp = dir.resolve(s".version-hint.$next.tmp")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, hintPath(meta.location),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    next
  }
}
