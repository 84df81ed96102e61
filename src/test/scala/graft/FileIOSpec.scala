package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.CompletableFuture
import java.util.concurrent.atomic.AtomicLong
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.catalog.GraftCatalog
import graft.tableformat.{FileIO, LocalFileIO, MetadataIO, TableMetadata}

/** The storage seam: every byte the metadata layer moves goes through
  * [[FileIO]], the claim primitive carries the commit protocol's
  * atomicity, and an installed wrapper observes ALL of the engine's
  * metadata traffic (the proof that no code path bypasses the seam).
  */
class FileIOSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", Some(4))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String =
    Files.createTempDirectory("graft-fio").toString

  test("claim: atomic create-if-absent, complete content, loser loses") {
    val dir = tmp()
    val p = s"$dir/slot.json"
    assert(LocalFileIO.claim(p, "first"))
    assert(!LocalFileIO.claim(p, "second"))
    assert(LocalFileIO.readString(p) == "first")
    // racing claims on a fresh slot: exactly one winner
    val p2 = s"$dir/race.json"
    val wins = (0 until 16).map { i =>
      CompletableFuture.supplyAsync { () =>
        if (LocalFileIO.claim(p2, s"w$i")) 1 else 0
      }
    }.map(_.join()).sum
    assert(wins == 1)
    // no temp-file debris after the losers clean up
    val debris = LocalFileIO.listDir(dir)
      .map(q => q.substring(q.lastIndexOf('/') + 1))
      .filter(_.startsWith("."))
    assert(debris.isEmpty, debris.toString)
  }

  test("replaceAtomic swaps whole files; listRecursive sees only files") {
    val dir = tmp()
    val p = s"$dir/a/b/hint.text"
    LocalFileIO.replaceAtomic(p, "1")
    LocalFileIO.replaceAtomic(p, "2")
    assert(LocalFileIO.readString(p) == "2")
    LocalFileIO.writeString(s"$dir/a/c/x.parquet", "data")
    val all = LocalFileIO.listRecursive(dir)
    assert(all.toSet == Set(s"$dir/a/b/hint.text", s"$dir/a/c/x.parquet"))
    assert(LocalFileIO.listRecursive(s"$dir/missing").isEmpty)
    LocalFileIO.deleteTree(dir)
    assert(!LocalFileIO.exists(p) && !Files.exists(Paths.get(dir)))
  }

  /** Counts every operation, delegating to local storage. */
  private final class CountingIO extends FileIO {
    val reads = new AtomicLong; val writes = new AtomicLong
    val claims = new AtomicLong; val deletes = new AtomicLong
    val lists = new AtomicLong
    override def readString(p: String) = { reads.incrementAndGet(); LocalFileIO.readString(p) }
    override def readLines(p: String) = { reads.incrementAndGet(); LocalFileIO.readLines(p) }
    override def writeString(p: String, c: String) = { writes.incrementAndGet(); LocalFileIO.writeString(p, c) }
    override def exists(p: String) = LocalFileIO.exists(p)
    override def size(p: String) = LocalFileIO.size(p)
    override def modifiedMs(p: String) = LocalFileIO.modifiedMs(p)
    override def delete(p: String) = { deletes.incrementAndGet(); LocalFileIO.delete(p) }
    override def listDir(d: String) = { lists.incrementAndGet(); LocalFileIO.listDir(d) }
    override def listRecursive(d: String) = { lists.incrementAndGet(); LocalFileIO.listRecursive(d) }
    override def deleteTree(d: String) = LocalFileIO.deleteTree(d)
    override def claim(p: String, c: String) = { claims.incrementAndGet(); LocalFileIO.claim(p, c) }
    override def replaceAtomic(p: String, c: String) = { writes.incrementAndGet(); LocalFileIO.replaceAtomic(p, c) }
  }

  test("the whole table lifecycle routes through an installed backend") {
    import spark.implicits._
    val counting = new CountingIO
    FileIO.install(counting)
    try {
      val cat = new GraftCatalog(spark, tmp())
      val t = cat.createTable("db", "seamed", Seq("id" -> "long"))
      t.append(Seq(1L, 2L, 3L).toDF("id"))
      t.append(Seq(4L, 5L).toDF("id"))
      t.delete(org.apache.spark.sql.functions.col("id") === 2L)
      assert(t.read().count() == 4)
      assert(t.countRows() == 4) // manifest fast path reads via the seam
      t.expireSnapshots(keepLast = 1)
      t.removeOrphanFiles(olderThanMs = 0)
      assert(t.read().as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L, 5L))
      // every tier of the protocol exercised the seam: document claims
      // (3 commits + expiry), manifest/list writes, reads, GC
      assert(counting.claims.get() >= 3, s"claims=${counting.claims.get()}")
      assert(counting.writes.get() > 0 && counting.reads.get() > 0)
      assert(counting.deletes.get() > 0, "orphan GC must delete via the seam")
      assert(counting.lists.get() > 0, "orphan GC must list via the seam")
    } finally FileIO.install(LocalFileIO)
  }

  test("commit conflict surfaces identically through the seam") {
    val loc = tmp()
    MetadataIO.commit(TableMetadata.create("t", loc, Seq("a" -> "int")))
    val base = MetadataIO.read(loc)
    MetadataIO.commit(base) // claims v2
    intercept[MetadataIO.CommitConflictException] {
      MetadataIO.commit(base) // same lineage: targets the taken v2 slot
    }
  }
}
