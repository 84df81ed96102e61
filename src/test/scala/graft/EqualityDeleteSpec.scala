package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.GraftTable
import graft.streaming.GraftTableSink

/** Equality deletes (format-v2's second merge-on-read delete kind):
  * value-keyed deletes with the strict sequence rule — a delete hides
  * only STRICTLY OLDER rows with equal keys, never the batch committed
  * alongside it. The write side is O(batch); readers anti-join until
  * compaction materializes the table.
  */
class EqualityDeleteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", Some(4))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft-eq").toString

  test("eq upsert chain: each batch's keys replace strictly older copies") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmp(), "eqc",
      Seq("id" -> "long", "v" -> "string"))
    val up = GraftTableSink.upsertBatchEq(t, Seq("id"), "cdc")
    up(Seq((1L, "a0"), (2L, "b0")).toDF("id", "v"), 0L)
    val filesAfter0 = t.meta.currentSnapshot.get.files.map(_.path).toSet
    up(Seq((2L, "b1"), (3L, "c1")).toDF("id", "v"), 1L)
    up(Seq((3L, "c2"), (4L, "d2")).toDF("id", "v"), 2L)
    // no data file was ever rewritten; batches 1 and 2 each left an
    // eq-delete file (batch 0 hit an empty table — nothing to hide)
    val snap = t.meta.currentSnapshot.get
    assert(filesAfter0.subsetOf(snap.files.map(_.path).toSet))
    assert(snap.deleteFiles.count(_.equalityIds.nonEmpty) == 2)
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a0"), (2L, "b1"), (3L, "c2"), (4L, "d2")))
    // replay of the last batch is a no-op
    val snaps = t.meta.snapshots.size
    up(Seq((3L, "c2"), (4L, "d2")).toDF("id", "v"), 2L)
    assert(t.meta.snapshots.size == snaps)
    // a batch with duplicate keys refuses loudly
    intercept[IllegalArgumentException](t.upsertEqIfNewMarker(
      Seq((9L, "x"), (9L, "y")).toDF("id", "v"), Seq("id"), "k", 50L))
  }

  test("eq deletes survive key-column rename and mix with positional deletes") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmp(), "eqr",
      Seq("id" -> "long", "v" -> "string"),
      properties = Map("write.delete.mode" -> "merge-on-read"))
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    t.upsertEqIfNewMarker(Seq((2L, "B")).toDF("id", "v"), Seq("id"), "m", 0L)
    // delete keys are stored by FIELD-ID, so renaming the key column
    // must not resurrect the old copy
    t.renameColumn("id", "doc_id")
    assert(t.read().orderBy("doc_id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
    // positional MoR delete on top of the equality delete
    t.delete(col("doc_id") === 3L)
    assert(t.read().orderBy("doc_id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "B")))
    // CoW DML over both delete kinds must not resurrect anything
    t.update(col("doc_id") === 1L, Map("v" -> lit("A")))
    assert(t.read().orderBy("doc_id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "A"), (2L, "B")))
  }

  test("eq-delete guards: type cast, widening, drop refusal, branch seq") {
    import spark.implicits._
    // int key column, long-typed batch: keys must cast to the TABLE'S
    // type or the committed delete file would be unreadable
    val t = GraftTable.create(spark, tmp(), "eqg",
      Seq("id" -> "int", "v" -> "string"))
    t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    t.upsertEqIfNewMarker(Seq((2L, "B")).toDF("id", "v"), Seq("id"), "m", 0L)
    assert(t.read().orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "B")))
    // widening the key type keeps existing delete files readable
    // (write-time schema + cast, like data files)
    t.alterColumnType("id", "long")
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "B")))
    // dropping a live eq-delete key would brick every read: refused
    // until compaction + expiry retire the delete files
    intercept[IllegalArgumentException](t.dropColumn("id"))
    t.rewriteDataFiles()
    t.expireSnapshots(keepLast = 1)
    t.dropColumn("id")
    assert(t.read().columns.toSeq == Seq("v"))

    // branch appends sequence like main commits: a fresh branch row
    // must NOT be hidden by a pre-existing equality delete
    val t2 = GraftTable.create(spark, tmp(), "eqb",
      Seq("id" -> "long", "v" -> "string"))
    t2.append(Seq((1L, "a")).toDF("id", "v"))
    t2.upsertEqIfNewMarker(Seq((1L, "A")).toDF("id", "v"), Seq("id"), "m", 0L)
    t2.createBranch("b")
    t2.appendToBranch("b", Seq((1L, "fresh")).toDF("id", "v"))
    val branchRows = t2.readRef("b").as[(Long, String)].collect().toSeq
    assert(branchRows.map(_._2).sorted == Seq("A", "fresh"),
      s"branch row hidden by older eq delete: $branchRows")

    // no delete file for an empty target or an empty batch
    val t3 = GraftTable.create(spark, tmp(), "eqe",
      Seq("id" -> "long", "v" -> "string"))
    t3.upsertEqIfNewMarker(Seq((1L, "a")).toDF("id", "v"), Seq("id"), "m", 0L)
    assert(t3.meta.currentSnapshot.get.deleteFiles.isEmpty)
    t3.upsertEqIfNewMarker(Seq.empty[(Long, String)].toDF("id", "v"),
      Seq("id"), "m", 1L)
    assert(t3.meta.currentSnapshot.get.deleteFiles.isEmpty)
    assert(t3.read().count() == 1)
  }

  test("compaction materializes equality deletes away") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmp(), "eqz",
      Seq("id" -> "long", "v" -> "string"))
    val up = GraftTableSink.upsertBatchEq(t, Seq("id"), "z")
    up(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    up(Seq((2L, "B")).toDF("id", "v"), 1L)
    t.rewriteDataFiles()
    val snap = t.meta.currentSnapshot.get
    assert(snap.deleteFiles.isEmpty, "compaction clears both delete kinds")
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "B")))
    // time travel before compaction still resolves the eq deletes
    val pre = t.meta.snapshots.sortBy(_.timestampMs).dropRight(1).last
    assert(t.readAsOfVersion(pre.snapshotId).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "B")))
  }
}
