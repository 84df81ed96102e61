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
    // no data file was ever rewritten; three eq-delete files accumulated
    val snap = t.meta.currentSnapshot.get
    assert(filesAfter0.subsetOf(snap.files.map(_.path).toSet))
    assert(snap.deleteFiles.count(_.equalityIds.nonEmpty) == 3)
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
