package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.GraftTable

/** Model-based DML fuzz: a SEEDED random interleaving of the whole
  * mutation surface — appends, CoW and MoR deletes/updates, keyed
  * upserts (positional and equality), mode toggles, compactions,
  * targeted MoR materialization, snapshot expiry, and the maintenance
  * sweep — applied in lockstep to a [[GraftTable]] and to a trivial
  * in-memory map. After EVERY op the table's read must equal the
  * model, and the manifest fast path must agree whenever it claims an
  * answer. Single-feature specs pin each op's semantics; this one
  * exists for the CROSS-FEATURE interactions (a MoR delete under an
  * equality-delete backlog followed by compaction and expiry is not a
  * shape any targeted test enumerates).
  *
  * Deterministic: fixed seed, no wall-clock dependence in op choice —
  * a failure replays exactly.
  */
class DmlFuzzSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("local[4]", Some(4))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-fuzz").toString + "/t"

  test("40 seeded random DML + maintenance ops match the in-memory model") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val t = GraftTable.create(spark, tmp(), "fuzz",
      Seq("id" -> "long", "v" -> "string", "x" -> "long"))
    val model = scala.collection.mutable.Map[Long, (String, Long)]()
    var nextId = 0L
    var marker = 0L

    def freshRows(n: Int): Seq[(Long, String, Long)] =
      (0 until n).map { _ =>
        nextId += 1
        (nextId, s"v$nextId", rnd.nextInt(100).toLong)
      }

    // snapshot id -> the model at that commit, for time-travel checks
    val history = scala.collection.mutable.Map[Long, Map[Long, (String, Long)]]()

    def check(opName: String): Unit = {
      val got = t.read().as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == model.toMap,
        s"divergence after $opName: table=${got.size} model=${model.size}\n" +
          s"only-table=${(got.keySet -- model.keySet).take(5)} " +
          s"only-model=${(model.keySet -- got.keySet).take(5)}")
      // the manifest count may refuse (MoR debt) but must never lie
      if (t.meta.currentSnapshot.forall(_.deleteFiles.isEmpty))
        assert(t.countRows() == model.size.toLong, s"countRows after $opName")
      // time travel: any RETAINED past snapshot replays exactly the
      // model recorded at its commit (expiry shrinks the candidates,
      // never corrupts the survivors)
      t.meta.currentSnapshotId.foreach(history(_) = model.toMap)
      val retained = t.meta.snapshots.map(_.snapshotId)
        .filter(history.contains)
      if (retained.nonEmpty) {
        val pick = retained(rnd.nextInt(retained.size))
        val past = t.readAsOfVersion(pick).as[(Long, String, Long)]
          .collect().map(r => r._1 -> ((r._2, r._3))).toMap
        assert(past == history(pick),
          s"time travel to $pick diverged after $opName")
      }
    }

    for (step <- 1 to 40) {
      val op = rnd.nextInt(10)
      val name = op match {
        case 0 | 1 => // append a small batch
          val rows = freshRows(1 + rnd.nextInt(8))
          t.append(rows.toDF("id", "v", "x"))
          rows.foreach(r => model(r._1) = (r._2, r._3))
          s"append(${rows.size})"
        case 2 => // toggle write modes
          val mode = if (rnd.nextBoolean()) "copy-on-write" else "merge-on-read"
          t.setProperties(Map(
            "write.delete.mode" -> mode, "write.update.mode" -> mode))
          s"mode=$mode"
        case 3 => // predicate delete
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
          t.delete(col("id") % m === r.toLong)
          model.keys.filter(k => k % m == r).toSeq.foreach(model.remove)
          s"delete(id%$m==$r)"
        case 4 => // predicate update
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
          val c = rnd.nextInt(50).toLong
          t.update(col("id") % m === r.toLong, Map("x" -> (col("x") + c)))
          model.mapValuesInPlace { case (k, (v, x)) =>
            if (k % m == r) (v, x + c) else (v, x) }
          s"update(id%$m==$r, x+=$c)"
        case 5 => // keyed upsert: replace a slice of live ids + add fresh
          val existing = rnd.shuffle(model.keys.toSeq.sorted)
            .take(rnd.nextInt(4))
          val fresh = freshRows(1 + rnd.nextInt(3))
          val batch = existing.map(k => (k, s"u$step-$k", rnd.nextInt(100).toLong)) ++ fresh
          marker += 1
          val eq = rnd.nextBoolean()
          if (eq) t.upsertEqIfNewMarker(batch.toDF("id", "v", "x"),
            Seq("id"), "graft.fuzz", marker)
          else t.upsertIfNewMarker(batch.toDF("id", "v", "x"),
            Seq("id"), "graft.fuzz", marker)
          batch.foreach(r => model(r._1) = (r._2, r._3))
          s"upsert(${if (eq) "eq" else "pos"}, ${batch.size})"
        case 6 =>
          t.rewriteDataFiles(); "compact"
        case 7 =>
          t.rewriteDeletedDataFiles(); "materialize-deletes"
        case 8 =>
          t.expireSnapshots(1 + rnd.nextInt(4)); "expire"
        case 9 =>
          val acts = t.maintain(deleteRatio = 0.05, keepLast = 3)
          s"maintain(${acts.mkString("+")})"
      }
      check(s"step $step: $name")
    }
  }

  test("30 seeded random ops through the NATIVE SQL surface match the " +
      "model (command-rewrite rules under interleaving)") {
    import spark.implicits._
    val rnd = new scala.util.Random(424242L)
    val cat = new graft.catalog.GraftCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-sqlfuzz").toString)
    val t = cat.createTable("db", "sfuzz",
      Seq("id" -> "long", "v" -> "string", "x" -> "long"))
    val model = scala.collection.mutable.Map[Long, (String, Long)]()
    var nextId = 0L

    def check(opName: String): Unit = {
      val got = spark.sql(
          "SELECT id, v, x FROM graft.db.sfuzz")
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == model.toMap, s"divergence after $opName: " +
        s"table=${got.size} model=${model.size}")
      // the SQL count must agree whichever path (pushdown or scan) it
      // takes
      assert(spark.sql("SELECT count(*) AS n FROM graft.db.sfuzz")
        .head().getLong(0) == model.size.toLong, s"count after $opName")
    }

    for (step <- 1 to 30) {
      val op = rnd.nextInt(8)
      val name = op match {
        case 0 | 1 =>
          val rows = (0 until 1 + rnd.nextInt(5)).map { _ =>
            nextId += 1; (nextId, s"v$nextId", rnd.nextInt(100).toLong)
          }
          spark.sql("INSERT INTO graft.db.sfuzz VALUES " +
            rows.map(r => s"(${r._1}, '${r._2}', ${r._3})").mkString(", "))
          rows.foreach(r => model(r._1) = (r._2, r._3))
          s"INSERT(${rows.size})"
        case 2 =>
          val mode = if (rnd.nextBoolean()) "copy-on-write" else "merge-on-read"
          spark.sql("ALTER TABLE graft.db.sfuzz SET TBLPROPERTIES (" +
            s"'write.delete.mode' = '$mode', 'write.update.mode' = '$mode')")
          s"mode=$mode"
        case 3 =>
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
          spark.sql(s"DELETE FROM graft.db.sfuzz WHERE id % $m = $r")
          model.keys.filter(k => k % m == r).toSeq.foreach(model.remove)
          s"DELETE(id%$m==$r)"
        case 4 =>
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
          val c = rnd.nextInt(50)
          spark.sql(s"UPDATE graft.db.sfuzz SET x = x + $c WHERE id % $m = $r")
          model.mapValuesInPlace { case (k, (v, x)) =>
            if (k % m == r) (v, x + c) else (v, x) }
          s"UPDATE(id%$m==$r)"
        case 5 => // MERGE: update a live slice, insert fresh
          val existing = rnd.shuffle(model.keys.toSeq.sorted)
            .take(rnd.nextInt(3))
          val fresh = (0 until 1 + rnd.nextInt(2)).map { _ =>
            nextId += 1; (nextId, s"m$nextId", rnd.nextInt(100).toLong)
          }
          val src = (existing.map(k => (k, s"m$step-$k",
            rnd.nextInt(100).toLong)) ++ fresh)
          src.toDF("id", "v", "x").createOrReplaceTempView("sfuzz_src")
          spark.sql("""MERGE INTO graft.db.sfuzz t USING sfuzz_src s
            ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""")
          src.foreach(r => model(r._1) = (r._2, r._3))
          s"MERGE(${src.size})"
        case 6 =>
          spark.sql("CALL graft.system.rewrite_data_files('db.sfuzz')")
          "compact"
        case 7 =>
          spark.sql("CALL graft.system.maintain('db.sfuzz', 0.05, 3)")
          "maintain"
      }
      check(s"step $step: $name")
    }
  }
}
