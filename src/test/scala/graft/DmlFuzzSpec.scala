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

  /** Backend the forked fuzz children install (GRAFT_FILEIO);
    * overridden by the parameterized-backend subclasses.
    */
  protected def childFileIOEnv: Option[String] = None

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

  test("multi-writer model fuzz: two forked JVMs drive seeded op " +
      "sequences against one warehouse; the final state equals the " +
      "replay of both op logs under the recovered commit order") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val loc = tmp()
    val t = GraftTable.create(spark, loc, "mwfuzz",
      Seq("id" -> "long", "v" -> "string", "x" -> "long"))
    // shared key space both writers upsert against
    t.append((1L to 16L).map(k => (k, "seed", 0L)).toDF("id", "v", "x"))
    val dir = java.nio.file.Files.createTempDirectory("graft-mwfuzz")
    def fork(tag: String, seed: Long, base: Long): (Process, String) = {
      val logPath = dir.resolve(s"$tag.jsonl").toString
      val p = ForkHelper.forkJava("graft.FuzzChild",
        Seq(loc, tag, seed.toString, base.toString, "12", logPath),
        childFileIOEnv, dir, tag)
      (p, logPath)
    }
    val (p1, log1) = fork("w1", 111L, 10000L)
    val (p2, log2) = fork("w2", 222L, 20000L)
    assert(p1.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
      p2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "forked writers did not finish")
    assert(p1.exitValue() == 0 && p2.exitValue() == 0,
      s"forked writer failed: ${p1.exitValue()}/${p2.exitValue()}; " +
        s"stderr under $dir")

    // ---- parse the op logs
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    case class Op(tag: String, kind: String, step: Int,
        rows: Vector[(Long, String, Long)], delId: Option[Long])
    def parseLog(tag: String, path: String): Vector[Op] =
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
        .asScala.filter(_.nonEmpty).map { l =>
          val j = JsonMethods.parse(l)
          Op(tag, (j \ "kind").extract[String], (j \ "step").extract[Int],
            (j \ "rows").extractOrElse[Vector[Vector[JValue]]](Vector.empty)
              .map(r => (r(0).extract[Long], r(1).extract[String],
                r(2).extract[Long])),
            (j \ "id").extractOpt[Long])
        }.toVector
    val ops = parseLog("w1", log1) ++ parseLog("w2", log2)
    val byTagStep = ops.map(o => (o.tag, o.step) -> o).toMap

    // ---- recover the LINEAR commit order from metadata
    val m = t.meta
    val chain = Iterator.unfold(m.currentSnapshotId) {
      case Some(id) => m.snapshotById(id).map(s => (s, s.parentId))
      case None     => None
    }.toVector.reverse
    assert(chain.size == m.snapshots.size,
      s"forked history: chain=${chain.size} snapshots=${m.snapshots.size}")
    // exactly-once: seed-create is snapshot 1; every logged non-noop op
    // committed exactly one snapshot
    val realOps = ops.count(_.kind != "noop")
    assert(chain.size == 1 + realOps,
      s"snapshots=${chain.size} ops=$realOps")

    // ---- replay: appends/deletes are writer-commutative (disjoint id
    // ranges); upserts on the shared keys are order-sensitive, and
    // their order is recovered from each snapshot's ADDED data files
    // alone (batch rows carry "tag:step"), never from the engine's
    // read path
    val own = scala.collection.mutable.Map[Long, (String, Long)]()
    ops.foreach {
      case Op(_, "append", _, rows, _) =>
        rows.foreach(r => own(r._1) = (r._2, r._3))
      case Op(_, "delete", _, _, Some(id)) => own.remove(id)
      case _ => ()
    }
    val shared = scala.collection.mutable.Map[Long, (String, Long)](
      (1L to 16L).map(k => k -> (("seed", 0L))): _*)
    val applied = scala.collection.mutable.Set[(String, Int)]()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.LongType)))
    chain.sliding(2).foreach { case Vector(parent, s) =>
      val parentPaths = parent.files.map(_.path).toSet
      val added = s.files.map(_.path).filterNot(parentPaths)
      if (added.nonEmpty) {
        val tags = spark.read.schema(schema)
          .parquet(added.map(p => s"$loc/$p"): _*)
          .filter(col("id") <= 16L).select("v").distinct()
          .as[String].collect()
        assert(tags.length <= 1, s"mixed upsert batch rows: ${tags.toSeq}")
        tags.headOption.filter(_ != "seed").foreach { tg =>
          val Array(w, st) = tg.split(":")
          val op = byTagStep((w, st.toInt))
          assert(op.kind == "upsert" && applied.add((w, st.toInt)),
            s"op $tg replayed twice or not an upsert")
          op.rows.foreach(r => shared(r._1) = (r._2, r._3))
        }
      }
      case _ => ()
    }
    assert(applied.size == ops.count(_.kind == "upsert"),
      s"upserts recovered=${applied.size} logged=${ops.count(_.kind == "upsert")}")

    // ---- the table equals the model replay of the linear history
    val expected = (own ++ shared).toMap
    val got = t.read().as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expected,
      s"divergence: table=${got.size} model=${expected.size}\n" +
        s"only-table=${(got.keySet -- expected.keySet).take(5)} " +
        s"only-model=${(expected.keySet -- got.keySet).take(5)}")
    if (m.currentSnapshot.forall(_.deleteFiles.isEmpty))
      assert(t.countRows() == expected.size.toLong)
  }
}
