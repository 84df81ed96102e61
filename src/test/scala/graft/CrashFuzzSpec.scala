package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.tableformat.{CatalogFileIO, FileIO, ObjectStoreFileIO,
  RenameRolledBack, RenameRolledForward}
import graft.engine.GraftTable

/** Crash-point FUZZ over the storage protocols: the individual
  * kill-point units (FileIOSpec, CatalogCommitSpec) pin each crash
  * shape in isolation; this suite composes them — a SEEDED random op
  * sequence (appends, CoW deletes, expiry, copy-based renames bouncing
  * a table between two locations) with crash hooks armed at random:
  *
  *   - rename kill-points: mid-copy, before-complete, after-complete,
  *     mid-unmark (the four phases of the claim/copy/complete/unmark
  *     protocol);
  *   - commit kill-point between the catalog CAS and the publish PUT
  *     (catalog backend — the REST-commit crash window, where the CAS
  *     already IS the commit);
  *   - CREATE attempts at a crash-claimed destination (the
  *     create-vs-rename handshake's refusal gate).
  *
  * After every crash the recovery surface a production operator has —
  * recoverRename, reader-side healing, the handshake guards — must
  * restore a state where the table reads exactly the model, the
  * integrity audit is clean, and the final history is one linear,
  * replayable snapshot chain. Deterministic seed: a failure replays
  * exactly.
  */
abstract class CrashFuzzBase extends AnyFunSuite {

  lazy val spark = GraftSession.builder("local[4]", Some(4))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The emulated store carrying the rename crash hooks (the catalog
    * backend wraps one).
    */
  protected def storeUnderTest: ObjectStoreFileIO = FileIO.io match {
    case os: ObjectStoreFileIO => os
    case c: CatalogFileIO      => c.storeForTesting
    case other => fail(s"crash fuzz needs an object-store backend, got $other")
  }

  /** Only the catalog backend has the CAS-vs-publish crash window. */
  private def canCrashCas: Boolean = FileIO.io.isInstanceOf[CatalogFileIO]
  private def armCasCrash(on: Boolean): Unit = FileIO.io match {
    case c: CatalogFileIO => c.crashAfterCasForTesting = on
    case _                => ()
  }

  test("36 seeded ops with randomly armed crash points: recovery + " +
      "healing always restore a linear, replayable history") {
    import spark.implicits._
    val wh = java.nio.file.Files
      .createTempDirectory("graft-crashfuzz").toString
    val locs = Vector(s"$wh/db/ta", s"$wh/db/tb")
    var cur = 0
    GraftTable.create(spark, locs(cur), "cf",
      Seq("id" -> "long", "v" -> "string"))
    // a fixed-location INDEX table the transaction ops publish to in
    // lockstep with the main table (catalog backend only): composes
    // multi-table transactions with the rename/commit crash classes
    val idxLoc = s"$wh/db/idx"
    GraftTable.create(spark, idxLoc, "cfidx",
      Seq("id" -> "long", "v" -> "string"))
    // the staged-DDL transaction shape (r19): schema evolution on a
    // DEDICATED table + dependent-view repair publish through one
    // claim set — the crash arms must never expose one without the
    // other. Dedicated because the row arms' API appends provide the
    // base (id, v) shape, and the engine's append (correctly) refuses
    // an input missing a live column.
    val ddlLoc = s"$wh/db/ddlt"
    GraftTable.create(spark, ddlLoc, "cfddl",
      Seq("id" -> "long", "v" -> "string"))
    val vLoc = s"$wh/db/cfv"
    graft.catalog.ViewIO.commit(vLoc, graft.catalog.ViewMetadata(
      name = "db.cfv", currentVersionId = 1,
      versions = Vector(graft.catalog.ViewVersion(
        versionId = 1, timestampMs = System.currentTimeMillis(),
        sql = "SELECT id, v FROM base", schemaJson = "{}",
        defaultCatalog = "graft", defaultNamespace = Vector("db"),
        queryColumnNames = Vector("id", "v"),
        columnAliases = Vector.empty, columnComments = Vector.empty)),
      properties = Map.empty))
    val model = scala.collection.mutable.Map[Long, String]()
    val idxModel = scala.collection.mutable.Map[Long, String]()
    var nextId = 0L
    // fixed seed for the committed run (failures replay exactly);
    // GRAFT_FUZZ_SEED explores alternative interleavings in dev loops.
    // 53 was selected (r19) because its catalog-backend stream arms
    // every crash class at once: all four rename kill-points,
    // cas-publish, cas-crash-then-rename, create-at-claimed, the three
    // transaction crash windows, and all three staged transaction
    // shapes (DML, MERGE, DDL+view).
    val seed = sys.env.get("GRAFT_FUZZ_SEED").flatMap(_.toLongOption)
      .getOrElse(53L)
    info(s"crash-fuzz seed=$seed")
    val rnd = new scala.util.Random(seed)
    val armed = scala.collection.mutable.Set[String]()

    def t = new GraftTable(spark, locs(cur))
    def check(opName: String): Unit = {
      // select the base pair explicitly: the staged-DDL arm adds
      // columns, and the row model is column-set-agnostic
      val got = t.read().select("id", "v").as[(Long, String)].collect()
        .map(r => r._1 -> r._2).toMap
      assert(got == model.toMap,
        s"divergence after $opName: table=${got.size} model=${model.size}\n" +
          s"only-table=${(got.keySet -- model.keySet).take(5)} " +
          s"only-model=${(model.keySet -- got.keySet).take(5)}")
      val audit = t.verifyIntegrity()
      assert(audit.isEmpty, s"integrity after $opName: $audit")
      val gotIdx = new GraftTable(spark, idxLoc).read()
        .as[(Long, String)].collect().map(r => r._1 -> r._2).toMap
      assert(gotIdx == idxModel.toMap,
        s"index divergence after $opName: " +
          s"table=${gotIdx.size} model=${idxModel.size}")
    }

    for (step <- 1 to 36) {
      val roll = rnd.nextInt(10)
      val name =
        if (roll < 4) { // append, sometimes killed between CAS and publish
          val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
            nextId += 1; (nextId, s"v$step-$nextId")
          }
          val crash = canCrashCas && rnd.nextInt(3) == 0
          if (crash) {
            armed += "cas-publish"
            armCasCrash(true)
            try {
              val e = intercept[Exception](t.append(rows.toDF("id", "v")))
              assert(e.getMessage != null &&
                e.getMessage.contains("simulated"), e.toString)
            } finally armCasCrash(false)
          } else t.append(rows.toDF("id", "v"))
          // the CAS IS the commit: a kill before the publish PUT still
          // committed — the model must include the batch, and check()'s
          // read must heal the unpublished document to see it
          rows.foreach(r => model(r._1) = r._2)
          s"append(${rows.size}${if (crash) ", cas-crash" else ""})"
        } else if (roll < 5 && model.nonEmpty) {
          val victim = model.keys.toSeq.sorted.apply(rnd.nextInt(model.size))
          t.delete(col("id") === victim)
          model.remove(victim)
          s"delete($victim)"
        } else if (roll == 5 && canCrashCas) {
          // multi-table TRANSACTION: main + index commit through one
          // catalog CAS, sometimes killed between CAS and publish or
          // BETWEEN the per-slot publish PUTs — either way BOTH tables
          // advance together (the CAS is the commit; reads heal the
          // unpublished half), never one without the other. A racing
          // reader probes both tables' metadata THROUGH the crash
          // window: any probe seeing one table's new version without
          // the other's is a torn pair.
          val crashMode = rnd.nextInt(3) // 0=clean, 1=cas, 2=mid-publish
          // sometimes the transaction is the staged-DML shape (the
          // dedup sweep: CoW delete from main + index in one claim
          // set), the staged-MERGE shape (the CDC upsert, q171's
          // transactional form), or the staged-DDL shape (r19: schema
          // evolution + dependent-view repair in one claim set)
          // instead of the two-table append
          val shapeRoll = rnd.nextInt(6)
          val asDelete = model.nonEmpty && shapeRoll == 0
          val asMerge = model.nonEmpty && !asDelete && shapeRoll == 1
          val asDdl = !asDelete && !asMerge && shapeRoll == 2
          val rows: Seq[(Long, String)] =
            if (asDelete || asMerge || asDdl) Nil
            else (0 until 1 + rnd.nextInt(3)).map { _ =>
              nextId += 1; (nextId, s"tx$step-$nextId")
            }
          val victims: Set[Long] =
            if (!asDelete) Set.empty
            else {
              val ks = model.keys.toSeq.sorted
              Set(ks(rnd.nextInt(ks.size)))
            }
          // merge source: upsert one EXISTING main key + one fresh key
          // on BOTH tables (matched rows update, unmatched insert — the
          // model mirror is the same upsert either way)
          val mergeSrc: Seq[(Long, String)] =
            if (!asMerge) Nil
            else {
              val ks = model.keys.toSeq.sorted
              val victim = ks(rnd.nextInt(ks.size))
              nextId += 1
              Seq((victim, s"m$step-$victim"), (nextId, s"m$step-$nextId"))
            }
          val ops =
            if (asDdl) {
              armed += "staged-ddl-txn"
              Nil // commits through commitDdl() below (view slot)
            } else if (asDelete) {
              armed += "staged-dml-txn"
              Seq(
                locs(cur) -> t.stageDelete(
                  col("id").isin(victims.toSeq: _*)),
                idxLoc -> new GraftTable(spark, idxLoc).stageDelete(
                  col("id").isin(victims.toSeq: _*)))
            } else if (asMerge) {
              armed += "staged-merge-txn"
              val src = mergeSrc.toDF("sid", "sv")
              def mergeOp(loc: String) =
                new GraftTable(spark, loc).stageMerge(
                  src, col("id") === col("sid"),
                  matched = Seq(graft.engine.MergeUpdateClause(None,
                    Map("v" -> col("sv")))),
                  notMatched = Seq(graft.engine.MergeInsertValuesClause(
                    None, Map("id" -> col("sid"), "v" -> col("sv")))))
              Seq(locs(cur) -> mergeOp(locs(cur)), idxLoc -> mergeOp(idxLoc))
            } else {
              val df = rows.toDF("id", "v")
              Seq(
                locs(cur) -> t.stageAppend(df),
                idxLoc -> new GraftTable(spark, idxLoc).stageAppend(df))
            }
          // the rename-resilience pair: evolve the table's schema AND
          // append a view version in the SAME claim set (the shape
          // GraftSqlTransactions.commit publishes for staged DDL +
          // CREATE OR REPLACE VIEW)
          def commitDdl(): Unit = graft.tableformat.MetadataIO.commitSlots(Seq(
            () => graft.tableformat.MetadataIO.prepareTableSlot(ddlLoc,
              new GraftTable(spark, ddlLoc)
                .addColumnTransform(s"ddl$step", "string")),
            () => graft.catalog.ViewIO.prepareSlot(vLoc,
              (v0: graft.catalog.ViewMetadata) => {
                val nid = v0.versions.map(_.versionId).max + 1
                v0.copy(currentVersionId = nid, versions = v0.versions :+
                  v0.current.copy(versionId = nid,
                    sql = s"SELECT id, v, ddl$step FROM base"))
              })))
          def commitBoth(): Unit =
            if (asDdl) commitDdl()
            else graft.tableformat.MetadataIO.commitAll(
              ops.map { case (loc, f) =>
                loc -> ((cur0: graft.tableformat.TableMetadata) =>
                  f(cur0, System.currentTimeMillis()))
              })
          def armMidPublish(on: Boolean): Unit = FileIO.io match {
            case c: CatalogFileIO => c.crashMidPublishForTesting = on
            case _                => ()
          }
          if (crashMode > 0) {
            val (mainLoc, ixLoc) = (locs(cur), idxLoc)
            val baseMain = graft.tableformat.MetadataIO
              .read(mainLoc).snapshots.size
            val baseIdx = graft.tableformat.MetadataIO
              .read(ixLoc).snapshots.size
            val baseSchema = graft.tableformat.MetadataIO
              .read(ddlLoc).currentSchemaId
            val baseVid = graft.catalog.ViewIO.read(vLoc).currentVersionId
            val stopReader = new java.util.concurrent.atomic.AtomicBoolean()
            val torn = new java.util.concurrent.atomic.AtomicInteger(0)
            val reader = new Thread(() => {
              while (!stopReader.get()) {
                // stability sandwich: the two documents can't be read
                // at one instant, so a sample straddling the CAS would
                // look torn without being so — it only counts when the
                // FIRST document is provably unchanged across the
                // second's read, which pins both reads to one side of
                // the commit
                if (asDdl) {
                  // schema evolution + view repair: never one without
                  // the other
                  val a1 = graft.tableformat.MetadataIO.read(ddlLoc)
                    .currentSchemaId != baseSchema
                  val b = graft.catalog.ViewIO.read(vLoc)
                    .currentVersionId != baseVid
                  val a2 = graft.tableformat.MetadataIO.read(ddlLoc)
                    .currentSchemaId != baseSchema
                  if (a1 == a2 && a1 != b) torn.incrementAndGet()
                } else {
                  val dM1 = graft.tableformat.MetadataIO.read(mainLoc)
                    .snapshots.size - baseMain
                  val dI = graft.tableformat.MetadataIO.read(ixLoc)
                    .snapshots.size - baseIdx
                  val dM2 = graft.tableformat.MetadataIO.read(mainLoc)
                    .snapshots.size - baseMain
                  if (dM1 == dM2 && dM1 != dI) torn.incrementAndGet()
                }
              }
            }, s"txn-torn-probe-$step")
            reader.start()
            armed += (if (crashMode == 1) "cas-publish-txn"
                      else "mid-publish-txn")
            if (crashMode == 1) armCasCrash(true) else armMidPublish(true)
            try {
              val e = intercept[Exception](commitBoth())
              assert(e.getMessage != null &&
                e.getMessage.contains("simulated"), e.toString)
            } finally {
              armCasCrash(false); armMidPublish(false)
              Thread.sleep(50) // linger in the crashed state under probes
              stopReader.set(true); reader.join()
            }
            assert(torn.get() == 0,
              s"racing reader observed ${torn.get()} torn pairs at step $step")
          } else commitBoth()
          if (asDelete) victims.foreach { k =>
            model.remove(k); idxModel.remove(k)
          }
          else if (asMerge) mergeSrc.foreach { case (k, v) =>
            model(k) = v; idxModel(k) = v
          }
          else rows.foreach { r => model(r._1) = r._2; idxModel(r._1) = r._2 }
          s"txn(${if (asDelete) s"delete ${victims.mkString(",")}"
            else if (asMerge) s"merge ${mergeSrc.map(_._1).mkString(",")}"
            else if (asDdl) s"ddl+view ddl$step"
            else rows.size.toString}${Seq("", ", cas-crash",
            ", mid-publish-crash")(crashMode)})"
        } else if (roll < 9) { // rename to the other location
          // sometimes a CAS-crashed append lands IMMEDIATELY before the
          // rename, with no healing read in between: the rename's
          // pre-copy heal must carry the unpublished commit across (the
          // copy phase moves keys; the commit exists only in the
          // catalog's slot record at this point)
          if (canCrashCas && rnd.nextInt(4) == 0) {
            armed += "cas-crash-then-rename"
            val rows = (0 until 1 + rnd.nextInt(2)).map { _ =>
              nextId += 1; (nextId, s"pre$step-$nextId")
            }
            armCasCrash(true)
            try intercept[Exception](t.append(rows.toDF("id", "v")))
            finally armCasCrash(false)
            rows.foreach(r => model(r._1) = r._2) // the CAS committed it
          }
          val from = locs(cur); val to = locs(1 - cur)
          Vector(Option.empty[String], Some("mid-copy"),
            Some("before-complete"), Some("after-complete"),
            Some("mid-unmark"))(rnd.nextInt(5)) match {
            case None =>
              FileIO.io.rename(from, to); cur = 1 - cur
              "rename(clean)"
            case Some(pt) =>
              armed += s"rename-$pt"
              storeUnderTest.renameCrashPoint = Some(pt)
              try intercept[IllegalStateException](
                FileIO.io.rename(from, to))
              finally storeUnderTest.renameCrashPoint = None
              // while the claim marker stands, a CREATE at the crashed
              // destination must refuse (handshake guard) — either on
              // the marker or on the already-complete copied table
              if (FileIO.io.exists(s"$to/" +
                  ObjectStoreFileIO.RenameClaimMarker) && rnd.nextBoolean()) {
                armed += "create-at-claimed"
                val e = intercept[IllegalArgumentException](
                  GraftTable.create(spark, to, "squatter",
                    Seq("id" -> "long")))
                assert(e.getMessage.contains("rename destination") ||
                  e.getMessage.contains("table exists"), e.getMessage)
              }
              val rec = FileIO.io.recoverRename(to, olderThanMs = 0L)
              rec match {
                case Some(RenameRolledBack(f)) =>
                  assert(f == from); () // table stayed at `from`
                case Some(RenameRolledForward(f)) =>
                  assert(f == from); cur = 1 - cur
                case None => cur = 1 - cur // mid-unmark: completed rename
              }
              s"rename(crash=$pt -> $rec)"
          }
        } else {
          t.expireSnapshots(1 + rnd.nextInt(3)); "expire"
        }
      check(s"step $step: $name")
    }

    info(s"armed crash classes: ${armed.toSeq.sorted.mkString(", ")}")
    assert(armed.size >= 3, s"crash classes exercised: $armed")
    // the committed seed was CHOSEN to arm every class on the catalog
    // backend — pin the full set, or an RNG-stream shift (any added
    // rnd draw moves every seed's path) would silently disarm classes
    // while armed.size >= 3 stays green
    if (sys.env.get("GRAFT_FUZZ_SEED").isEmpty && canCrashCas)
      assert(armed == Set("cas-crash-then-rename", "cas-publish",
        "cas-publish-txn", "create-at-claimed", "mid-publish-txn",
        "rename-after-complete", "rename-before-complete",
        "rename-mid-copy", "rename-mid-unmark", "staged-ddl-txn",
        "staged-dml-txn", "staged-merge-txn"),
        s"the committed seed no longer arms every crash class " +
          s"(got ${armed.toSeq.sorted.mkString(", ")}) — the RNG " +
          "stream shifted; re-run the seed search and update the " +
          "default seed")
    // one linear, replayable chain at whichever location survived
    val m = t.meta
    val chain = Iterator.unfold(m.currentSnapshotId) {
      case Some(id) => m.snapshotById(id).map(s => (s, s.parentId))
      case None     => None
    }.size
    assert(chain == m.snapshots.size,
      s"forked history: chain=$chain snapshots=${m.snapshots.size}")
    // the other location holds nothing a reader could resolve
    assert(FileIO.io.listRecursive(locs(1 - cur)).isEmpty,
      s"stale keys at the vacated location: " +
        s"${FileIO.io.listRecursive(locs(1 - cur)).take(5)}")
  }
}

class CrashFuzzObjectStoreSpec extends CrashFuzzBase with ObjectStoreBackend

class CrashFuzzCatalogSpec extends CrashFuzzBase with CatalogBackend
