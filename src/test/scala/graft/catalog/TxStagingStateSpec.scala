package graft.catalog

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic units for [[GraftSqlTransactions]]'s internal staging
  * contract — the interleavings a thread test can only make probable.
  * Lives in graft.catalog for package-private access to
  * planBase/stage.
  */
class TxStagingStateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession
    .builder("local[4]", Some(4))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("staging against a stale preview refuses loudly: a concurrent " +
      "statement on the same table between plan and stage cannot be " +
      "silently dropped") {
    import spark.implicits._
    val cat = new GraftCatalog(spark,
      Files.createTempDirectory("graft-txrace").toString)
    val t = cat.createTable("db", "race", Seq("id" -> "long"))
    t.append(Seq(1L, 2L, 3L).toDF("id"))
    GraftSqlTransactions.begin(spark)
    try {
      // thread A plans a DELETE against the current transaction view
      val (base, isFirst) =
        GraftSqlTransactions.planBase(spark, t.location, t.meta)
      assert(isFirst)
      // thread B stages an INSERT on the SAME table in between —
      // previews(location) moves past A's planning base
      spark.sql("INSERT INTO graft.db.race VALUES (5)")
      // thread A's stage must refuse: its rewrite was planned without
      // B's effects, so committing it would silently drop B's insert
      val e = intercept[IllegalArgumentException](
        GraftSqlTransactions.stage(spark, t.location, "DELETE", base,
          revalidates = true,
          t.stageDelete(expr("id = 2"), Some(base), revalidate = isFirst)))
      assert(e.getMessage.contains("stale"), e.getMessage)
      // replanning against the fresh preview succeeds and sees B's row
      val (base2, isFirst2) =
        GraftSqlTransactions.planBase(spark, t.location, t.meta)
      assert(!isFirst2, "the replan must plan against B's preview")
      GraftSqlTransactions.stage(spark, t.location, "DELETE", base2,
        revalidates = true,
        t.stageDelete(expr("id = 2"), Some(base2), revalidate = isFirst2))
      assert(spark.sql("SELECT id FROM graft.db.race ORDER BY id")
        .as[Long].collect().toSeq == Seq(1L, 3L, 5L))
    } finally GraftSqlTransactions.rollback(spark)
    assert(t.read().count() == 3, "rollback discards both statements")
  }

  test("two threads staging on the SAME table: appends rebase and BOTH " +
      "land; plan-dependent races either land or refuse loudly — never " +
      "a silent drop") {
    import spark.implicits._
    val cat = new GraftCatalog(spark,
      Files.createTempDirectory("graft-txrace2").toString)
    val t = cat.createTable("db", "race2", Seq("id" -> "long"))
    t.append(Seq(1L).toDF("id"))
    (1 to 5).foreach { round =>
      GraftSqlTransactions.begin(spark)
      val errors = java.util.Collections.synchronizedList(
        new java.util.ArrayList[Throwable]())
      val gate = new java.util.concurrent.CyclicBarrier(2)
      val threads = Seq(10L + round, 20L + round).map { v =>
        new Thread(() => {
          gate.await()
          try spark.sql(s"INSERT INTO graft.db.race2 VALUES ($v)")
          catch { case e: Throwable => errors.add(e) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      // appends depend on no base state: both must land, whatever the
      // interleaving, and the preview must hold both rows
      assert(errors.isEmpty,
        s"round $round: append staging must never refuse: " +
          errors.toArray.mkString("; "))
      assert(spark.sql("SELECT count(*) FROM graft.db.race2")
        .head().getLong(0) == t.read().count() + 2,
        s"round $round: both staged inserts must be in the preview")
      GraftSqlTransactions.rollback(spark)
    }
    // plan-dependent twin: two UPDATE threads on one table — each
    // reported success must be in the preview, each failure must be
    // the loud stale-preview refusal (sequential consistency)
    (1 to 5).foreach { round =>
      GraftSqlTransactions.begin(spark)
      val errors = java.util.Collections.synchronizedList(
        new java.util.ArrayList[Throwable]())
      val gate = new java.util.concurrent.CyclicBarrier(2)
      val threads = Seq(100L, 200L).map { v =>
        new Thread(() => {
          gate.await()
          try spark.sql(
            s"UPDATE graft.db.race2 SET id = id + $v WHERE id = 1")
          catch { case e: Throwable => errors.add(e) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      errors.forEach(e => assert(e.getMessage.contains("stale"),
        s"round $round: unexpected failure kind: ${e.getMessage}"))
      assert(errors.size <= 1, s"round $round: at most one refusal")
      // whatever the interleaving, EXACTLY one increment applied: the
      // second update either refused (concurrent plan) or re-planned
      // against the first's preview and matched nothing (WHERE id = 1
      // is gone) — never a lost or doubled update
      val mx = spark.sql("SELECT max(id) FROM graft.db.race2")
        .head().getLong(0)
      assert(mx == 101L || mx == 201L, s"round $round: max=$mx")
      GraftSqlTransactions.rollback(spark)
    }
  }
}
