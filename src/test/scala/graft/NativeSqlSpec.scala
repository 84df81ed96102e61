package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.catalog.GraftCatalog

/** Native SQL over graft tables through the injected Catalyst
  * resolution rule (GraftExtensions): Spark's own parser handles the
  * statement — no text rewriting — including its time-travel syntax.
  */
class NativeSqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", Some(4))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshCat() = new GraftCatalog(spark,
    Files.createTempDirectory("graft-nwh").toString)

  test("spark.sql and spark.table resolve graft.db.t natively") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "people",
      Seq("id" -> "long", "name" -> "string"))
    t.append(Seq((1L, "ann"), (2L, "bo")).toDF("id", "name"))
    assert(spark.sql("SELECT name FROM graft.db.people ORDER BY id")
      .as[String].collect().toSeq == Seq("ann", "bo"))
    assert(spark.table("graft.db.people").count() == 2)
    // joins + aggregation across two graft tables, pure SQL text
    val t2 = cat.createTable("db", "pets", Seq("owner" -> "long", "pet" -> "string"))
    t2.append(Seq((1L, "cat"), (1L, "dog"), (2L, "eel")).toDF("owner", "pet"))
    val got = spark.sql("""
      SELECT p.name, count(*) AS n
      FROM graft.db.people p JOIN graft.db.pets q ON p.id = q.owner
      GROUP BY p.name ORDER BY p.name""").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("ann", 2L), ("bo", 1L)))
  }

  test("native VERSION AS OF and TIMESTAMP AS OF time travel") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "v", Seq("id" -> "long"))
    t.append(Seq(1L, 2L).toDF("id"))
    val snap = t.meta.currentSnapshot.get
    Thread.sleep(5)
    t.append(Seq(3L).toDF("id"))
    assert(spark.sql(
      s"SELECT id FROM graft.db.v VERSION AS OF ${snap.snapshotId} ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L))
    val ts = java.time.Instant.ofEpochMilli(snap.timestampMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.toString.replace("T", " ")
    assert(spark.sql(
      s"SELECT id FROM graft.db.v TIMESTAMP AS OF '$ts' ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L))
    assert(spark.sql("SELECT count(*) FROM graft.db.v").head().getLong(0) == 3L)
  }

  test("renamed columns and MoR deletes flow through native SQL") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "emp",
      Seq("Index" -> "long", "Phone" -> "string"),
      properties = Map("write.delete.mode" -> "merge-on-read"))
    t.append(Seq((1L, "555-1"), (2L, "555-2"), (3L, "555-3"))
      .toDF("Index", "Phone"))
    t.renameColumn("Phone", "Phone number")
    t.delete(col("Index") === 2L)
    val got = spark.sql(
      "SELECT `Phone number` FROM graft.db.emp ORDER BY `Index`")
      .as[String].collect()
    assert(got.toSeq == Seq("555-1", "555-3"))
  }

  test("SHOW DATABASES / SHOW TABLES go through the catalog plugin") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db_a", "t1", Seq("id" -> "long"))
    t.append(Seq(1L).toDF("id"))
    cat.createTable("db_a", "t2", Seq("id" -> "long"))
    cat.createDatabase("db_b")
    val dbs = spark.sql("SHOW DATABASES IN graft").collect().map(_.getString(0))
    assert(dbs.toSet == Set("db_a", "db_b"))
    val tbls = spark.sql("SHOW TABLES IN graft.db_a").collect()
      .map(_.getString(1))
    assert(tbls.toSet == Set("t1", "t2"))
  }

  test("unknown table stays unresolved and errors through Spark") {
    freshCat()
    val e = intercept[Exception](spark.sql("SELECT * FROM graft.db.nope").collect())
    assert(e.getMessage.toLowerCase.contains("nope") ||
      e.getMessage.toLowerCase.contains("not found"))
  }
}
