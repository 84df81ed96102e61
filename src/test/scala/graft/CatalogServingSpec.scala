package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.{ColumnResolver, Serving}
import graft.catalog.GraftCatalog

/** Catalog namespaces/SQL-text + serving-edge endpoints, replaying the
  * reference's employee golden history (FIXTURES A2: create -> insert
  * -> rename Phone -> queries by old name keep working).
  */
class CatalogServingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", Some(4))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshCat() = new GraftCatalog(spark,
    Files.createTempDirectory("graft-wh").toString)

  private def employeeTable(cat: GraftCatalog) = {
    import spark.implicits._
    val t = cat.createTable("employee_db", "employee",
      Seq("Index" -> "long", "First Name" -> "string", "Phone" -> "string"))
    t.append(Seq((1L, "Alice", "555-1"), (2L, "Bob", "555-2"))
      .toDF("Index", "First Name", "Phone"))
    t.renameColumn("Phone", "Phone number")
    t
  }

  test("D1/D7: databases and tables are listable") {
    val cat = freshCat()
    cat.createDatabase("a_db")
    cat.createDatabase("b_db")
    cat.createTable("a_db", "t1", Seq("id" -> "long"))
    cat.createTable("a_db", "t2", Seq("id" -> "long"))
    assert(cat.listDatabases() == Seq("a_db", "b_db"))
    assert(cat.listTables("a_db") == Seq("t1", "t2"))
    assert(cat.showDatabases().columns.toSeq == Seq("namespace"))
    assert(cat.showTables("a_db").count() == 2)
    cat.use("a_db")
  }

  test("D8: describe and describe extended") {
    val cat = freshCat()
    employeeTable(cat)
    val desc = cat.describe("employee_db", "employee").collect()
    assert(desc.map(_.getString(0)).toSeq ==
      Seq("Index", "First Name", "Phone number"))
    val ext = cat.describeExtended("employee_db", "employee")
      .collect().map(_.getString(0))
    assert(ext.contains("Format-version"))
    assert(ext.contains("write.parquet.compression-codec"))
  }

  test("SQL text: quoted idents and historical reads via catalog") {
    val cat = freshCat()
    employeeTable(cat)
    val rows = cat.sql(
      "SELECT `Phone number` FROM graft.employee_db.employee ORDER BY `Phone number`")
      .collect().map(_.getString(0))
    assert(rows.toSeq == Seq("555-1", "555-2"))
  }

  test("SQL text: repeated and qualified references resolve to one view") {
    val cat = freshCat()
    employeeTable(cat)
    // the qualified column reference must rewrite to the SAME view name
    // as the FROM-clause reference
    val n = cat.sql(
      """SELECT graft.employee_db.employee.Index
        |FROM graft.employee_db.employee
        |WHERE graft.employee_db.employee.Index > 0""".stripMargin).count()
    assert(n == 2)
    // self-join: both occurrences share the view, aliases disambiguate
    val j = cat.sql(
      """SELECT a.Index FROM graft.employee_db.employee a
        |JOIN graft.employee_db.employee b ON a.Index = b.Index""".stripMargin)
    assert(j.count() == 2)
  }

  test("SQL text: FOR SYSTEM_TIME AS OF resolves a past snapshot") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "t", Seq("id" -> "long"))
    t.append(Seq(1L, 2L).toDF("id"))
    val ts = new java.sql.Timestamp(t.meta.currentSnapshot.get.timestampMs)
    Thread.sleep(5)
    t.append(Seq(3L).toDF("id"))
    val got = cat.sql(
      s"SELECT id FROM graft.db.t FOR SYSTEM_TIME AS OF '$ts' ORDER BY id")
      .as[Long].collect()
    assert(got.toSeq == Seq(1L, 2L))
    assert(cat.sql("SELECT id FROM graft.db.t ORDER BY id").count() == 3)
  }

  test("SQL text: string literals never rewrite; time-travel keywords " +
      "are case-insensitive") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "lit", Seq("id" -> "long", "src" -> "string"))
    t.append(Seq((1L, "graft.db.lit"), (2L, "other")).toDF("id", "src"))
    // the literal on the right of the predicate names the table — it
    // must pass through verbatim, not rewrite into the temp-view name
    val got = cat.sql(
      "SELECT id FROM graft.db.lit WHERE src = 'graft.db.lit'")
      .as[Long].collect()
    assert(got.toSeq == Seq(1L), got.mkString(","))
    // lowercase time-travel keywords work like every other SQL surface
    val ts = new java.sql.Timestamp(t.meta.currentSnapshot.get.timestampMs)
    Thread.sleep(5)
    t.append(Seq((3L, "x")).toDF("id", "src"))
    val past = cat.sql(
      s"select id from graft.db.lit for system_time as of '$ts' order by id")
      .as[Long].collect()
    assert(past.toSeq == Seq(1L, 2L))
    val v1 = t.meta.snapshots.head.snapshotId
    assert(cat.sql(s"select count(*) as n from graft.db.lit version as of $v1")
      .head().getLong(0) == 2L)
  }

  test("AS OF attachment anchors to OUR qualified form: a foreign " +
      "'TIMESTAMP AS OF' literal containing a graft name passes through") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "asof_t", Seq("id" -> "long"))
    t.append(Seq(1L).toDF("id"))
    // Spark-native time travel on some OTHER table whose timestamp
    // literal happens to contain graft.db.t-shaped text: the literal
    // must stay a literal (it used to attach to the rewrite segment
    // and get its insides rewritten into a temp-view reference)
    val foreign = cat.rewriteSql(
      "SELECT * FROM delta_tbl TIMESTAMP AS OF 'graft.db.asof_t'")
    assert(foreign.contains("'graft.db.asof_t'"), foreign)
    // our own qualified form still attaches its timestamp and rewrites
    val ts = new java.sql.Timestamp(t.meta.currentSnapshot.get.timestampMs)
    val ours = cat.rewriteSql(
      s"SELECT * FROM graft.db.asof_t FOR SYSTEM_TIME AS OF '$ts'")
    assert(!ours.contains("graft.db.asof_t"), ours)
    assert(ours.contains("graft_db_asof_t_0"), ours)
  }

  test("serving: getColumn fast path, history slow path, 404s") {
    val cat = freshCat()
    val t = employeeTable(cat)
    // fast path (current name)
    val Serving.Ok(cur) = Serving.getColumn(t, "Phone number"): @unchecked
    assert(cur.size == 2 && cur.forall(_.contains("Phone number")))
    // slow path: historical name resolves via field-id (apiv15.py:182-207)
    val Serving.Ok(hist) = Serving.getColumn(t, "Phone"): @unchecked
    assert(hist.size == 2)
    assert(Serving.getColumn(t, "Fax").isInstanceOf[Serving.NotFound])
    val Serving.Ok(all) = Serving.getTable(t): @unchecked
    assert(all.size == 2)
  }

  test("serving: fuzzy resolver (H5) — match, ambiguous, no-match") {
    val cat = freshCat()
    val t = employeeTable(cat)
    // typo within distance
    val Serving.Ok(_) = Serving.getColumnFuzzy(t, "phone_number"): @unchecked
    assert(Serving.getColumnFuzzy(t, "zzzzzz").isInstanceOf[Serving.NotFound])
    // ambiguity: two equally-near candidates
    import spark.implicits._
    val t2 = cat.createTable("db2", "amb",
      Seq("col_a" -> "long", "col_b" -> "long"))
    t2.append(Seq((1L, 2L)).toDF("col_a", "col_b"))
    assert(Serving.getColumnFuzzy(t2, "col_x").isInstanceOf[Serving.BadRequest])
    assert(ColumnResolver.levenshtein("kitten", "sitting") == 3)
  }

  test("serving: positional (H3), key filter, snapshot, history") {
    val cat = freshCat()
    val t = employeeTable(cat)
    // position 1 = "First Name" whatever it is currently called
    val Serving.Ok(byPos) = Serving.getColumnByPosition(t, 1): @unchecked
    assert(byPos.forall(_.contains("First Name")))
    val Serving.Ok(row) = Serving.getRowsByKey(t, "Index", 2L): @unchecked
    assert(row.size == 1 && row.head.contains("Bob"))
    val Serving.Ok(hist) = Serving.getHistory(t): @unchecked
    assert(hist.size == 1) // one append
    val today = java.time.LocalDate.now().toString
    val Serving.Ok(snap) = Serving.getSnapshot(t, today): @unchecked
    assert(snap.size == 2)
    assert(Serving.getSnapshot(t, "junk").isInstanceOf[Serving.BadRequest])
    // stats endpoint: one JSON record per column, manifest-only
    val Serving.Ok(stats) = Serving.getStats(t): @unchecked
    assert(stats.size == t.meta.currentSchema.fields.size)
    assert(stats.exists(r => r.contains("\"col_name\":\"Index\"") &&
      r.contains("\"record_count\":2")))
  }

  test("H4: schema evolution records provenance properties") {
    val cat = freshCat()
    val t = employeeTable(cat)
    t.addColumn("Email", "string")
    val props = t.meta.properties
    assert(props.exists { case (k, v) =>
      k.startsWith("graft.schema-log.") && v.contains("rename-column Phone") })
    assert(props.exists { case (_, v) => v.contains("add-column Email") })
  }
}
