package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.catalog.{GraftCatalog, ViewIO}

/** Stored SQL views: Iceberg-view semantics (late binding, versioned
  * definitions, definition-context name resolution) over the graft
  * warehouse, driven through the injected parser + resolution rule.
  */
class ViewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", Some(4))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshCat() = new GraftCatalog(spark,
    Files.createTempDirectory("graft-vwh").toString)

  test("create, read, late binding, replace, version pinning") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "base", Seq("id" -> "long"))
    t.append(Seq(1L, 2L, 3L).toDF("id"))
    spark.sql("CREATE VIEW graft.db.v1 AS SELECT id * 2 AS d FROM graft.db.base")
    assert(spark.sql("SELECT * FROM graft.db.v1 ORDER BY d")
      .as[Long].collect().toSeq == Seq(2L, 4L, 6L))
    // spark.table() resolves through the same path
    assert(spark.table("graft.db.v1").count() == 3)
    // LATE BINDING: new base rows appear without any view DDL
    t.append(Seq(10L).toDF("id"))
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.v1")
      .head().getLong(0) == 4L)
    // IF NOT EXISTS is a no-op on an existing view; bare CREATE throws
    spark.sql("CREATE VIEW IF NOT EXISTS graft.db.v1 AS SELECT 1 AS x")
    assert(spark.table("graft.db.v1").columns.toSeq == Seq("d"))
    intercept[Exception](
      spark.sql("CREATE VIEW graft.db.v1 AS SELECT 1 AS x"))
    // OR REPLACE appends a version; the old definition stays readable
    spark.sql("CREATE OR REPLACE VIEW graft.db.v1 AS " +
      "SELECT id + 100 AS d FROM graft.db.base")
    assert(spark.sql("SELECT min(d) AS m FROM graft.db.v1")
      .head().getLong(0) == 101L)
    assert(spark.sql("SELECT min(d) AS m FROM graft.db.v1 VERSION AS OF 1")
      .head().getLong(0) == 2L)
    intercept[Exception](
      spark.sql("SELECT * FROM graft.db.v1 VERSION AS OF 9"))
  }

  test("expire_view_versions: keep-last / older-than retention — " +
      "pinned reads of expired versions fail loudly, SHOW CREATE and " +
      "current reads unaffected") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "evbase", Seq("id" -> "long"))
    t.append(Seq(1L, 2L, 3L).toDF("id"))
    // a "daily pipeline redefinition": five versions accrete
    (1 to 5).foreach { k =>
      spark.sql("CREATE OR REPLACE VIEW graft.db.ev AS " +
        s"SELECT id + $k AS d FROM graft.db.evbase")
    }
    assert(spark.sql("SELECT * FROM graft.db.ev.versions").count() == 5L)
    // keep the newest 2 (v4, v5)
    spark.sql("CALL graft.system.expire_view_versions('db.ev', 2)")
    assert(spark.sql("SELECT version_id FROM graft.db.ev.versions")
      .as[Int].collect().sorted.toSeq == Seq(4, 5))
    // current read + SHOW CREATE still round-trip
    assert(spark.sql("SELECT min(d) AS m FROM graft.db.ev")
      .head().getLong(0) == 6L)
    val ddl = spark.sql("SHOW CREATE TABLE graft.db.ev")
      .head().getString(0)
    assert(ddl.contains("id + 5"), ddl)
    // surviving pinned version answers; expired one fails loudly
    assert(spark.sql("SELECT min(d) AS m FROM graft.db.ev VERSION AS OF 4")
      .head().getLong(0) == 5L)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft.db.ev VERSION AS OF 2").collect())
    assert(e.getMessage.contains("no version 2"), e.getMessage)
    // the CURRENT version can never expire, whatever keep_last says
    // combined with an age cutoff in the future
    spark.sql("CALL graft.system.expire_view_versions('db.ev', 1, " +
      s"${Long.MaxValue}L)")
    assert(spark.sql("SELECT version_id FROM graft.db.ev.versions")
      .as[Int].collect().toSeq == Seq(5))
    assert(spark.sql("SELECT min(d) AS m FROM graft.db.ev")
      .head().getLong(0) == 6L)
    // API form with an age cutoff: nothing younger than the cutoff is
    // dropped even beyond keep_last
    spark.sql("CREATE OR REPLACE VIEW graft.db.ev AS " +
      "SELECT id + 9 AS d FROM graft.db.evbase")
    val loc = graft.catalog.GraftViewSql.viewLocation(spark, "db", "ev").get
    assert(ViewIO.expireVersions(loc, 1, olderThanMs = 0L).isEmpty,
      "age cutoff 0 must retain everything")
    assert(spark.sql("SELECT * FROM graft.db.ev.versions").count() == 2L)
  }

  test("definition context: unqualified names resolve where the author sat") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("dbx", "nums", Seq("n" -> "long"))
    t.append(Seq(5L, 6L).toDF("n"))
    spark.sql("USE graft.dbx")
    try {
      // body references bare `nums`; ident is 1-part under current ns
      spark.sql("CREATE VIEW ctxv AS SELECT sum(n) AS s FROM nums")
      assert(spark.sql("SELECT s FROM ctxv").head().getLong(0) == 11L)
      // a reader sitting ELSEWHERE still resolves the body correctly
      spark.sql("USE spark_catalog.default")
      assert(spark.sql("SELECT s FROM graft.dbx.ctxv").head().getLong(0) == 11L)
    } finally spark.sql("USE spark_catalog.default")
  }

  test("views over views, column aliases, cycle detection") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "b2", Seq("id" -> "long"))
    t.append(Seq(1L, 2L, 3L, 4L).toDF("id"))
    spark.sql("CREATE VIEW graft.db.even (e) AS " +
      "SELECT id FROM graft.db.b2 WHERE id % 2 = 0")
    spark.sql("CREATE VIEW graft.db.esum AS SELECT sum(e) AS s FROM graft.db.even")
    assert(spark.sql("SELECT s FROM graft.db.esum").head().getLong(0) == 6L)
    // cycle: rewire `even` to read `esum` — both reads must now fail
    // with an explicit cycle error, not an analyzer loop
    spark.sql("CREATE OR REPLACE VIEW graft.db.even (e) AS " +
      "SELECT s AS id FROM graft.db.esum")
    val e = intercept[Exception](spark.sql("SELECT * FROM graft.db.even").collect())
    assert(e.getMessage.contains("cycle"), e.getMessage)
    // CTE names inside a view body must NOT be catalog-qualified
    spark.sql("CREATE VIEW graft.db.wcte AS " +
      "WITH tmp AS (SELECT id FROM graft.db.b2 WHERE id <= 2) " +
      "SELECT count(*) AS n FROM tmp")
    assert(spark.sql("SELECT n FROM graft.db.wcte").head().getLong(0) == 2L)
  }

  test("DML against a view is rejected with a clear error") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "b3", Seq("id" -> "long"))
    t.append(Seq(1L).toDF("id"))
    spark.sql("CREATE VIEW graft.db.vd AS SELECT id FROM graft.db.b3")
    for (stmt <- Seq(
        "INSERT INTO graft.db.vd VALUES (9)",
        "DELETE FROM graft.db.vd WHERE id = 1",
        "UPDATE graft.db.vd SET id = 2 WHERE id = 1",
        "MERGE INTO graft.db.vd USING (SELECT 1 AS id) s ON vd.id = s.id " +
          "WHEN MATCHED THEN DELETE")) {
      val e = intercept[Exception](spark.sql(stmt))
      assert(e.getMessage.contains("view"), s"$stmt -> ${e.getMessage}")
    }
    assert(t.read().count() == 1)
  }

  test("show, drop, rename, properties, metadata guards") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "b4", Seq("id" -> "long"))
    t.append(Seq(1L).toDF("id"))
    spark.sql("CREATE VIEW graft.db.sv1 COMMENT 'first' " +
      "TBLPROPERTIES ('team'='data') AS SELECT id FROM graft.db.b4")
    spark.sql("CREATE VIEW graft.db.sv2 AS SELECT id FROM graft.db.b4")
    assert(spark.sql("SHOW VIEWS IN graft.db").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSeq ==
      Seq(("db", "sv1", false), ("db", "sv2", false)))
    // SHOW TABLES must NOT list views; a view is not a table
    assert(!spark.sql("SHOW TABLES IN graft.db").collect()
      .map(_.getString(1)).contains("sv1"))
    val nsCat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftNamespaceCatalog]
    assert(!nsCat.tableExists(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "sv1")))
    // properties round-trip through ALTER VIEW SET/UNSET
    spark.sql("ALTER VIEW graft.db.sv1 SET TBLPROPERTIES ('tier'='gold')")
    spark.sql("ALTER VIEW graft.db.sv1 UNSET TBLPROPERTIES ('team')")
    val loc = java.nio.file.Paths.get(cat.warehouse, "db", "sv1").toString
    val m = ViewIO.read(loc)
    assert(m.properties == Map("comment" -> "first", "tier" -> "gold"))
    // property changes do NOT bump the definition version
    assert(m.currentVersionId == 1 && m.versions.size == 1)
    // rename moves the directory, same-namespace shorthand
    spark.sql("ALTER VIEW graft.db.sv2 RENAME TO sv3")
    assert(spark.sql("SELECT id FROM graft.db.sv3").head().getLong(0) == 1L)
    intercept[Exception](spark.sql("SELECT * FROM graft.db.sv2").collect())
    // drop: IF EXISTS tolerates absence; bare drop of a missing view throws
    spark.sql("DROP VIEW graft.db.sv3")
    spark.sql("DROP VIEW IF EXISTS graft.db.sv3")
    intercept[Exception](spark.sql("DROP VIEW graft.db.sv3"))
    // a TABLE is not droppable as a view, nor shadowable by CREATE VIEW
    intercept[Exception](spark.sql("DROP VIEW graft.db.b4"))
    intercept[Exception](
      spark.sql("CREATE VIEW graft.db.b4 AS SELECT 1 AS x"))
  }

  test("CTE bodies: referenced twice (self-join), nested in subquery") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "b8", Seq("id" -> "long"))
    t.append(Seq(1L, 2L, 3L).toDF("id"))
    // the inlined CTE appears at TWO reference sites — the analyzer's
    // DeduplicateRelations must disambiguate the duplicated exprIds
    spark.sql("CREATE VIEW graft.db.wjoin AS " +
      "WITH t8 AS (SELECT id FROM graft.db.b8) " +
      "SELECT a.id AS x, b.id AS y FROM t8 a JOIN t8 b ON a.id = b.id - 1")
    assert(spark.sql("SELECT x, y FROM graft.db.wjoin ORDER BY x").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L), (2L, 3L)))
    // CTE name referenced from inside a subquery expression
    spark.sql("CREATE VIEW graft.db.wsub AS " +
      "WITH big AS (SELECT id FROM graft.db.b8 WHERE id >= 2) " +
      "SELECT id FROM graft.db.b8 WHERE id IN (SELECT id FROM big)")
    assert(spark.sql("SELECT id FROM graft.db.wsub ORDER BY id")
      .as[Long].collect().toSeq == Seq(2L, 3L))
  }

  test("DDL grammar: clause reordering, escaped quotes, clear errors") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "b9", Seq("id" -> "long"))
    t.append(Seq(7L).toDF("id"))
    // TBLPROPERTIES before COMMENT; comment contains ')' and an
    // ''-escaped quote; property value contains ',' and ')'
    spark.sql("CREATE VIEW graft.db.gv1 " +
      "TBLPROPERTIES ('path'='a,b)c', 'team'='data') " +
      "COMMENT 'it''s (v1)' AS SELECT id FROM graft.db.b9")
    val loc = java.nio.file.Paths.get(cat.warehouse, "db", "gv1").toString
    val m = ViewIO.read(loc)
    assert(m.properties == Map(
      "path" -> "a,b)c", "team" -> "data", "comment" -> "it's (v1)"))
    assert(spark.sql("SELECT id FROM graft.db.gv1").head().getLong(0) == 7L)
    // aliases after COMMENT still parse
    spark.sql("CREATE VIEW graft.db.gv2 COMMENT 'c' (k) " +
      "AS SELECT id FROM graft.db.b9")
    assert(spark.table("graft.db.gv2").columns.toSeq == Seq("k"))
    // a malformed clause on a graft target fails with a graft-side
    // error naming the grammar — not MISSING_CATALOG_ABILITY
    val e = intercept[Exception](spark.sql(
      "CREATE VIEW graft.db.gv3 COMMENTS 'typo' AS SELECT id FROM graft.db.b9"))
    assert(e.getMessage.contains("Supported grammar"), e.getMessage)
    // ALTER VIEW SET with a paren-containing value round-trips
    spark.sql("ALTER VIEW graft.db.gv1 SET TBLPROPERTIES ('note'='x(y),z')")
    assert(ViewIO.read(loc).properties("note") == "x(y),z")
  }

  test("SHOW CREATE TABLE on a view round-trips; .versions audits history") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "b10", Seq("id" -> "long"))
    t.append(Seq(1L, 2L).toDF("id"))
    spark.sql("CREATE VIEW graft.db.scv (k) COMMENT 'it''s v1' " +
      "TBLPROPERTIES ('team'='data') AS SELECT id FROM graft.db.b10")
    val stmt = spark.sql("SHOW CREATE TABLE graft.db.scv").head().getString(0)
    assert(stmt.contains("CREATE VIEW graft.db.scv (k)"), stmt)
    assert(stmt.contains("COMMENT 'it''s v1'") &&
      stmt.contains("'team' = 'data'"), stmt)
    // the emitted statement re-parses: drop, replay, read again
    spark.sql("DROP VIEW graft.db.scv")
    spark.sql(stmt)
    assert(spark.sql("SELECT k FROM graft.db.scv ORDER BY k")
      .as[Long].collect().toSeq == Seq(1L, 2L))
    // SHOW CREATE TABLE on a TABLE stays Spark's own v2 path
    assert(spark.sql("SHOW CREATE TABLE graft.db.b10").head().getString(0)
      .contains("CREATE TABLE graft.db.b10"))
    // versions relation: replace appends a row, currency moves
    spark.sql("CREATE OR REPLACE VIEW graft.db.scv AS " +
      "SELECT id * 10 AS k FROM graft.db.b10")
    val vs = spark.sql("SELECT version_id, is_current, sql " +
      "FROM graft.db.scv.versions ORDER BY version_id").collect()
    assert(vs.length == 2)
    assert(vs(0).getInt(0) == 1 && !vs(0).getBoolean(1) &&
      vs(0).getString(2).contains("SELECT id FROM"))
    assert(vs(1).getInt(0) == 2 && vs(1).getBoolean(1) &&
      vs(1).getString(2).contains("id * 10"))
  }

  test("DESCRIBE / SHOW COLUMNS / SHOW TBLPROPERTIES / REFRESH on views") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "b11", Seq("id" -> "long"))
    t.append(Seq(1L).toDF("id"))
    spark.sql("CREATE VIEW graft.db.iv (key, dbl) COMMENT 'c1' " +
      "TBLPROPERTIES ('tier'='gold') AS " +
      "SELECT id, id * 2 FROM graft.db.b11")
    assert(spark.sql("DESCRIBE graft.db.iv").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("key", "bigint"), ("dbl", "bigint")))
    val ext = spark.sql("DESCRIBE EXTENDED graft.db.iv").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(ext("Type") == "VIEW" && ext("View Version") == "1")
    assert(ext("View Text").contains("SELECT id, id * 2"), ext)
    assert(spark.sql("SHOW COLUMNS IN graft.db.iv").collect()
      .map(_.getString(0)).toSeq == Seq("key", "dbl"))
    assert(spark.sql("SHOW TBLPROPERTIES graft.db.iv").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("comment", "c1"), ("tier", "gold")))
    spark.sql("REFRESH TABLE graft.db.iv") // late binding: no-op success
    // a TABLE target keeps Spark's own paths for all four statements
    assert(spark.sql("DESCRIBE graft.db.b11").collect()
      .map(_.getString(0)).contains("id"))
    assert(spark.sql("SHOW COLUMNS IN graft.db.b11").collect()
      .map(_.getString(0)).toSeq == Seq("id"))
    spark.sql("REFRESH TABLE graft.db.b11")
  }

  test("temp-view references are rejected at create; temp DDL untouched") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "b5", Seq("id" -> "long"))
    t.append(Seq(1L).toDF("id"))
    // graft parser must leave Spark's temporary-view DDL alone
    spark.sql("CREATE TEMPORARY VIEW tmp_nums AS SELECT 42 AS n")
    assert(spark.sql("SELECT n FROM tmp_nums").head().getInt(0) == 42)
    val e = intercept[Exception](
      spark.sql("CREATE VIEW graft.db.overtmp AS SELECT n FROM tmp_nums"))
    assert(e.getMessage.contains("temporary"), e.getMessage)
    spark.sql("DROP VIEW tmp_nums") // session temp view: Spark's own path
  }

  test("ALTER VIEW ... AS preserves TBLPROPERTIES and COMMENT; " +
      "CREATE OR REPLACE resets them") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "pv", Seq("id" -> "long"))
    t.append(Seq(1L, 2L).toDF("id"))
    spark.sql("CREATE VIEW graft.db.keepprops COMMENT 'the comment' " +
      "TBLPROPERTIES ('owner'='alice') AS SELECT id FROM graft.db.pv")
    // definition-only change: properties and comment survive
    spark.sql("ALTER VIEW graft.db.keepprops AS SELECT id * 2 AS d " +
      "FROM graft.db.pv")
    val props = spark.sql("SHOW TBLPROPERTIES graft.db.keepprops")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("owner").contains("alice"), props.toString)
    assert(props.get("comment").contains("the comment"), props.toString)
    assert(spark.sql("SELECT * FROM graft.db.keepprops ORDER BY d")
      .as[Long].collect().toSeq == Seq(2L, 4L))
    // CREATE OR REPLACE is the resetting form
    spark.sql("CREATE OR REPLACE VIEW graft.db.keepprops AS " +
      "SELECT id FROM graft.db.pv")
    val props2 = spark.sql("SHOW TBLPROPERTIES graft.db.keepprops")
      .collect().map(_.getString(0)).toSet
    assert(!props2.contains("owner"), props2.toString)
  }

  test("DROP/ALTER VIEW on a TEMPORARY view stays Spark's even under " +
      "a graft current catalog; CTE names shadow temp views at create; " +
      "temp refs inside subquery expressions are rejected") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "b6", Seq("id" -> "long"))
    t.append(Seq(1L, 2L).toDF("id"))
    spark.sql("USE graft.db")
    try {
      // 1-part DROP VIEW of a temp view must reach Spark's path, not
      // the stored-view command (which would throw NoSuchView / no-op)
      spark.range(1).createOrReplaceTempView("tv_hijack")
      spark.sql("DROP VIEW tv_hijack")
      assert(spark.sessionState.catalog.getTempView("tv_hijack").isEmpty,
        "temp view must actually drop")
      // a CTE named like a temp view is NOT a temp reference — the
      // expansion inlines the CTE before any catalog lookup
      spark.range(5).createOrReplaceTempView("shadowed")
      spark.sql("CREATE VIEW graft.db.cteshadow AS " +
        "WITH shadowed AS (SELECT 7 AS a) SELECT * FROM shadowed")
      assert(spark.sql("SELECT a FROM graft.db.cteshadow")
        .as[Int].collect().toSeq == Seq(7))
      // a temp view hidden in a subquery EXPRESSION must be rejected
      // (it would store fine and break every later read)
      val e = intercept[Exception](spark.sql(
        "CREATE VIEW graft.db.subq AS SELECT id FROM graft.db.b6 " +
          "WHERE id IN (SELECT id FROM shadowed)"))
      assert(e.getMessage.contains("temporary"), e.getMessage)
      spark.sql("DROP VIEW shadowed")
    } finally spark.sql("USE spark_catalog")
  }

  test("CTE visibility is per scope: a same-named temp reference " +
      "OUTSIDE the defining subquery is still rejected") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "b7", Seq("id" -> "long"))
    t.append(Seq(1L).toDF("id"))
    spark.sql("USE graft.db")
    try {
      spark.range(3).createOrReplaceTempView("scoped")
      // the CTE 'scoped' exists only inside the subquery; the OUTER
      // 'scoped' resolves to the temp view — a statement-wide CTE name
      // set used to let this store and rebind/break at read time
      val e = intercept[Exception](spark.sql(
        "CREATE VIEW graft.db.ctescope AS SELECT * FROM " +
          "(WITH scoped AS (SELECT 1 AS x) SELECT * FROM scoped) q " +
          "CROSS JOIN scoped"))
      assert(e.getMessage.contains("temporary"), e.getMessage)
      // the CTE-visible shape still stores fine
      spark.sql("CREATE VIEW graft.db.ctescope_ok AS SELECT * FROM " +
        "(WITH scoped AS (SELECT 1 AS x) SELECT * FROM scoped) q")
      assert(spark.sql("SELECT x FROM graft.db.ctescope_ok")
        .as[Int].collect().toSeq == Seq(1))
      spark.sql("DROP VIEW scoped")
    } finally spark.sql("USE spark_catalog")
  }

  test("TIMESTAMP AS OF pins the definition that was current then") {
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "b6", Seq("id" -> "long"))
    t.append(Seq(1L, 2L).toDF("id"))
    spark.sql("CREATE VIEW graft.db.tv AS SELECT count(*) AS c FROM graft.db.b6")
    val between = System.currentTimeMillis()
    Thread.sleep(5)
    spark.sql("CREATE OR REPLACE VIEW graft.db.tv AS " +
      "SELECT count(*) * 100 AS c FROM graft.db.b6")
    assert(spark.sql("SELECT c FROM graft.db.tv").head().getLong(0) == 200L)
    val ts = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(between), java.time.ZoneOffset.UTC)
      .toString.replace("T", " ")
    assert(spark.sql(s"SELECT c FROM graft.db.tv TIMESTAMP AS OF '$ts'")
      .head().getLong(0) == 2L)
  }

  test("programmatic ViewCatalog surface + concurrent replace safety") {
    import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
    import spark.implicits._
    val cat = freshCat()
    val t = cat.createTable("db", "b7", Seq("id" -> "long"))
    t.append(Seq(1L).toDF("id"))
    val vc = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftNamespaceCatalog]
    val ident = Identifier.of(Array("db"), "pv")
    val schema = spark.sql("SELECT id FROM graft.db.b7").schema
    def info(sql: String) = new ViewInfo(ident, sql, "graft", Array("db"),
      schema, Array("id"), Array.empty, Array.empty,
      new java.util.HashMap[String, String]())
    vc.createView(info("SELECT id FROM graft.db.b7"))
    assert(vc.viewExists(ident))
    assert(vc.loadView(ident).query() == "SELECT id FROM graft.db.b7")
    intercept[Exception](vc.createView(info("SELECT 1 AS id")))
    vc.replaceView(info("SELECT id + 1 AS id FROM graft.db.b7"),
      orCreate = false)
    assert(spark.sql("SELECT id FROM graft.db.pv").head().getLong(0) == 2L)
    // the claim protocol: racing commits of one view serialize on the
    // atomic link(2) slot claim — exactly one writer per slot
    val loc = java.nio.file.Paths.get(cat.warehouse, "db", "pv").toString
    val base = ViewIO.read(loc)
    val racers = (0 until 8).map { i =>
      java.util.concurrent.CompletableFuture.supplyAsync { () =>
        try { ViewIO.commit(loc, base.copy(
          properties = Map("who" -> s"w$i"))); 1 }
        catch { case _: Exception => 0 }
      }
    }
    val wins = racers.map(_.join()).sum
    assert(wins >= 1, "at least one racer must commit")
    val fin = ViewIO.read(loc)
    assert(fin.properties.get("who").exists(_.startsWith("w")))
  }
}
