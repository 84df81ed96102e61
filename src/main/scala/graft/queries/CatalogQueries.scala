package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.Tables
import graft.catalog.GraftCatalog

/** Catalog + SQL-text surface (SURVEY D1/D7/D8 + §2.11 SQL forms):
  * tables registered under `graft.<db>.<table>` and queried through
  * SQL text — joins, aggregation, and time travel included — exactly
  * how the reference addresses `iceberg.employee_db.employee`
  * (apiv15.py:65, notebook cells 2-5).
  */
object CatalogQueries {

  private def scratch(prefix: String): String =
    Files.createTempDirectory(s"graft-$prefix").toString

  private val built =
    new scala.collection.concurrent.TrieMap[(String, String), AnyRef]

  private def setupOnce[T <: AnyRef](name: String, d: String)(f: => T): T =
    built.getOrElseUpdate((name, d), f).asInstanceOf[T]

  val all: Seq[QueryDef] = Seq(

    // SQL text over registered names, with a join + agg through spark.sql
    QueryDef(
      "q53_catalog_sql",
      (s, d) => {
        val wh = setupOnce("q53", d) {
          val w = scratch("cat")
          val cat = new GraftCatalog(s, w)
          cat.createDatabase("db1")
          cat.createTableAs("db1", "region_t", Tables.region(s, d))
          cat.createTableAs("db1", "nation_t", Tables.nation(s, d))
          w
        }
        new GraftCatalog(s, wh).sql("""
          SELECT r.r_name, count(*) AS n_nations
          FROM graft.db1.nation_t n
          JOIN graft.db1.region_t r ON n.n_regionkey = r.r_regionkey
          GROUP BY r.r_name
          ORDER BY r.r_name""")
      },
      Some("""
        SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
      """)),

    // NATIVE SQL through the injected Catalyst rule: Spark's own parser
    // and analyzer resolve graft.db.t and its VERSION AS OF clause —
    // no text rewriting anywhere in this path
    QueryDef(
      "q57_native_sql",
      (s, d) => {
        val (wh, v) = setupOnce("q57", d) {
          val w = scratch("natcat")
          val cat = new GraftCatalog(s, w)
          cat.createDatabase("db1")
          val t = cat.createTableAs("db1", "part_t",
            Tables.part(s, d).select("p_partkey", "p_name", "p_brand"))
          val v0 = t.meta.currentSnapshot.get.snapshotId
          t.append(Tables.part(s, d)
            .select("p_partkey", "p_name", "p_brand")
            .limit(0)) // second snapshot, same rows
          (w, java.lang.Long.valueOf(v0))
        }
        // other queries repoint the session's graft warehouse between
        // invocations — native resolution follows the conf, so pin it
        s.conf.set("spark.graft.warehouse", wh)
        s.sql(s"""
          SELECT p_brand, count(*) AS n
          FROM graft.db1.part_t VERSION AS OF ${v.longValue()}
          GROUP BY p_brand ORDER BY p_brand""")
      },
      Some("""
        SELECT p_brand, CAST(count(*) AS BIGINT) AS n
        FROM part GROUP BY p_brand ORDER BY p_brand
      """))
  ) ++ Seq(

    // SQL-text time travel: VERSION AS OF through the catalog
    QueryDef(
      "q54_catalog_time_travel_sql",
      (s, d) => {
        val (wh, v) = setupOnce("q54", d) {
          val w = scratch("cattt")
          val cat = new GraftCatalog(s, w)
          cat.createDatabase("db1")
          val sup = Tables.supplier(s, d)
          val t = cat.createTableAs("db1", "supp_t",
            sup.filter(col("s_suppkey") <= 50))
          val v0 = t.meta.currentSnapshot.get.snapshotId
          t.append(sup.filter(col("s_suppkey") > 50))
          (w, java.lang.Long.valueOf(v0))
        }
        new GraftCatalog(s, wh).sql(s"""
          SELECT s_suppkey, s_name
          FROM graft.db1.supp_t VERSION AS OF ${v.longValue()}
          ORDER BY s_suppkey""")
      },
      Some("""
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey <= 50 ORDER BY s_suppkey
      """))
  )
}
