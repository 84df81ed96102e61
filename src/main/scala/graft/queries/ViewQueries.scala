package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.catalog.GraftCatalog

/** Stored SQL views (SURVEY §8 V1-V4): Iceberg-view-spec semantics —
  * late binding, versioned definitions, definition-context name
  * resolution — driven end-to-end through the injected parser
  * (CREATE/REPLACE VIEW) and resolution rule (reads), oracled against
  * DuckDB running the equivalent flat SQL over the same parquet.
  *
  * One shared fixture: base tables + the whole view DDL script run
  * once per scale; each query then reads through `spark.sql` exactly
  * as a user would. Reads re-pin `spark.graft.warehouse` because
  * other query modules repoint it between invocations.
  */
object ViewQueries {

  import Scratch.{dir => scratch, setupOnce}

  private def viewWarehouse(s: SparkSession, d: String): String =
    setupOnce("q160", d) {
      val w = scratch("views")
      val cat = new GraftCatalog(s, w)
      cat.createDatabase("db1")
      val sup = Tables.supplier(s, d)
        .select("s_suppkey", "s_name", "s_acctbal")
      // half the rows now — the other half appends AFTER the views
      // exist, proving late binding (the view re-analyzes per read)
      val t = cat.createTableAs("db1", "supp_b",
        sup.filter(col("s_suppkey") % 2 === 0))
      cat.createTableAs("db1", "nation_b",
        Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey"))
      s.sql("""CREATE VIEW graft.db1.supp_rich AS
        SELECT s_suppkey, s_name, s_acctbal FROM graft.db1.supp_b
        WHERE s_acctbal > 1000.0""")
      // version 1 reads region 1; the replace (version 2) flips the
      // predicate — VERSION AS OF 1 must still see the original
      s.sql("""CREATE VIEW graft.db1.nat_pick AS
        SELECT n_nationkey, n_name FROM graft.db1.nation_b
        WHERE n_regionkey = 1""")
      s.sql("""CREATE OR REPLACE VIEW graft.db1.nat_pick AS
        SELECT n_nationkey, n_name FROM graft.db1.nation_b
        WHERE n_regionkey = 2""")
      // view over a view with recorded column aliases
      s.sql("""CREATE VIEW graft.db1.supp_cols (k, bal) AS
        SELECT s_suppkey, s_acctbal FROM graft.db1.supp_rich""")
      s.sql("""CREATE VIEW graft.db1.supp_agg AS
        SELECT count(*) AS n, min(bal) AS lo, max(bal) AS hi
        FROM graft.db1.supp_cols""")
      // CTE-bodied view, the CTE referenced twice (self-join) — the
      // r12 regression: substitution must happen inside expand()
      s.sql("""CREATE VIEW graft.db1.nat_pairs AS
        WITH nr AS (SELECT n_nationkey, n_name, n_regionkey
                    FROM graft.db1.nation_b)
        SELECT a.n_name AS name_a, b.n_name AS name_b
        FROM nr a JOIN nr b
          ON a.n_regionkey = b.n_regionkey
         AND a.n_nationkey < b.n_nationkey""")
      t.append(sup.filter(col("s_suppkey") % 2 =!= 0))
      w
    }

  private def pinned(s: SparkSession, d: String): Unit =
    s.conf.set("spark.graft.warehouse", viewWarehouse(s, d))

  val all: Seq[QueryDef] = Seq(

    // plain read through a stored view, late-bound over a post-create
    // append — the oracle sees ALL supplier rows
    QueryDef(
      "q160_view_read",
      (s, d) => {
        pinned(s, d)
        s.sql("""SELECT s_suppkey, s_name, s_acctbal
          FROM graft.db1.supp_rich ORDER BY s_suppkey""")
      },
      Some("""
        SELECT s_suppkey, s_name, s_acctbal FROM supplier
        WHERE s_acctbal > 1000.0 ORDER BY s_suppkey
      """)),

    // VERSION AS OF pins the DEFINITION (region 1), not the data
    QueryDef(
      "q161_view_version_pinned",
      (s, d) => {
        pinned(s, d)
        s.sql("""SELECT n_nationkey, n_name
          FROM graft.db1.nat_pick VERSION AS OF 1
          ORDER BY n_nationkey""")
      },
      Some("""
        SELECT n_nationkey, n_name FROM nation
        WHERE n_regionkey = 1 ORDER BY n_nationkey
      """)),

    // view over an aliased view: exact aggregates (count/min/max)
    QueryDef(
      "q162_view_over_view",
      (s, d) => {
        pinned(s, d)
        s.sql("SELECT n, lo, hi FROM graft.db1.supp_agg")
      },
      Some("""
        SELECT CAST(count(*) AS BIGINT) AS n,
               min(s_acctbal) AS lo, max(s_acctbal) AS hi
        FROM supplier WHERE s_acctbal > 1000.0
      """)),

    // CTE-bodied view with the CTE at two reference sites
    QueryDef(
      "q163_view_cte",
      (s, d) => {
        pinned(s, d)
        s.sql("""SELECT name_a, name_b FROM graft.db1.nat_pairs
          ORDER BY name_a, name_b""")
      },
      Some("""
        SELECT a.n_name AS name_a, b.n_name AS name_b
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey
         AND a.n_nationkey < b.n_nationkey
        ORDER BY name_a, name_b
      """))
  )
}
