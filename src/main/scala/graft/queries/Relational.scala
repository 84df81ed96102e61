package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** One named query with an optional DuckDB oracle.
  *
  * Determinism contract (the driver hash-compares against DuckDB):
  *   - every query ends in a total ORDER BY over non-null keys, mirrored
  *     in the oracle SQL;
  *   - double aggregates are round()ed identically on both sides;
  *   - oracle aggregate types are cast to match Spark (DuckDB sum(int)
  *     is HUGEINT, year() is BIGINT — cast to BIGINT/INT).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Relational query surface: the reference's scan/project/filter/distinct/
  * limit operators (SURVEY.md §2.2, apiv15.py:65-249) plus the full
  * relational complement Spark provides natively (§2.3-2.8: joins, aggs,
  * windows, set ops, sorts — absent in the reference but in scope per the
  * capability-floor rule).
  *
  * Scale notes (100 TB design): every query is a declarative DataFrame
  * plan — filters/projections reach the parquet scan via Catalyst pushdown;
  * dimension joins (region/nation/customer/part/supplier) are broadcast;
  * fact-fact joins shuffle on their join key only after partial
  * aggregation where possible.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)

  val all: Seq[QueryDef] = Seq(

    // ---- Aggregation (SURVEY §2.4; TPC-H Q1 shape) -----------------------
    QueryDef(
      "q01_pricing_summary",
      (s, d) => {
        li(s, d)
          .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """)),

    // ---- Projection + filter (SURVEY §2.2 P2/P3 + F1-F4) -----------------
    QueryDef(
      "q02_filter_project",
      (s, d) => {
        li(s, d)
          .filter(col("l_quantity") > lit(45.0) &&
            col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity > 45.0 AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        ORDER BY l_orderkey, l_linenumber
      """)),

    // ---- DISTINCT (SURVEY §2.2 P5, notebook cell 35) ---------------------
    QueryDef(
      "q03_distinct",
      (s, d) =>
        li(s, d).select(col("l_returnflag"), col("l_linestatus")).distinct()
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""
        SELECT DISTINCT l_returnflag, l_linestatus
        FROM lineitem
        ORDER BY l_returnflag, l_linestatus
      """)),

    // ---- Top-k: ORDER BY + LIMIT → TakeOrderedAndProject (SURVEY §2.6) ---
    QueryDef(
      "q04_topk",
      (s, d) =>
        ord(s, d)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
      """)),

    // ---- Multi-way join + agg (SURVEY §2.3; TPC-H Q5 shape) --------------
    // customer/nation/region are dims → broadcast; lineitem⋈orders is the
    // only shuffle join and AQE coalesces its partitions.
    QueryDef(
      "q05_revenue_by_nation",
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        val o = ord(s, d)
        val l = li(s, d)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""
        SELECT r_name, n_name,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
      """)),

    // ---- Broadcast dim join + agg ---------------------------------------
    QueryDef(
      "q06_brand_volume",
      (s, d) => {
        val p = Tables.part(s, d)
        li(s, d)
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            round(sum(col("l_quantity")), 2).as("total_qty"),
            round(avg(col("l_extendedprice")), 2).as("avg_price"),
            count(lit(1)).as("n_items"))
          .orderBy(col("p_brand"))
      },
      Some("""
        SELECT p_brand,
               round(sum(l_quantity), 2) AS total_qty,
               round(avg(l_extendedprice), 2) AS avg_price,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY p_brand
      """)),

    // ---- Window functions (SURVEY §2.5) ----------------------------------
    QueryDef(
      "q07_top_customers_per_nation",
      (s, d) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.customer(s, d)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("c_nationkey"), col("rk"), col("c_custkey"),
            round(col("c_acctbal"), 2).as("acctbal"))
          .orderBy(col("c_nationkey"), col("rk"))
      },
      Some("""
        SELECT c_nationkey, CAST(rk AS INT) AS rk, c_custkey,
               round(c_acctbal, 2) AS acctbal
        FROM (
          SELECT c_nationkey, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey) AS rk
          FROM customer) t
        WHERE rk <= 3
        ORDER BY c_nationkey, rk
      """)),

    // ---- Running window aggregate ---------------------------------------
    QueryDef(
      "q08_running_order_total",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ord(s, d)
          .withColumn("running_spend", round(sum(col("o_totalprice")).over(w), 2))
          .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_spend
        FROM orders
        ORDER BY o_custkey, o_orderkey
      """)),

    // ---- Set operations (SURVEY §2.7) ------------------------------------
    QueryDef(
      "q09_union",
      (s, d) => {
        val c = Tables.customer(s, d)
        val a = c.filter(col("c_mktsegment") === lit("BUILDING")).select(col("c_custkey"))
        val b = c.filter(col("c_acctbal") > lit(9000.0)).select(col("c_custkey"))
        a.union(b).distinct().orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
        ORDER BY c_custkey
      """)),

    QueryDef(
      "q10_except_intersect",
      (s, d) => {
        val c = Tables.customer(s, d)
        val big = c.filter(col("c_acctbal") > lit(5000.0)).select(col("c_custkey"))
        val building = c.filter(col("c_mktsegment") === lit("BUILDING")).select(col("c_custkey"))
        val machinery = c.filter(col("c_mktsegment") === lit("MACHINERY")).select(col("c_custkey"))
        big.intersect(building.union(machinery))
          .except(c.filter(col("c_acctbal") > lit(9500.0)).select(col("c_custkey")))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey FROM (
          SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
          INTERSECT
          (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           UNION
           SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          EXCEPT
          SELECT c_custkey FROM customer WHERE c_acctbal > 9500.0) t
        ORDER BY c_custkey
      """)),

    // ---- Scalar date functions (SURVEY §2.8: YEAR/DATE/interval) ---------
    QueryDef(
      "q11_date_scalars",
      (s, d) =>
        ord(s, d)
          .filter(col("o_orderkey") % 100 === 0)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("order_year"),
            month(col("o_orderdate")).as("order_month"),
            to_date(col("o_orderdate")).as("order_date"),
            (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_ts"))
          .orderBy(col("o_orderkey")),
      Some("""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(month(o_orderdate) AS INT) AS order_month,
               CAST(o_orderdate AS DATE) AS order_date,
               o_orderdate + INTERVAL 30 DAY AS due_ts
        FROM orders
        WHERE o_orderkey % 100 = 0
        ORDER BY o_orderkey
      """)),

    // ---- NULL + inequality predicates (SURVEY §2.2 F5/F6) ---------------
    // the fixture has no NULL columns; nullif derives them
    // deterministically so IS NULL / IS NOT NULL / != run under oracle
    QueryDef(
      "q17_null_predicates",
      (s, d) =>
        li(s, d)
          .withColumn("flag", nullif(col("l_returnflag"), lit("N")))
          .filter(col("flag").isNull && col("l_linestatus") =!= "F" &&
            col("l_quantity") > lit(49.0))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("flag"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity,
               nullif(l_returnflag, 'N') AS flag
        FROM lineitem
        WHERE nullif(l_returnflag, 'N') IS NULL
          AND l_linestatus != 'F' AND l_quantity > 49.0
        ORDER BY l_orderkey, l_linenumber
      """)),

    // ---- ROLLUP grouping (SURVEY §2.4: grouping-set builtins) ------------
    QueryDef(
      "q12_rollup",
      (s, d) =>
        li(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
      """)),

    // ---- Semi join / EXISTS (SURVEY §2.3) --------------------------------
    QueryDef(
      "q13_semi_join",
      (s, d) => {
        val bigItems = li(s, d).filter(col("l_quantity") >= lit(49.5))
        ord(s, d)
          .join(bigItems, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select(col("o_orderkey"), col("o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, o_orderstatus
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 49.5)
        ORDER BY o_orderkey
      """)),

    // ---- Anti join / NOT EXISTS ------------------------------------------
    QueryDef(
      "q14_anti_join",
      (s, d) => {
        val bigOrders = ord(s, d).filter(col("o_totalprice") > lit(150000.0))
        Tables.customer(s, d)
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_totalprice > 150000.0)
        ORDER BY c_custkey
      """)),

    // ---- Conditional aggregation (CASE WHEN pivot shape) -----------------
    QueryDef(
      "q15_status_pivot",
      (s, d) =>
        ord(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
            sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
            sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
            round(avg(col("o_totalprice")), 2).as("avg_price"))
          .orderBy(col("o_orderpriority")),
      Some("""
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
               round(avg(o_totalprice), 2) AS avg_price
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """)),

    // ---- Time-bucketed event aggregation (events.ts; batch shape of the
    //      streaming tumbling window) ------------------------------------
    QueryDef(
      "q16_hourly_events",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value")), 2).as("total_value"))
          .orderBy(col("hour"), col("event_type")),
      Some("""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY hour, event_type
      """)),

    // ---- Correlated subqueries (scalar + EXISTS) -------------------------
    // Catalyst decorrelates both into joins (the scalar subquery into an
    // aggregate-then-join, EXISTS into a left-semi); no hand-written
    // join needed, and the plan scales like any grouped join. Threshold
    // margin: prices are ~1e4 apart while cross-engine avg drift is
    // ~1e-10, so the > comparison cannot flip between engines.
    QueryDef(
      "q73_correlated_subquery",
      (s, d) => {
        ord(s, d).createOrReplaceTempView("q73_orders")
        Tables.customer(s, d).createOrReplaceTempView("q73_customer")
        s.sql("""
          SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
          FROM q73_customer c JOIN q73_orders o ON o.o_custkey = c.c_custkey
          WHERE o.o_totalprice > (SELECT 2 * avg(o2.o_totalprice)
                                  FROM q73_orders o2
                                  WHERE o2.o_custkey = c.c_custkey)
            AND EXISTS (SELECT 1 FROM q73_orders o3
                        WHERE o3.o_custkey = c.c_custkey
                          AND o3.o_orderstatus = 'F')
          ORDER BY c.c_custkey, o.o_orderkey
        """)
      },
      Some("""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice > (SELECT 2 * avg(o2.o_totalprice)
                                FROM orders o2
                                WHERE o2.o_custkey = c.c_custkey)
          AND EXISTS (SELECT 1 FROM orders o3
                      WHERE o3.o_custkey = c.c_custkey
                        AND o3.o_orderstatus = 'F')
        ORDER BY c.c_custkey, o.o_orderkey
      """)),

    // ---- Semi-structured extraction (JSON column) ----------------------
    // events.props is a JSON string; the Spark side parses it with a
    // schema'd from_json (codegen'd, no UDF), the oracle with DuckDB's
    // json extension — same extracted values, aggregated identically.
    QueryDef(
      "q132_json_extract",
      (s, d) => {
        import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
        val schema = StructType(Seq(StructField("k", IntegerType)))
        Tables.events(s, d)
          .select(col("event_type"),
            from_json(col("props"), schema).getField("k").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
            round(avg(col("k")), 4).as("avg_k"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH x AS (
          SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS INT) AS k
          FROM events
        )
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(k) AS BIGINT) AS sum_k,
               round(avg(k), 4) AS avg_k
        FROM x GROUP BY 1 ORDER BY event_type
      """)),

    // ---- CUBE + grouping_id (SURVEY §2.4 completeness) -----------------
    QueryDef(
      "q133_cube",
      (s, d) =>
        li(s, d)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
            count(lit(1)).as("n"), grouping_id().as("gid"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first, col("gid")),
      Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST,
                 l_linestatus ASC NULLS FIRST, gid
      """))
  )
}
