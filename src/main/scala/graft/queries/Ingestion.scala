package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ingest.CsvIngest

/** CSV ingest surface (SURVEY §2.1 S3): round-trips a dd-MM-yy CSV
  * written inside the query from the orders table — the same parquet
  * the oracle reads — through CsvIngest's parse + errors→null +
  * century-fix cleaning.
  *
  * Century-fix oracle equivalence: Spark's 'yy' pattern maps 92→2092,
  * then the fix subtracts 100 → 1992; DuckDB's C-style strptime %y
  * pivots 69-99 → 19xx directly. Both land on the same date, which is
  * the point of the fix.
  */
object Ingestion {

  import Scratch.{dir => scratch, setupOnce}

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q51_csv_ingest",
      (s, d) => {
        // CSV written once per scale; repeat invocations measure ingest
        val dir = setupOnce("q51", d) {
          import s.implicits._
          val dir0 = scratch("csv")
          val src = Tables.orders(s, d).select(
              col("o_orderkey").cast("long").as("k"),
              date_format(col("o_orderdate"), "dd-MM-yy").as("d"))
            .unionByName(Seq((-1L, "not-a-date"), (-2L, "31-02-95"))
              .toDF("k", "d")) // malformed rows must coerce to NULL
          src.coalesce(1).write.option("header", "true").mode("overwrite").csv(dir0)
          dir0
        }
        CsvIngest.readCsv(s, dir, dateCols = Seq("d"))
          .select(col("k").cast("long").as("k"), col("d"))
          .orderBy(col("k"))
      },
      Some("""
        SELECT CAST(o_orderkey AS BIGINT) AS k,
               CAST(strptime(strftime(o_orderdate, '%d-%m-%y'), '%d-%m-%y')
                    AS DATE) AS d
        FROM orders
        UNION ALL SELECT -1, NULL
        UNION ALL SELECT -2, NULL
        ORDER BY k
      """))
  )
}
