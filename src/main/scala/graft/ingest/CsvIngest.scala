package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV ingest with the reference's date-cleaning semantics (SURVEY §2.1
  * S3; reference notebook cell 66, raw line ~2152): the reference loads
  * `Employee 1000x.csv` through pandas `to_datetime(format='%d-%m-%y',
  * errors='coerce')` and repairs two-digit years parsed into the future
  * by subtracting 100 years.
  *
  * Re-expressed as pure Column expressions over Spark's native CSV
  * source — no driver-side pandas loop, so ingest scales with the
  * cluster: the CSV scan is splittable, and the cleaning runs codegen'd
  * per partition.
  */
object CsvIngest {

  /** `%d-%m-%y` parse, errors → null, century fix: a parsed year in the
    * future (e.g. '45' -> 2045) becomes last century (1945), mirroring
    * the reference's `x.replace(year=x.year-100)`.
    */
  def cleanDate(c: Column): Column = {
    // try_to_timestamp: unparseable input yields NULL (ANSI-safe),
    // matching pandas errors='coerce'
    val d = try_to_timestamp(c, lit("dd-MM-yy")).cast("date")
    when(year(d) > year(current_date()), add_months(d, -1200)).otherwise(d)
  }

  /** Header CSV read with schema inference; the listed columns are
    * dd-MM-yy date strings to clean (errors->null + century fix).
    */
  def readCsv(spark: SparkSession, path: String,
      dateCols: Seq[String] = Nil): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)
    dateCols.foldLeft(raw)((df, c) =>
      df.withColumn(c, cleanDate(col(s"`$c`"))))
  }
}
