package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ingest.CsvIngest

/** CSV ingest with the reference's employee-style schema and date
  * cleaning (SURVEY S3: `Employee 1000x.csv`, `%d-%m-%y`, errors →
  * null, future years − 100).
  */
class IngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", Some(4))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("employee-style CSV: dd-MM-yy parse, coerce errors, century fix") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val csv =
      """Index,First Name,Last Name,Date of birth,Job Title
        |1,Alice,Smith,15-06-45,Engineer
        |2,Bob,Jones,20-03-99,Analyst
        |3,Carol,Null,not-a-date,Manager
        |4,Dan,Leap,31-02-95,Clerk
        |5,Eve,Young,05-01-10,Intern
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(dir, "employee.csv"), csv)
    val df = CsvIngest.readCsv(spark, dir, dateCols = Seq("Date of birth"))
    assert(df.columns.toSeq ==
      Seq("Index", "First Name", "Last Name", "Date of birth", "Job Title"))
    val got = df.select(col("Index"), col("`Date of birth`").cast("string"))
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(got(1) == Some("1945-06-15")) // 2045 is in the future -> 1945
    assert(got(2) == Some("1999-03-20")) // 2099 -> 1999
    assert(got(3) == None)               // unparseable -> null
    assert(got(4) == None)               // Feb 31 -> null
    assert(got(5) == Some("2010-01-05")) // 2010 is past -> untouched
  }
}
