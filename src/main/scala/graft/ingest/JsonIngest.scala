package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tableformat.MetadataIO

/** JSON file reads (SURVEY §2.1 S4): the reference reads Iceberg
  * metadata JSON documents straight into DataFrames
  * (`spark.read.json("spark-warehouse/.../v1.metadata.json")`, notebook
  * cells 49-50) to introspect schemas/snapshots with SQL. Same
  * capability over graft metadata: each vN.metadata.json is a
  * multi-line JSON document.
  */
object JsonIngest {

  /** Generic multi-line JSON document read. */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** A graft table's metadata document as a DataFrame (current version
    * unless one is given).
    */
  def readTableMetadata(spark: SparkSession, tableLocation: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.orElse(MetadataIO.currentVersion(tableLocation))
      .getOrElse(sys.error(s"no table at $tableLocation"))
    readJson(spark, MetadataIO.metadataPath(tableLocation, v).toString)
  }
}
