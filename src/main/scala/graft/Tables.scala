package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * parquet directly — scans stay declarative so Catalyst pushes filters
  * and prunes columns into the parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts has shipped in two parquet shapes across fixture
    * generations, neither of which is a plain session-zone timestamp:
    *
    *   - TIMESTAMP(NANOS): Spark's reader rejects it unless
    *     spark.sql.legacy.parquet.nanosAsLong=true (then it surfaces as a
    *     nanos-since-epoch long) — truncate to micros.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 reads it as
    *     TIMESTAMP_NTZ, which watermarks, CAST(ts AS BIGINT), and
    *     partition-transform DDL all refuse. Cast to TimestampType —
    *     exact under the pinned UTC session zone (GraftSession.builder),
    *     where NTZ wall-clock == UTC instant.
    *
    * Both normalizations happen HERE so every downstream consumer
    * (partition transforms, watermarks, changelogs) sees one type. The
    * nanosAsLong flag must be set at session construction — a loader
    * mutating session conf mid-flight would silently change how OTHER
    * nanos-typed parquet reads behave.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet is TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true (see GraftSession.builder)")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
