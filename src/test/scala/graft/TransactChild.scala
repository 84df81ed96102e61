package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM writer for the cross-process TRANSACTION test: commits N
  * two-table transactions (a "corpus" row and its "fpidx" fingerprint
  * row per step) through the catalog CAS, while the parent process
  * reads both tables and asserts it never observes a corpus commit
  * without its index commit. Exits 0 iff every transaction landed.
  *
  * args: warehouse nTxns
  */
object TransactChild {
  def main(args: Array[String]): Unit = {
    graft.tableformat.FileIO.installFromEnv()
    val Array(wh, nStr) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-txn-writer")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      val cat = new graft.catalog.GraftCatalog(spark, wh)
      val a = cat.table("db", "corpus")
      val b = cat.table("db", "fpidx")
      for (k <- 1 to nStr.toInt)
        cat.transact(
          a -> Seq((k.toLong, s"doc$k")).toDF("id", "v"),
          b -> Seq((k.toLong, s"fp$k")).toDF("id", "v"))
    } finally spark.stop()
    sys.exit(0)
  }
}
