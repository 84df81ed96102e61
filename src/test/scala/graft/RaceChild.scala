package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.engine.GraftTable

/** Forked-JVM writer for the cross-process commit-race test: a real
  * second process with its own SparkSession and metadata cache racing
  * on a shared warehouse path — the deployment shape (two jobs on one
  * table) the in-process units can't reach. Appends `nApp` rows
  * (base+i, tag), then CoW-deletes each listed id with the documented
  * caller-retries contract. Exits 0 iff every commit landed.
  *
  * args: location tag base nApp delIds(comma list or "-")
  */
object RaceChild {
  def main(args: Array[String]): Unit = {
    // the parent passes its storage backend via GRAFT_FILEIO: a
    // cross-process race only tests the claim protocol when both
    // sides run the same semantics
    graft.tableformat.FileIO.installFromEnv()
    val Array(loc, tag, baseStr, nAppStr, delStr) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-$tag")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      val mine = GraftTable.load(spark, loc)
      val base = baseStr.toLong
      for (i <- 0 until nAppStr.toInt)
        mine.append(Seq((base + i, tag)).toDF("id", "src"))
      val dels =
        if (delStr == "-") Seq.empty[Long]
        else delStr.split(',').map(_.trim.toLong).toSeq
      for (d <- dels) {
        var done = false
        while (!done) {
          try { mine.delete(col("id") === d); done = true }
          catch {
            // CoW refuses a concurrent commit (rewrite computed against
            // one base snapshot); the caller re-runs — same contract the
            // in-process race unit pins
            case _: graft.engine.ConcurrentCommitException => ()
          }
        }
      }
    } finally spark.stop()
    sys.exit(0)
  }
}
