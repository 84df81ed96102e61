package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.engine.GraftTable

/** Forked-JVM writer for the MULTI-WRITER model-based fuzz: a seeded
  * random op sequence against a shared warehouse, with every op
  * appended to a JSON-lines log the parent replays under the commit
  * order it recovers from the table's linear history.
  *
  * Op design keeps the model reconstructible without trusting the
  * engine's own read path:
  *   - appends create rows in the writer's OWN id range (v = "w:step")
  *     — commutative across writers;
  *   - CoW deletes target only the writer's own previously-appended
  *     ids — commutative across writers, retried on the documented
  *     concurrent-commit refusal;
  *   - upserts (positional or equality, marker-protected) hit the
  *     SHARED key space — the only order-sensitive ops; their batch
  *     rows carry "w:step" so the parent can identify which logged op
  *     landed at which snapshot from the snapshot's ADDED files alone.
  *
  * args: location writerTag(w1|w2) seed idBase nOps logPath
  */
object FuzzChild {
  def main(args: Array[String]): Unit = {
    // run under the parent's storage backend (see RaceChild)
    graft.tableformat.FileIO.installFromEnv()
    val Array(loc, tag, seedStr, baseStr, nOpsStr, logPath) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-fuzz-$tag")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val log = new java.io.PrintWriter(logPath)
    try {
      import spark.implicits._
      val t = GraftTable.load(spark, loc)
      val rnd = new scala.util.Random(seedStr.toLong)
      val base = baseStr.toLong
      var nextOwn = 0L
      val liveOwn = scala.collection.mutable.ArrayBuffer[Long]()
      val sharedKeys = (1L to 16L).toVector
      def retrying(body: => Unit): Unit = {
        var done = false
        while (!done) {
          try { body; done = true }
          catch { case _: graft.engine.ConcurrentCommitException => () }
        }
      }
      for (step <- 1 to nOpsStr.toInt) {
        val roll = rnd.nextInt(10)
        if (roll < 4) { // own-range append
          val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
            nextOwn += 1
            (base + nextOwn, s"$tag:$step", rnd.nextInt(100).toLong)
          }
          t.append(rows.toDF("id", "v", "x"))
          rows.foreach(r => liveOwn += r._1)
          log.println(s"""{"kind":"append","step":$step,"rows":[""" +
            rows.map(r => s"""[${r._1},"${r._2}",${r._3}]""")
              .mkString(",") + "]}")
        } else if (roll < 8) { // shared-key upsert, marker-protected
          val keys = rnd.shuffle(sharedKeys).take(1 + rnd.nextInt(3)).sorted
          val rows = keys.map(k => (k, s"$tag:$step", rnd.nextInt(100).toLong))
          val eq = rnd.nextBoolean()
          retrying {
            if (eq) t.upsertEqIfNewMarker(rows.toDF("id", "v", "x"),
              Seq("id"), s"graft.fuzz.$tag", step.toLong)
            else t.upsertIfNewMarker(rows.toDF("id", "v", "x"),
              Seq("id"), s"graft.fuzz.$tag", step.toLong)
          }
          log.println(s"""{"kind":"upsert","step":$step,"rows":[""" +
            rows.map(r => s"""[${r._1},"${r._2}",${r._3}]""")
              .mkString(",") + "]}")
        } else if (liveOwn.nonEmpty) { // CoW delete of one own id
          val victim = liveOwn.remove(rnd.nextInt(liveOwn.size))
          retrying(t.delete(col("id") === victim))
          log.println(s"""{"kind":"delete","step":$step,"id":$victim}""")
        } else {
          log.println(s"""{"kind":"noop","step":$step}""")
        }
      }
    } finally { log.close(); spark.stop() }
    sys.exit(0)
  }
}
