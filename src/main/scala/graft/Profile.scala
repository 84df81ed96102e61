package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev-loop profiler (not part of the driver contract): runs selected
  * queries once warmed, then dumps the FINAL executed plan with
  * per-operator SQL metrics — the Spark-UI SQL tab equivalent for a
  * headless host (optimization guide §7.1/§7.2). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.Profile q127 q135"
  *
  * Prints, per operator: nodeName, key metrics (times in ms, bytes,
  * rows). Reads the same env contract as Bench so numbers line up.
  */
object Profile {

  private def run(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def dump(p: SparkPlan, depth: Int,
      out: StringBuilder): Unit = {
    val m = p.metrics.toSeq
      .filter(_._2.value > 0)
      .sortBy(-_._2.value)
      .map { case (k, v) => s"$k=${v.value}" }
      .mkString(", ")
    out.append("  " * depth).append(p.nodeName)
    if (m.nonEmpty) out.append("  [").append(m).append("]")
    out.append('\n')
    p match {
      case a: AdaptiveSparkPlanExec => dump(a.executedPlan, depth + 1, out)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        dump(q.plan, depth + 1, out)
      case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
        r.children.foreach(dump(_, depth + 1, out))
      case other =>
        other.children.foreach(dump(_, depth + 1, out))
        other.subqueries.foreach { s =>
          out.append("  " * (depth + 1)).append("Subquery:\n")
          dump(s, depth + 2, out)
        }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = GraftSession.builder(s"local[$cpus]", Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
    // same tmpfs shuffle-dir treatment as Bench: /tmp is a virtio disk
    // with shared-host writeback and poisons shuffle-write timings
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm) &&
        shm.toFile.getUsableSpace > (8L << 30)) {
      val d = shm.resolve(s"graft-profile-${ProcessHandle.current().pid()}")
      java.nio.file.Files.createDirectories(d)
      builder.config("spark.local.dir", d.toString)
      // the dir is RAM — reclaim it even on a crashed run (tmpfs leaks
      // accumulate across profiling sessions otherwise)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        try {
          val w = java.nio.file.Files.walk(d)
          val paths = try {
            import scala.jdk.CollectionConverters._
            w.iterator().asScala.toSeq.reverse
          } finally w.close()
          paths.foreach(java.nio.file.Files.deleteIfExists(_))
        } catch { case _: Throwable => () }
      }))
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wanted = args.toSeq
    val queries = graft.queries.Registry.all.sortBy(_.name)
      .filter(q => wanted.isEmpty || wanted.exists(q.name.contains))
    queries.foreach { q =>
      // warmup twice (setup + JIT), then the measured/profiled pass
      try {
        run(q.fn(spark, sfDir)); run(q.fn(spark, sfDir))
        val df = q.fn(spark, sfDir)
        val t0 = System.nanoTime()
        // force execution through THIS QueryExecution (a noop write
        // plans its own copy and leaves df's metrics empty); count()
        // drains every partition's UnsafeRow iterator, so all columns
        // evaluate — timing is close to, not identical to, the bench's
        // noop sink (relative per-operator shares are what matter here)
        df.queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val out = new StringBuilder
        out.append(f"==== ${q.name} ($sec%.3f s) ====%n")
        dump(df.queryExecution.executedPlan, 0, out)
        println(out.result())
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"==== ${q.name} FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
