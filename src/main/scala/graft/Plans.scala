package graft

/** Dev-loop plan dumper (not part of the driver contract): writes
  * `.explain("formatted")` of each selected query to
  * plans/<SPARK_GRAFT_PLAN_TAG>/<query>_<SPARK_GRAFT_PLAN_SUFFIX>.txt —
  * the before/after plan evidence the optimization rounds commit.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   SPARK_GRAFT_PLAN_TAG=r19 SPARK_GRAFT_PLAN_SUFFIX=before \
  *     sbt "runMain graft.Plans q127 q135"
  */
object Plans {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r19")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = GraftSession.builder(s"local[$cpus]", Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wanted = args.toSeq
    val queries = graft.queries.Registry.all.sortBy(_.name)
      .filter(q => wanted.isEmpty || wanted.exists(q.name.contains))
    val dir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(dir)
    queries.foreach { q =>
      try {
        val df = q.fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          dir.resolve(s"${q.name}_$suffix.txt"), txt)
        println(s"[plans] wrote ${q.name}_$suffix.txt")
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[plans] ${q.name} FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
