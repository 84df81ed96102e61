package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level diagnostic for [[Dedup.dedupSpans]]'s soak scaling —
  * the r18 verdict asked which stage superlinearizes under the soak's
  * blow-up (SOAK_r18 span_dedup ratio 3.96x at 10x data while every
  * other op holds <= 2.5x).
  *
  * Measures, per blow-up factor, the CUMULATIVE time of each stage
  * prefix (gram hashing -> owner aggregation -> occurrence probe ->
  * full dedup; stage cost = consecutive delta) alongside the ROW
  * COUNTS each stage produces. The hypothesis under test: every stage
  * is linear in its own input, but the soak corpus's duplicated-gram
  * MASS grows superlinearly with the factor (half the copies are
  * byte-exact, so at 1x almost no gram crosses minDf while at Fx
  * nearly every gram does — the cut-occurrence row count explodes by
  * construction, not by operator defect).
  *
  * Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   SPARK_GRAFT_SPAN_FACTORS=1,10,30 sbt "runMain graft.pipeline.SpanSoak"
  */
object SpanSoak {

  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def timed(df: DataFrame): Double = {
    run(df) // warm
    math.min(time(run(df)), time(run(df)))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SPAN_FACTORS", "1,10,30")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val soakDir = java.nio.file.Files.createTempDirectory("graft-spansoak")

    val out = factors.map { factor =>
      // the Soak blow-up, verbatim: copy k keeps the text for
      // k < factor/2 (exact duplicate mass) and appends a copy-unique
      // token otherwise
      val path = s"$soakDir/documents$factor"
      (0 until factor).map { k =>
        val txt =
          if (k < factor / 2) col("text")
          else concat_ws(" ", col("text"), lit(s"soakcopy$k"))
        base.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          txt.as("text"), col("lang"), col("source"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(path)
      val df = spark.read.parquet(path)

      // the stages, mirrored from dedupSpans/cutAndReassemble
      // line-for-line so the deltas attribute to the real plan
      val b = Dedup.spanBase(df, "doc_id", "text")
      val grams = Dedup.spanGrams(b, 13)
      val owners = grams.groupBy(col("__g"))
        .agg(countDistinct(col("__id")).as("__df"),
          min(col("__id")).as("__owner"))
        .filter(col("__df") >= 2)
        .select("__g", "__owner")
      val occ = grams.join(owners.hint("SHUFFLE_MERGE"), Seq("__g"))
        .filter(!(col("__id") <=> col("__owner")))
        .select(col("__id"), col("__pos")).distinct()
      val full = Dedup.dedupSpans(df, "doc_id", "text")
        .agg(sum(col("n_removed")).as("r"), count(lit(1)).as("n"))

      val nDocs = df.count()
      val nGrams = grams.count()
      val nOwners = owners.count()
      val nOcc = occ.count()
      val tGrams = timed(grams)
      val tOwners = timed(owners)
      val tOcc = timed(occ)
      val tFull = timed(full)
      f"""{"factor":$factor,"docs":$nDocs,"gram_rows":$nGrams,""" +
        f""""owned_grams":$nOwners,"cut_occurrences":$nOcc,""" +
        f""""t_grams":$tGrams%.2f,"t_owners":$tOwners%.2f,""" +
        f""""t_occ":$tOcc%.2f,"t_full":$tFull%.2f}"""
    }
    println(out.mkString("[", ",", "]"))
  }
}
