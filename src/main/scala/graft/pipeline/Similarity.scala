package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]) — the
  * LLM-pipeline tier's ANN surface.
  *
  * Scale design (100 TB): the exact path broadcasts the (small) query
  * set against a single scan of the corpus — no corpus self-join, one
  * shuffle for the per-query top-k. The approximate path buckets both
  * sides by random-hyperplane LSH signs so the join is bucket-local;
  * multiprobe widens recall without widening the shuffle. All math is
  * built-in expressions (zip_with/aggregate in double precision) —
  * codegen'd, no UDFs.
  */
object Similarity {

  /** Double-precision cosine similarity of two float arrays. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact brute-force top-k: for each row of `queries`, the k nearest
    * corpus rows by cosine. Queries are broadcast (they are small by
    * assumption); the corpus is scanned once.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Deterministic random hyperplanes: `numPlanes` x `dim` doubles from
    * a seeded PRNG, embedded as literal arrays (no data-dependent
    * state, identical on every executor).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH signature (one long, numPlanes <= 63 bits). */
  def lshSignature(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit(_)): _*)
      val d = aggregate(zip_with(vec, plane, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k via multi-table hyperplane LSH: `numTables`
    * independent tables of `planesPerTable` sign bits; candidates are
    * rows sharing (table, bucket) with the query in ANY table, then
    * exact cosine ranks the candidates. Recall rises with tables,
    * join volume stays bucket-local — at 100 TB each bucket is a tiny
    * slice vs the exact path's full corpus scan per query batch.
    * (This is the IVF/LSH "scale path" the brute-force operator pairs
    * with; both are deterministic given `seed`.)
    */
  def cosineTopKLsh(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planesPerTable: Int = 4, numTables: Int = 16,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val tables = (0 until numTables).map(t =>
      t -> hyperplanes(planesPerTable, dim, seed + t))
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(id), col(vec),
        explode(array(tables.map { case (t, planes) =>
          struct(lit(t).as("table"),
            lshSignature(col(vec), planes).as("bucket"))
        }: _*)).as("tb"))
        .select(col(id), col(vec), col("tb.table").as("table"),
          col("tb.bucket").as("bucket"))
    val c = bucketed(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
      "neighbor_id", "cv")
    val q = bucketed(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv")
    val scored = c.join(broadcast(q),
        c("table") === q("table") && c("bucket") === q("bucket") &&
          col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
