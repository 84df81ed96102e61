package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, types}
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

  /** Double-precision cosine similarity of two float arrays. Backed by
    * the native [[graft.functions.FloatVectorDot]] expression: the
    * higher-order `aggregate(zip_with(...))` form it replaces is
    * CodegenFallback (~35us/pair interpreted) with identical summation
    * order, so results are bit-equal and the scan is codegen'd.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineF(a, b)

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

  /** Sign-bit LSH signature (one long, numPlanes <= 63 bits). NOTE:
    * this per-row form runs one interpreted `aggregate` pass PER plane
    * (higher-order functions are CodegenFallback) — it exists as the
    * independent reference implementation for tests; the corpus-scale
    * path is [[planeDots]], pinned sign-identical to this in
    * PipelineSpec.
    */
  def lshSignature(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit(_)): _*)
      val d = aggregate(zip_with(vec, plane, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** All `planes.size` dot products per row in ONE pass: posexplode the
    * vector, look up each plane's weight for that position in a literal
    * plane matrix (GetArrayItem — codegen'd), one map-side-combined
    * `sum` per plane. Output is one row per id with columns d0..d{n-1}.
    *
    * Why grouped and not per-row: `aggregate(zip_with(...))` per plane
    * is n interpreted traversals of every vector — the round-2 bench's
    * 13x-slower-than-brute-force root cause. Here each vector element
    * is touched once in whole-stage codegen and the shuffle carries one
    * (id, n doubles) row per document per input partition.
    */
  def planeDots(df: DataFrame, idCol: String, vecCol: String,
      planes: Seq[Array[Double]]): DataFrame = {
    val dim = planes.head.length
    require(planes.forall(_.length == dim), "planes must share one dim")
    // a vector whose length != dim must fail LOUDLY: element_at past the
    // plane end yields null, sum skips it, and the dot silently becomes
    // a partial sum — one codegen'd size check per row, not per element.
    // (Bucket determinism is up to FP summation order: grouped sums add
    // in partition order, so a dot within ~1e-16 of 0 may flip sign.)
    val checked = when(size(col(vecCol)) === dim, col(vecCol))
      .otherwise(raise_error(concat(
        lit(s"embedding length != $dim: id="), col(idCol).cast("string"),
        lit(" len="), size(col(vecCol)).cast("string"))))
    // the plane matrix travels as DATA (a dim-row LocalRelation,
    // broadcast-joined on the exploded position), NOT as plan literals:
    // per-plane `array(lit, lit, …)` built an expression tree of
    // numPlanes*dim Literal nodes (64x64 -> ~1.3 MiB task binaries), and
    // a shared typedlit was worse — optimizer copies break reference
    // identity, so every aggregate serialized its own boxed 4096-double
    // payload (measured 23 MiB task binaries). With the weights in a
    // broadcast relation the plan size is independent of plane count;
    // the join is a 64-row broadcast hash build with no row blowup
    // (one wide weight row per position).
    val spark = df.sparkSession
    val planeSchema = types.StructType(
      types.StructField("pos", types.IntegerType, nullable = false) +:
        planes.indices.map(j =>
          types.StructField(s"w$j", types.DoubleType, nullable = false)))
    val planeRows: java.util.List[Row] = java.util.Arrays.asList(
      (0 until dim).map(p =>
        Row.fromSeq(p +: planes.map(_(p)).toVector)): _*)
    val planesDf = spark.createDataFrame(planeRows, planeSchema)
    val aggs = planes.indices.map { j =>
      sum(col("x").cast("double") * col(s"w$j")).as(s"d$j")
    }
    df.select(col(idCol), posexplode(checked).as(Seq("pos", "x")))
      .join(broadcast(planesDf), "pos")
      .groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Approximate top-k via multi-table hyperplane LSH: `numTables`
    * independent tables of `planesPerTable` sign bits; candidates are
    * rows sharing (table, bucket) with the query in ANY table, then
    * exact cosine ranks the candidates. Recall rises with tables,
    * join volume stays bucket-local — at 100 TB each bucket is a tiny
    * slice vs the exact path's full corpus scan per query batch.
    * (This is the IVF/LSH "scale path" the brute-force operator pairs
    * with; both are deterministic given `seed`.)
    *
    * When it pays off: signature cost is numTables*planesPerTable dots
    * per corpus row, brute force is |queries| dots per corpus row — LSH
    * only wins when the query batch is much larger than the plane count
    * (or the corpus is re-probed across batches with signatures
    * persisted). For a handful of queries, use [[cosineTopK]].
    */
  /** Multi-table hyperplane LSH bucket assignments: one (id, table,
    * bucket) row per table — the shared candidate-generation front end
    * of [[cosineTopKLsh]] and [[Dedup.nearDupEmbeddingLsh]]. Only ids
    * and two small ints leave this stage; vectors rejoin later for the
    * candidates alone (the round-2 plan exploded every vector 16x
    * through the shuffle). Deterministic given `seed`.
    */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
      planesPerTable: Int = 4, numTables: Int = 16, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    // flat plane matrix: table t owns dots d[t*m .. t*m+m-1]
    val allPlanes = (0 until numTables)
      .flatMap(t => hyperplanes(planesPerTable, dim, seed + t))
    val tb = (0 until numTables).map { t =>
      val b = (0 until planesPerTable).map { i =>
        when(col(s"d${t * planesPerTable + i}") >= 0, lit(1L << i))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("table"), b.as("bucket"))
    }
    planeDots(df, idCol, vecCol, allPlanes)
      .select(col(idCol), explode(array(tb: _*)).as("tb"))
      .select(col(idCol), col("tb.table").as("table"),
        col("tb.bucket").as("bucket"))
  }

  def cosineTopKLsh(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planesPerTable: Int = 4, numTables: Int = 16,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      lshBuckets(df, id, vec, planesPerTable, numTables, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cand = bucketed(Dedup.spread(c), "neighbor_id", "cv")
      .join(broadcast(bucketed(q, "query_id", "qv")), Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    // the candidate set is ids-only and bounded by |queries| x bucket
    // occupancy — if the queries fit a broadcast (this operator's
    // contract), so does cand. Pin it broadcast so the corpus-side
    // verification join is a broadcast hash join streaming one corpus
    // scan: left to AQE, the strategy choice flapped in long sessions
    // (round-4 driver full-suite 11.7s vs 2.8s isolated, same commit —
    // the exact q42 instability round 3 fixed in Dedup) by shuffling
    // the full corpus WITH vectors when the size estimate drifted.
    val scored = c
      .join(broadcast(cand), "neighbor_id")
      .join(broadcast(q), "query_id")
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
