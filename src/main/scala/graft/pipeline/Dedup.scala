package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for large text corpora (the LLM-pipeline
  * tier of BASELINE's north star; absent in the reference, which never
  * goes beyond scan/filter — SURVEY §2).
  *
  * Scale design (100 TB): every strategy here generates candidate
  * pairs through a KEY-BUCKETED equi-join (content hash, shared
  * shingle, LSH band bucket, SimHash chunk) — never an all-pairs
  * cartesian. Buckets shuffle-partition by key, so 1000 executors
  * each see only their buckets; skewed buckets (a shingle present in
  * every doc) are the one hazard, handled by `maxShingleDf` document-
  * frequency capping plus AQE skew splitting.
  */
object Dedup {

  /** Exact dedup by content hash: one shuffle (groupBy md5), keeps the
    * smallest id per distinct content. Output: (hash, keep_id, n_copies).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Token k-shingle sets per document: (id, shingle_set).
    *
    * Tokens materialize as a column BEFORE shingling: a lambda that
    * references an enclosing non-attribute expression re-evaluates it
    * per array element (the split would run ~|tokens| times per row —
    * measured 10x slowdown at bench scale).
    */
  def shingleSets(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame =
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), shingles(col("toks"), k).as("sh"))
      .filter(size(col("sh")) > 0)

  /** COMPLETE near-dup pairs by exact n-gram Jaccard >= threshold.
    *
    * Candidate generation is an inverted-index self-join on shingles:
    * any pair with Jaccard > 0 shares >= 1 shingle, so recall is 1.0
    * by construction (unlike MinHash) while still being a bucketed
    * equi-join. Verification recomputes exact Jaccard on candidates
    * only. `maxShingleDf` drops ubiquitous shingles from the INDEX
    * (candidate gen) for skew control at scale — pairs sharing only
    * those are below any useful threshold anyway; pass None for the
    * oracle-exact complete variant.
    */
  def nearDupJaccard(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5,
      maxShingleDf: Option[Int] = None): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, k)
    // carry |set| through the index so Jaccard needs NO join back to the
    // shingle arrays: for distinct-element sets, the equi-join emits one
    // row per SHARED shingle, so count(*) per pair IS |A ∩ B|, and
    // |A ∪ B| = |A| + |B| - |A ∩ B|. The join feeds straight into a
    // partially-aggregated groupBy (map-side combine) instead of a
    // distinct + two wide array shuffles — the difference between
    // O(pairs) small rows and O(pairs) array payloads at 100 TB.
    val inv0 = sets.select(col("id"), size(col("sh")).as("n"),
      explode(col("sh")).as("s"))
    val inv1 = maxShingleDf match {
      case Some(cap) =>
        val rare = inv0.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("s")
        inv0.join(rare, "s")
      case None => inv0
    }
    // pin sort-merge for the index self-join: the skewed hot-shingle
    // key makes AQE's size-based strategy choice flap (measured up to
    // 10x run-to-run variance); SMJ is the stable, spill-safe plan
    val inv = inv1.hint("SHUFFLE_MERGE")
    inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** MinHash + banded-LSH near-dup: candidates only within LSH band
    * buckets (numHashes = bands * rowsPerBand), then exact-Jaccard
    * verified. Probabilistic recall (tunable via bands/rows), but the
    * join volume is bucket-local — the scale path when the full
    * inverted index is too hot. Signature is deterministic (seeded
    * permutations), so results are stable across runs/cluster sizes.
    */
  def nearDupMinhashLsh(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    // deliberately NOT cached: the sets are consumed three times
    // (signatures + both verification sides), but recomputing the
    // shingle projection is ~1s/10k docs while columnar-caching string
    // arrays costs more than it saves and its eviction churn under
    // memory pressure measured 20x worse than recompute
    val sets = shingleSets(docs, idCol, textCol, k)
    val sigs = sets
      .withColumn("hv", transform(col("sh"), s => hash31(s)))
      .withColumn("sig",
        minhashSignatureOfHashes(col("hv"), bands * rowsPerBand, seed))
    val buckets = sigs.select(col("id"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    cand
      .join(sets.select(col("id").as("id1"), col("sh").as("sh1")), "id1")
      .join(sets.select(col("id").as("id2"), col("sh").as("sh2")), "id2")
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** SimHash near-dup: 64-bit fingerprints, candidates = pairs sharing
    * one of four 16-bit chunks (pigeonhole-complete for hamming <= 3),
    * verified by exact hamming distance. Candidate join is chunk-value
    * bucketed.
    */
  def nearDupSimhash(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "chunk scheme is complete only for hamming <= 3")
    val fps = docs
      .select(col(idCol).as("id"),
        transform(tokens(col(textCol)), t => xxhash64(t)).as("hv"))
      .select(col("id"), simhashOfHashes(col("hv")).as("fp"))
    val chunks = fps.select(col("id"), col("fp"),
        explode(simhashChunks(col("fp"))).as("c"))
      .select(col("id"), col("fp"), col("c.chunk").as("chunk"),
        col("c.value").as("value"))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.value") === col("b.value") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        hamming(col("a.fp"), col("b.fp")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
