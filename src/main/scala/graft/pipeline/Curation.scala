package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between dedup and tokenization: domain-mixture sampling, PII
  * redaction, and token-budget packing. All three are single-pass,
  * codegen-friendly column expressions or one partitioned window — no
  * UDFs, no driver-side loops — so they scale as scans.
  */
object Curation {

  /** Deterministic domain-mixture sampling: a row survives iff
    * `id % base < weights(domain)` — the "mix 30% web, 50% books"
    * shape. No RNG: retries, re-runs, and different partitionings keep
    * EXACTLY the same rows (sampling decisions must be reproducible or
    * every downstream artifact changes under the pipeline), and the
    * filter pushes into the scan. Domains absent from `weights` drop.
    */
  def sampleMixture(df: DataFrame, idCol: String, domainCol: String,
      weights: Map[String, Int], base: Int = 10): DataFrame = {
    require(base > 0, "base must be positive")
    weights.foreach { case (d, w) =>
      require(w >= 0 && w <= base, s"weight for $d must be in [0, $base]")
    }
    // deterministic CASE order (sorted) so plans are stable run-to-run
    val keep = weights.toSeq.sortBy(_._1).foldRight(lit(0)) {
      case ((dom, w), els) => when(col(domainCol) === dom, lit(w)).otherwise(els)
    }
    df.filter(pmod(col(idCol), lit(base)) < keep)
  }

  /** PII redaction: emails then long digit runs (phone/SSN-ish), as
    * two chained codegen'd regexp_replace passes. Patterns stick to
    * portable regex (character classes + bounded repetition — no
    * lookarounds), so the same semantics hold across engines.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "[0-9]{7,}", "<NUM>")

  /** Benchmark decontamination — the n-gram overlap filter every
    * training pipeline runs before training (GPT-3's 13-gram rule):
    * drop corpus documents sharing ANY word n-gram with a benchmark
    * document, so eval sets can't leak into training data.
    *
    * Scale shape: the benchmark side reduces to DISTINCT n-grams and
    * BROADCASTS (benchmarks are eval-set-sized by construction, not
    * corpus-sized); the corpus side explodes its shingles in one
    * codegen'd projection and LEFT ANTI semi-probes the broadcast —
    * the corpus is never shuffled, never collected, and a document
    * short-circuits out of the probe on its first hit. Both sides
    * match on the 64-BIT HASH of the gram, not the string: only 8-byte
    * keys reach the bench-side distinct/broadcast and the probe
    * (~10x smaller than 13-word strings), and the collision error is
    * both negligible and conservative (see
    * [[graft.functions.TextFunctions.shingleHashes]]). Lowercasing is
    * the only normalization (decontamination wants high precision;
    * callers wanting stemmed/fuzzy matching should pre-normalize both
    * sides the same way).
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 13): DataFrame = {
    require(n >= 2, "decontamination n-gram size must be >= 2")
    // fused native form of shingleHashes(tokens(lower(text)), n): one
    // pass per row instead of re-evaluating the token array once per
    // shingle window (PipelineSpec pins hash-for-hash equivalence)
    import graft.functions.ShingleExpressions.wordShingleHashes
    val benchGrams = benchmark
      .select(explode(wordShingleHashes(lower(col(benchTextCol)), n))
        .as("__gram"))
      .distinct()
    val hits = docs
      .select(col(idCol),
        explode(wordShingleHashes(lower(col(textCol)), n)).as("__gram"))
      .join(broadcast(benchGrams), "__gram")
      .select(idCol).distinct()
    // hit ids broadcast too: contaminated docs are a small fraction by
    // construction (eval leakage, typically well under 1%), and an
    // unhinted anti-join would shuffle the whole corpus instead
    docs.join(broadcast(hits), Seq(idCol), "left_anti")
  }

  /** Token-budget packing: assign each document to a context-window
    * bucket via a running token count per `partCol` — the
    * concat-then-chunk pretokenization shape (a document straddling a
    * boundary starts in its cumulative bucket). One partitioned,
    * ordered window: parallel across partitions, streaming within one
    * — the 100 TB form is "pack per (domain, shard)", never one global
    * ordered window.
    */
  def packTokens(df: DataFrame, partCol: String, orderCol: String,
      nTokensCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(partCol).orderBy(orderCol)
    df.withColumn("__cum", sum(col(nTokensCol)).over(w))
      .withColumn("bucket",
        floor((col("__cum") - col(nTokensCol)) / budget).cast("int"))
      .drop("__cum")
  }
}
