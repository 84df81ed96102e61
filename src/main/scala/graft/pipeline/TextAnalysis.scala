package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text analysis over document corpora: token/char statistics, quality
  * scoring, heuristic language ID, token counting, and shingle
  * fingerprints. All built-in expressions; every derived number is an
  * integer or an integer-ratio double so an independent SQL engine
  * reproduces it bit-for-bit (the driver's DuckDB oracle does).
  *
  * Scale: one narrow projection + one partial-aggregated groupBy per
  * stat query — no joins, no UDFs, map-side combine throughout.
  */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Per-language marker words for the n-gram/marker lang-ID heuristic.
    * (The detector is a deterministic scoring rule, not a model.)
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "que", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  /** Per-document derived features (id, n_tokens, n_distinct, chars,
    * mean token length, stopword count/ratio).
    */
  def docFeatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    // spread: the tokenize/distinct/marker folds are scan-partitioned —
    // a single small parquet file serializes them on one task; no-op at
    // scale (stats-gated round-robin, see Dedup.spread)
    Dedup.spread(docs).select(
      col("*"), // keep original columns: stats group by them
      toks.as("toks"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      length(col(textCol)).as("n_chars"),
      aggregate(transform(toks, t => length(t)), lit(0),
        (acc, l) => acc + l).as("token_chars"),
      markerCount(toks, Stopwords).as("n_stop"))
  }

  /** Within-document repetition metrics — the filter family every
    * pre-training pipeline runs to drop degenerate/boilerplate pages
    * (documents dominated by one repeated token or by duplicated
    * vocabulary): the fraction of the doc taken by its most frequent
    * token and the duplicate-token fraction.
    *
    * Computed PER ROW with zero shuffle: once the token array is
    * SORTED, equal tokens are adjacent, so the max token frequency is
    * the longest equal-run — one codegen'd `aggregate` fold. At 100 TB
    * this scores as a scan; the alternative (doc, token) groupBy would
    * shuffle the entire tokenized corpus. Integer counts divide to
    * doubles identically on any engine, so the metrics oracle exactly.
    */
  def repetitionStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val sorted = sort_array(toks)
    val maxFreq = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc("prev"), acc("run") + lit(1L))
          .otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    val n = size(toks).cast("long")
    // Empty/whitespace-only documents have ZERO tokens ([[tokens]]
    // yields the empty array), and a repetition ratio over zero tokens
    // is undefined: both ratios are NULL there, never 0/0's NaN (the
    // oracle's LEFT JOIN reproduces the same NULLs).
    docs.select(col(idCol),
      n.as("n_tokens"),
      when(n > 0, round(maxFreq.cast("double") / n.cast("double"), 4))
        .as("max_tok_frac"),
      when(n > 0, round(lit(1.0) - size(array_distinct(toks)).cast("double") /
        n.cast("double"), 4)).as("dup_tok_frac"))
  }

  /** Corpus statistics grouped by the given columns: doc counts, token
    * totals, averages. Integer sums + int-ratio averages → oracle-exact.
    */
  def corpusStats(docs: DataFrame, idCol: String, textCol: String,
      groupCols: Seq[String]): DataFrame =
    docFeatures(docs, idCol, textCol)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("n_tokens")), 4).as("avg_tokens"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        round(sum(col("n_stop")).cast("double") /
          sum(col("n_tokens")).cast("double"), 6).as("stopword_ratio"))

  /** Sketch-based corpus profile — the form corpus profiling takes at
    * 100 TB, where exact per-group distincts are their own shuffle of
    * the whole tokenized corpus: HyperLogLog++ for distinct counts
    * (content fingerprints ~= unique documents, exploded tokens =
    * vocabulary) and a mergeable quantile sketch for the token-length
    * distribution. Every aggregate here carries FIXED-size state that
    * merges map-side — the exchange moves one sketch per (group,
    * partition), never a row per document or token, regardless of
    * corpus size. `rsd` is the HLL standard-error knob (state size ~
    * 1/rsd^2).
    *
    * Accuracy is pinned in PipelineSpec against the exact twins
    * ([[corpusStats]] / count-distinct): relative error <= 3*rsd for
    * the distincts, quantiles within the exact neighboring ranks. Not
    * oracle-able (HLL bucket layouts are engine-specific) — rows-only,
    * the same pattern as the xxhash64 families.
    */
  def approxCorpusStats(docs: DataFrame, idCol: String, textCol: String,
      groupCols: Seq[String], rsd: Double = 0.02): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    // one generator pass: pos==0 (or the null row of an empty doc)
    // gates the DOC-level columns so the explode doesn't weight each
    // document by its token count in the doc-level sketches
    val first = coalesce(col("pos"), lit(0)) === 0
    // spread: same scan-parallelism treatment as docFeatures
    Dedup.spread(docs).select(groupCols.map(col) :+ toks.as("toks"): _*)
      .select(groupCols.map(col) ++ Seq(
        size(col("toks")).as("n_tokens"),
        xxhash64(concat_ws(" ", col("toks"))).as("fp"),
        posexplode_outer(col("toks")).as(Seq("pos", "tok"))): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        approx_count_distinct(when(first, col("fp")), rsd)
          .as("approx_unique_docs"),
        approx_count_distinct(col("tok"), rsd).as("approx_vocab"),
        percentile_approx(when(first, col("n_tokens")), lit(0.5),
          lit(10000)).as("p50_tokens"),
        percentile_approx(when(first, col("n_tokens")), lit(0.95),
          lit(10000)).as("p95_tokens"))
  }

  /** Quality score in [0,1]: length saturation + vocabulary diversity +
    * non-stopword mass. Same closed formula on the oracle side; all
    * operands are integer ratios so the doubles agree exactly.
    */
  def qualityScore(nTokens: Column, nDistinct: Column, nStop: Column): Column = {
    val lenScore = least(nTokens.cast("double") / lit(50.0), lit(1.0))
    val diversity = nDistinct.cast("double") / nTokens.cast("double")
    val content = lit(1.0) - nStop.cast("double") / nTokens.cast("double")
    round(lit(0.3) * lenScore + lit(0.4) * diversity + lit(0.3) * content, 6)
  }

  /** Gopher-style quality RULESET (the public heuristics of Rae et al.
    * 2021 §A1.1, reused by MassiveText descendants): hard keep/drop per
    * document with per-rule reasons — the gate form of filtering, where
    * [[qualityScore]] is the soft-score form. A document FAILS on:
    *   - word count outside [minWords, maxWords]            → "n_words"
    *   - mean word length outside [minMeanLen, maxMeanLen]  → "word_len"
    *   - '#'/'...' symbols per word above maxSymbolRatio    → "symbols"
    *   - words containing a letter below minAlphaFrac       → "alpha"
    *   - fewer than minStopwords stopword hits              → "stopwords"
    *   - duplicate-token fraction above maxDupFrac          → "dup_tokens"
    * `keep` is true iff `reasons` is empty. Ratio rules are defined
    * only when n_words > 0 — a zero-token document already fails
    * "n_words", and its NULL ratios fire no phantom reasons.
    *
    * Two projections (features first, rules referencing them as
    * attributes — the [[langScores]] CollapseProject note applies to
    * the interpreted alpha-word filter), zero shuffle: the gate scales
    * as a scan, and every metric is an integer ratio rounded to 4
    * places so rules and output agree bit-for-bit with a SQL oracle.
    * Symbol counts come from length deltas of codegen'd `replace`, not
    * a regex — '#' and '...' are literal substrings on both engines.
    */
  def gopherFilter(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2, maxDupFrac: Double = 0.3,
      keepInput: Boolean = false): DataFrame = {
    val toks = tokens(col(textCol))
    val txt = col(textCol)
    val reserved = Seq("n_words", "n_stop", "mean_word_len",
      "symbol_ratio", "alpha_frac", "dup_tok_frac", "reasons", "keep")
    if (keepInput) {
      val clash = docs.columns.filterNot(_ == idCol).toSet
        .intersect(reserved.toSet)
      require(clash.isEmpty, "keepInput would shadow gate output " +
        s"columns: ${clash.mkString(", ")} — rename them first")
    }
    val passthrough =
      if (keepInput) docs.columns.filterNot(_ == idCol).map(col).toSeq
      else Seq.empty
    // NULL text must FAIL the gate, not slip through it: size(NULL) is
    // NULL, and a NULL word count would make every rule's `when` skip —
    // concat_ws drops the NULLs and the doc would sail out with
    // keep = true. Pinning n_words to 0 routes NULL text through the
    // same "fails n_words, NULL ratios" contract as empty text.
    val feats = docs.select((col(idCol) +: passthrough) ++ Seq(
      coalesce(size(toks), lit(0)).as("n_words"),
      aggregate(transform(toks, t => length(t)), lit(0),
        (a, l) => a + l).as("__chars"),
      (length(txt) - length(replace(txt, lit("#"), lit("")))).as("__sym_h"),
      ((length(txt) - length(replace(txt, lit("..."), lit("")))) / 3)
        .as("__sym_e"),
      size(filter(toks, t => t.rlike("[A-Za-z]"))).as("__alpha"),
      markerCount(toks, Stopwords).as("n_stop"),
      size(array_distinct(toks)).as("__dist")): _*)
    val n = col("n_words").cast("double")
    val pos = col("n_words") > 0
    val metrics = feats.select((col(idCol) +: passthrough) ++ Seq(
      col("n_words"), col("n_stop"),
      when(pos, round(col("__chars") / n, 4)).as("mean_word_len"),
      when(pos, round((col("__sym_h") + col("__sym_e")) / n, 4))
        .as("symbol_ratio"),
      when(pos, round(col("__alpha") / n, 4)).as("alpha_frac"),
      when(pos, round(lit(1.0) - col("__dist") / n, 4))
        .as("dup_tok_frac")): _*)
    // rules evaluate the ROUNDED metrics so the emitted numbers and the
    // keep flag can never disagree in a downstream audit
    val reasons = concat_ws(",",
      when(col("n_words") < minWords || col("n_words") > maxWords,
        lit("n_words")),
      when(col("mean_word_len") < minMeanLen ||
        col("mean_word_len") > maxMeanLen, lit("word_len")),
      when(col("symbol_ratio") > maxSymbolRatio, lit("symbols")),
      when(col("alpha_frac") < minAlphaFrac, lit("alpha")),
      when(col("n_stop") < minStopwords, lit("stopwords")),
      when(col("dup_tok_frac") > maxDupFrac, lit("dup_tokens")))
    metrics.select(col("*"), reasons.as("reasons"))
      .withColumn("keep", col("reasons") === "")
  }

  /** Per-language marker-count columns for langId — materialize these
    * in their OWN projection (`.select(..., langScores(toks).map(...))`)
    * so the argmax in [[langIdFromScores]] references them as
    * attributes: inlined, each count would be duplicated ~6x by the
    * CASE and re-run its interpreted array filter per copy (round-5/6
    * verdict item; CollapseProject keeps multiply-referenced non-cheap
    * aliases materialized, so the two-projection shape is stable).
    */
  def langScores(toks: Column): Seq[(String, Column)] =
    LangMarkers.map { case (l, ms) => l -> markerCount(toks, ms) }

  /** Heuristic language ID over already-materialized score columns:
    * predict the argmax; zero hits everywhere -> "und" (undetermined);
    * a tied max resolves to the FIRST language in LangMarkers order
    * (fixed evaluation order keeps it deterministic; the oracle mirrors
    * the same first-match CASE).
    */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, lit("und"))) { case (acc, (l, s)) =>
      acc.when(s === best, lit(l))
    }.otherwise(lit("und"))
  }

  /** One-column form of langId — convenient for ad-hoc use, but it
    * inlines every markerCount into the CASE (~25 interpreted filter
    * passes per row after duplication). Corpus-scale scans go through
    * [[langScores]] + [[langIdFromScores]] instead (see q46).
    */
  def langId(toks: Column): Column = langIdFromScores(langScores(toks))

  /** Corpus-wide frequent n-gram mining: every lowercased word n-gram
    * appearing in >= minDf distinct documents, with its document
    * frequency — the statistic boilerplate detection, contamination
    * audits, and tokenizer corpus studies start from.
    *
    * Two-pass scale shape (the string-recovery trick):
    *   1. document frequency is counted on the 8-byte xxhash64 of the
    *      gram — per-doc-distinct hashes explode straight into a
    *      map-side-combined count, so the first exchange moves only
    *      fixed-width (hash, count) rows, never gram text;
    *   2. a second scan recovers the STRINGS of survivors only: gram
    *      text joins the frequent-hash set, and AQE sizes that join at
    *      runtime — with a high minDf the survivor set is the Zipf
    *      head and broadcasts (gram strings never shuffle at all);
    *      if a caller mines with a low minDf the set is large and the
    *      planner falls back to a shuffled join, which is then
    *      inherent (the output itself is corpus-sized).
    * A 64-bit collision would merge two grams' counts (both reported,
    * df summed) — the same bounded hash budget as the other 8-byte
    * key paths, conservative for boilerplate mining.
    */
  def frequentNgrams(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Int): DataFrame = {
    require(n >= 1 && minDf >= 1, "n and minDf must be positive")
    import graft.functions.ShingleExpressions.{wordShingleHashes, wordShingles}
    // spread both scans: gram hashing and string recovery are the
    // operator's cost and are scan-partitioned (no-op at scale)
    val d = Dedup.spread(docs.select(col(textCol)))
    val hot = d
      .select(explode(wordShingleHashes(lower(col(textCol)), n)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    d.select(explode(wordShingles(lower(col(textCol)), n)).as("gram"))
      .select(col("gram"), xxhash64(col("gram")).as("h"))
      .join(hot, "h")
      .groupBy(col("gram")).agg(max(col("df")).as("df"))
  }

  /** Token counting, two tokenizers side by side: whitespace tokens and
    * a BPE-ish regex chunking (letter runs / digit runs / single other
    * marks) — the standard pre-tokenizer shape.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokenCounts(docs, idCol, textCol, None)

  /** With a merges table, adds the REAL model-token count
    * (`bpe_tokens`, [[graft.functions.BpeExpressions.bpeTokenCount]])
    * beside the approximations — whitespace counts run 2–4× off on
    * code/non-English, so budget arithmetic should feed on this
    * column when a vocabulary is available.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      bpe: Option[graft.functions.BpeExpressions.BpeRanks]): DataFrame = {
    val base = Seq(
      col(idCol),
      size(tokens(col(textCol))).as("ws_tokens"),
      size(regexp_extract_all(col(textCol),
        lit("[a-z]+|[A-Z][a-z]*|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).as("bpe_chunks"))
    val cols = base ++ bpe.map(v =>
      graft.functions.BpeExpressions.bpeTokenCount(col(textCol), v)
        .as("bpe_tokens"))
    docs.select(cols: _*)
  }

  /** Context-window chunking: split each document into stride-spaced
    * token windows of `chunkTokens` tokens overlapping by
    * `overlapTokens` — the standard pre-training / RAG preparation
    * step that turns variable-length documents into model-sized
    * pieces while the overlap preserves cross-boundary context.
    *
    * Chunk k covers tokens [k*stride, k*stride + chunkTokens) with
    * stride = chunkTokens - overlapTokens; the window count is the
    * minimal number covering every token (1 + ceil((n-chunk)/stride)
    * for n > chunk), so only the FINAL chunk may be short and no
    * degenerate window fully contained in its predecessor is emitted.
    * Empty/whitespace-only documents produce zero chunks.
    *
    * Scale: a pure projection + posexplode — ZERO shuffle, stays in
    * whole-stage codegen end to end. At 100 TB this is a scan whose
    * output feeds straight into tokenize/pack; the alternative
    * (per-token explode + group back by chunk id) would shuffle the
    * entire tokenized corpus. Output rows carry (id, chunk_id,
    * start_token, n_chunk_tokens, chunk_text).
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int): DataFrame =
    chunkDocuments(docs, idCol, textCol, chunkTokens, overlapTokens,
      tokens, c => concat_ws(" ", c))

  /** Tokenizer-hooked flavor: `tokenizer` produces the token array a
    * window spans (default: whitespace [[tokens]], unchanged), and
    * `detokenizer` turns a window back into chunk text (default:
    * space join — the whitespace tokenizer's exact inverse modulo
    * runs). Pass [[graft.functions.BpeExpressions.bpeTokens]] +
    * [[graft.functions.BpeExpressions.bpeDetokenize]] to window in
    * MODEL tokens with byte-exact chunk text (the overlap then
    * measures real context-window occupancy, not whitespace words).
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int,
      tokenizer: Column => Column,
      detokenizer: Column => Column): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlapTokens
    // integer ceil((n-chunk)/stride); exact for any n that fits an
    // int since doubles hold integers < 2^53
    val extra = greatest(size(col("toks")) - chunkTokens, lit(0))
    val nChunks = lit(1) + floor((extra + (stride - 1)) / stride)
    docs
      .select(col(idCol), tokenizer(col(textCol)).as("toks"))
      // sequence(0, -1) would generate a DESCENDING range, not an
      // empty one — empty docs need the explicit empty array. The
      // coalesce folds NULL text in too: size(NULL) is NULL, which
      // would fall through to the otherwise-branch where greatest()
      // IGNORES the NULL (largest non-null arg) and fabricates one
      // spurious NULL chunk
      .withColumn("chunks",
        when(coalesce(size(col("toks")), lit(0)) <= 0,
          array().cast("array<array<string>>"))
          .otherwise(transform(sequence(lit(0), (nChunks - 1).cast("int")),
            k => slice(col("toks"), k * stride + 1, lit(chunkTokens)))))
      .select(col(idCol),
        posexplode(col("chunks")).as(Seq("chunk_id", "chunk_toks")))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride).as("start_token"),
        size(col("chunk_toks")).as("n_chunk_tokens"),
        detokenizer(col("chunk_toks")).as("chunk_text"))
  }

  /** Document fingerprint: min-md5 over word 3-shingles (a 1-hash
    * winnowing sketch) + shingle cardinality. String min over md5 hex is
    * engine-portable (md5 is everywhere; xxhash64 is not).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame =
    // spread: shingling + per-shingle md5 are scan-partitioned
    Dedup.spread(docs.select(col(idCol), col(textCol))).select(col(idCol),
        graft.functions.ShingleExpressions.wordShingles(col(textCol), k)
          .as("sh"))
      .select(col(idCol),
        array_min(transform(col("sh"), s => md5(s))).as("fingerprint"),
        size(col("sh")).as("n_shingles"))
}
