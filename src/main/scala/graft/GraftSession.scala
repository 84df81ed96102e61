package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the library's recommended configuration, set
  * ONCE at construction (a loader silently flipping session-wide flags
  * mid-query is a trap for every other reader in the session):
  *
  *   - UTC session timezone (reference uses timestamptz; oracle
  *     comparisons need a pinned zone);
  *   - zstd parquet writes (reference's
  *     write.parquet.compression-codec on every table);
  *   - nanosAsLong so TIMESTAMP(NANOS) parquet (the events fixture)
  *     reads as a long instead of erroring — `Tables.events` then
  *     normalizes to a micros timestamp;
  *   - shuffle partitions sized to the core count, not the 200
  *     default (right for local/bench; a real cluster deployment
  *     should size to executors x cores, or rely on AQE coalescing).
  */
object GraftSession {

  def builder(master: String = "local[*]",
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    // storage backend is deploy-time selectable: GRAFT_FILEIO =
    // objectstore | catalog:<port> | unset (POSIX link(2) protocol).
    // Installed before any session I/O; no-op when unset.
    graft.tableformat.FileIO.installFromEnv()
    val parts = shufflePartitions.getOrElse(
      Runtime.getRuntime.availableProcessors())
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", parts.toString)
      // AQE partition coalescing sizes post-shuffle stages at
      // max(totalBytes / defaultParallelism, minPartitionSize); the
      // default 1 MB floor collapses every small-to-mid intermediate
      // shuffle to ONE partition, serializing multi-stage pipelines
      // whose per-row cost is expression-heavy (bytes are a bad proxy
      // for work on shingle/regex/hash/vector-dot pipelines). A 256 KB
      // floor keeps MB-scale intermediate stages parallel while leaving
      // genuinely tiny shuffles coalesced (a 64 KB floor was measured:
      // it over-fragments the many-small-stage SMJ pipelines into task
      // storms — q42 +15%, q127 +20%; 256 KB recovers those AND keeps
      // the wins). Fully scale-adaptive: at real data sizes
      // totalBytes/parallelism dominates and behavior is unchanged;
      // the worst case is "no coalescing", bounded by
      // shuffle.partitions.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // wide-expression operators (MinHash/SimHash fan-outs) compile
      // large generated classes; the default 100-entry codegen cache
      // evicts them in sessions running many distinct queries, forcing
      // multi-second Janino recompiles on every execution. 1000 (the
      // r6-r19 value) stopped being enough when the suite grew past
      // ~160 queries: at ~15 codegen units per query the suite's
      // working set is ~2,500 classes, so by the time a query's
      // MEASURED pass ran, its classes had been evicted by the 100+
      // queries warmed up in between — profiled as steady-state passes
      // uniformly 1-1.5 s slower than the warmup with near-zero GC on
      // exactly the widest-codegen tier (q42/q63/q71/q92/q93/q127),
      // the same signature as r19's driver-run "regressions". 5000
      // covers the working set with headroom; memory bound is
      // generated-class bytecode (~10-100 KB each), a few hundred MB
      // worst case on the driver — measured: full suite 67.96 s /
      // 14 stall flags at 1000 vs 57.90 s / 2 flags at 5000, same
      // commit, same host.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // dynamic pruning's residual domains reach parquet as IN-sets;
      // above this threshold Spark degrades the pushed filter to a
      // min/max range, losing dictionary + bloom point skipping — a
      // CDC batch of a few hundred scattered keys is exactly the shape
      // blooms exist for, and a 128-branch OR is evaluated per ROW
      // GROUP (stats/bloom), not per row
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "128")
      // InferFiltersFromGenerate turns explode(f(x)) into
      // `size(f(x)) > 0 AND isnotnull(f(x))` filters which predicate
      // pushdown then inlines BELOW exchanges — for the pipeline tier's
      // shingle/token explodes that re-evaluates the library's most
      // expensive (interpreted higher-order) expressions per row on the
      // narrow pre-shuffle side, for zero pruning benefit (the Generate
      // drops empty arrays itself). Measured 2-10x on the dedup
      // operators at bench scale.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // bound driver-side status bookkeeping: long sessions executing
      // thousands of heavy queries otherwise accumulate job/stage/task
      // state and degrade progressively
      .config("spark.sql.ui.retainedExecutions", "50")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "10000")
      // native `graft.db.t` SQL resolution (incl. VERSION/TIMESTAMP AS
      // OF) — a no-op until spark.graft.warehouse points at a warehouse;
      // the catalog plugin claims the name, the rule supplies the plan
      .config("spark.sql.catalog.graft", "graft.catalog.GraftNamespaceCatalog")
      // observability: warn when the ANN candidate cap binds (recall
      // degrades by design, but never silently)
      .config("spark.sql.queryExecutionListeners",
        "graft.pipeline.CapBindingListener")
      .withExtensions(new graft.catalog.GraftExtensions)
  }
}
