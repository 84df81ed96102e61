package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.GraftTable
import graft.ingest.JsonIngest

/** Plan-quality gates: the properties that make these operators hold at
  * 100 TB are asserted on the actual physical plans, so a regression
  * (lost pushdown, un-broadcast dim, un-pruned scan, codegen fallback)
  * fails the build, not just the benchmark.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", Some(4))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters and projections push into the parquet scan") {
    val df = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 45.0)
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"filter must reach the scan:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan must read only projected columns:\n$p")
  }

  test("dimension joins broadcast; no shuffle of the fact side for dims") {
    val q05 = graft.queries.Registry.all.find(_.name == "q05_revenue_by_nation").get
    val p = plan(q05.fn(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
    // exactly one shuffle join (lineitem x orders); dims never shuffle-join
    assert(!p.contains("SortMergeJoin") || p.split("SortMergeJoin").length <= 2)
  }

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    val df = Tables.orders(spark, sf)
      .orderBy(col("o_totalprice").desc).limit(10)
    assert(plan(df).contains("TakeOrderedAndProject"))
  }

  test("whole-stage codegen covers the relational hot path") {
    // lambda-bearing higher-order functions (transform/filter/aggregate)
    // are excluded from whole-stage codegen by Spark itself; the gate
    // here is that scan->filter->agg pipelines stay fused
    // AQE inserts codegen stages only when the plan finalizes at
    // execution; run first, then check the final plan's "*(n)" markers
    val q01 = graft.queries.Registry.all.find(_.name == "q01_pricing_summary").get
    val df = q01.fn(spark, sf)
    df.collect() // a write would plan its own QueryExecution; collect
                 // finalizes THIS df's adaptive plan in place
    val p = plan(df)
    assert(p.contains("isFinalPlan=true"))
    assert(p.contains("*("), s"agg pipeline must have codegen stages:\n$p")
    // and the text path still prunes to exactly the needed columns
    val f = graft.pipeline.TextAnalysis.docFeatures(
      Tables.documents(spark, sf), "doc_id", "text")
    val tp = plan(f.select("doc_id", "n_tokens", "n_stop"))
    assert(tp.contains("Batched: true"), s"vectorized parquet read:\n$tp")
  }

  test("versioned-table partition pruning reads only matching files") {
    import spark.implicits._
    val t = GraftTable.create(spark,
      Files.createTempDirectory("graft-plan").toString, "ev",
      Seq("id" -> "long", "added_at" -> "timestamp"),
      partition = Seq("added_at" -> "day"))
    t.append(Seq(
      (1L, java.sql.Timestamp.valueOf("2025-02-23 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2025-02-24 11:00:00")),
      (3L, java.sql.Timestamp.valueOf("2025-02-25 09:00:00"))).toDF("id", "added_at"))
    val pruned = t.readPruned(_.get("added_at_day").contains("2025-02-24"))
    assert(pruned.inputFiles.length == 1, "pruning is metadata-only, 1 file read")
    val full = t.read()
    assert(full.inputFiles.length == 3)
  }

  test("transform-aware pruning: range through month(), eq through bucket()") {
    import spark.implicits._
    val t = GraftTable.create(spark,
      Files.createTempDirectory("graft-plan").toString, "tp",
      Seq("id" -> "long", "added_at" -> "timestamp"),
      partition = Seq("added_at" -> "month", "id" -> "bucket(4)"))
    t.append((1 to 12).map(mn =>
        (mn.toLong, java.sql.Timestamp.valueOf(f"2025-$mn%02d-10 08:00:00")))
      .toDF("id", "added_at"))
    val total = t.read().inputFiles.length
    assert(total >= 12, "one file per month at minimum")
    // the query never names a partition column — hidden partitioning
    val q = t.readWhere(col("added_at") >= lit("2025-11-01").cast("timestamp"))
    assert(q.inputFiles.length < total / 3,
      s"month() range prune: ${q.inputFiles.length} of $total")
    assert(q.select("id").as[Long].collect().sorted.toSeq == Seq(11L, 12L))
    // bucket eq-prune: only files of id's bucket survive
    val b = t.readWhere(col("id") === 7L)
    assert(b.inputFiles.length < total / 2,
      s"bucket() eq prune: ${b.inputFiles.length} of $total")
    assert(b.select("id").as[Long].collect().toSeq == Seq(7L))
    // order can't push through bucket: at the PARTITION layer a range
    // on id keeps every file (manifest bounds may still prune — that's
    // StatsPruning's composed, separate veto)
    val m = t.meta
    val all = m.currentSnapshot.get.files
    val kept = graft.engine.PartitionPruning.candidates(m, all,
      org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("id"),
        org.apache.spark.sql.catalyst.expressions.Literal(7L)))
    assert(kept.length == all.length, "bucket must not range-prune")
    assert(t.readWhere(col("id") >= 7L).select("id").as[Long]
      .collect().sorted.toSeq == (7L to 12L))
  }

  test("SQL WHERE prunes graft scans through the resolution rule") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-plan-wh").toString
    val cat = new graft.catalog.GraftCatalog(spark, wh)
    val t = cat.createTable("pp", "ev",
      Seq("id" -> "long", "added_at" -> "timestamp"),
      partition = Seq("added_at" -> "day"))
    t.append(Seq(
      (1L, java.sql.Timestamp.valueOf("2025-02-23 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2025-02-24 11:00:00")),
      (3L, java.sql.Timestamp.valueOf("2025-02-25 09:00:00"))).toDF("id", "added_at"))
    val q = spark.sql(
      "SELECT id FROM graft.pp.ev WHERE added_at = TIMESTAMP'2025-02-24 11:00:00'")
    assert(q.inputFiles.length == 1,
      s"SQL WHERE should file-prune: read ${q.inputFiles.length} of 3")
    assert(q.as[Long].collect().toSeq == Seq(2L))
    // manifest BOUNDS prune even without partitioning: id is not a
    // partition column, but per-file min/max excludes the others
    val qb = spark.sql("SELECT id FROM graft.pp.ev WHERE id = 3")
    assert(qb.inputFiles.length == 1,
      s"bounds prune through SQL: read ${qb.inputFiles.length} of 3")
    assert(qb.as[Long].collect().toSeq == Seq(3L))
  }

  test("dedup self-joins stay pinned: SMJ, shared exchange, anti-join cap") {
    import spark.implicits._
    val docs = (0 until 60).map(i => (i.toLong, s"alpha beta gamma delta $i"))
      .toDF("doc_id", "text")
    // uncapped: both self-join sides consume ONE materialized index
    // exchange (reuse appears in the FINALIZED adaptive plan)
    val un = graft.pipeline.Dedup.nearDupJaccard(docs, "doc_id", "text")
    un.collect()
    val pu = plan(un)
    assert(pu.contains("isFinalPlan=true"))
    assert(pu.contains("SortMergeJoin"), s"index self-join must be SMJ:\n$pu")
    assert(pu.contains("ReusedExchange"),
      s"self-join sides must share the index exchange:\n$pu")
    // capped: strategy still pinned; the df cap is an SMJ anti join
    // (NOT broadcast — the hot-key SET is unbounded on real corpora
    // even though it is a small fraction of index rows)
    val cap = graft.pipeline.Dedup.nearDupJaccard(
      docs, "doc_id", "text", maxShingleDf = Some(8))
    cap.collect()
    val pc = plan(cap)
    assert(pc.contains("SortMergeJoin"), s"capped self-join must be SMJ:\n$pc")
    assert(pc.contains("LeftAnti"), s"df cap must be an anti join:\n$pc")
    assert(!pc.contains("BroadcastHashJoin"),
      s"hot-key set must never broadcast (unbounded at scale):\n$pc")
  }

  test("ANN verification joins are broadcast; corpus is never shuffle-joined") {
    val emb = Tables.embeddings(spark, sf)
    val p = plan(graft.pipeline.Similarity.cosineTopKLsh(
      emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 3))
    // query buckets, candidate set, and query vectors all broadcast —
    // the round-4 flap was AQE shuffling the corpus WITH vectors here
    assert(!p.contains("SortMergeJoin"),
      s"no corpus shuffle join in the ANN path:\n$p")
    assert(p.split("BroadcastHashJoin").length >= 3,
      s"bucket + verification joins must broadcast:\n$p")
  }

  test("q46 langId evaluates each marker count once (no CASE re-inlining)") {
    val q46 = graft.queries.Registry.all.find(_.name == "q46_lang_id").get
    val p = q46.fn(spark, sf).queryExecution.optimizedPlan.toString
    // each language's marker filter must appear exactly once in the
    // optimized plan — the inlined form duplicated every count ~6x
    // through the argmax CASE, re-running the interpreted array filter
    // (and the split feeding it) per copy
    for (marker <- Seq("der,die,das", "el,la,los", "le,la,les")) {
      val n = p.sliding(marker.length).count(_ == marker)
      assert(n == 1, s"marker list '$marker' appears $n times (want 1):\n$p")
    }
    assert(p.sliding("split(".length).count(_ == "split(") == 1,
      s"tokenization must run once:\n$p")
  }

  test("JSON metadata documents read as DataFrames (S4)") {
    import spark.implicits._
    val t = GraftTable.create(spark,
      Files.createTempDirectory("graft-json").toString, "jt",
      Seq("id" -> "long"))
    t.append(Seq(1L, 2L).toDF("id"))
    val df = JsonIngest.readTableMetadata(spark, t.location)
    val row = df.select("name", "formatVersion", "currentSchemaId").head()
    assert(row.getString(0) == "jt")
    assert(row.getLong(1) == 2L)
    // snapshots array surfaces as queryable nested structure
    assert(df.select(explode(col("snapshots")).as("s"))
      .select("s.operation").as[String].collect().toSeq == Seq("append"))
  }

  test("chunking reads only the two columns it uses; quality cut " +
      "broadcasts its thresholds and never exchanges the corpus twice") {
    val q138 = graft.queries.Registry.all.find(_.name == "q138_chunking").get
    val p138 = plan(q138.fn(spark, sf))
    assert(p138.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"chunking must prune the scan to (doc_id, text):\n$p138")
    val q139 = graft.queries.Registry.all.find(_.name == "q139_quality_cut").get
    val p139 = plan(q139.fn(spark, sf))
    assert(p139.contains("BroadcastHashJoin"),
      s"thresholds must broadcast:\n$p139")
    // the skew-free shape itself (only the tie set is ever ranked) is
    // pinned behaviorally in PipelineSpec's naive-window equality test;
    // a textual no-corpus-window assertion can't be separated from the
    // query's own deterministic output ORDER BY here
  }

  test("incremental touched-slice probe: the history index is " +
      "broadcast-semi pre-filtered by batch keys once the stats gate " +
      "says history is at scale, and left whole below it") {
    import graft.pipeline.Dedup
    // a batch sized like a real batch
    val batch = spark.range(100)
      .select(col("id").as("doc_id"),
        concat_ws(" ", lit("alpha beta gamma delta epsilon zeta eta"),
          col("id").cast("string")).as("text"))
    // small history: the gate must NOT fire (the filter is pure
    // serialized-broadcast latency when the exchange it removes is
    // small — measured +0.4 s on q151's fixture index)
    val smallIdx = Dedup.spanGramIndex(batch, "doc_id", "text")
    val pSmall = Dedup.dedupSpansIncremental(batch, "doc_id", "text",
      smallIdx).queryExecution.executedPlan.toString
    assert(!pSmall.contains("LeftSemi"),
      s"small history must skip the touched-slice filter:\n$pSmall")
    // at-scale history: spark.range carries exact stats (8 bytes/row),
    // so 4B rows estimate ~32 GB >> cores x maxPartitionBytes and the
    // gate fires; the plan is only EXPLAINED, never executed
    val bigIdx = spark.range(4L * 1000 * 1000 * 1000)
      .select(col("id").as("g"), col("id").as("owner"), lit(2L).as("ndocs"))
    val pBig = Dedup.dedupSpansIncremental(batch, "doc_id", "text", bigIdx)
      .queryExecution.executedPlan.toString
    assert(pBig.contains("LeftSemi") && pBig.contains("Broadcast"),
      s"at-scale history must be broadcast-semi pre-filtered:\n$pBig")
  }

  test("span dedup plans with equi-joins only — no nested-loop or " +
      "cartesian anywhere, batch and incremental alike") {
    for (name <- Seq("q150_span_dedup", "q151_span_dedup_incremental")) {
      val q = graft.queries.Registry.all.find(_.name == name).get
      val p = plan(q.fn(spark, sf))
      assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
        s"$name must stay equi-joined:\n$p")
    }
  }
}
