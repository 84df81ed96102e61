package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the pipeline tier (round-9 verdict item 5): runs the
  * workhorse document operators — exact dedup, decontamination,
  * within-document repetition scoring, line dedup, the quality gate —
  * plus the temporal joins (as-of, range) over the sf fixtures and
  * over FACTOR× self-similar blow-ups of them, and reports the
  * wall-time scaling factor per operator as one JSON line.
  *
  * What "pass" means: time(FACTOR×) / time(1×) stays ≲ linear
  * (`ratio <= FACTOR * slack`), and the plan shape is IDENTICAL at
  * both scales (no broadcast that only fits at the small scale, no
  * join-strategy flip — the silent 100 TB killers). The plans are
  * hashed on their join/exchange skeleton and compared.
  *
  * The blow-up corpus is deterministic: copy k of a document keeps its
  * text for k < FACTOR/2 (real duplicate mass for dedup to find) and
  * appends a copy-unique token otherwise (unique mass so dedup's
  * output also scales). Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SOAK_FACTOR=10 \
  *     sbt "runMain graft.Soak"
  */
object Soak {

  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Join/exchange skeleton of the executed plan — the STRUCTURE that
    * must not flip between scales: join keys and conditions, aggregate
    * stages, explicit repartitionings, and any nested-loop/cartesian
    * appearance. Equi-join STRATEGY is deliberately normalized away:
    * BroadcastHashJoin at 1× becoming SortMergeJoin at 30× (with its
    * implied ENSURE_REQUIREMENTS exchanges) is the planner's designed
    * size-driven degradation on the SAME key — the 100 TB failure
    * modes this gate exists for are the opposite shapes (a key change,
    * a BroadcastNestedLoopJoin, an aggregation restructure).
    */
  private def planShape(df: DataFrame): String =
    df.queryExecution.executedPlan.toString.linesIterator
      .map(_.replaceAll("#\\d+L?", "#x").replaceAll("plan_id=\\d+", "plan_id=x")
        .trim)
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Aggregate"))
      .filterNot(l => l.contains("BroadcastExchange") ||
        (l.contains("Exchange hashpartitioning") &&
          l.contains("ENSURE_REQUIREMENTS")))
      .map(_.replaceAll("^[+:\\- ]*", "")
        .replaceAll("^(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)",
          "EquiJoin")
        .replaceAll(", Build(Left|Right)", "")
        .replaceAll(", false$", ""))
      .mkString("\n")

  def main(args: Array[String]): Unit = {
    // the metadata block measures the table format THROUGH the storage
    // seam: GRAFT_FILEIO=objectstore re-runs it under the strict
    // flat-key/conditional-PUT contract, proving the commit/plan/count
    // numbers don't silently depend on POSIX-cheap claims
    graft.tableformat.FileIO.installFromEnv()
    val fileio = sys.env.get("GRAFT_FILEIO").map(_.trim)
      .filter(_.nonEmpty).getOrElse("local")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SOAK_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))

    // FACTOR× corpus, written to scratch parquet so both measured runs
    // read real files (not an in-memory union the optimizer can see
    // through): ids offset per copy; half the copies duplicate text
    // exactly, half append a copy-unique token
    val soakDir = java.nio.file.Files.createTempDirectory("graft-soak")
    val bigPath = s"$soakDir/documents10"
    val copies = (0 until factor).map { k =>
      val txt =
        if (k < factor / 2) col("text")
        else concat_ws(" ", col("text"), lit(s"soakcopy$k"))
      base.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        txt.as("text"), col("lang"), col("source"))
    }
    copies.reduce(_ unionByName _).write.mode("overwrite").parquet(bigPath)
    val big = spark.read.parquet(bigPath)

    // benchmark set for decontamination: a fixed slice of the corpus
    val bench = base.filter(col("doc_id") % 97 === 0)
      .select(col("text").as("btext"))

    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      "exact_dedup" -> (d => graft.pipeline.Dedup.exact(d, "doc_id", "text")),
      "decontaminate" -> (d => graft.pipeline.Curation
        .decontaminate(d, "doc_id", "text", bench, "btext")),
      "repetition" -> (d => graft.pipeline.TextAnalysis
        .repetitionStats(d, "doc_id", "text")
        .agg(sum(col("n_tokens")).as("t"),
          avg(col("max_tok_frac")).as("m"))),
      // the fixture's docs are single-line, so each exact-copy group in
      // the blow-up is a duplicated "line" crossing minDf — the hot
      // set, probe, and reassembly all do real work at both scales
      "line_dedup" -> (d => graft.pipeline.Curation
        .dedupLines(d, "doc_id", "text", minDf = 3)
        .agg(sum(col("n_removed")).as("r"), count(lit(1)).as("n"))),
      "quality_gate" -> (d => graft.pipeline.TextAnalysis
        .gopherFilter(d, "doc_id", "text", minWords = 20)
        .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("kept"),
          count(lit(1)).as("n"))),
      "chunking" -> (d => graft.pipeline.TextAnalysis
        .chunkDocuments(d, "doc_id", "text", chunkTokens = 64,
          overlapTokens = 16)
        .agg(count(lit(1)).as("n"), sum(col("n_chunk_tokens")).as("t"))),
      // score on length(text): integer-valued, high-cardinality enough
      // to exercise the histogram path at both scales
      "quality_cut" -> (d => graft.pipeline.Curation
        .topPercentPerStratum(d.withColumn("score", length(col("text"))),
          "doc_id", "lang", "score", percent = 30)
        .agg(count(lit(1)).as("kept"))),
      // the blow-up's exact-copy docs share EVERY 13-gram, so the
      // owner/cut machinery does real work at both scales; token-level
      // (id, pos) rows are the operator's heaviest exchange
      "span_dedup" -> (d => graft.pipeline.Dedup
        .dedupSpans(d, "doc_id", "text")
        .agg(sum(col("n_removed")).as("r"), count(lit(1)).as("n"))),
      // the model side is bucket-bounded by construction; what must
      // scale is the probe feature scan
      "lm_fluency" -> (d => graft.pipeline.Curation
        .lmScores(d, "doc_id", "text",
          d.filter(col("doc_id") % 11 === 0), "text")
        .agg(count(lit(1)).as("n"), avg(col("nll")).as("m"))))

    // FACTOR× events for the temporal joins: each copy shifts time by
    // k × 32 days (past the fixture's one-month span), so event DENSITY
    // per window stays constant and both join outputs scale ×FACTOR —
    // a same-span copy would grow the range join's OUTPUT
    // quadratically and the ratio gate would measure the output, not
    // the operator
    val evBase = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val bigEvPath = s"$soakDir/events10"
    (0 until factor).map { k =>
      evBase.select((col("event_id") + lit(k * 100000000L)).as("event_id"),
        (col("ts") + expr(s"INTERVAL ${k * 32} DAYS")).as("ts"),
        col("user_id"), col("event_type"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(bigEvPath)
    val bigEv = spark.read.parquet(bigEvPath)

    val evOps: Seq[(String, DataFrame => DataFrame)] = Seq(
      "asof_join" -> { d =>
        val p = d.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val c = d.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        graft.operators.TemporalJoins.asofJoin(p, c, Seq("user_id"),
          "ts", "ts", Seq("event_id"))
      },
      "range_join" -> { d =>
        val e = d.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"),
            (col("ts") - expr("INTERVAL 1 HOUR")).as("s"),
            (col("ts") + expr("INTERVAL 1 HOUR")).as("e"))
        val p = d.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("ts").as("pts"))
        graft.operators.TemporalJoins.rangeJoinPoints(e, "s", "e",
          p, "pts", bucketWidthMicros = 3600L * 1000000L)
      })

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val debug = sys.env.contains("SPARK_GRAFT_SOAK_DEBUG")
    // dev knob: metadata block only (the pipeline ops dominate a full
    // soak's wall clock; iterating on commit-path cost doesn't need
    // them)
    val metaOnly = sys.env.contains("SPARK_GRAFT_SOAK_META_ONLY")
    // dev knob: comma-separated op-name substrings, for core-scaling
    // runs at large factors where the heaviest ops would dominate the
    // wall clock (r20: the 8-vs-32-cpu demonstration at factor 100)
    val onlyOps = sys.env.get("SPARK_GRAFT_SOAK_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def wanted(n: String) = onlyOps.forall(_.exists(n.contains))
    val jobs =
      if (metaOnly) Seq.empty
      else ops.filter(o => wanted(o._1))
        .map { case (n, op) => (n, base, big, op) } ++
        evOps.filter(o => wanted(o._1))
          .map { case (n, op) => (n, evBase, bigEv, op) }
    val results = jobs.map { case (name, small, large, op) =>
      run(op(small)) // warm both code paths
      val t1 = math.min(time(run(op(small))), time(run(op(small))))
      val tN = math.min(time(run(op(large))), time(run(op(large))))
      val (s1, sN) = (planShape(op(small)), planShape(op(large)))
      if (debug && s1 != sN)
        System.err.println(s"[soak] $name shape diff\n--- 1x\n$s1\n--- ${factor}x\n$sN")
      val shapeSame = s1 == sN
      val ratio = tN / math.max(t1, 1e-3)
      (name, t1, tN, ratio, shapeSame)
    }
    val ok = results.forall { case (_, _, _, ratio, shapeSame) =>
      shapeSame && ratio <= factor * 1.5
    }
    val json = results.map { case (n, t1, tN, r, s) =>
      f""""$n":{"t1":$t1%.2f,"tN":$tN%.2f,"ratio":$r%.2f,"shape_stable":$s}"""
    }.mkString("{", ",", "}")

    // ---- metadata-scale soak (round-11 item 2; pushed to 1M entries
    // round 13): a table with 10⁶ file entries — the ~100 TB file
    // count at 100 MB/file — across 100 commits, NO data I/O anywhere;
    // this measures the table format itself. Pins:
    //   - commit cost stays O(new files + #manifests), observed as the
    //     last-10-commit average staying within 3x of the first-10
    //     (inline file lists made it O(total files): ~linear growth,
    //     last10/first10 ~ 8x at the 100k shape);
    //   - countRows answers from manifest-ref arithmetic in
    //     milliseconds (never loads the million entries);
    //   - a boundary-aligned countWhere plans over the full inventory
    //     (manifest skip + strict refs) without reading a byte of data
    //     (the entry paths don't exist on disk) — and the fraction of
    //     manifests its summaries veto without opening is reported;
    //   - COLD planning (every manifest parsed, one parallel task
    //     each — Manifests.readAll) is reported in seconds.
    val metaJson = {
      import graft.tableformat._
      val mloc = java.nio.file.Files.createTempDirectory("graft-msoak").toString
      MetadataIO.commit(TableMetadata.create("msoak", mloc, Seq("id" -> "long")))
      val perCommit =
        sys.env.getOrElse("SPARK_GRAFT_MSOAK_PER_COMMIT", "10000").toInt
      val nCommits =
        sys.env.getOrElse("SPARK_GRAFT_MSOAK_COMMITS", "100").toInt
      val commitSecs = (0 until nCommits).map { k =>
        val cur = MetadataIO.read(mloc)
        val fresh = (0 until perCommit).map { j =>
          val i = k * perCommit + j
          DataFileEntry(s"data/f$i.parquet", 1000L, 0,
            lowerBounds = Map("1" -> (i * 1000L).toString),
            upperBounds = Map("1" -> (i * 1000L + 999L).toString),
            nullCounts = Map("1" -> 0L), fileSizeBytes = 4L << 20)
        }.toVector
        val files = cur.currentSnapshot.map(_.files).getOrElse(Vector.empty) ++ fresh
        time(MetadataIO.commit(cur.copy(
          currentSnapshotId = Some(k.toLong + 1),
          snapshots = cur.snapshots :+ Snapshot(k.toLong + 1,
            cur.currentSnapshotId, 1000000L + k, "append", 0, 0, files),
          snapshotLog = cur.snapshotLog :+
            SnapshotLogEntry(1000000L + k, k.toLong + 1))))
      }
      val t = new graft.engine.GraftTable(spark, mloc)
      Manifests.clearCachesForTesting()
      val planCold = time {
        require(t.meta.currentSnapshot.get.files.size == perCommit * nCommits)
      }
      // PREDICATED cold planning: a selective predicate must veto
      // manifests on their summaries BEFORE any readEntries call, so a
      // cold pruned plan loads only the SURVIVING manifests — ms, not
      // the full-inventory seconds of planCold. Pinned with the parse
      // counter: loads observed == manifests that survive the skip.
      val (planPruned, prunedLoads, prunedSurvivors) = {
        Manifests.clearCachesForTesting()
        // top 1% of the id range: everything below the cut's manifest
        // upper bounds is vetoed unopened
        val pcut = (perCommit * nCommits).toLong * 1000L * 99L / 100L
        val before = Manifests.parseCount.get()
        val sec = time {
          // the candidate-file computation readWhere plans through —
          // manifest-summary skip, then entry loads for survivors only
          val m2 = t.meta
          val s2 = m2.currentSnapshot.get
          val kept = t.prunedSnapshotFiles(m2, s2,
            org.apache.spark.sql.graftshim.expressionOf(col("id") >= pcut))
          require(kept.nonEmpty && kept.size <= 2 * perCommit,
            s"pruned candidates: ${kept.size}")
        }
        val loads = Manifests.parseCount.get() - before
        val survivors = t.meta.currentSnapshot.get.manifests
          .filter(_.kind == "data")
          .count(_.upperBounds.get("1").forall(_.toLong >= pcut))
        (sec, loads, survivors)
      }
      // DYNAMIC-DOMAIN pruning at the 10⁶-file shape: the evaluated
      // IN-set that join-driven pruning, MERGE source-key pruning, and
      // subquery-domain pruning hand to file planning. A 10-key "CDC
      // batch" spread across the clustered inventory must collapse to
      // EXACTLY its 10 files, opening only the 10 manifests that hold
      // them (summaries veto the rest unopened) — the difference
      // between an upsert planning in milliseconds and scanning a
      // 100 TB fact to find its rows.
      val (dynSec, dynLoads, dynKept) = {
        Manifests.clearCachesForTesting()
        val n = (perCommit * nCommits).toLong
        val keys = (0 until 10).map(i => i * n / 10L * 1000L + 500L)
        val expr = org.apache.spark.sql.catalyst.expressions.In(
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            .quoted("id"),
          keys.map(k => org.apache.spark.sql.catalyst.expressions.Literal(k)))
        val before = Manifests.parseCount.get()
        var kept = 0
        val sec = time {
          val m2 = t.meta
          val s2 = m2.currentSnapshot.get
          kept = t.prunedSnapshotFiles(m2, s2, expr).size
        }
        require(kept == 10, s"dynamic-domain prune kept $kept files")
        (sec, Manifests.parseCount.get() - before, kept)
      }
      val countRowsSec = time(require(t.countRows() == 1000L * perCommit * nCommits))
      // boundary-aligned predicate: half the inventory, proven wholly
      // from manifest/file stats — zero parquet reads (paths are fake)
      val cut = (perCommit * nCommits / 2) * 1000L
      val countWhereSec = time(require(
        t.countWhere(col("id") >= cut) == 1000L * perCommit * nCommits / 2))
      // manifest-summary skip rate on that predicate: refs whose
      // merged upper bound proves NO row matches never open at all
      val dataRefs = t.meta.currentSnapshot.get.manifests
        .filter(_.kind == "data")
      val skippable = dataRefs.count(
        _.upperBounds.get("1").exists(_.toLong < cut))
      val skipFrac = skippable.toDouble / math.max(dataRefs.size, 1)
      val first10 = commitSecs.take(10).sum / 10.0
      val last10 = commitSecs.takeRight(10).sum / 10.0
      val flat = last10 / math.max(first10, 1e-3) <= 3.0
      // CHURN commits at full inventory: a CoW-delete-shaped commit
      // (drop one mid-inventory file) exercises the general sealing
      // path — identity-first manifest reuse must keep its cost at
      // tens of ms over 10⁶ entries, not the seconds a string-keyed
      // full-inventory map costs
      Manifests.SealStats.reset()
      val churnSecs = (0 until 5).map { k =>
        val cur = MetadataIO.read(mloc)
        val inv = cur.currentSnapshot.get.files
        val files = inv.patch(inv.size / 2 + k, Nil, 1)
        time(MetadataIO.commit(cur.copy(
          currentSnapshotId = Some(1000L + k),
          snapshots = cur.snapshots :+ Snapshot(1000L + k,
            cur.currentSnapshotId, 2000000L + k, "delete", 0, 0, files),
          snapshotLog = cur.snapshotLog :+
            SnapshotLogEntry(2000000L + k, 1000L + k))))
      }
      val churnAvg = churnSecs.sum / churnSecs.size
      // named-term split of the churn cost (per commit, seconds):
      // where the general sealing path spends its time — identity-set
      // build over the inventory, the parent-manifest reuse filter,
      // the leftover scan, and the leftover re-manifest write
      def per(ns: java.util.concurrent.atomic.AtomicLong): Double =
        ns.get() / 1e9 / churnSecs.size
      val churnTerms =
        f""""churn_ident_build_s":${per(Manifests.SealStats.identBuildNs)}%.4f,""" +
        f""""churn_reuse_filter_s":${per(Manifests.SealStats.filterNs)}%.4f,""" +
        f""""churn_leftover_scan_s":${per(Manifests.SealStats.leftoverNs)}%.4f,""" +
        f""""churn_manifest_write_s":${per(Manifests.SealStats.writeNs)}%.4f,"""
      try {
        import scala.jdk.CollectionConverters._
        val w = java.nio.file.Files.walk(java.nio.file.Paths.get(mloc))
        val ps = try w.iterator().asScala.toSeq.reverse finally w.close()
        ps.foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case _: java.io.IOException => () }
      f""""metadata":{"files":${perCommit * nCommits},"commits":$nCommits,""" +
        f""""commit_first10_avg_s":$first10%.4f,"commit_last10_avg_s":$last10%.4f,""" +
        f""""commit_flat":$flat,"plan_cold_s":$planCold%.3f,""" +
        f""""plan_pruned_s":$planPruned%.4f,""" +
        f""""pruned_manifest_loads":$prunedLoads,""" +
        f""""pruned_manifest_survivors":$prunedSurvivors,""" +
        f""""dyn_prune_s":$dynSec%.4f,"dyn_manifest_loads":$dynLoads,""" +
        f""""dyn_files_kept":$dynKept,""" +
        f""""count_rows_s":$countRowsSec%.4f,"count_where_s":$countWhereSec%.3f,""" +
        f""""manifests":${dataRefs.size},"manifest_skip_frac":$skipFrac%.3f,""" +
        churnTerms +
        f""""churn_commit_avg_s":$churnAvg%.4f}"""
    }

    val line = s"""{"soak":"pipeline","sf":"$sfDir","factor":$factor,""" +
      s""""fileio":"$fileio","ops":$json,$metaJson,"linear_enough":$ok}"""
    println(line)
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target", "soak.json"), line + "\n")
    } catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
    // reclaim the scratch blow-up
    try {
      val w = java.nio.file.Files.walk(soakDir)
      val ps = try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.toSeq.reverse
      } finally w.close()
      ps.foreach(java.nio.file.Files.deleteIfExists(_))
    } catch { case _: java.io.IOException => () }
  }
}
