package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import graft.engine.GraftTable

/** Structured Streaming SOURCE over a graft table: tail a versioned
  * table as a stream of its appended snapshots — the streaming twin of
  * `GraftTable.readAppendsBetween` and the capability the reference
  * approximates by re-reading its changelog after each commit
  * (Pyspark_Notebook.ipynb cells 32-35).
  *
  * Offsets are POSITIONS IN THE SNAPSHOT LOG (1-based count of
  * commits), not snapshot ids: log positions are monotonic while ids
  * are random, and a micro-batch (start, end] maps to
  * `readAppendsBetween(log(start-1).id, log(end-1).id)` — a
  * metadata-only file selection reading exactly the files added by the
  * covered commits.
  *
  * Scale design: each micro-batch plans from the manifest (no
  * directory listing, no state proportional to table size). Honest
  * caveat: the DSv1 Source contract compiles each batch through
  * `queryExecution.toRdd` (a LogicalRDD barrier), so the streaming
  * query's OWN projections/filters do not push into the per-batch
  * parquet scan — each batch reads the appended files' full rows; the
  * file SELECTION is still metadata-exact. Semantics guards inherited from
  * readAppendsBetween: a non-append commit (CoW rewrite, compaction)
  * inside a batch range fails loudly rather than re-delivering
  * rewritten rows; consumers resync via `changelog()`. Snapshot
  * expiration invalidates open checkpoints (log positions shift) —
  * documented, same constraint as Iceberg's incremental read.
  */
final class GraftTableStreamSource(spark: SparkSession, location: String,
    mode: String = "appends", maxSnapshotsPerTrigger: Option[Int] = None,
    metadataPath: Option[String] = None,
    maxBytesPerTrigger: Option[Long] = None,
    maxRowsPerTrigger: Option[Long] = None) extends Source {

  require(mode == "appends" || mode == "changes",
    s"graft-table stream mode must be 'appends' or 'changes', got '$mode'")
  require(maxSnapshotsPerTrigger.forall(_ > 0),
    "maxSnapshotsPerTrigger must be positive")
  require(maxBytesPerTrigger.forall(_ > 0),
    "maxBytesPerTrigger must be positive")
  require(maxRowsPerTrigger.forall(_ > 0),
    "maxRowsPerTrigger must be positive")

  private val table = GraftTable.load(spark, location)

  private def capped: Boolean = maxSnapshotsPerTrigger.isDefined ||
    maxBytesPerTrigger.isDefined || maxRowsPerTrigger.isDefined

  /** Admission control (Kafka's maxOffsetsPerTrigger; here in
    * snapshots, data-file bytes, or rows — Delta offers the same
    * maxBytes/maxFiles pair): a capped source must never offer an
    * offset BELOW what a previous run already committed — the V1
    * contract hands the source no committed floor, so the floor is
    * persisted in the source's own checkpoint dir (`metadataPath`, the
    * FileStreamSource pattern): every planned batch records its end
    * position, planning runs before commit, so the recovered floor is
    * always >= the committed offset and capping from it can never
    * regress the stream. Caveat (documented): with
    * Trigger.AvailableNow/Once a V1 source runs ONE batch, so a capped
    * query should drive with ProcessingTime until caught up.
    */
  private val floorFile: Option[java.nio.file.Path] =
    (if (capped) metadataPath else None).map { mp =>
      // metadataPath arrives as a URI (file:/...): resolve it as one,
      // or Paths.get would treat the whole string as a RELATIVE path
      val dir =
        if (mp.contains(":/")) java.nio.file.Paths.get(java.net.URI.create(
          // bare "file:/x" URIs need the authority form for Paths.get
          if (mp.startsWith("file:/") && !mp.startsWith("file:///"))
            "file://" + mp.stripPrefix("file:")
          else mp))
        else java.nio.file.Paths.get(mp)
      java.nio.file.Files.createDirectories(dir)
      dir.resolve("graft-offset-floor")
    }

  private var floor: Long = floorFile match {
    case Some(p) if java.nio.file.Files.exists(p) =>
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim.toLong
    case _ => 0L
  }

  private def recordFloor(end: Long): Unit = if (end > floor) {
    floor = end
    floorFile.foreach { p =>
      val tmp = p.resolveSibling(s"${p.getFileName}.tmp")
      java.nio.file.Files.write(tmp, end.toString.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  // the stream's schema binds at construction: every micro-batch maps
  // onto THIS shape by field-id, so mid-stream evolution (rename, drop,
  // add) keeps delivering the declared columns instead of silently
  // re-labelling new-schema columns positionally (MicroBatchExecution
  // rebinds batch output to the declared schema by position)
  private val boundSchema = table.meta.currentSchema

  override val schema: StructType =
    if (mode == "changes") GraftTableStream.changesSchema(boundSchema)
    else boundSchema.toStructType

  /** Latest offset = number of committed snapshots (None until the
    * first commit). Metadata read only — called once per trigger; the
    * byte/row caps read each candidate commit's cost from its
    * snapshot summary (`added-files-size-bytes` / `added-records`,
    * O(1) per snapshot), falling back to a parent-path-set diff for
    * manifests written before summaries carried added-* keys.
    */
  override def getOffset: Option[OffsetV1] = {
    val m = table.meta
    val n = m.snapshotLog.size.toLong
    val end = if (!capped) n else admit(m, n)
    if (end == 0) None else Some(LongOffset(end))
  }

  /** Cost of admitting one commit: (data-file bytes, rows) added. */
  private def addedCost(m: graft.tableformat.TableMetadata,
      snap: graft.tableformat.Snapshot): (Long, Long) = {
    (snap.summary.get("added-files-size-bytes").map(_.toLong),
      snap.summary.get("added-records").map(_.toLong)) match {
      case (Some(b), Some(r)) => (b, r)
      case _ =>
        val parentPaths = snap.parentId.flatMap(m.snapshotById)
          .map(_.files.map(_.path).toSet).getOrElse(Set.empty)
        val added = snap.files.filterNot(f => parentPaths(f.path))
        (added.map(_.fileSizeBytes).sum, added.map(_.recordCount).sum)
    }
  }

  /** Walk log positions above the floor, admitting commits while every
    * configured cap holds. A single commit larger than a cap is still
    * admitted ALONE (snapshot granularity is the admission unit —
    * refusing it would stall the stream forever); pointer-move log
    * entries (rollback/fast-forward re-point to existing snapshots)
    * cost their original commit's summary, an acceptable estimate for
    * pacing.
    */
  private def admit(m: graft.tableformat.TableMetadata, n: Long): Long = {
    var end = floor
    var snaps = 0
    var bytes = 0L
    var rows = 0L
    while (end < n) {
      val (b, r) = m.snapshotById(m.snapshotLog(end.toInt).snapshotId)
        .map(addedCost(m, _)).getOrElse((0L, 0L))
      val fits = maxSnapshotsPerTrigger.forall(snaps + 1 <= _) &&
        maxBytesPerTrigger.forall(bytes + b <= _) &&
        maxRowsPerTrigger.forall(rows + r <= _)
      if (!fits) return if (snaps == 0) end + 1 else end
      end += 1; snaps += 1; bytes += b; rows += r
    }
    end
  }

  /** Rows appended by commits in log positions (start, end]. */
  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val m = table.meta
    val from = start.map(asLong).getOrElse(0L).toInt
    val to = asLong(end).toInt
    recordFloor(to.toLong)
    require(to >= 1 && to <= m.snapshotLog.size,
      s"offset $to out of range (snapshot log has ${m.snapshotLog.size} " +
        "entries — expired snapshots invalidate streaming checkpoints)")
    val fromId =
      if (from == 0) None else Some(m.snapshotLog(from - 1).snapshotId)
    val toId = m.snapshotLog(to - 1).snapshotId
    val batch =
      if (mode == "changes") {
        // per-range changelog (_change_type insert/delete): the CDC
        // consumer shape `readAppendsBetween` refuses (it cannot cross
        // rewrites). The first batch (from = 0) is the initial load —
        // current state as inserts — exactly Delta CDF's convention.
        // Accretive ranges (CDC upsert / MoR DML commits) diff from
        // delta files only; columns re-bind to the declared schema by
        // FIELD-ID so mid-stream renames keep delivering them.
        import org.apache.spark.sql.functions.col
        val cur = m.currentSchema
        val cols = boundSchema.fields.map { f =>
          val liveName = cur.fieldById(f.id).getOrElse(sys.error(
            s"stream-bound column ${f.name} (field-id ${f.id}) was " +
              "dropped mid-stream")).name
          col(s"`$liveName`").cast(f.sparkType).as(f.name)
        } :+ col("_change_type")
        table.changelog(fromId, toId).select(cols: _*)
      } else table.readAppendsBetween(fromId, toId, Some(boundSchema))
    org.apache.spark.sql.graftshim.streamingDfFromBatch(spark, batch)
  }

  /** Checkpointed offsets come back as SerializedOffset json. */
  private def asLong(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case other         => other.json.trim.toLong
  }

  override def stop(): Unit = ()
}

/** `spark.readStream.format("graft-table").option("path", loc).load()`
  * (short name via META-INF/services; streaming-only — batch reads go
  * through GraftTable / the catalog).
  */
final class GraftTableStreamProvider
    extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def loc(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      sys.error("graft-table stream requires option 'path' (table location)"))

  private def mode(parameters: Map[String, String]): String =
    parameters.getOrElse("mode", "appends")

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val s = GraftTable.load(sqlContext.sparkSession, loc(parameters))
      .meta.currentSchema
    (shortName(),
      if (mode(parameters) == "changes") GraftTableStream.changesSchema(s)
      else s.toStructType)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftTableStreamSource(sqlContext.sparkSession, loc(parameters),
      mode(parameters),
      opt(parameters, "maxSnapshotsPerTrigger").map(_.toInt),
      Some(metadataPath),
      opt(parameters, "maxBytesPerTrigger").map(_.toLong),
      opt(parameters, "maxRowsPerTrigger").map(_.toLong))

  // DataSource options arrive case-preserved from .option() but are
  // case-insensitive by Spark convention
  private def opt(parameters: Map[String, String], name: String) =
    parameters.get(name).orElse(parameters.get(name.toLowerCase))
}

object GraftTableStream {

  /** Streaming read of a graft table's appended snapshots. */
  def read(spark: SparkSession, location: String): DataFrame =
    spark.readStream.format("graft-table").option("path", location).load()

  /** Streaming CDC read: per-batch changelog rows with `_change_type`
    * insert/delete — the consumer shape for tables written by the CDC
    * upsert paths, whose non-append commits `read` refuses to cross.
    */
  def readChanges(spark: SparkSession, location: String): DataFrame =
    spark.readStream.format("graft-table").option("path", location)
      .option("mode", "changes").load()

  private[streaming] def changesSchema(
      s: graft.tableformat.VersionedSchema): StructType =
    StructType(s.toStructType.fields :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false))
}
