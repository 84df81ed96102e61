package graft.catalog

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String
import graft.engine.GraftTable
import graft.tableformat.MetadataIO

/** Native SQL resolution for graft tables — the Catalyst-extension
  * point (SparkSessionExtensions.injectResolutionRule) instead of text
  * rewriting: with the extension installed and `spark.graft.warehouse`
  * set, `spark.table("graft.db.t")` and SQL text like
  *
  *   SELECT * FROM graft.db.t
  *   SELECT * FROM graft.db.t VERSION AS OF 123
  *   SELECT * FROM graft.db.t TIMESTAMP AS OF '2026-01-01 00:00:00'
  *
  * resolve through Spark's own parser/analyzer (the reference gets the
  * same surface from the Iceberg Spark extensions, apiv15.py:22).
  *
  * Install via `GraftSession.builder` or
  * `spark.sql.extensions=graft.catalog.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectResolutionRule(ResolveGraftRelations)
}

/** Resolution rule: replaces `UnresolvedRelation(graft, db, t)` (plus
  * its RelationTimeTravel wrapper) with the analyzed plan of the
  * versioned read — field-id mapping, positional deletes, and snapshot
  * selection all come from the engine read path.
  */
case class ResolveGraftRelations(spark: SparkSession) extends Rule[LogicalPlan] {

  private def warehouse: Option[String] =
    spark.conf.getOption("spark.graft.warehouse")

  private def load(db: String, tbl: String): Option[GraftTable] =
    warehouse.map(w => java.nio.file.Paths.get(w, db, tbl).toString)
      .filter(MetadataIO.exists)
      .map(loc => GraftTable.load(spark, loc))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case RelationTimeTravel(u: UnresolvedRelation, ts, ver)
          if isGraft(u) =>
        withTable(u) { t =>
          (ts, ver) match {
            case (_, Some(v)) => t.readAsOfVersion(v.toLong)
            case (Some(e), _) => t.readAsOfTime(evalTsMillis(e))
            case _            => t.read()
          }
        }.getOrElse(plan) // leave unresolved; Spark reports the error
      case u: UnresolvedRelation if isGraft(u) =>
        withTable(u)(_.read()).getOrElse(u)
    }

  private def isGraft(u: UnresolvedRelation): Boolean =
    u.multipartIdentifier.length == 3 &&
      u.multipartIdentifier.head.equalsIgnoreCase("graft")

  private def withTable(u: UnresolvedRelation)(
      f: GraftTable => org.apache.spark.sql.DataFrame): Option[LogicalPlan] = {
    val Seq(_, db, tbl) = u.multipartIdentifier
    load(db, tbl).map(t => f(t).queryExecution.analyzed)
  }

  /** TIMESTAMP AS OF operand: a timestamp literal (micros) or a UTC
    * date/timestamp string.
    */
  private def evalTsMillis(e: Expression): Long = e match {
    case Literal(v: Long, TimestampType) => v / 1000L
    case Literal(s: UTF8String, StringType) => parseUtc(s.toString)
    case other if other.foldable =>
      other.eval(null) match {
        case v: Long       => v / 1000L
        case s: UTF8String => parseUtc(s.toString)
        case v => sys.error(s"cannot interpret time-travel timestamp $v")
      }
    case other => sys.error(s"non-constant time-travel timestamp $other")
  }

  private def parseUtc(s: String): Long = {
    val t = s.trim
    if (t.contains(":"))
      java.time.LocalDateTime.parse(t.replace(" ", "T"))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    else
      java.time.LocalDate.parse(t).atStartOfDay
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  }
}
