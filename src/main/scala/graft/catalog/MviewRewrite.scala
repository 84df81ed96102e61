package graft.catalog

import scala.util.control.NonFatal

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  Expression, Literal, NamedExpression, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import graft.engine.GraftTable

/** Automatic query rewrite onto MAINTAINED MATERIALIZED AGGREGATES.
  *
  * [[graft.operators.IncrementalAgg]] keeps a keyed state table
  * (count/sum components, optionally min/max extremes) current in
  * O(changed rows) per refresh. This rule closes the loop: a SQL
  * aggregate over the BASE table rewrites to an aggregate over the
  * state table when a registered view covers it and is FRESH — at
  * 100 TB that turns a full-table GROUP BY into a scan of an
  * MB-scale state table, the classic materialized-view rewrite
  * (Oracle/Calcite "query rewrite"), here with Iceberg-style
  * snapshot-id freshness instead of staleness windows.
  *
  * Registration rides on the base table's properties
  * ([[GraftTable.registerMaterializedView]]):
  * `graft.mview.<name>.{state,keys,sums,exts}`. Freshness is exact:
  * the state table's `graft.agg.<name>.from-snapshot` (committed
  * atomically with every fold) must equal the snapshot the query
  * reads — the CURRENT snapshot, or the pinned one for time travel.
  * A stale, missing, or mis-shaped state falls through to the
  * ordinary scan: the rewrite is all-or-nothing and can never change
  * results, only the plan.
  *
  * Covered shapes (everything else scans):
  *   - grouping by any SUBSET of the view's keys (including none —
  *     the state rolls up: sums/counts add, mins/maxes nest);
  *   - count(*) / count(col) / sum(col) / avg(col) over `sums`
  *     columns (long/double results only — decimal sums keep exact
  *     scan semantics), min/max over `exts` columns;
  *   - one WHERE over key columns only (whole groups selected, so
  *     filtering the state is equivalent to filtering the base).
  */
object MviewRewrite {

  final case class Mview(name: String, stateLoc: String,
      keys: Seq[String], sums: Seq[String], exts: Seq[String])

  def viewsOf(t: GraftTable): Seq[Mview] = {
    val props = t.meta.properties
    props.keys.collect {
      case k if k.startsWith("graft.mview.") && k.endsWith(".state") =>
        k.stripPrefix("graft.mview.").stripSuffix(".state")
    }.toSeq.sorted.flatMap { n =>
      def list(s: String) = props.getOrElse(s"graft.mview.$n.$s", "")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val state = props.getOrElse(s"graft.mview.$n.state", "")
      if (state.isEmpty) None // dropped view: state cleared
      else Some(Mview(n, state, list("keys"), list("sums"), list("exts")))
    }
  }

  def hasViews(t: GraftTable): Boolean =
    t.meta.properties.keys
      .exists(k => k.startsWith("graft.mview.") && k.endsWith(".state"))

  /** Shape-only pre-test for the analyzer deferral (mirrors
    * `maybePushable`, widened to sum/avg): every output is a group
    * column or an undecorated count/sum/avg/min/max of one.
    */
  def mviewShaped(exprs: Seq[NamedExpression]): Boolean = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias,
      UnresolvedAttribute, UnresolvedFunction, UnresolvedStar}
    def okArg(e: Expression): Boolean = e match {
      case _: Literal | _: UnresolvedStar | _: UnresolvedAttribute |
          _: AttributeReference => true
      case _ => false
    }
    exprs.forall { ne =>
      val body = ne match {
        case Alias(c, _)         => c
        case ua: UnresolvedAlias => ua.child
        case other               => other
      }
      body match {
        case UnresolvedFunction(Seq(fn), args, false, None, _, _, _)
            if Set("count", "sum", "avg", "mean", "min", "max")(
              fn.toLowerCase) =>
          args.sizeIs == 1 && okArg(args.head)
        case AggregateExpression(fnn, _, false, None, _) => fnn match {
          case Count(Seq(a))  => okArg(a)
          case Sum(a, _)      => okArg(a)
          case Average(a, _)  => okArg(a)
          case Min(a)         => okArg(a)
          case Max(a)         => okArg(a)
          case _              => false
        }
        case e if okArg(e) => true
        case _             => false
      }
    }
  }

  private sealed trait Out
  private final case class KeyOut(name: String) extends Out
  private final case class AggOut(kind: String, colName: String,
      dt: DataType) extends Out

  /** Attempt the rewrite; None leaves the Aggregate for the scan. */
  def rewrite(spark: SparkSession, agg: Aggregate, h: GraftTableHandle,
      cond: Option[Expression]): Option[LogicalPlan] = {
    val views = viewsOf(h.table)
    if (views.isEmpty) return None
    val groupNames: Seq[String] = agg.groupingExpressions.map {
      case a: AttributeReference => a.name
      case _                     => return None
    }
    if (cond.exists(c => !c.deterministic ||
        c.exists(_.isInstanceOf[PlanExpression[_]]))) return None
    val condAttrs = cond.toSeq.flatMap(_.collect {
      case a: AttributeReference => a.name
    })
    val outs: Seq[(NamedExpression, Out)] = agg.aggregateExpressions.map {
      ne =>
        val out: Out = ne match {
          case a: AttributeReference if groupNames.contains(a.name) =>
            KeyOut(a.name)
          case Alias(a: AttributeReference, _)
              if groupNames.contains(a.name) =>
            KeyOut(a.name)
          case al @ Alias(AggregateExpression(fn, _, false, None, _), _) =>
            fn match {
              case Count(Seq(l: Literal)) if l.value != null =>
                AggOut("count*", "", al.dataType)
              case Count(Seq(a: AttributeReference)) =>
                AggOut("count", a.name, al.dataType)
              case Sum(a: AttributeReference, _)
                  if al.dataType == LongType || al.dataType == DoubleType =>
                AggOut("sum", a.name, al.dataType)
              case Average(a: AttributeReference, _)
                  if al.dataType == DoubleType =>
                AggOut("avg", a.name, al.dataType)
              case Min(a: AttributeReference) =>
                AggOut("min", a.name, al.dataType)
              case Max(a: AttributeReference) =>
                AggOut("max", a.name, al.dataType)
              case _ => return None
            }
          case _ => return None
        }
        (ne, out)
    }
    val needSum = outs.collect {
      case (_, AggOut(k, c, _)) if k == "count" || k == "sum" || k == "avg" =>
        c
    }
    val needExt = outs.collect {
      case (_, AggOut(k, c, _)) if k == "min" || k == "max" => c
    }
    views.foreach { v =>
      val covers = groupNames.forall(v.keys.contains) &&
        condAttrs.forall(v.keys.contains) &&
        needSum.forall(v.sums.contains) && needExt.forall(v.exts.contains)
      if (covers) tryView(spark, v, agg, h, cond, groupNames, outs) match {
        case some @ Some(_) => return some
        case None           => ()
      }
    }
    None
  }

  private def tryView(spark: SparkSession, v: Mview, agg: Aggregate,
      h: GraftTableHandle, cond: Option[Expression],
      groupNames: Seq[String],
      outs: Seq[(NamedExpression, Out)]): Option[LogicalPlan] = {
    val state = try GraftTable.load(spark, v.stateLoc)
      catch { case NonFatal(_) => return None }
    // exact freshness: the fold's recorded base snapshot must BE the
    // snapshot this query reads (current, or the time-travel pin) — OR
    // reach it through "replace" commits only: binpack/zorder/manifest
    // compaction/MoR materialization advance the snapshot id without
    // changing a single row, and maintenance must not knock a hot view
    // off its fast path
    val applied = state.meta.properties
      .get(s"graft.agg.${v.name}.from-snapshot").flatMap(_.toLongOption)
    val baseMeta = h.table.meta
    val want = h.pinnedSnapshot.orElse(baseMeta.currentSnapshot)
      .map(_.snapshotId)
    def replaceOnlyLineage(appliedId: Long, wantId: Long): Boolean = {
      val byId = baseMeta.snapshots.map(s => s.snapshotId -> s).toMap
      var cur = byId.get(wantId)
      var hops = 0
      while (cur.isDefined && hops < 100000) {
        val s = cur.get
        if (s.snapshotId == appliedId) return true
        if (s.operation != "replace") return false
        cur = s.parentId.flatMap(byId.get)
        hops += 1
      }
      false // lineage broken (expired history): stale
    }
    if (want.isEmpty ||
        !applied.exists(a => replaceOnlyLineage(a, want.get))) return None
    // raw state, zero-count groups hidden (IncrementalAgg.present
    // semantics — kept raw so nn_/min_/max_ components stay addressable)
    val src0 = state.read().filter(col("n_rows") > 0)
    val have = src0.columns.toSet
    val needed = v.keys ++ Seq("n_rows") ++
      outs.collect { case (_, AggOut("count", c, _)) => s"nn_$c"
                     case (_, AggOut("sum", c, _))   => s"sum_$c"
                     case (_, AggOut("min", c, _))   => s"min_$c"
                     case (_, AggOut("max", c, _))   => s"max_$c" }
    if (!needed.forall(have)) return None // mis-registered state: scan
    val src = cond match {
      case None => src0
      case Some(e) =>
        val out = src0.queryExecution.analyzed.output
        val remapped = e.transform {
          case a: AttributeReference =>
            out.find(o => o.name == a.name && o.dataType == a.dataType)
              .getOrElse(return None)
        }
        src0.filter(org.apache.spark.sql.graftshim.columnOf(remapped))
    }
    def mapped(o: AggOut): Column = o.kind match {
      case "count*" => coalesce(sum(col("n_rows")), lit(0L))
      case "count"  => coalesce(sum(col(s"nn_${o.colName}")), lit(0L))
      // SQL sum semantics ride on nn_: a group whose live rows are all
      // NULL contributes nothing, and no groups at all yields NULL
      case "sum" =>
        sum(when(col(s"nn_${o.colName}") > 0, col(s"sum_${o.colName}")))
      case "avg" =>
        val s =
          sum(when(col(s"nn_${o.colName}") > 0, col(s"sum_${o.colName}")))
        val n = sum(col(s"nn_${o.colName}"))
        when(n > 0, s.cast(DoubleType) / n.cast(DoubleType))
      case "min" => min(col(s"min_${o.colName}"))
      case "max" => max(col(s"max_${o.colName}"))
    }
    val aggCols = outs.zipWithIndex.collect {
      case ((_, o: AggOut), i) => mapped(o).as(s"_a$i")
    }
    val res =
      if (groupNames.isEmpty) src.agg(aggCols.head, aggCols.tail: _*)
      else {
        val g = src.groupBy(groupNames.distinct.map(col): _*)
        // SELECT k FROM t GROUP BY k: no aggregates to compute, but
        // groupBy().agg needs one — the dummy never projects through
        if (aggCols.isEmpty) g.agg(count(lit(1)).as("_dummy"))
        else g.agg(aggCols.head, aggCols.tail: _*)
      }
    val resPlan = res.queryExecution.analyzed
    val byName = resPlan.output.map(a => a.name -> a).toMap
    val aliasesOpt: Seq[Option[NamedExpression]] =
      outs.zipWithIndex.map {
        case ((ne, KeyOut(nm)), _) =>
          byName.get(nm).map(a => Alias(a, ne.name)(exprId = ne.exprId,
            qualifier = ne.qualifier))
        case ((ne, _: AggOut), i) =>
          byName.get(s"_a$i").map(a => Alias(a, ne.name)(
            exprId = ne.exprId, qualifier = ne.qualifier))
      }
    if (aliasesOpt.exists(_.isEmpty)) return None
    val aliases = aliasesOpt.flatten
    // the rewrite must be invisible to parents: same names (exprIds
    // preserved above) AND same types, or we leave the scan alone
    if (aliases.zip(agg.aggregateExpressions)
        .exists { case (al, orig) => al.dataType != orig.dataType })
      return None
    Some(Project(aliases, resPlan))
  }
}
