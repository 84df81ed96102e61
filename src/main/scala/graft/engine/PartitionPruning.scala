package graft.engine

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import graft.tableformat._

/** Transform-aware partition pruning: decide from a file's RECORDED
  * partition values (manifest, not paths) whether a predicate could
  * match any of its rows — Iceberg's hidden-partitioning payoff, where
  * `WHERE ts >= X` prunes `day(ts)`/`month(ts)` layouts and
  * `WHERE id = k` prunes `bucket(N, id)` layouts without the query ever
  * naming a partition column.
  *
  * Same strictly-conservative tri-state collapse as [[StatsPruning]]:
  * anything not understood keeps the file, so correctness never depends
  * on pruning. The two compose — partition values exclude whole
  * partitions, manifest min/max bounds then exclude files within the
  * surviving ones.
  *
  * Mixed-spec rule: a file written under an older spec simply lacks the
  * newer spec's partition-value keys, and an absent key always keeps
  * the file. Constraints are checked against EVERY spec's recording of
  * a source column (specs log them per file), so pre-evolution files
  * still prune by their own layout.
  *
  * Null layout: Spark records a null partition value as the Hive
  * default marker, and every transform here except bucket propagates
  * null — so a marker partition holds ONLY null-source rows (IS NULL
  * prunes exactly), while bucket hashes null like any value (never
  * prunable by nullness). Non-null comparisons exclude marker
  * partitions for the null-propagating transforms.
  */
object PartitionPruning {

  private val HiveNull = "__HIVE_DEFAULT_PARTITION__"

  def candidates(m: TableMetadata, files: Vector[DataFileEntry],
      cond: Expression): Vector[DataFileEntry] = {
    val schema = m.currentSchema
    // source field id -> every (partition name, transform) any spec records
    val bySource: Map[Int, Vector[(String, String)]] =
      m.partitionSpecs.flatMap(_.fields)
        .map(pf => pf.sourceId -> (pf.name -> pf.transform))
        .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).distinct }
    if (bySource.isEmpty) files
    else files.filter(f => mayMatch(schema, bySource, f, cond))
  }

  private def mayMatch(schema: VersionedSchema,
      bySource: Map[Int, Vector[(String, String)]], f: DataFileEntry,
      e: Expression): Boolean = e match {
    case And(l, r) => mayMatch(schema, bySource, f, l) && mayMatch(schema, bySource, f, r)
    case Or(l, r)  => mayMatch(schema, bySource, f, l) || mayMatch(schema, bySource, f, r)
    case EqualTo(a, b)            => leaf(schema, bySource, f, a, b, "=")
    case EqualNullSafe(a, b)      => leaf(schema, bySource, f, a, b, "=")
    case LessThan(a, b)           => leaf(schema, bySource, f, a, b, "<")
    case LessThanOrEqual(a, b)    => leaf(schema, bySource, f, a, b, "<=")
    case GreaterThan(a, b)        => leaf(schema, bySource, f, a, b, ">")
    case GreaterThanOrEqual(a, b) => leaf(schema, bySource, f, a, b, ">=")
    case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => leaf(schema, bySource, f, a, v, "="))
    case InSet(a, vs) =>
      vs.exists(v => leaf(schema, bySource, f, a, Literal(v), "="))
    case IsNull(a)    => nullness(schema, bySource, f, a, wantNull = true)
    case IsNotNull(a) => nullness(schema, bySource, f, a, wantNull = false)
    // Column-DSL conditions arrive pre-analysis as UnresolvedFunction
    case UnresolvedFunction(Seq(fn), args, false, _, _, _, _) =>
      (fn.toLowerCase, args) match {
        case ("and", Seq(l, r)) =>
          mayMatch(schema, bySource, f, l) && mayMatch(schema, bySource, f, r)
        case ("or", Seq(l, r)) =>
          mayMatch(schema, bySource, f, l) || mayMatch(schema, bySource, f, r)
        case ("=" | "==", Seq(a, b)) => leaf(schema, bySource, f, a, b, "=")
        case ("<=>", Seq(a, b))      => leaf(schema, bySource, f, a, b, "=")
        case ("<", Seq(a, b))        => leaf(schema, bySource, f, a, b, "<")
        case ("<=", Seq(a, b))       => leaf(schema, bySource, f, a, b, "<=")
        case (">", Seq(a, b))        => leaf(schema, bySource, f, a, b, ">")
        case (">=", Seq(a, b))       => leaf(schema, bySource, f, a, b, ">=")
        case ("in", a +: vs) if vs.forall(_.isInstanceOf[Literal]) =>
          vs.exists(v => leaf(schema, bySource, f, a, v, "="))
        case ("isnull", Seq(a))    => nullness(schema, bySource, f, a, wantNull = true)
        case ("isnotnull", Seq(a)) => nullness(schema, bySource, f, a, wantNull = false)
        case _ => true
      }
    case _ => true // Not, functions-of-columns, subqueries, ... — keep
  }

  private def leaf(schema: VersionedSchema,
      bySource: Map[Int, Vector[(String, String)]], f: DataFileEntry,
      a: Expression, b: Expression, op: String): Boolean =
    (attrName(a), litOf(b)) match {
      case (Some(n), Some(l)) => admit(schema, bySource, f, n, l, op)
      case _ =>
        (attrName(b), litOf(a)) match {
          case (Some(n), Some(l)) => admit(schema, bySource, f, n, l, mirror(op))
          case _                  => true
        }
    }

  private def mirror(op: String): String = op match {
    case "<" => ">"; case "<=" => ">="
    case ">" => "<"; case ">=" => "<="
    case other => other
  }

  private def attrName(e: Expression): Option[String] = e match {
    case u: UnresolvedAttribute => Some(u.nameParts.last)
    case a: AttributeReference  => Some(a.name)
    case _                      => None
  }

  private def litOf(e: Expression): Option[Literal] = e match {
    case l: Literal => Some(l)
    case c: Cast if c.child.foldable =>
      // a pre-analysis Cast (Column DSL) has no timeZoneId yet and so
      // reports unresolved — bind the session zone, as analysis would
      val bound = if (c.timeZoneId.isEmpty)
        c.withTimeZone(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
      else c
      if (!bound.resolved) None
      else try Some(Literal(bound.eval(null), bound.dataType))
      catch { case _: Exception => None }
    case _ => None
  }

  private def entriesFor(schema: VersionedSchema,
      bySource: Map[Int, Vector[(String, String)]],
      name: String): Option[(FieldDef, Vector[(String, String)])] =
    schema.fieldByName(name)
      .orElse(schema.fields.find(_.name.equalsIgnoreCase(name)))
      .flatMap(fd => bySource.get(fd.id).map(fd -> _))

  /** Every spec's recording of the column gets a veto: a single
    * recorded value that proves exclusion skips the file.
    */
  private def admit(schema: VersionedSchema,
      bySource: Map[Int, Vector[(String, String)]], f: DataFileEntry,
      name: String, l: Literal, op: String): Boolean = {
    if (l.value == null) return true // x = NULL matches nothing; keep — the filter handles it
    entriesFor(schema, bySource, name) match {
      case None => true
      case Some((fd, entries)) => entries.forall { case (pname, tr) =>
        f.partitionValues.get(pname) match {
          case None => true
          // marker partition = all-null source rows (null-propagating
          // transforms only); no non-null comparison can match
          case Some(HiveNull) =>
            PartitionTransforms.parse(tr)._1 == "bucket"
          case Some(p) =>
            PartitionTransforms.ofLiteral(tr, fd.dataType, l) match {
              case None => true
              case Some(t) =>
                lazy val c = PartitionTransforms.cmpValues(tr, fd.dataType, p, t)
                op match {
                  case "="          => c.map(_ == 0).getOrElse(p == t)
                  case "<" | "<="   =>
                    !PartitionTransforms.orderPreserving(tr) ||
                      c.forall(_ <= 0)
                  case ">" | ">="   =>
                    !PartitionTransforms.orderPreserving(tr) ||
                      c.forall(_ >= 0)
                  case _ => true
                }
            }
        }
      }
    }
  }

  private def nullness(schema: VersionedSchema,
      bySource: Map[Int, Vector[(String, String)]], f: DataFileEntry,
      a: Expression, wantNull: Boolean): Boolean =
    attrName(a).flatMap(entriesFor(schema, bySource, _)) match {
      case None => true
      case Some((_, entries)) => entries.forall { case (pname, tr) =>
        if (PartitionTransforms.parse(tr)._1 == "bucket") true
        else f.partitionValues.get(pname) match {
          case None    => true
          case Some(p) => if (wantNull) p == HiveNull else p != HiveNull
        }
      }
    }
}
