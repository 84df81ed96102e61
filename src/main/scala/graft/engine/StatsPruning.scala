package graft.engine

import java.time.LocalDate
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.tableformat._

/** Metadata-only candidate-file pruning for row-level DML: decide from a
  * file's manifest min/max bounds whether a predicate COULD match any of
  * its rows, without touching the file.
  *
  * Strictly conservative tri-state collapse: anything not understood —
  * unrecognized expression shape, missing bounds, type mismatch — keeps
  * the file. So pruning can only skip files that provably contain no
  * matching row; correctness never depends on it.
  *
  * Mirrors what Iceberg's `InclusiveMetricsEvaluator` does over manifest
  * bounds (reference's DELETE/UPDATE planning goes through the same
  * idea); expressed here over Catalyst expression trees directly.
  */
object StatsPruning {

  def candidates(m: TableMetadata, files: Vector[DataFileEntry],
      cond: Expression): Vector[DataFileEntry] = {
    val schema = m.currentSchema
    files.filter(f => mayMatch(schema, f, cond))
  }

  /** STRICT file-level evaluation — the dual of [[candidates]]'
    * inclusive test (Iceberg's StrictMetricsEvaluator next to its
    * InclusiveMetricsEvaluator): true only when EVERY row of the file
    * PROVABLY satisfies `cond` from manifest bounds + null counts.
    * Conservative the other way around: anything not understood is
    * "not provably all", never a wrong yes. Comparisons additionally
    * require a recorded ZERO null count (a NULL row satisfies no
    * comparison), and a 0-row file satisfies anything vacuously.
    *
    * This is what turns `count(*) WHERE ts >= X` into manifest
    * arithmetic: inclusive pruning drops the files wholly outside the
    * predicate, strict evaluation counts the files wholly inside, and
    * only boundary files need their rows read.
    */
  def allMatch(m: TableMetadata, f: DataFileEntry,
      cond: Expression): Boolean =
    f.recordCount == 0L || mustMatch(m.currentSchema, f, cond)

  private def mustMatch(schema: VersionedSchema, f: DataFileEntry,
      e: Expression): Boolean = e match {
    case And(l, r) => mustMatch(schema, f, l) && mustMatch(schema, f, r)
    // sufficient, not complete: one branch covering the whole file
    // proves the disjunction (row-by-row mixed coverage does not prove
    // here — it falls to the scan, never to a wrong answer)
    case Or(l, r)  => mustMatch(schema, f, l) || mustMatch(schema, f, r)
    case EqualTo(a, b)            => strictLeaf(schema, f, a, b, "=")
    case LessThan(a, b)           => strictLeaf(schema, f, a, b, "<")
    case LessThanOrEqual(a, b)    => strictLeaf(schema, f, a, b, "<=")
    case GreaterThan(a, b)        => strictLeaf(schema, f, a, b, ">")
    case GreaterThanOrEqual(a, b) => strictLeaf(schema, f, a, b, ">=")
    case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => strictLeaf(schema, f, a, v, "="))
    case InSet(a, vs) =>
      vs.exists(v => strictLeaf(schema, f, a, Literal(v), "="))
    case IsNull(a)         => strictNullLeaf(schema, f, a, wantNull = true)
    case IsNotNull(a)      => strictNullLeaf(schema, f, a, wantNull = false)
    case Not(IsNull(a))    => strictNullLeaf(schema, f, a, wantNull = false)
    case Not(IsNotNull(a)) => strictNullLeaf(schema, f, a, wantNull = true)
    // Column-DSL conditions (countWhere's API path) arrive pre-analysis
    // as UnresolvedFunction nodes named after the SQL operator — the
    // same shapes [[mayMatch]] handles on its side
    case UnresolvedFunction(Seq(fn), args, false, _, _, _, _) =>
      (fn.toLowerCase, args) match {
        case ("and", Seq(l, r)) =>
          mustMatch(schema, f, l) && mustMatch(schema, f, r)
        case ("or", Seq(l, r)) =>
          mustMatch(schema, f, l) || mustMatch(schema, f, r)
        case ("=" | "==", Seq(a, b)) => strictLeaf(schema, f, a, b, "=")
        case ("<", Seq(a, b))   => strictLeaf(schema, f, a, b, "<")
        case ("<=", Seq(a, b))  => strictLeaf(schema, f, a, b, "<=")
        case (">", Seq(a, b))   => strictLeaf(schema, f, a, b, ">")
        case (">=", Seq(a, b))  => strictLeaf(schema, f, a, b, ">=")
        case ("in", a +: vs) if vs.forall(_.isInstanceOf[Literal]) =>
          vs.exists(v => strictLeaf(schema, f, a, v, "="))
        case ("isnull", Seq(a)) =>
          strictNullLeaf(schema, f, a, wantNull = true)
        case ("isnotnull", Seq(a)) =>
          strictNullLeaf(schema, f, a, wantNull = false)
        case ("!" | "not",
            Seq(UnresolvedFunction(Seq(inner), Seq(a), false, _, _, _, _))) =>
          inner.toLowerCase match {
            case "isnull"    => strictNullLeaf(schema, f, a, wantNull = false)
            case "isnotnull" => strictNullLeaf(schema, f, a, wantNull = true)
            case _           => false
          }
        case _ => false
      }
    case _ => false
  }

  /** EVERY row satisfies `a op b`: bounds prove the comparison for the
    * whole value range AND the file records zero nulls (a NULL never
    * satisfies a comparison). Missing bounds/counts → false.
    */
  private def strictLeaf(schema: VersionedSchema, f: DataFileEntry,
      a: Expression, b: Expression, op: String): Boolean =
    (attrName(a), litOf(b)) match {
      case (Some(n), Some(l)) => boundsRequire(schema, f, n, l, op)
      case _ =>
        (attrName(b), litOf(a)) match {
          case (Some(n), Some(l)) => boundsRequire(schema, f, n, l, mirror(op))
          case _                  => false
        }
    }

  private def boundsRequire(schema: VersionedSchema, f: DataFileEntry,
      name: String, l: Literal, op: String): Boolean = {
    if (l.value == null) return false
    val field = schema.fieldByName(name)
      .orElse(schema.fields.find(_.name.equalsIgnoreCase(name)))
      .getOrElse(return false)
    val key = field.id.toString
    if (!f.nullCounts.get(key).contains(0L)) return false
    (for {
      v  <- litValue(field.dataType, l)
      lo <- f.lowerBounds.get(key).flatMap(parseBound(field.dataType, _))
      hi <- f.upperBounds.get(key).flatMap(parseBound(field.dataType, _))
    } yield op match {
      case "="  => cmp(lo, v) == 0 && cmp(hi, v) == 0
      case "<"  => cmp(hi, v) < 0
      case "<=" => cmp(hi, v) <= 0
      case ">"  => cmp(lo, v) > 0
      case ">=" => cmp(lo, v) >= 0
      case _    => false
    }).getOrElse(false)
  }

  /** EVERY row is NULL (wantNull) / non-NULL in the column. */
  private def strictNullLeaf(schema: VersionedSchema, f: DataFileEntry,
      a: Expression, wantNull: Boolean): Boolean =
    (for {
      n <- attrName(a)
      field <- schema.fieldByName(n)
        .orElse(schema.fields.find(_.name.equalsIgnoreCase(n)))
      nc <- f.nullCounts.get(field.id.toString)
    } yield if (wantNull) nc == f.recordCount else nc == 0L)
      .getOrElse(false)

  private def mayMatch(schema: VersionedSchema, f: DataFileEntry,
      e: Expression): Boolean = e match {
    case And(l, r) => mayMatch(schema, f, l) && mayMatch(schema, f, r)
    case Or(l, r)  => mayMatch(schema, f, l) || mayMatch(schema, f, r)
    case EqualTo(a, b)            => leaf(schema, f, a, b, "=")
    case EqualNullSafe(a, b)      => leaf(schema, f, a, b, "=")
    case LessThan(a, b)           => leaf(schema, f, a, b, "<")
    case LessThanOrEqual(a, b)    => leaf(schema, f, a, b, "<=")
    case GreaterThan(a, b)        => leaf(schema, f, a, b, ">")
    case GreaterThanOrEqual(a, b) => leaf(schema, f, a, b, ">=")
    case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => leaf(schema, f, a, v, "="))
    case InSet(a, vs) =>
      vs.exists(v => leaf(schema, f, a, Literal(v), "="))
    // IS [NOT] NULL against the manifest's null_value_counts — a file
    // with zero nulls can't satisfy IS NULL; one that is all-null
    // can't satisfy IS NOT NULL. Missing count = unknown = keep (a
    // pre-ADD-COLUMN file null-fills the column but carries no entry).
    case IsNull(a)         => nullLeaf(schema, f, a, wantNull = true)
    case IsNotNull(a)      => nullLeaf(schema, f, a, wantNull = false)
    case Not(IsNull(a))    => nullLeaf(schema, f, a, wantNull = false)
    case Not(IsNotNull(a)) => nullLeaf(schema, f, a, wantNull = true)
    // Spark 4 Column DSL arrives pre-analysis as UnresolvedFunction nodes
    // named after the SQL operator ('=', '<', 'and', 'in', ...)
    case UnresolvedFunction(Seq(fn), args, false, _, _, _, _) =>
      (fn.toLowerCase, args) match {
        case ("and", Seq(l, r)) => mayMatch(schema, f, l) && mayMatch(schema, f, r)
        case ("or", Seq(l, r))  => mayMatch(schema, f, l) || mayMatch(schema, f, r)
        case ("=" | "==", Seq(a, b))  => leaf(schema, f, a, b, "=")
        case ("<=>", Seq(a, b)) => leaf(schema, f, a, b, "=")
        case ("<", Seq(a, b))   => leaf(schema, f, a, b, "<")
        case ("<=", Seq(a, b))  => leaf(schema, f, a, b, "<=")
        case (">", Seq(a, b))   => leaf(schema, f, a, b, ">")
        case (">=", Seq(a, b))  => leaf(schema, f, a, b, ">=")
        case ("in", a +: vs) if vs.forall(_.isInstanceOf[Literal]) =>
          vs.exists(v => leaf(schema, f, a, v, "="))
        case ("isnull", Seq(a))    => nullLeaf(schema, f, a, wantNull = true)
        case ("isnotnull", Seq(a)) => nullLeaf(schema, f, a, wantNull = false)
        // pre-analysis NOT is the "!" function; only the null tests
        // have a safe complement here (general NOT stays conservative)
        case ("!" | "not",
            Seq(UnresolvedFunction(Seq(inner), Seq(a), false, _, _, _, _))) =>
          inner.toLowerCase match {
            case "isnull"    => nullLeaf(schema, f, a, wantNull = false)
            case "isnotnull" => nullLeaf(schema, f, a, wantNull = true)
            case _           => true
          }
        case _ => true
      }
    case _ => true // IsNull, Not, functions-of-columns, UDFs, ... — keep
  }

  /** attr-vs-literal comparison; flipped literal-on-left mirrors the op. */
  private def leaf(schema: VersionedSchema, f: DataFileEntry,
      a: Expression, b: Expression, op: String): Boolean =
    (attrName(a), litOf(b)) match {
      case (Some(n), Some(l)) => boundsAdmit(schema, f, n, l, op)
      case _ =>
        (attrName(b), litOf(a)) match {
          case (Some(n), Some(l)) => boundsAdmit(schema, f, n, l, mirror(op))
          case _                  => true
        }
    }

  private def mirror(op: String): String = op match {
    case "<" => ">"; case "<=" => ">="
    case ">" => "<"; case ">=" => "<="
    case other => other
  }

  /** COULD the file hold a row that is NULL (wantNull) / non-NULL
    * (!wantNull) in the named column? Conservative: unknown attr,
    * unknown field, or absent count keeps the file.
    */
  private def nullLeaf(schema: VersionedSchema, f: DataFileEntry,
      a: Expression, wantNull: Boolean): Boolean =
    (for {
      n <- attrName(a)
      field <- schema.fieldByName(n)
        .orElse(schema.fields.find(_.name.equalsIgnoreCase(n)))
      nc <- f.nullCounts.get(field.id.toString)
    } yield if (wantNull) nc > 0 else nc < f.recordCount).getOrElse(true)

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

  private def boundsAdmit(schema: VersionedSchema, f: DataFileEntry,
      name: String, l: Literal, op: String): Boolean = {
    if (l.value == null) return true
    val field = schema.fieldByName(name)
      .orElse(schema.fields.find(_.name.equalsIgnoreCase(name)))
      .getOrElse(return true)
    val key = field.id.toString
    (for {
      v  <- litValue(field.dataType, l)
      lo = f.lowerBounds.get(key).flatMap(parseBound(field.dataType, _))
      hi = f.upperBounds.get(key).flatMap(parseBound(field.dataType, _))
    } yield op match {
      case "="  => lo.forall(cmp(_, v) <= 0) && hi.forall(cmp(_, v) >= 0)
      case "<"  => lo.forall(cmp(_, v) < 0)   // some row < v possible?
      case "<=" => lo.forall(cmp(_, v) <= 0)
      case ">"  => hi.forall(cmp(_, v) > 0)
      case ">=" => hi.forall(cmp(_, v) >= 0)
      case _    => true
    }).getOrElse(true)
  }

  // comparison domains: BigDecimal (all numerics), String, Int (epoch
  // days), Long (micros)
  private[engine] def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => x.compare(y)
    case (x: String, y: String)         => x.compareTo(y)
    case (x: Int, y: Int)               => x.compareTo(y)
    case (x: Long, y: Long)             => x.compareTo(y)
    case _                              => 0
  }

  /** Manifest bound string → the column's Catalyst-internal value, for
    * the SQL MIN/MAX aggregate pushdown (a pushed `min(col)` becomes a
    * typed literal). Bounds are EXACT here — [[ParquetFooterStats]]
    * merges untruncated footer min/max and poisons NaN columns — so a
    * Some is always the true extreme of its files. None = this type's
    * bounds don't round-trip; the caller must scan.
    */
  private[graft] def internalBound(dt: DataType,
      raw: String): Option[Any] = dt match {
    case IntegerType                   => raw.toIntOption
    case LongType                      => raw.toLongOption
    case FloatType                     => raw.toFloatOption
    case DoubleType                    => raw.toDoubleOption
    case StringType                    => Some(UTF8String.fromString(raw))
    case DateType                      => raw.toIntOption
    case TimestampType | TimestampNTZType => raw.toLongOption
    case _                             => None
  }

  private[engine] def parseBound(dt: String, raw: String): Option[Any] = dt match {
    case "int" | "long" | "float" | "double" =>
      try Some(BigDecimal(raw)) catch { case _: Exception => None }
    case "string"    => Some(raw)
    case "date"      => raw.toIntOption
    // both timestamp flavors record INT64 micros in the footer
    case "timestamp" | "timestamp_ntz" => raw.toLongOption
    case _           => None
  }

  /** Literal → the field's comparison domain; None = can't compare, keep. */
  private def litValue(dt: String, l: Literal): Option[Any] = dt match {
    case "int" | "long" | "float" | "double" =>
      l.value match {
        case n: Int     => Some(BigDecimal(n))
        case n: Long    => Some(BigDecimal(n))
        case n: Short   => Some(BigDecimal(n.toInt))
        case n: Byte    => Some(BigDecimal(n.toInt))
        // float/double MUST round-trip through toString: bounds are
        // encoded with toString, and BigDecimal(0.1d) is the binary
        // expansion 0.1000000000000000055... — comparing that against
        // decimal "0.1" would wrongly prune the file containing 0.1
        case n: Float   => if (n.isNaN) None else Some(BigDecimal(n.toString))
        case n: Double  => if (n.isNaN) None else Some(BigDecimal(n.toString))
        case d: Decimal => Some(d.toBigDecimal)
        case s: UTF8String =>
          try Some(BigDecimal(s.toString)) catch { case _: Exception => None }
        case _ => None
      }
    case "string" =>
      l.value match {
        case s: UTF8String => Some(s.toString)
        case s: String     => Some(s)
        case _             => None
      }
    case "date" =>
      (l.dataType, l.value) match {
        case (DateType, d: Int) => Some(d)
        case (StringType, s) =>
          try Some(LocalDate.parse(s.toString).toEpochDay.toInt)
          catch { case _: Exception => None }
        case _ => None
      }
    case "timestamp" =>
      (l.dataType, l.value) match {
        case (TimestampType, t: Long) => Some(t)
        case _                        => None
      }
    case "timestamp_ntz" =>
      (l.dataType, l.value) match {
        // NTZ micros compare against NTZ micros only — a TZ literal's
        // instant is a different domain (would shift by the zone offset)
        case (TimestampNTZType, t: Long) => Some(t)
        case _                           => None
      }
    case _ => None
  }
}
