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
      cond: Expression): Vector[DataFileEntry] =
    files.filter(f => mayMatch(m, f, cond))

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
    f.recordCount == 0L || mustMatch(m, f, cond)

  /** Bound strings are written under the FILE's schema, but consumers
    * parse them under the CURRENT schema — and [[GraftTable.alterColumnType]]
    * permits widening promotions whose bound encodings do NOT
    * reinterpret: a float file's "0.1" reread as double is 0.1d (the
    * actual widened values are 0.10000000149...), and a date file's
    * epoch-days reread as timestamp micros is a 1970-era instant. Any
    * file whose written type differs from the current type therefore
    * disqualifies itself from every bound-based proof, EXCEPT the
    * promotions whose decimal-string encoding is value-preserving
    * (int widens exactly into long and double). A file written before
    * the column existed is fine: it recorded no bounds, and the
    * absent-bound handling is already conservative.
    */
  private[graft] def boundTypeStable(m: TableMetadata, f: DataFileEntry,
      field: FieldDef): Boolean =
    m.schemaById(f.schemaId) match {
      case None => false // unknown provenance: refuse every proof
      case Some(ws) => ws.fieldById(field.id) match {
        case None    => true // pre-ADD-COLUMN file: no bounds recorded
        case Some(w) => w.dataType == field.dataType ||
          ((w.dataType, field.dataType) match {
            case ("int", "long") | ("int", "double") => true
            case _                                   => false
          })
      }
    }

  private def mustMatch(m: TableMetadata, f: DataFileEntry,
      e: Expression): Boolean = e match {
    case And(l, r) => mustMatch(m, f, l) && mustMatch(m, f, r)
    // sufficient, not complete: one branch covering the whole file
    // proves the disjunction (row-by-row mixed coverage does not prove
    // here — it falls to the scan, never to a wrong answer)
    case Or(l, r)  => mustMatch(m, f, l) || mustMatch(m, f, r)
    case EqualTo(a, b)            => strictLeaf(m, f, a, b, "=")
    case LessThan(a, b)           => strictLeaf(m, f, a, b, "<")
    case LessThanOrEqual(a, b)    => strictLeaf(m, f, a, b, "<=")
    case GreaterThan(a, b)        => strictLeaf(m, f, a, b, ">")
    case GreaterThanOrEqual(a, b) => strictLeaf(m, f, a, b, ">=")
    case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => strictLeaf(m, f, a, v, "="))
    case InSet(a, vs) =>
      vs.exists(v => strictLeaf(m, f, a, Literal(v), "="))
    case IsNull(a)         => strictNullLeaf(m, f, a, wantNull = true)
    case IsNotNull(a)      => strictNullLeaf(m, f, a, wantNull = false)
    case Not(IsNull(a))    => strictNullLeaf(m, f, a, wantNull = false)
    case Not(IsNotNull(a)) => strictNullLeaf(m, f, a, wantNull = true)
    // Column-DSL conditions (countWhere's API path) arrive pre-analysis
    // as UnresolvedFunction nodes named after the SQL operator — the
    // same shapes [[mayMatch]] handles on its side
    case UnresolvedFunction(Seq(fn), args, false, _, _, _, _) =>
      (fn.toLowerCase, args) match {
        case ("and", Seq(l, r)) =>
          mustMatch(m, f, l) && mustMatch(m, f, r)
        case ("or", Seq(l, r)) =>
          mustMatch(m, f, l) || mustMatch(m, f, r)
        case ("=" | "==", Seq(a, b)) => strictLeaf(m, f, a, b, "=")
        case ("<", Seq(a, b))   => strictLeaf(m, f, a, b, "<")
        case ("<=", Seq(a, b))  => strictLeaf(m, f, a, b, "<=")
        case (">", Seq(a, b))   => strictLeaf(m, f, a, b, ">")
        case (">=", Seq(a, b))  => strictLeaf(m, f, a, b, ">=")
        case ("in", a +: vs) if vs.forall(_.isInstanceOf[Literal]) =>
          vs.exists(v => strictLeaf(m, f, a, v, "="))
        case ("isnull", Seq(a)) =>
          strictNullLeaf(m, f, a, wantNull = true)
        case ("isnotnull", Seq(a)) =>
          strictNullLeaf(m, f, a, wantNull = false)
        case ("!" | "not",
            Seq(UnresolvedFunction(Seq(inner), Seq(a), false, _, _, _, _))) =>
          inner.toLowerCase match {
            case "isnull"    => strictNullLeaf(m, f, a, wantNull = false)
            case "isnotnull" => strictNullLeaf(m, f, a, wantNull = true)
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
  private def strictLeaf(m: TableMetadata, f: DataFileEntry,
      a: Expression, b: Expression, op: String): Boolean =
    (attrName(a), litOf(b)) match {
      case (Some(n), Some(l)) => boundsRequire(m, f, n, l, op)
      case _ =>
        (attrName(b), litOf(a)) match {
          case (Some(n), Some(l)) => boundsRequire(m, f, n, l, mirror(op))
          case _                  => false
        }
    }

  private def boundsRequire(m: TableMetadata, f: DataFileEntry,
      name: String, l: Literal, op: String): Boolean = {
    if (l.value == null) return false
    val schema = m.currentSchema
    val field = schema.fieldByName(name)
      .orElse(schema.fields.find(_.name.equalsIgnoreCase(name)))
      .getOrElse(return false)
    if (!boundTypeStable(m, f, field)) return false
    val key = field.id.toString
    if (!f.nullCounts.get(key).contains(0L)) return false
    (for {
      lo <- f.lowerBounds.get(key)
      hi <- f.upperBounds.get(key)
      (cl, ch) <- boundsVersusLiteral(field.dataType, lo, hi, l)
    } yield op match {
      case "="  => cl == 0 && ch == 0
      case "<"  => ch < 0
      case "<=" => ch <= 0
      case ">"  => cl > 0
      case ">=" => cl >= 0
      case _    => false
    }).getOrElse(false)
  }

  /** EVERY row is NULL (wantNull) / non-NULL in the column. */
  private def strictNullLeaf(m: TableMetadata, f: DataFileEntry,
      a: Expression, wantNull: Boolean): Boolean = {
    val schema = m.currentSchema
    (for {
      n <- attrName(a)
      field <- schema.fieldByName(n)
        .orElse(schema.fields.find(_.name.equalsIgnoreCase(n)))
      nc <- f.nullCounts.get(field.id.toString)
    } yield if (wantNull) nc == f.recordCount else nc == 0L)
      .getOrElse(false)
  }

  private def mayMatch(m: TableMetadata, f: DataFileEntry,
      e: Expression): Boolean = e match {
    case And(l, r) => mayMatch(m, f, l) && mayMatch(m, f, r)
    case Or(l, r)  => mayMatch(m, f, l) || mayMatch(m, f, r)
    case EqualTo(a, b)            => leaf(m, f, a, b, "=")
    case EqualNullSafe(a, b)      => leaf(m, f, a, b, "=")
    case LessThan(a, b)           => leaf(m, f, a, b, "<")
    case LessThanOrEqual(a, b)    => leaf(m, f, a, b, "<=")
    case GreaterThan(a, b)        => leaf(m, f, a, b, ">")
    case GreaterThanOrEqual(a, b) => leaf(m, f, a, b, ">=")
    case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => leaf(m, f, a, v, "="))
    case InSet(a, vs) =>
      vs.exists(v => leaf(m, f, a, Literal(v), "="))
    // IS [NOT] NULL against the manifest's null_value_counts — a file
    // with zero nulls can't satisfy IS NULL; one that is all-null
    // can't satisfy IS NOT NULL. Missing count = unknown = keep (a
    // pre-ADD-COLUMN file null-fills the column but carries no entry).
    case IsNull(a)         => nullLeaf(m, f, a, wantNull = true)
    case IsNotNull(a)      => nullLeaf(m, f, a, wantNull = false)
    case Not(IsNull(a))    => nullLeaf(m, f, a, wantNull = false)
    case Not(IsNotNull(a)) => nullLeaf(m, f, a, wantNull = true)
    // Spark 4 Column DSL arrives pre-analysis as UnresolvedFunction nodes
    // named after the SQL operator ('=', '<', 'and', 'in', ...)
    case UnresolvedFunction(Seq(fn), args, false, _, _, _, _) =>
      (fn.toLowerCase, args) match {
        case ("and", Seq(l, r)) => mayMatch(m, f, l) && mayMatch(m, f, r)
        case ("or", Seq(l, r))  => mayMatch(m, f, l) || mayMatch(m, f, r)
        case ("=" | "==", Seq(a, b))  => leaf(m, f, a, b, "=")
        case ("<=>", Seq(a, b)) => leaf(m, f, a, b, "=")
        case ("<", Seq(a, b))   => leaf(m, f, a, b, "<")
        case ("<=", Seq(a, b))  => leaf(m, f, a, b, "<=")
        case (">", Seq(a, b))   => leaf(m, f, a, b, ">")
        case (">=", Seq(a, b))  => leaf(m, f, a, b, ">=")
        case ("in", a +: vs) if vs.forall(_.isInstanceOf[Literal]) =>
          vs.exists(v => leaf(m, f, a, v, "="))
        case ("isnull", Seq(a))    => nullLeaf(m, f, a, wantNull = true)
        case ("isnotnull", Seq(a)) => nullLeaf(m, f, a, wantNull = false)
        // pre-analysis NOT is the "!" function; only the null tests
        // have a safe complement here (general NOT stays conservative)
        case ("!" | "not",
            Seq(UnresolvedFunction(Seq(inner), Seq(a), false, _, _, _, _))) =>
          inner.toLowerCase match {
            case "isnull"    => nullLeaf(m, f, a, wantNull = false)
            case "isnotnull" => nullLeaf(m, f, a, wantNull = true)
            case _           => true
          }
        case _ => true
      }
    case _ => true // IsNull, Not, functions-of-columns, UDFs, ... — keep
  }

  /** attr-vs-literal comparison; flipped literal-on-left mirrors the op. */
  private def leaf(m: TableMetadata, f: DataFileEntry,
      a: Expression, b: Expression, op: String): Boolean =
    (attrName(a), litOf(b)) match {
      case (Some(n), Some(l)) => boundsAdmit(m, f, n, l, op)
      case _ =>
        (attrName(b), litOf(a)) match {
          case (Some(n), Some(l)) => boundsAdmit(m, f, n, l, mirror(op))
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
  private def nullLeaf(m: TableMetadata, f: DataFileEntry,
      a: Expression, wantNull: Boolean): Boolean = {
    val schema = m.currentSchema
    (for {
      n <- attrName(a)
      field <- schema.fieldByName(n)
        .orElse(schema.fields.find(_.name.equalsIgnoreCase(n)))
      nc <- f.nullCounts.get(field.id.toString)
    } yield if (wantNull) nc > 0 else nc < f.recordCount).getOrElse(true)
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

  private def boundsAdmit(m: TableMetadata, f: DataFileEntry,
      name: String, l: Literal, op: String): Boolean = {
    if (l.value == null) return true
    val schema = m.currentSchema
    val field = schema.fieldByName(name)
      .orElse(schema.fields.find(_.name.equalsIgnoreCase(name)))
      .getOrElse(return true)
    if (!boundTypeStable(m, f, field)) return true
    val key = field.id.toString
    (f.lowerBounds.get(key), f.upperBounds.get(key)) match {
      case (Some(lo), Some(hi)) =>
        boundsVersusLiteral(field.dataType, lo, hi, l) match {
          case None => true // incomparable domains: keep
          case Some((cl, ch)) => op match {
            case "="  => cl <= 0 && ch >= 0
            case "<"  => cl < 0   // some row < v possible?
            case "<=" => cl <= 0
            case ">"  => ch > 0
            case ">=" => ch >= 0
            case _    => true
          }
        }
      case _ => true // missing bounds: keep
    }
  }

  /** Compare the file's (lower, upper) bound against the literal — in
    * EXACTLY the comparison domain the scan evaluates in — returning
    * (cmp(lo, v), cmp(hi, v)). None = incomparable, caller stays
    * conservative.
    *
    * The numeric case is the subtle one: Spark widens both sides of a
    * comparison to the tighter common type (int < long < float <
    * double; decimal pairs with int/long exactly and with
    * float/double in double), and the widening CASTS ARE LOSSY —
    * `cast(0.3f as double)` is 0.30000001192..., `cast(2^53+1L as
    * double)` is 2^53 — so proving in an exact decimal-string domain
    * diverges from what the scan computes (a float-0.3 file would
    * "prove" `fx <= 0.3` that the scan rejects). [[Num]] carries each
    * participant's exact value PLUS its cast images, and the
    * comparison picks the runtime domain.
    */
  private def boundsVersusLiteral(dt: String, lo: String, hi: String,
      l: Literal): Option[(Int, Int)] = dt match {
    case "int" | "long" | "float" | "double" =>
      for {
        v  <- numLit(l)
        nl <- numBound(dt, lo)
        nh <- numBound(dt, hi)
      } yield (cmpNum(nl, v), cmpNum(nh, v))
    case _ =>
      for {
        v  <- litValue(dt, l)
        pl <- parseBound(dt, lo)
        ph <- parseBound(dt, hi)
      } yield (cmp(pl, v), cmp(ph, v))
  }

  /** A numeric comparison participant: which primitive kind it is, its
    * exact value, and its runtime-cast images. Cast images are computed
    * from the ORIGINAL primitive with JVM cast semantics (round to
    * nearest), which is exactly what Spark's Cast executes.
    */
  private final case class Num(prec: Int, exact: BigDecimal,
      asF: Float, asD: Double)
  private object Num {
    val PInt = 0; val PLong = 1; val PFloat = 2; val PDouble = 3
    val PDecimal = 4
    private def exactD(d: Double): BigDecimal =
      BigDecimal(new java.math.BigDecimal(d))
    def ofInt(i: Int): Num = Num(PInt, BigDecimal(i), i.toFloat, i.toDouble)
    def ofLong(l: Long): Num = Num(PLong, BigDecimal(l), l.toFloat, l.toDouble)
    def ofFloat(f: Float): Option[Num] =
      if (f.isNaN) None
      else Some(Num(PFloat, exactD(f.toDouble), f, f.toDouble))
    def ofDouble(d: Double): Option[Num] =
      if (d.isNaN) None else Some(Num(PDouble, exactD(d), d.toFloat, d))
    def ofDecimal(bd: BigDecimal): Num =
      Num(PDecimal, bd, bd.toFloat, bd.toDouble)
  }

  /** Manifest bound string → [[Num]] under the column's (write-domain)
    * type. Bound strings round-trip their primitive exactly
    * (Float/Double.toString is the shortest uniquely-parsing form).
    */
  private def numBound(dt: String, raw: String): Option[Num] = dt match {
    case "int"    => raw.toIntOption.map(Num.ofInt)
    case "long"   => raw.toLongOption.map(Num.ofLong)
    case "float"  => raw.toFloatOption.flatMap(Num.ofFloat)
    case "double" => raw.toDoubleOption.flatMap(Num.ofDouble)
    case _        => None
  }

  private def numLit(l: Literal): Option[Num] = l.value match {
    case n: Int     => Some(Num.ofInt(n))
    case n: Long    => Some(Num.ofLong(n))
    case n: Short   => Some(Num.ofInt(n.toInt))
    case n: Byte    => Some(Num.ofInt(n.toInt))
    case n: Float   => Num.ofFloat(n)
    case n: Double  => Num.ofDouble(n)
    case d: Decimal => Some(Num.ofDecimal(d.toBigDecimal))
    // a string literal against a numeric column: Spark's coercion rules
    // are their own maze — refuse and let the scan decide
    case _          => None
  }

  /** Runtime-domain comparison: int/long(/decimal) pairs compare
    * exactly; any float participant (and nothing wider) compares as
    * float; any double — or a decimal meeting a float/double —
    * compares as double. Signed zeros normalize (Spark treats -0.0
    * and 0.0 as equal); NaN never gets here (refused at construction).
    */
  private def cmpNum(a: Num, b: Num): Int = {
    import Num._
    def zf(f: Float): Float = if (f == 0f) 0f else f
    def zd(d: Double): Double = if (d == 0d) 0d else d
    val hasDec = a.prec == PDecimal || b.prec == PDecimal
    val hasF = a.prec == PFloat || b.prec == PFloat
    val hasD = a.prec == PDouble || b.prec == PDouble
    if (hasDec)
      if (hasF || hasD) java.lang.Double.compare(zd(a.asD), zd(b.asD))
      else a.exact.compare(b.exact)
    else if (hasD) java.lang.Double.compare(zd(a.asD), zd(b.asD))
    else if (hasF) java.lang.Float.compare(zf(a.asF), zf(b.asF))
    else a.exact.compare(b.exact)
  }

  // comparison domains for the non-numeric types: String, Int (epoch
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
    * bounds don't round-trip; the caller must scan. Callers must also
    * hold [[boundTypeStable]] for every contributing file (the
    * columnBoundsIn gate does) — a widened column's old bound strings
    * are in the OLD type's encoding.
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

  /** Literal → the field's comparison domain; None = can't compare, keep.
    * Numeric fields go through [[numLit]]/[[cmpNum]] instead — this
    * covers the string/date/timestamp domains, which have no lossy
    * cross-type casts to model.
    */
  private def litValue(dt: String, l: Literal): Option[Any] = dt match {
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
