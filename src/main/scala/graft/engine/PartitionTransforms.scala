package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg's hidden-partitioning transform set, in one place: the
  * write-path Column that materializes a row's partition value, the
  * driver-side function that maps a predicate LITERAL into the same
  * encoding (what makes transform-aware file pruning possible), and the
  * ordering facts pruning needs (which transforms preserve order, how
  * recorded values compare).
  *
  * Transforms (reference's PARTITIONED BY surface, apiv15 notebook
  * cells 7-8, extended to Iceberg's full set): `identity`, `day`,
  * `month`, `year`, `hour`, `bucket(N)`, `truncate(W)`.
  *
  * Recorded encodings are STRINGS (they live in directory names and
  * manifest maps):
  *   - identity:    Spark's `CAST(v AS STRING)`
  *   - year/month/day/hour: zero-padded `yyyy` / `yyyy-MM` /
  *     `yyyy-MM-dd` / `yyyy-MM-dd-HH` (Iceberg's path layout)
  *   - bucket(N):   `pmod(xxhash64(v), N)` rendered as decimal —
  *     xxhash64 is a Spark built-in, so the write side stays inside
  *     whole-stage codegen and the prune side can evaluate the very
  *     same expression on a literal driver-side
  *   - truncate(W): strings → first W code points; int/long → floored
  *     multiple of W (`v - pmod(v, W)`, negative-safe)
  *
  * Every function here is paired: `column` (write) and `ofLiteral`
  * (prune) MUST agree, which is why `ofLiteral` for bucket evaluates
  * the same Catalyst `XxHash64` expression rather than re-implementing
  * the hash.
  */
object PartitionTransforms {

  /** "bucket(16)" -> ("bucket", Some(16)); "day" -> ("day", None). */
  def parse(tr: String): (String, Option[Int]) = {
    val t = tr.trim
    val i = t.indexOf('(')
    if (i < 0) (t, None)
    else {
      require(t.endsWith(")"), s"malformed partition transform '$tr'")
      val arg = t.substring(i + 1, t.length - 1).trim
      val n = arg.toIntOption.getOrElse(
        sys.error(s"partition transform '$tr': argument must be an int"))
      require(n > 0, s"partition transform '$tr': argument must be positive")
      (t.substring(0, i).trim, Some(n))
    }
  }

  /** Default partition-column name, mirroring Iceberg's (`ts_day`,
    * `id_bucket`, ...); identity keeps the source name.
    */
  def defaultName(src: String, tr: String): String = parse(tr)._1 match {
    case "identity" => src
    case "bucket"   => s"${src}_bucket"
    case "truncate" => s"${src}_trunc"
    case kind       => s"${src}_$kind"
  }

  /** Transform/source-type compatibility — rejected at DDL time, not at
    * first write (`dataType` is the FieldDef type name).
    */
  def validate(tr: String, dataType: String): Unit = {
    val (kind, arg) = parse(tr)
    // timestamp_ntz is a first-class temporal source: the fixtures ship
    // parquet TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4
    // surfaces as TIMESTAMP_NTZ — rejecting it here would make the
    // reference's own `PARTITIONED BY (day(added_at))` unusable.
    def ts = dataType == "timestamp" || dataType == "timestamp_ntz"
    def temporal = dataType == "date" || ts
    kind match {
      case "identity" => ()
      case "year" | "month" | "day" =>
        require(temporal, s"$kind() needs a date/timestamp source, got $dataType")
      case "hour" =>
        require(ts, s"hour() needs a timestamp source, got $dataType")
      case "bucket" =>
        require(arg.isDefined, "bucket needs a width: bucket(N)")
        require(Set("int", "long", "string", "date", "timestamp",
            "timestamp_ntz")(dataType),
          s"bucket() over $dataType is not supported")
      case "truncate" =>
        require(arg.isDefined, "truncate needs a width: truncate(W)")
        require(Set("int", "long", "string")(dataType),
          s"truncate() over $dataType is not supported")
      case other => sys.error(s"unknown partition transform $other")
    }
  }

  /** Write-path expression: the recorded string partition value. */
  def column(tr: String, src: Column, dataType: String): Column =
    parse(tr) match {
      case ("identity", _)  => src.cast("string")
      case ("year", _)      => date_format(src, "yyyy")
      case ("month", _)     => date_format(src, "yyyy-MM")
      case ("day", _)       => date_format(src, "yyyy-MM-dd")
      case ("hour", _)      => date_format(src, "yyyy-MM-dd-HH")
      case ("bucket", Some(n)) =>
        pmod(xxhash64(src), lit(n.toLong)).cast("string")
      case ("truncate", Some(w)) => dataType match {
        case "string" => substring(src, 1, w)
        case _        => (src - pmod(src, lit(w))).cast("string")
      }
      case (other, _) => sys.error(s"unknown partition transform $other")
    }

  /** Driver-side transform of a predicate literal into the recorded
    * encoding. None = this literal can't be mapped reliably (wrong
    * type, identity over a timestamp whose cast rendering is
    * timezone-fragile, ...) — callers must treat None as "no
    * constraint". `l` carries Catalyst INTERNAL values (UTF8String,
    * epoch-day Int, micros Long).
    */
  def ofLiteral(tr: String, dataType: String, l: Literal): Option[String] = {
    import org.apache.spark.sql.types._
    if (l.value == null) return None
    val (kind, arg) = parse(tr)
    // the literal in the source column's domain, or bail
    def asEpochDay: Option[Int] = (l.dataType, l.value) match {
      case (DateType, d: Int) => Some(d)
      case (StringType, s) =>
        try Some(java.time.LocalDate.parse(s.toString).toEpochDay.toInt)
        catch { case _: Exception => None }
      case _ => None
    }
    def asMicros: Option[Long] = (l.dataType, l.value) match {
      case (TimestampType, t: Long) => Some(t)
      case _                        => None
    }
    // NTZ micros are a separate domain: a TZ literal's instant-micros
    // shift by the zone offset, so cross-flavor literals never map
    def asNtzMicros: Option[Long] = (l.dataType, l.value) match {
      case (TimestampNTZType, t: Long) => Some(t)
      case _                           => None
    }
    def asLong: Option[Long] = l.value match {
      case n: Int => Some(n.toLong); case n: Long => Some(n)
      case n: Short => Some(n.toLong); case n: Byte => Some(n.toLong)
      case _ => None
    }
    def asString: Option[String] = (l.dataType, l.value) match {
      case (StringType, s: UTF8String) => Some(s.toString)
      case _                           => None
    }
    def zoned: Option[java.time.ZonedDateTime] = dataType match {
      case "date" => asEpochDay.map(d =>
        java.time.LocalDate.ofEpochDay(d.toLong)
          .atStartOfDay(java.time.ZoneOffset.UTC))
      case "timestamp" => asMicros.map { us =>
        // date_format renders in the SESSION timezone — match it
        val zone = java.time.ZoneId.of(SQLConf.get.sessionLocalTimeZone)
        java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS)
          .atZone(zone)
      }
      case "timestamp_ntz" => asNtzMicros.map { us =>
        // NTZ micros ARE the wall clock, and the write side's
        // date_format(ntz) round-trips it through the session zone
        // (implicit NTZ→TZ cast interprets the wall clock in the
        // session zone, then the formatter renders in it). For almost
        // every instant the two cancel — but a wall clock inside a DST
        // spring-forward GAP is shifted by the cast (java.time's
        // atZone gap rule, which Spark's cast shares), so the recorded
        // value is e.g. "...-03" for a "...-02:30" literal. Mapping
        // the literal through the SAME round-trip keeps the prune
        // exact instead of non-conservative.
        val zone = java.time.ZoneId.of(SQLConf.get.sessionLocalTimeZone)
        java.time.LocalDateTime
          .ofEpochSecond(Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
          .atZone(zone)
      }
      case _ => None
    }
    def fmt(pattern: String): Option[String] = zoned.map(z =>
      java.time.format.DateTimeFormatter.ofPattern(pattern).format(z))
    kind match {
      case "identity" => dataType match {
        case "int" | "long" => asLong.map(_.toString)
        case "string"       => asString
        case "date"         => asEpochDay.map(d =>
          java.time.LocalDate.ofEpochDay(d.toLong).toString)
        // identity over timestamp/float/double: CAST-to-string
        // renderings have timezone/precision edge cases — don't prune
        case _ => None
      }
      case "year"  => fmt("yyyy")
      case "month" => fmt("yyyy-MM")
      case "day"   => fmt("yyyy-MM-dd")
      case "hour"  => fmt("yyyy-MM-dd-HH")
      case "bucket" => arg.flatMap { n =>
        // literal must be in the column's own type: hashing an int as
        // a long changes the bytes xxhash64 sees
        val ok = (dataType, l.dataType) match {
          case ("int", IntegerType) | ("long", LongType) |
               ("string", StringType) | ("date", DateType) |
               ("timestamp", TimestampType) |
               ("timestamp_ntz", TimestampNTZType) => true
          case _ => false
        }
        if (!ok) None
        else {
          // seed 42 = the default of functions.xxhash64 (write side)
          val h = XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long]
          Some((((h % n) + n) % n).toString)
        }
      }
      case "truncate" => arg.flatMap { w =>
        dataType match {
          case "string" => asString.map { s =>
            // code-point truncation, matching Spark's substring()
            val cps = s.codePoints().toArray
            new String(cps, 0, math.min(w, cps.length))
          }
          case "int" | "long" =>
            asLong.map(v => (v - (((v % w) + w) % w)).toString)
          case _ => None
        }
      }
      case _ => None
    }
  }

  /** Does the recorded encoding preserve the source ordering, so range
    * predicates push through? (bucket scrambles; everything else here
    * is monotone non-decreasing.)
    */
  def orderPreserving(tr: String): Boolean = parse(tr)._1 != "bucket"

  /** DSv2 Transform (CREATE TABLE ... PARTITIONED BY) → (source column,
    * transform string). Accepts Spark's plural names and the bare ones.
    */
  def fromV2(tr: org.apache.spark.sql.connector.expressions.Transform): (String, String) = {
    val src = tr.references()(0).fieldNames()(0)
    def arg: Int = tr.arguments().collectFirst {
      case l: org.apache.spark.sql.connector.expressions.Literal[_]
          if l.value().isInstanceOf[Number] =>
        l.value().asInstanceOf[Number].intValue()
    }.getOrElse(sys.error(s"partition transform ${tr.name()} needs an int argument"))
    tr.name().toLowerCase match {
      case "identity"         => src -> "identity"
      case "years" | "year"   => src -> "year"
      case "months" | "month" => src -> "month"
      case "days" | "day"     => src -> "day"
      case "hours" | "hour"   => src -> "hour"
      case "bucket"           => src -> s"bucket($arg)"
      case "truncate"         => src -> s"truncate($arg)"
      case other => sys.error(s"unsupported partition transform $other")
    }
  }

  /** Transform string → DSv2 Transform (for Table.partitioning). */
  def toV2(tr: String, src: String): org.apache.spark.sql.connector.expressions.Transform = {
    import org.apache.spark.sql.connector.expressions.Expressions
    parse(tr) match {
      case ("identity", _)       => Expressions.identity(src)
      case ("year", _)           => Expressions.years(src)
      case ("month", _)          => Expressions.months(src)
      case ("day", _)            => Expressions.days(src)
      case ("hour", _)           => Expressions.hours(src)
      case ("bucket", Some(n))   => Expressions.bucket(n, src)
      case ("truncate", Some(w)) =>
        Expressions.apply("truncate",
          Expressions.literal(w), Expressions.column(src))
      case (other, _) => Expressions.identity(other)
    }
  }

  /** Compare two recorded values in this transform's encoding. None =
    * not comparable (malformed/legacy value — callers keep the file).
    * Temporal encodings are zero-padded so string order IS value order,
    * but only for non-negative years — the digit guard rejects
    * anything else rather than risk a wrong prune.
    */
  def cmpValues(tr: String, dataType: String, a: String, b: String): Option[Int] = {
    val (kind, _) = parse(tr)
    def numeric: Option[Int] =
      try Some(BigDecimal(a).compare(BigDecimal(b)))
      catch { case _: Exception => None }
    def lexDigitGuard: Option[Int] =
      if (a.nonEmpty && b.nonEmpty && a.head.isDigit && b.head.isDigit)
        Some(a.compareTo(b))
      else None
    kind match {
      case "identity" => dataType match {
        case "int" | "long" | "float" | "double" => numeric
        case "string"                            => Some(a.compareTo(b))
        case "date"                              => lexDigitGuard
        case _                                   => None
      }
      case "year" | "month" | "day" | "hour" => lexDigitGuard
      case "truncate" => dataType match {
        case "string" => Some(a.compareTo(b))
        case _        => numeric
      }
      case _ => None
    }
  }
}
