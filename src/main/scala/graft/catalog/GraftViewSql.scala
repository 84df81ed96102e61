package graft.catalog

import java.nio.file.Paths
import scala.util.matching.Regex
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, StringType, StructType}

/** SQL surface for stored views. Spark 4.1 parses `CREATE VIEW` /
  * `DROP VIEW` / `SHOW VIEWS` / `ALTER VIEW` but its session-catalog
  * resolution throws MISSING_CATALOG_ABILITY for any v2 catalog before
  * extension resolution rules run (verified empirically — there is no
  * v2 view exec path in 4.1), so the statements must be claimed at the
  * PARSER seam, the same place Iceberg's Spark extensions claim theirs.
  *
  * [[GraftSqlParser]] delegates everything to Spark's parser except
  * view DDL whose target identifier lands in the graft catalog (an
  * explicit `graft.` prefix, or a 1-2 part name while the session's
  * current catalog is graft). Temporary-view DDL never matches the
  * patterns and stays Spark's.
  *
  * The statement grammar accepted here is the common subset:
  *   CREATE [OR REPLACE] VIEW [IF NOT EXISTS] ident [(col aliases)]
  *     [COMMENT 'text'] [TBLPROPERTIES ('k'='v', ...)] AS query
  *   ALTER VIEW ident AS query
  *   ALTER VIEW ident SET TBLPROPERTIES ('k'='v', ...)
  *   ALTER VIEW ident UNSET TBLPROPERTIES ('k', ...)
  *   DROP VIEW [IF EXISTS] ident
  *   SHOW VIEWS [IN|FROM namespace]
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  import GraftViewSql._

  override def parsePlan(sqlText: String): LogicalPlan =
    interceptViewDdl(session, delegate, sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftViewSql {

  // (?i) case-insensitive, (?s) DOTALL so the AS body spans lines.
  // Identifiers allow word chars, dots, and backticks — resolved
  // properly by the delegate's parseMultipartIdentifier afterwards.
  private val CreateViewRe: Regex =
    ("(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?VIEW\\s+(IF\\s+NOT\\s+EXISTS\\s+)?" +
      "([\\w.`]+)\\s*(?:\\(([^)]*)\\))?\\s*(?:COMMENT\\s+'([^']*)')?\\s*" +
      "(?:TBLPROPERTIES\\s*\\(([^)]*)\\))?\\s*AS\\s+(.+)$").r
  private val AlterViewAsRe: Regex =
    "(?is)^\\s*ALTER\\s+VIEW\\s+([\\w.`]+)\\s+AS\\s+(.+)$".r
  private val AlterViewSetRe: Regex =
    "(?is)^\\s*ALTER\\s+VIEW\\s+([\\w.`]+)\\s+SET\\s+TBLPROPERTIES\\s*\\(([^)]*)\\)\\s*;?\\s*$".r
  private val AlterViewUnsetRe: Regex =
    "(?is)^\\s*ALTER\\s+VIEW\\s+([\\w.`]+)\\s+UNSET\\s+TBLPROPERTIES\\s*\\(([^)]*)\\)\\s*;?\\s*$".r
  private val AlterViewRenameRe: Regex =
    "(?is)^\\s*ALTER\\s+VIEW\\s+([\\w.`]+)\\s+RENAME\\s+TO\\s+([\\w.`]+)\\s*;?\\s*$".r
  private val DropViewRe: Regex =
    "(?is)^\\s*DROP\\s+VIEW\\s+(IF\\s+EXISTS\\s+)?([\\w.`]+)\\s*;?\\s*$".r
  private val ShowViewsRe: Regex =
    "(?is)^\\s*SHOW\\s+VIEWS(?:\\s+(?:IN|FROM)\\s+([\\w.`]+))?\\s*;?\\s*$".r

  /** The graft catalog instance registered under `name`, if any. */
  private def graftCatalog(session: SparkSession, name: String)
      : Option[GraftNamespaceCatalog] =
    try session.sessionState.catalogManager.catalog(name) match {
      case g: GraftNamespaceCatalog => Some(g)
      case _ => None
    } catch { case _: Exception => None }

  /** Resolve a statement's target identifier to (catalogName, db, view)
    * when it lands in a graft catalog; None → the statement is not ours
    * and delegates untouched.
    */
  private def graftTarget(session: SparkSession, parts: Seq[String])
      : Option[(String, String, String)] = {
    val cm = session.sessionState.catalogManager
    parts match {
      case Seq(c, db, v) if graftCatalog(session, c).isDefined =>
        Some((c, db, v))
      case Seq(db, v)
          if graftCatalog(session, cm.currentCatalog.name()).isDefined =>
        Some((cm.currentCatalog.name(), db, v))
      case Seq(v)
          if graftCatalog(session, cm.currentCatalog.name()).isDefined &&
            cm.currentNamespace.length == 1 =>
        Some((cm.currentCatalog.name(), cm.currentNamespace.head, v))
      case _ => None
    }
  }

  /** `'k'='v', 'k2'='v2'` → Map. Empty/absent text → empty map. */
  private def parseProps(text: String): Map[String, String] = {
    val Pair = "\\s*'([^']*)'\\s*=\\s*'([^']*)'\\s*".r
    if (text == null || text.trim.isEmpty) Map.empty
    else text.split(",").map {
      case Pair(k, v) => k -> v
      case other => sys.error(s"malformed TBLPROPERTIES entry: $other " +
        "(expected 'key'='value')")
    }.toMap
  }

  private def parseKeys(text: String): Seq[String] = {
    val Key = "\\s*'([^']*)'\\s*".r
    if (text == null || text.trim.isEmpty) Seq.empty
    else text.split(",").toSeq.map {
      case Key(k) => k
      case other => sys.error(s"malformed TBLPROPERTIES key: $other")
    }
  }

  def interceptViewDdl(session: SparkSession, delegate: ParserInterface,
      sqlText: String): Option[LogicalPlan] = sqlText match {
    case CreateViewRe(orReplace, ifNotExists, identText, aliases, comment,
        props, body) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      graftTarget(session, parts).map { case (cat, db, v) =>
        delegate.parsePlan(body) // surface syntax errors at parse time
        GraftCreateViewCommand(cat, db, v, body.trim,
          replace = orReplace != null,
          ifNotExists = ifNotExists != null,
          columnAliases = Option(aliases).map(_.split(",").toSeq
            .map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty)).getOrElse(Seq.empty),
          comment = Option(comment),
          properties = parseProps(props))
      }
    case AlterViewAsRe(identText, body) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      graftTarget(session, parts).map { case (cat, db, v) =>
        delegate.parsePlan(body)
        GraftCreateViewCommand(cat, db, v, body.trim, replace = true,
          ifNotExists = false, columnAliases = Seq.empty, comment = None,
          properties = Map.empty, requireExists = true)
      }
    case AlterViewSetRe(identText, props) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      graftTarget(session, parts).map { case (cat, db, v) =>
        GraftAlterViewPropsCommand(cat, db, v,
          set = parseProps(props), unset = Seq.empty)
      }
    case AlterViewUnsetRe(identText, keys) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      graftTarget(session, parts).map { case (cat, db, v) =>
        GraftAlterViewPropsCommand(cat, db, v,
          set = Map.empty, unset = parseKeys(keys))
      }
    case AlterViewRenameRe(fromText, toText) =>
      val fromParts = delegate.parseMultipartIdentifier(fromText)
      graftTarget(session, fromParts).map { case (cat, db, v) =>
        // RENAME TO takes a name within the same namespace (Spark's
        // contract) or an explicit same-catalog multipart
        val toParts = delegate.parseMultipartIdentifier(toText)
        val (toDb, toV) = toParts match {
          case Seq(one)       => (db, one)
          case Seq(d2, v2)    => (d2, v2)
          case Seq(c2, d2, v2) =>
            require(c2 == cat, s"cannot rename across catalogs ($cat -> $c2)")
            (d2, v2)
          case other => sys.error(s"bad rename target ${other.mkString(".")}")
        }
        GraftRenameViewCommand(cat, db, v, toDb, toV)
      }
    case DropViewRe(ifExists, identText) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      graftTarget(session, parts).map { case (cat, db, v) =>
        GraftDropViewCommand(cat, db, v, ifExists = ifExists != null)
      }
    case ShowViewsRe(nsText) =>
      val cm = session.sessionState.catalogManager
      val target = Option(nsText) match {
        case Some(t) =>
          delegate.parseMultipartIdentifier(t) match {
            case Seq(c, db) if graftCatalog(session, c).isDefined =>
              Some((c, db))
            case Seq(db)
                if graftCatalog(session, cm.currentCatalog.name()).isDefined =>
              Some((cm.currentCatalog.name(), db))
            case _ => None
          }
        case None
            if graftCatalog(session, cm.currentCatalog.name()).isDefined &&
              cm.currentNamespace.length == 1 =>
          Some((cm.currentCatalog.name(), cm.currentNamespace.head))
        case None => None
      }
      target.map { case (cat, db) => GraftShowViewsCommand(cat, db) }
    case _ => None
  }

  /** Normalize a relation identifier to (db, view) when it names a
    * STORED view: explicit `graft.db.v`, or 1-2 part names while the
    * session's current catalog is a graft catalog. Existence-checked —
    * a table never matches (a location is a table XOR a view).
    */
  def viewParts(spark: SparkSession, parts: Seq[String])
      : Option[(String, String)] = {
    val cm = spark.sessionState.catalogManager
    val norm = parts match {
      case Seq(c, db, v) if graftCatalog(spark, c).isDefined => Some((db, v))
      case Seq(db, v)
          if graftCatalog(spark, cm.currentCatalog.name()).isDefined =>
        Some((db, v))
      case Seq(v)
          if graftCatalog(spark, cm.currentCatalog.name()).isDefined &&
            cm.currentNamespace.length == 1 =>
        Some((cm.currentNamespace.head, v))
      case _ => None
    }
    norm.filter { case (db, v) => viewLocation(spark, db, v).isDefined }
  }

  /** Expand a stored view into its (unresolved) defining plan —
    * LATE BINDING: the SQL re-analyzes against the tables' current
    * state. Relation names inside the body are qualified into the
    * view's recorded definition context (CTE-local names excepted),
    * nested stored views expand recursively with cycle detection, and
    * recorded column aliases apply via the analyzer's own
    * subquery-alias node.
    *
    * `versionId` / `tsMillis` pin a historic definition (`VERSION AS
    * OF` / `TIMESTAMP AS OF` on the view name): the DEFINITION is
    * pinned, the data stays current — pinning both is spelled by
    * time-traveling the tables inside a pinned view SQL.
    */
  def expand(spark: SparkSession, db: String, view: String,
      versionId: Option[Int], tsMillis: Option[Long],
      seen: Set[String] = Set.empty): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedSubqueryColumnAliases
    import org.apache.spark.sql.catalyst.plans.logical.{SubqueryAlias, UnresolvedWith}
    val key = s"$db.$view".toLowerCase
    require(!seen(key),
      s"view cycle detected through $db.$view (${(seen + key).mkString(" -> ")})")
    val loc = viewLocation(spark, db, view)
      .getOrElse(sys.error(s"view $db.$view not found"))
    val meta = ViewIO.read(loc)
    val v = (versionId, tsMillis) match {
      case (Some(id), _) => meta.version(id).getOrElse(
        sys.error(s"view $db.$view has no version $id " +
          s"(has ${meta.versions.map(_.versionId).mkString(",")})"))
      case (None, Some(ts)) =>
        val cands = meta.versions.filter(_.timestampMs <= ts)
        if (cands.isEmpty) sys.error(
          s"view $db.$view: no version existed at the requested timestamp")
        cands.maxBy(_.timestampMs)
      case _ => meta.current
    }
    val parsed = spark.sessionState.sqlParser.parsePlan(v.sql)
    // CTE names are plan-local — they must never be catalog-qualified
    val cteNames: Set[String] = parsed.collect {
      case w: UnresolvedWith => w.cteRelations.map(_._1.toLowerCase)
    }.flatten.toSet
    val ctxNs = v.defaultNamespace
    val qualified = parsed.transformDown {
      case u: UnresolvedRelation =>
        val full: Seq[String] = u.multipartIdentifier match {
          case Seq(one) if cteNames(one.toLowerCase) => Seq(one)
          case Seq(one) => (v.defaultCatalog +: ctxNs) :+ one
          case Seq(d, t) => Seq(v.defaultCatalog, d, t)
          case other => other
        }
        full match {
          case Seq(c, d2, t2)
              if graftCatalog(spark, c).isDefined &&
                viewLocation(spark, d2, t2).isDefined =>
            expand(spark, d2, t2, None, None, seen + key)
          case _ if full == u.multipartIdentifier => u
          case _ => u.copy(multipartIdentifier = full)
        }
    }
    val aliased =
      if (v.columnAliases.isEmpty) qualified
      else UnresolvedSubqueryColumnAliases(v.columnAliases, qualified)
    SubqueryAlias(view, aliased)
  }

  def viewCatalogOf(spark: SparkSession, name: String): GraftNamespaceCatalog =
    spark.sessionState.catalogManager.catalog(name)
      .asInstanceOf[GraftNamespaceCatalog]

  /** The view's storage location under the session's warehouse. */
  def viewLocation(spark: SparkSession, db: String, view: String)
      : Option[String] =
    spark.conf.getOption("spark.graft.warehouse")
      .map(w => Paths.get(w, db, view).toString)
      .filter(ViewIO.exists)
}

/** CREATE [OR REPLACE] VIEW / ALTER VIEW ... AS. Captures the session's
  * current catalog + namespace as the stored definition context
  * (Iceberg view-spec semantics: unqualified names in the body resolve
  * where the AUTHOR sat, not where a later reader sits).
  */
final case class GraftCreateViewCommand(catalogName: String, db: String,
    view: String, sql: String, replace: Boolean, ifNotExists: Boolean,
    columnAliases: Seq[String], comment: Option[String],
    properties: Map[String, String], requireExists: Boolean = false)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.viewCatalogOf(spark, catalogName)
    val ident = Identifier.of(Array(db), view)
    if (requireExists && !cat.viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    if (!replace && cat.viewExists(ident)) {
      if (ifNotExists) return Nil
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
    }
    // A stored view referencing a TEMP view would bind to session state
    // that won't exist at read time — reject at create, as Spark's own
    // persistent views do.
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    parsed.foreach {
      case u: UnresolvedRelation if u.multipartIdentifier.sizeIs == 1 &&
          spark.sessionState.catalog
            .getTempView(u.multipartIdentifier.head).isDefined =>
        sys.error(s"cannot store view $db.$view over temporary view " +
          s"'${u.multipartIdentifier.head}'")
      case _ => ()
    }
    // definition-time schema: analyze the body in THIS session (late
    // binding re-analyzes at every read; this copy serves DESCRIBE and
    // drift audits)
    val analyzed = spark.sessionState.executePlan(parsed).analyzed
    val schema = analyzed.schema
    require(columnAliases.isEmpty || columnAliases.size == schema.size,
      s"view $db.$view: ${columnAliases.size} column aliases for " +
        s"${schema.size} query columns")
    val cm = spark.sessionState.catalogManager
    val props = properties ++ comment.map("comment" -> _)
    val info = new ViewInfo(ident, sql, cm.currentCatalog.name(),
      cm.currentNamespace, schema, schema.fieldNames,
      columnAliases.toArray, Array.empty[String], {
        val m = new java.util.HashMap[String, String]()
        props.foreach { case (k, v) => m.put(k, v) }
        m
      })
    if (replace) cat.replaceView(info, orCreate = !requireExists)
    else cat.createView(info)
    Nil
  }
}

final case class GraftDropViewCommand(catalogName: String, db: String,
    view: String, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.viewCatalogOf(spark, catalogName)
    val ident = Identifier.of(Array(db), view)
    if (cat.tableExists(ident))
      sys.error(s"$db.$view is a table, not a view — use DROP TABLE")
    if (!cat.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Nil
  }
}

final case class GraftAlterViewPropsCommand(catalogName: String, db: String,
    view: String, set: Map[String, String], unset: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val cat = GraftViewSql.viewCatalogOf(spark, catalogName)
    val changes: Seq[ViewChange] =
      set.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) } ++
        unset.map(ViewChange.removeProperty)
    cat.alterView(Identifier.of(Array(db), view), changes: _*)
    Nil
  }
}

final case class GraftRenameViewCommand(catalogName: String, db: String,
    view: String, toDb: String, toView: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.viewCatalogOf(spark, catalogName)
    cat.renameView(Identifier.of(Array(db), view),
      Identifier.of(Array(toDb), toView))
    Nil
  }
}

final case class GraftShowViewsCommand(catalogName: String, db: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("viewName", StringType, nullable = false)(),
    AttributeReference("isTemporary", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.viewCatalogOf(spark, catalogName)
    cat.listViews(db).toSeq.sortBy(_.name())
      .map(i => Row(db, i.name(), false))
  }
}
