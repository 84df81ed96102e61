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
    GraftSqlTransactions.intercept(sqlText)
      .orElse(interceptViewDdl(session, delegate, sqlText))
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
  // CREATE VIEW matches only the head; the clause tail (aliases /
  // COMMENT / TBLPROPERTIES, any order, ''-escaped quotes) is parsed
  // by [[parseCreateViewTail]] — a malformed tail on a GRAFT target is
  // a clear graft-side error naming the grammar, never a silent
  // fallthrough into Spark's MISSING_CATALOG_ABILITY.
  private val CreateViewHeadRe: Regex =
    ("(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?VIEW\\s+(IF\\s+NOT\\s+EXISTS\\s+)?" +
      "([\\w.`]+)\\s*(.*?)\\s*;?\\s*$").r
  private val AlterViewAsRe: Regex =
    "(?is)^\\s*ALTER\\s+VIEW\\s+([\\w.`]+)\\s+AS\\s+(.+)$".r
  private val AlterViewSetRe: Regex =
    "(?is)^\\s*ALTER\\s+VIEW\\s+([\\w.`]+)\\s+SET\\s+TBLPROPERTIES\\s*(\\(.*)$".r
  private val AlterViewUnsetRe: Regex =
    "(?is)^\\s*ALTER\\s+VIEW\\s+([\\w.`]+)\\s+UNSET\\s+TBLPROPERTIES\\s*(\\(.*)$".r
  private val AlterViewRenameRe: Regex =
    "(?is)^\\s*ALTER\\s+VIEW\\s+([\\w.`]+)\\s+RENAME\\s+TO\\s+([\\w.`]+)\\s*;?\\s*$".r
  private val DropViewRe: Regex =
    "(?is)^\\s*DROP\\s+VIEW\\s+(IF\\s+EXISTS\\s+)?([\\w.`]+)\\s*;?\\s*$".r
  // claimed only when the target is a stored VIEW — tables keep
  // Spark's own v2 SHOW CREATE TABLE exec (which handles graft tables
  // natively through the DSv2 handle, hidden partitioning included)
  private val ShowCreateRe: Regex =
    "(?is)^\\s*SHOW\\s+CREATE\\s+TABLE\\s+([\\w.`]+)\\s*;?\\s*$".r
  private val ShowViewsRe: Regex =
    "(?is)^\\s*SHOW\\s+VIEWS(?:\\s+(?:IN|FROM)\\s+([\\w.`]+))?\\s*;?\\s*$".r
  // introspection statements Spark's session catalog can't serve for a
  // v2 view in 4.1 (TABLE_OR_VIEW_NOT_FOUND, probed empirically) —
  // claimed only when the target resolves to a stored graft view;
  // everything else (tables, functions, DESCRIBE QUERY, per-column
  // describe) falls through to Spark by failing the match or the
  // viewParts check
  private val DescribeRe: Regex =
    ("(?is)^\\s*(?:DESC|DESCRIBE)\\s+(?:TABLE\\s+)?" +
      "(EXTENDED\\s+|FORMATTED\\s+)?([\\w.`]+)\\s*;?\\s*$").r
  private val ShowColumnsRe: Regex =
    ("(?is)^\\s*SHOW\\s+COLUMNS\\s+(?:IN|FROM)\\s+([\\w.`]+)" +
      "(?:\\s+(?:IN|FROM)\\s+([\\w.`]+))?\\s*;?\\s*$").r
  private val ShowTblPropsRe: Regex =
    "(?is)^\\s*SHOW\\s+TBLPROPERTIES\\s+([\\w.`]+)\\s*;?\\s*$".r
  private val RefreshTableRe: Regex =
    "(?is)^\\s*REFRESH\\s+TABLE\\s+([\\w.`]+)\\s*;?\\s*$".r

  /** The graft catalog instance registered under `name`, if any. */
  private def graftCatalog(session: SparkSession, name: String)
      : Option[GraftNamespaceCatalog] =
    try session.sessionState.catalogManager.catalog(name) match {
      case g: GraftNamespaceCatalog => Some(g)
      case _ => None
    } catch { case _: Exception => None }

  /** DDL on a TEMPORARY view is never ours — Spark's session catalog
    * owns temp views regardless of the current catalog. Without this
    * check, `USE graft.db; DROP VIEW tv` would hijack the temp view's
    * drop into the stored-view path: the drop fails (or silently
    * no-ops under IF EXISTS) while the temp view survives.
    */
  private def isTempViewRef(session: SparkSession,
      parts: Seq[String]): Boolean = parts match {
    case Seq(v) =>
      session.sessionState.catalog.getTempView(v).isDefined
    case Seq(g, v) =>
      g.equalsIgnoreCase(session.conf
        .get("spark.sql.globalTempDatabase", "global_temp")) &&
        session.sessionState.catalog.getGlobalTempView(v).isDefined
    case _ => false
  }

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

  /** Split `"( ... ) rest"` at the paren closing the list, respecting
    * ''-escaped single-quoted strings — a ')' or '(' inside a quoted
    * value must not count. Returns (inside, rest).
    */
  private def splitParen(text: String): (String, String) = {
    require(text.startsWith("("), s"expected '(' at: ${text.take(30)}")
    var i = 1; var depth = 1; var inStr = false
    while (i < text.length && depth > 0) {
      val c = text.charAt(i)
      if (inStr) {
        if (c == '\'') {
          if (i + 1 < text.length && text.charAt(i + 1) == '\'') i += 1
          else inStr = false
        }
      } else c match {
        case '\'' => inStr = true
        case '('  => depth += 1
        case ')'  => depth -= 1
        case _    => ()
      }
      i += 1
    }
    require(depth == 0, s"unbalanced parentheses in: ${text.take(60)}")
    (text.substring(1, i - 1), text.substring(i))
  }

  /** Top-level comma split, respecting ''-escaped quoted strings (a
    * ',' inside a quoted property value must not split).
    */
  private def splitList(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inStr = false; var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (inStr) {
        cur.append(c)
        if (c == '\'') {
          if (i + 1 < text.length && text.charAt(i + 1) == '\'') {
            cur.append('\''); i += 1
          } else inStr = false
        }
      } else if (c == '\'') { inStr = true; cur.append(c) }
      else if (c == ',') { out += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    require(!inStr, s"unterminated quoted string in: ${text.take(60)}")
    out += cur.toString
    out.toSeq.filter(_.trim.nonEmpty)
  }

  /** `'lit''eral'` → `lit'eral` (SQL single-quote escaping). */
  private def unquote(lit: String): String =
    lit.stripPrefix("'").stripSuffix("'").replace("''", "'")

  /** `'k'='v', 'k2'='v2'` → Map. Empty/absent text → empty map.
    * Values may contain commas, parens, and ''-escaped quotes.
    */
  private def parseProps(text: String): Map[String, String] = {
    val Pair = "(?s)\\s*('(?:[^']|'')*')\\s*=\\s*('(?:[^']|'')*')\\s*".r
    if (text == null || text.trim.isEmpty) Map.empty
    else splitList(text).map {
      case Pair(k, v) => unquote(k) -> unquote(v)
      case other => sys.error(s"malformed TBLPROPERTIES entry: $other " +
        "(expected 'key'='value')")
    }.toMap
  }

  private def parseKeys(text: String): Seq[String] = {
    val Key = "\\s*('(?:[^']|'')*')\\s*".r
    if (text == null || text.trim.isEmpty) Seq.empty
    else splitList(text).map {
      case Key(k) => unquote(k)
      case other => sys.error(s"malformed TBLPROPERTIES key: $other")
    }
  }

  private val SupportedCreateGrammar =
    "CREATE [OR REPLACE] VIEW [IF NOT EXISTS] name [(col [, ...])] " +
      "[COMMENT 'text'] [TBLPROPERTIES ('k'='v' [, ...])] AS query " +
      "(clauses accepted in any order before AS; '' escapes a quote)"

  /** Parse the CREATE VIEW clause tail — everything after the view
    * identifier. Clauses may appear in ANY order before AS; each at
    * most once. Returns (columnAliases, comment, properties, body).
    */
  private def parseCreateViewTail(tail0: String)
      : (Seq[String], Option[String], Map[String, String], String) = {
    val CommentRe = "(?is)^COMMENT\\s+('(?:[^']|'')*')(.*)$".r
    val TblPropsRe = "(?is)^TBLPROPERTIES\\s*(\\(.*)$".r
    val AsRe = "(?is)^AS\\s+(.+)$".r
    var tail = tail0.trim
    var aliases: Option[Seq[String]] = None
    var comment: Option[String] = None
    var props: Option[Map[String, String]] = None
    var body: String = null
    while (body == null) {
      tail match {
        case AsRe(b) => body = b.trim
        case _ if tail.startsWith("(") && aliases.isEmpty =>
          val (inside, rest) = splitParen(tail)
          aliases = Some(inside.split(",").toSeq
            .map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty))
          tail = rest.trim
        case CommentRe(lit, rest) if comment.isEmpty =>
          comment = Some(unquote(lit)); tail = rest.trim
        case TblPropsRe(parenAndRest) if props.isEmpty =>
          val (inside, rest) = splitParen(parenAndRest)
          props = Some(parseProps(inside)); tail = rest.trim
        case _ => sys.error(
          s"cannot parse CREATE VIEW near '${tail.take(40)}'. " +
            s"Supported grammar: $SupportedCreateGrammar")
      }
    }
    (aliases.getOrElse(Seq.empty), comment, props.getOrElse(Map.empty), body)
  }

  def interceptViewDdl(session: SparkSession, delegate: ParserInterface,
      sqlText: String): Option[LogicalPlan] = sqlText match {
    case CreateViewHeadRe(orReplace, ifNotExists, identText, tail) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      graftTarget(session, parts).map { case (cat, db, v) =>
        val (aliases, comment, props, body) = parseCreateViewTail(tail)
        delegate.parsePlan(body) // surface syntax errors at parse time
        GraftCreateViewCommand(cat, db, v, body,
          replace = orReplace != null,
          ifNotExists = ifNotExists != null,
          columnAliases = aliases,
          comment = comment,
          properties = props)
      }
    case AlterViewAsRe(identText, body) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      graftTarget(session, parts)
        .filterNot(_ => isTempViewRef(session, parts))
        .map { case (cat, db, v) =>
        delegate.parsePlan(body)
        // ALTER ... AS changes the DEFINITION only — properties and
        // comment survive (Spark/Iceberg semantics; CREATE OR REPLACE
        // is the form that resets them)
        GraftCreateViewCommand(cat, db, v, body.trim, replace = true,
          ifNotExists = false, columnAliases = Seq.empty, comment = None,
          properties = Map.empty, requireExists = true,
          preserveProperties = true)
      }
    case AlterViewSetRe(identText, parenAndRest) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      graftTarget(session, parts)
        .filterNot(_ => isTempViewRef(session, parts))
        .map { case (cat, db, v) =>
        val (inside, rest) = splitParen(parenAndRest)
        require(rest.trim.stripSuffix(";").trim.isEmpty,
          s"unexpected trailing text after TBLPROPERTIES: ${rest.take(40)}")
        GraftAlterViewPropsCommand(cat, db, v,
          set = parseProps(inside), unset = Seq.empty)
      }
    case AlterViewUnsetRe(identText, parenAndRest) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      graftTarget(session, parts)
        .filterNot(_ => isTempViewRef(session, parts))
        .map { case (cat, db, v) =>
        val (inside, rest) = splitParen(parenAndRest)
        require(rest.trim.stripSuffix(";").trim.isEmpty,
          s"unexpected trailing text after TBLPROPERTIES: ${rest.take(40)}")
        GraftAlterViewPropsCommand(cat, db, v,
          set = Map.empty, unset = parseKeys(inside))
      }
    case AlterViewRenameRe(fromText, toText) =>
      val fromParts = delegate.parseMultipartIdentifier(fromText)
      graftTarget(session, fromParts)
        .filterNot(_ => isTempViewRef(session, fromParts))
        .map { case (cat, db, v) =>
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
    case ShowCreateRe(identText) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      viewCatalogAndParts(session, parts).map { case (cat, db, v) =>
        GraftShowCreateViewCommand(cat, db, v)
      }
    case DescribeRe(extended, identText) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      viewCatalogAndParts(session, parts).map { case (cat, db, v) =>
        GraftDescribeViewCommand(cat, db, v, extended = extended != null)
      }
    case ShowColumnsRe(identText, nsText) =>
      val ident = delegate.parseMultipartIdentifier(identText)
      val parts = Option(nsText) match {
        case Some(ns) => delegate.parseMultipartIdentifier(ns) ++ ident
        case None     => ident
      }
      viewParts(session, parts).map { case (db, v) =>
        GraftShowViewColumnsCommand(db, v)
      }
    case ShowTblPropsRe(identText) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      viewParts(session, parts).map { case (db, v) =>
        GraftShowViewPropsCommand(db, v)
      }
    case RefreshTableRe(identText) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      // late binding means there is nothing stale to refresh — accept
      // the statement as a successful no-op instead of NOT_FOUND
      viewParts(session, parts).map { case (_, _) => GraftNoopCommand() }
    case DropViewRe(ifExists, identText) =>
      val parts = delegate.parseMultipartIdentifier(identText)
      graftTarget(session, parts)
        .filterNot(_ => isTempViewRef(session, parts))
        .map { case (cat, db, v) =>
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
      : Option[(String, String)] =
    viewCatalogAndParts(spark, parts).map { case (_, db, v) => (db, v) }

  /** Like [[viewParts]] but also returns the RESOLVED catalog name —
    * commands that echo an identifier back to the user (SHOW CREATE,
    * DESCRIBE) must name the catalog the view actually resolved
    * through, not assume the registration name `graft`.
    */
  def viewCatalogAndParts(spark: SparkSession, parts: Seq[String])
      : Option[(String, String, String)] = {
    val cm = spark.sessionState.catalogManager
    val norm = parts match {
      case Seq(c, db, v) if graftCatalog(spark, c).isDefined =>
        Some((c, db, v))
      case Seq(db, v)
          if graftCatalog(spark, cm.currentCatalog.name()).isDefined =>
        Some((cm.currentCatalog.name(), db, v))
      case Seq(v)
          if graftCatalog(spark, cm.currentCatalog.name()).isDefined &&
            cm.currentNamespace.length == 1 =>
        Some((cm.currentCatalog.name(), cm.currentNamespace.head, v))
      case _ => None
    }
    norm.filter { case (_, db, v) => viewLocation(spark, db, v).isDefined }
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
    import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
    val key = s"$db.$view".toLowerCase
    require(!seen(key),
      s"view cycle detected through $db.$view (${(seen + key).mkString(" -> ")})")
    val loc = viewLocation(spark, db, view)
      .getOrElse(sys.error(s"view $db.$view not found"))
    // transaction view of the DOCUMENT: a redefinition staged in this
    // session's open transaction serves its NEW definition here
    // (read-your-own-writes); an untouched view PINS its committed
    // document at first touch, so a concurrent CREATE OR REPLACE
    // cannot change which definition a later statement expands —
    // views get the same snapshot-isolation contract as tables.
    // EXPLICIT time travel overrides the pin (it names its own
    // version, like VERSION AS OF on a table inside a transaction):
    // it always resolves against the COMMITTED document.
    val explicit = versionId.isDefined || tsMillis.isDefined
    val meta =
      if (explicit) ViewIO.read(loc)
      else GraftSqlTransactions.viewReadView(spark, loc)
        .getOrElse(ViewIO.read(loc))
    // BEGIN TRANSACTION AS OF: with no explicit definition pin, the
    // historical instant selects the definition that was current THEN
    // (tables pin their data snapshot; views version their SQL)
    val v = (versionId,
        tsMillis.orElse(GraftSqlTransactions.asOfMillisOf(spark))) match {
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
    val parsed = inlineCtes(spark.sessionState.sqlParser.parsePlan(v.sql))
    val ctxNs = v.defaultNamespace
    // transformDownWithSubqueries: relations inside IN/EXISTS/scalar
    // subquery expressions must qualify (and expand) the same way
    val qualified = parsed.transformDownWithSubqueries {
      case u: UnresolvedRelation =>
        val full: Seq[String] = u.multipartIdentifier match {
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

  /** Inline WITH clauses in a parsed view body. The expanded plan is
    * spliced into the OUTER query mid-analysis — AFTER the analyzer's
    * Substitution batch (where Spark's own CTESubstitution lives) has
    * already run — so an `UnresolvedWith` left in the splice would never
    * be substituted and the read dies with TABLE_OR_VIEW_NOT_FOUND on
    * the CTE name. Plain inlining preserves Spark semantics (a CTE is
    * not a materialization barrier; the optimizer inlines too).
    * transformUp inlines innermost WITHs first, which gives correct
    * shadowing: an inner definition wins before an outer one is even
    * considered, and outer names still reach inner bodies afterwards.
    * Within one WITH, later definitions may reference earlier ones
    * (the env folds left-to-right).
    */
  private def inlineCtes(plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith
    plan.transformUpWithSubqueries {
      case w: UnresolvedWith =>
        require(!w.allowRecursion,
          "recursive CTEs are not supported in stored view bodies")
        val env = w.cteRelations
          .foldLeft(Map.empty[String, LogicalPlan]) {
            case (acc, (name, body, _)) =>
              acc + (name.toLowerCase -> substituteCtes(body, acc))
          }
        substituteCtes(w.child, env)
    }
  }

  private def substituteCtes(plan: LogicalPlan,
      env: Map[String, LogicalPlan]): LogicalPlan =
    if (env.isEmpty) plan
    else plan.transformUpWithSubqueries {
      case u: UnresolvedRelation if u.multipartIdentifier.sizeIs == 1 &&
          env.contains(u.multipartIdentifier.head.toLowerCase) =>
        env(u.multipartIdentifier.head.toLowerCase)
    }

  /** `graft.db.v.versions`: the view's recorded definition history as
    * a relation — version id, commit time, currency, the SQL text, and
    * the definition context. The audit surface `t.history` serves for
    * tables, for views.
    */
  def versionsDf(spark: SparkSession, db: String, view: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val loc = viewLocation(spark, db, view)
      .getOrElse(sys.error(s"view $db.$view not found"))
    val m = ViewIO.read(loc)
    val schema = StructType(Seq(
      StructField("version_id", IntegerType, nullable = false),
      StructField("committed_at", TimestampType, nullable = false),
      StructField("is_current", BooleanType, nullable = false),
      StructField("sql", StringType, nullable = false),
      StructField("default_catalog", StringType, nullable = false),
      StructField("default_namespace", ArrayType(StringType), nullable = false),
      StructField("column_aliases", ArrayType(StringType), nullable = false)))
    val rows = m.versions.sortBy(_.versionId).map { v =>
      Row(v.versionId, new java.sql.Timestamp(v.timestampMs),
        v.versionId == m.currentVersionId, v.sql, v.defaultCatalog,
        v.defaultNamespace, v.columnAliases)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
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
    properties: Map[String, String], requireExists: Boolean = false,
    preserveProperties: Boolean = false)
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
    // persistent views do. Three refinements over a naive relation scan:
    //   - a name defined as a CTE is NOT a temp reference (expansion
    //     inlines CTEs before any catalog lookup, so a CTE shadowing a
    //     temp view is fine) — but only WHERE THE CTE IS VISIBLE: the
    //     in-scope set is threaded down the walk and extended only
    //     inside the corresponding UnresolvedWith, so a same-named temp
    //     reference in a scope the CTE does not reach (e.g. outside the
    //     subquery that defines it) is still rejected instead of
    //     storing a view that rebinds or breaks at read time;
    //   - later CTEs see earlier ones (Spark's sequential CTE
    //     visibility), the body sees all of that statement's CTEs;
    //   - subquery EXPRESSIONS (IN/EXISTS/scalar) carry their own
    //     plans that plan.foreach does not descend into — a temp view
    //     hidden there would store fine and break on every later read.
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    def rejectTempRefs(p: LogicalPlan, ctes: Set[String]): Unit = p match {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        var scope = ctes
        w.cteRelations.foreach { case (nm, rel, _) =>
          rejectTempRefs(rel, scope)
          scope = scope + nm.toLowerCase
        }
        rejectTempRefs(w.child, scope)
      case n =>
        n match {
          case u: UnresolvedRelation if u.multipartIdentifier.sizeIs == 1 &&
              !ctes(u.multipartIdentifier.head.toLowerCase) &&
              spark.sessionState.catalog
                .getTempView(u.multipartIdentifier.head).isDefined =>
            sys.error(s"cannot store view $db.$view over temporary view " +
              s"'${u.multipartIdentifier.head}'")
          case _ => ()
        }
        n.expressions.foreach(_.foreach {
          case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
            rejectTempRefs(s.plan, ctes)
          case _ => ()
        })
        n.children.foreach(rejectTempRefs(_, ctes))
    }
    rejectTempRefs(parsed, Set.empty)
    // definition-time schema: analyze the body in THIS session (late
    // binding re-analyzes at every read; this copy serves DESCRIBE and
    // drift audits)
    val analyzed = spark.sessionState.executePlan(parsed).analyzed
    val schema = analyzed.schema
    require(columnAliases.isEmpty || columnAliases.size == schema.size,
      s"view $db.$view: ${columnAliases.size} column aliases for " +
        s"${schema.size} query columns")
    val cm = spark.sessionState.catalogManager
    // ALTER ... AS (preserveProperties): carry the existing view's
    // properties (comment included — it is stored as a property)
    // through the definition replacement
    val existing =
      if (preserveProperties)
        GraftViewSql.viewLocation(spark, db, view)
          .map(l => GraftSqlTransactions.viewReadView(spark, l)
            .getOrElse(ViewIO.read(l)).properties)
          .getOrElse(Map.empty)
      else Map.empty[String, String]
    val props = existing ++ properties ++ comment.map("comment" -> _)
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

/** SHOW CREATE TABLE on a stored view: reconstruct the CREATE VIEW
  * statement from the CURRENT recorded version (Spark's v1 behavior
  * for its own views; column name matches Spark's `createtab_stmt`).
  * The emitted statement re-parses through [[GraftSqlParser]] — quote
  * escaping included — so drop-and-replay round-trips.
  */
final case class GraftShowCreateViewCommand(catalog: String, db: String,
    view: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("createtab_stmt", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val loc = GraftViewSql.viewLocation(spark, db, view)
      .getOrElse(sys.error(s"view $db.$view not found"))
    val m = ViewIO.read(loc)
    val cur = m.current
    def q(s: String): String = s.replace("'", "''")
    val aliases =
      if (cur.columnAliases.isEmpty) ""
      else cur.columnAliases.mkString(" (", ", ", ")")
    val comment = m.properties.get("comment")
      .map(c => s"\nCOMMENT '${q(c)}'").getOrElse("")
    val props = (m.properties - "comment").toSeq.sortBy(_._1)
    val tblprops =
      if (props.isEmpty) ""
      else props.map { case (k, v) => s"  '${q(k)}' = '${q(v)}'" }
        .mkString("\nTBLPROPERTIES (\n", ",\n", ")")
    Seq(Row(
      s"CREATE VIEW $catalog.$db.$view$aliases$comment$tblprops" +
        s"\nAS ${cur.sql}\n"))
  }
}

/** DESCRIBE [EXTENDED] on a stored view: the CURRENT version's
  * recorded definition-time schema (aliases applied), and under
  * EXTENDED the detailed-view block Spark's v1 views emit — type,
  * text, definition context, version, properties.
  */
final case class GraftDescribeViewCommand(catalog: String, db: String,
    view: String, extended: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", StringType, nullable = false)(),
    AttributeReference("data_type", StringType, nullable = false)(),
    AttributeReference("comment", StringType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val loc = GraftViewSql.viewLocation(spark, db, view)
      .getOrElse(sys.error(s"view $db.$view not found"))
    val m = ViewIO.read(loc)
    val cur = m.current
    val schema = org.apache.spark.sql.types.DataType.fromJson(cur.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val names =
      if (cur.columnAliases.nonEmpty) cur.columnAliases
      else schema.fieldNames.toVector
    val cols = schema.fields.toVector.zip(names).zipWithIndex.map {
      case ((f, n), i) =>
        Row(n, f.dataType.simpleString, cur.columnComments.lift(i).orNull)
    }
    if (!extended) cols
    else cols ++ Seq(
      Row("", "", null),
      Row("# Detailed View Information", "", null),
      Row("Type", "VIEW", null),
      Row("View Name", s"$catalog.$db.$view", null),
      Row("View Text", cur.sql, null),
      Row("View Default Catalog", cur.defaultCatalog, null),
      Row("View Default Namespace",
        cur.defaultNamespace.mkString("[", ", ", "]"), null),
      Row("View Version", m.currentVersionId.toString, null),
      Row("Properties", m.properties.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString("[", ", ", "]"), null))
  }
}

final case class GraftShowViewColumnsCommand(db: String, view: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val loc = GraftViewSql.viewLocation(spark, db, view)
      .getOrElse(sys.error(s"view $db.$view not found"))
    val cur = ViewIO.read(loc).current
    val schema = org.apache.spark.sql.types.DataType.fromJson(cur.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val names =
      if (cur.columnAliases.nonEmpty) cur.columnAliases
      else schema.fieldNames.toVector
    names.map(Row(_))
  }
}

final case class GraftShowViewPropsCommand(db: String, view: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val loc = GraftViewSql.viewLocation(spark, db, view)
      .getOrElse(sys.error(s"view $db.$view not found"))
    ViewIO.read(loc).properties.toSeq.sortBy(_._1)
      .map { case (k, v) => Row(k, v) }
  }
}

final case class GraftNoopCommand() extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = Nil
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
