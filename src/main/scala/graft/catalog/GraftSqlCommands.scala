package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftshim
import graft.engine.GraftTable

/** Eagerly-executed commands the resolution rule substitutes for SQL
  * DML against graft tables (the reference drives ALL its DML through
  * SQL text — INSERT INTO cells 11/22/27, UPDATE cell 24, DELETE cell
  * 11). Each delegates to the engine API so CoW/MoR mode selection,
  * stats pruning, and snapshot commits are identical to programmatic
  * calls.
  *
  * Conditions/values captured at analysis carry AttributeReferences
  * bound to the ORIGINAL relation; `unbind` rewrites them to
  * by-name UnresolvedAttributes so they re-resolve against the fresh
  * read the engine performs.
  */
object GraftSqlCommands {

  def unbind(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
  }
}

/** INSERT INTO / INSERT OVERWRITE graft.db.t. */
final case class GraftInsertCommand(location: String, query: LogicalPlan,
    overwrite: Boolean, columnNames: Seq[String]) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val t = GraftTable.load(session, location)
    var df = graftshim.dfFromPlan(session, query)
    val target = t.meta.currentSchema.fieldNames
    // an explicit column list names the query's positional output
    // (VALUES rows arrive as col1, col2, ...)
    if (columnNames.nonEmpty) {
      // an explicit column list names the query's positional output
      // (VALUES rows arrive as col1, col2, ...), then maps BY NAME onto
      // the table schema; partial lists are unsupported (no null-fill)
      require(df.columns.length == columnNames.length,
        s"INSERT column list has ${columnNames.length} names, " +
          s"query provides ${df.columns.length} columns")
      require(columnNames.sorted == target.sorted,
        s"INSERT column list (${columnNames.mkString(", ")}) must name " +
          s"every table column (${target.mkString(", ")})")
      df = df.toDF(columnNames: _*).select(target.map(n => col(s"`$n`")): _*)
    } else {
      // SQL INSERT INTO without a column list is POSITIONAL — never
      // reorder by name, even when the query's names permute the
      // table's (matching Spark's own semantics for every other table)
      require(df.columns.length == target.length,
        s"INSERT provides ${df.columns.length} columns, table has ${target.length}")
      df = df.toDF(target: _*)
    }
    if (overwrite) t.overwrite(df) else t.append(df)
    Seq.empty
  }
}

/** CREATE TABLE ... AS SELECT / REPLACE TABLE ... AS SELECT
  * (reference cells 68 and 13).
  */
final case class GraftCtasCommand(location: String, tableName: String,
    query: LogicalPlan, partition: Seq[(String, String)],
    properties: Map[String, String], replace: Boolean,
    ifNotExists: Boolean, orCreate: Boolean)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(session: SparkSession): Seq[Row] = {
    val df = graftshim.dfFromPlan(session, query)
    val exists = graft.tableformat.MetadataIO.exists(location)
    if (replace) {
      // CREATE OR REPLACE on a missing table creates; plain REPLACE
      // errors (SQL semantics); an explicit PARTITIONED BY /
      // TBLPROPERTIES carries into the replacement spec
      if (exists) GraftTable.replaceAs(session, location, df,
        partition, properties)
      else if (orCreate) GraftTable.createAs(session, location, tableName,
        df, partition, properties)
      else sys.error(s"REPLACE TABLE: no table at $location " +
        "(use CREATE OR REPLACE TABLE)")
    } else if (exists && ifNotExists) {
      () // CREATE TABLE IF NOT EXISTS on an existing table: no-op
    } else {
      GraftTable.createAs(session, location, tableName, df,
        partition, properties)
    }
    Seq.empty
  }
}

/** DELETE FROM graft.db.t WHERE cond. */
final case class GraftDeleteCommand(location: String,
    condition: Expression) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    GraftTable.load(session, location)
      .delete(graftshim.columnOf(GraftSqlCommands.unbind(condition)))
    Seq.empty
  }
}

/** UPDATE graft.db.t SET ... [WHERE cond]. */
final case class GraftUpdateCommand(location: String,
    assignments: Seq[(String, Expression)],
    condition: Option[Expression]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.lit
    val cond = condition.map(c => graftshim.columnOf(GraftSqlCommands.unbind(c)))
      .getOrElse(lit(true))
    // duplicates must error BEFORE the map collapses them last-wins
    val dupes = assignments.map(_._1).groupBy(identity)
      .collect { case (n, g) if g.size > 1 => n }
    require(dupes.isEmpty,
      s"duplicate UPDATE targets: ${dupes.mkString(", ")}")
    val as = assignments.map { case (name, value) =>
      name -> graftshim.columnOf(GraftSqlCommands.unbind(value))
    }.toMap
    GraftTable.load(session, location).update(cond, as)
    Seq.empty
  }
}
