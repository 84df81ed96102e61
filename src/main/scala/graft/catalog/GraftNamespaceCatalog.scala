package graft.catalog

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.tableformat.MetadataIO

/** Catalog plugin claiming the `graft` namespace
  * (`spark.sql.catalog.graft=graft.catalog.GraftNamespaceCatalog`).
  *
  * Division of labor: this plugin answers NAMESPACE questions (SHOW
  * DATABASES / SHOW TABLES / existence) from the warehouse layout, and
  * deliberately reports every table as "not found" — Spark's built-in
  * resolution then leaves `graft.db.t` unresolved, and the injected
  * [[ResolveGraftRelations]] rule supplies the versioned-table read
  * plan (field-id mapping, positional deletes, time travel), which a
  * DSv2 Table handle could not express without reimplementing the
  * whole scan stack. Without the plugin, the session catalog claims
  * the identifier first and fails with REQUIRES_SINGLE_PART_NAMESPACE
  * before any resolution rule runs.
  */
class GraftNamespaceCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = "graft"

  private def warehouse: Option[String] =
    Option(org.apache.spark.sql.SparkSession.active)
      .flatMap(_.conf.getOption("spark.graft.warehouse"))

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  // -------- namespaces (SHOW DATABASES / USE) --------

  override def listNamespaces(): Array[Array[String]] =
    warehouse.map { w =>
      val root = Paths.get(w)
      if (!Files.isDirectory(root)) Array.empty[Array[String]]
      else Files.list(root).iterator().asScala.filter(Files.isDirectory(_))
        .map(p => Array(p.getFileName.toString)).toArray
    }.getOrElse(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && warehouse.exists(w =>
      Files.isDirectory(Paths.get(w, namespace.head)))

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] =
    if (namespaceExists(namespace)) java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    require(namespace.length == 1, "graft namespaces are single-level")
    warehouse.foreach(w => Files.createDirectories(Paths.get(w, namespace.head)))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("alterNamespace")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("dropNamespace")

  // -------- tables: existence answered here, reads via the rule --------

  override def listTables(namespace: Array[String]): Array[Identifier] =
    warehouse.map { w =>
      val d = Paths.get(w, namespace.mkString("/"))
      if (!Files.isDirectory(d)) Array.empty[Identifier]
      else Files.list(d).iterator().asScala
        .filter(p => MetadataIO.exists(p.toString))
        .map(p => Identifier.of(namespace, p.getFileName.toString)).toArray
    }.getOrElse(Array.empty)

  override def tableExists(ident: Identifier): Boolean =
    warehouse.exists(w => MetadataIO.exists(
      Paths.get(w, (ident.namespace() :+ ident.name()).mkString("/")).toString))

  override def loadTable(ident: Identifier): Table =
    throw new NoSuchTableException(ident)

  override def loadTable(ident: Identifier, version: String): Table =
    throw new NoSuchTableException(ident)

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new NoSuchTableException(ident)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "create graft tables via GraftCatalog.createTable")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "alter graft tables via GraftTable (addColumn/renameColumn/...)")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("dropTable")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("renameTable")
}
