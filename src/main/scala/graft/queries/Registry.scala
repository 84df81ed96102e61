package graft.queries

/** Central registry: each module contributes QueryDefs; SparkEntry exposes
  * them under the driver's contract. Duplicate names are a bug — fail fast.
  */
object Registry {
  def modules: Seq[Seq[QueryDef]] =
    Seq(Relational.all, Versioned.all, Pipeline.all, Ingestion.all,
      CatalogQueries.all, ApiSurface.all, Temporal.all, ViewQueries.all)

  lazy val all: Seq[QueryDef] = {
    val qs = modules.flatten
    val dupes = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
    qs
  }
}
