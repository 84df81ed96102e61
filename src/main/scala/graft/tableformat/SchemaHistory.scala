package graft.tableformat

/** Field-id based name resolution across schema history — the reference's
  * central semantic (apiv15.py:182-207 endpoint GetColumn; notebook cell 55):
  * a column requested by a historical name resolves to its current name via
  * the immutable field-id, so queries keep working across renames.
  */
object SchemaHistory {

  sealed trait Resolution
  /** Name exists in the current schema as-is. */
  final case class Current(name: String) extends Resolution
  /** Name existed historically; field-id survives under a new name. */
  final case class Renamed(currentName: String, fieldId: Int,
      foundInSchemaId: Int) extends Resolution
  /** Name existed historically but its field was dropped. */
  final case class Dropped(fieldId: Int) extends Resolution
  /** Name never appeared in any schema version. */
  case object NeverExisted extends Resolution

  /** Resolve a requested column name against the full schema history.
    * Walks schemas newest-first so the most recent binding of a reused
    * name wins (the reference's `test` table drops then re-adds `age`
    * under a new field-id — SURVEY §7 risk 1).
    */
  def resolve(meta: TableMetadata, requested: String): Resolution = {
    val current = meta.currentSchema
    if (current.fieldByName(requested).isDefined) return Current(requested)
    val history = meta.schemas.filter(_.schemaId != meta.currentSchemaId)
      .sortBy(-_.schemaId)
    history.iterator
      .flatMap(s => s.fieldByName(requested).map(f => (s.schemaId, f.id)))
      .nextOption() match {
      case Some((sid, fid)) =>
        current.fieldById(fid) match {
          case Some(f) => Renamed(f.name, fid, sid)
          case None    => Dropped(fid)
        }
      case None => NeverExisted
    }
  }

  /** Positional resolution: "column #i" of the current schema regardless
    * of name (reference: apiv15.py:238-249 GetEmployeeByName uses position 1).
    */
  def byPosition(meta: TableMetadata, pos: Int): Option[String] = {
    val fs = meta.currentSchema.fields
    if (pos >= 0 && pos < fs.length) Some(fs(pos).name) else None
  }
}
