package graft.engine

/** A retention operation (expire / orphan GC) refused because
  * registered zero-copy clones still reference this table's files —
  * see [[GraftTable.snapshotTo]]'s class-doc stranding discussion.
  * A dedicated type (rather than a bare IllegalStateException matched
  * by message substring) so callers like [[GraftTable.maintain]] can
  * catch the refusal without string coupling; extends
  * IllegalStateException so operator-facing handlers written against
  * the general contract keep working.
  */
final class CloneRetentionRefusedException(message: String)
    extends IllegalStateException(message)
