package graft.engine

/** A racing writer advanced the table's snapshot between an
  * operation's read and its commit, and the operation's rebase policy
  * refuses to rebase (it referenced the base snapshot's files —
  * rebasing would silently drop the racer's rows). RETRYABLE: re-run
  * the operation against the fresh table state.
  *
  * A dedicated type so cooperating retriers ([[graft.operators.IncrementalAgg]]'s
  * refresh loop) catch the condition structurally instead of matching
  * exception message text. Extends IllegalArgumentException to stay
  * compatible with callers that treated the former `require` failure
  * generically.
  */
final class ConcurrentCommitException(message: String)
    extends IllegalArgumentException(message)
