package graft.api

import graft.tableformat.{SchemaHistory, TableMetadata}

/** Deterministic replacement for the reference's LLM column matcher
  * (apiv15.py:378-394 `find_closest_column`, which asks gpt-4o and
  * returns `NO MATCH` / `AMBIGUOUS` sentinels): resolution order is
  *
  *   1. exact current-schema name;
  *   2. field-id schema-history resolution (a historical name maps to
  *      its current name — the thesis's own mechanism, H2);
  *   3. nearest current name by case-insensitive Levenshtein distance,
  *      capped at `maxDistance`; a tie for nearest → Ambiguous.
  *
  * Same decision surface as the LLM endpoint (match / no-match /
  * ambiguous), but reproducible, offline, and unit-testable.
  */
object ColumnResolver {

  sealed trait Resolution
  final case class Resolved(currentName: String, via: String) extends Resolution
  final case class Ambiguous(candidates: Seq[String]) extends Resolution
  case object NoMatch extends Resolution

  def resolve(meta: TableMetadata, requested: String,
      maxDistance: Int = 3): Resolution = {
    val current = meta.currentSchema.fieldNames
    if (current.contains(requested)) return Resolved(requested, "exact")
    SchemaHistory.resolve(meta, requested) match {
      // Current is unreachable here (the exact check above is the same
      // comparison); only historical renames fall through to "history"
      case SchemaHistory.Renamed(n, _, _) => return Resolved(n, "history")
      case _                              => ()
    }
    // a schema with zero columns (all dropped) has no nearest name —
    // `.min` of nothing would throw where the contract says NoMatch
    if (current.isEmpty) return NoMatch
    val scored = current.map(c =>
      c -> levenshtein(requested.toLowerCase, c.toLowerCase))
    val best = scored.map(_._2).min
    if (best > maxDistance) NoMatch
    else scored.filter(_._2 == best).map(_._1) match {
      case Seq(only) => Resolved(only, s"levenshtein:$best")
      case several   => Ambiguous(several)
    }
  }

  /** Classic DP edit distance. */
  def levenshtein(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0)
      dp(0) = i
      for (j <- 1 to b.length) {
        val tmp = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = tmp
      }
    }
    dp(b.length)
  }
}
