package graft.pipeline

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Surfaces ANN candidate-cap binding ([[Similarity]]'s
  * `maxCandidatesPerQuery`) as a WARN log line: the cap bounds the
  * verification broadcast, so when it binds recall degrades by design —
  * but silently degraded recall is an operational trap (round-5/6
  * advice). The counts come from a CollectMetrics observation riding
  * the candidate scan, so detection costs no extra action.
  *
  * Installed by GraftSession via `spark.sql.queryExecutionListeners`
  * (needs the zero-arg constructor).
  */
class CapBindingListener extends QueryExecutionListener {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit =
    qe.observedMetrics.get(Similarity.CapMetricName).foreach { row =>
      // sum() over zero rows is null — no candidates means no binding
      val dropped = Option(row.getAs[Any]("dropped_candidates"))
        .collect { case l: Long => l }.getOrElse(0L)
      val queries = Option(row.getAs[Any]("capped_queries"))
        .collect { case l: Long => l }.getOrElse(0L)
      if (dropped > 0)
        log.warn(s"ANN candidate cap bound: dropped $dropped candidates " +
          s"across $queries queries — recall is degraded; raise " +
          "maxCandidatesPerQuery or add tables/probes if unacceptable")
    }

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit = ()
}
