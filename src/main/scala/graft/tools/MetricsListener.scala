package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query-level run metrics via `QueryExecutionListener` — the
  * SparkListener half of the reference's `ingestion` metrics document
  * (SURVEY §1: "job-metrics table written at end of run (+ SparkListener
  * for task metrics)"). Each completed query contributes one row:
  * function name, wall nanos, output rows (when the sink reports them),
  * success flag. `snapshot` exposes the buffer as a DataFrame for
  * appending to a run-log table.
  */
final case class QueryMetric(fn: String, durationNs: Long,
                             outputRows: Long, succeeded: Boolean)

class MetricsListener extends QueryExecutionListener {
  private val buf = new ConcurrentLinkedQueue[QueryMetric]()

  private def outputRowsOf(qe: QueryExecution): Long =
    qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit =
    buf.add(QueryMetric(funcName, durationNs, outputRowsOf(qe), succeeded = true))

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit =
    buf.add(QueryMetric(funcName, -1L, -1L, succeeded = false))

  def snapshot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    buf.toArray(Array.empty[QueryMetric]).toSeq
      .map(m => (m.fn, m.durationNs, m.outputRows, m.succeeded))
      .toDF("fn", "duration_ns", "output_rows", "succeeded")
  }

  def clear(): Unit = buf.clear()
}

object MetricsListener {
  /** Install a listener on the session; returns it for snapshotting. */
  def install(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }
}
