package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline observability via `Dataset.observe`: named aggregate metrics
  * (row counts, null counts, value bounds) computed INSIDE the running job —
  * zero extra passes over the data, which is the only affordable way to get
  * data-quality counters out of a 100 TB pipeline (a separate `count()`
  * would re-scan everything).
  *
  * Usage:
  * {{{
  *   val (df, listener) = Metrics.observed(input, "clean_stage",
  *     count(lit(1)).as("rows"),
  *     count(when(col("text").isNull, 1)).as("null_text"))
  *   df.write...   // metrics arrive on the listener after the action
  *   val m = listener.get("clean_stage")
  * }}}
  */
object Metrics {

  /** Collects observation rows for ONE metric name; `close()` unregisters it
    * — a long-lived session calling [[observed]] per stage would otherwise
    * leak one listener per call, each harvesting every query's metrics.
    */
  final class Collector(session: org.apache.spark.sql.SparkSession, watched: String)
      extends QueryExecutionListener with AutoCloseable {
    private val seen = new java.util.concurrent.ConcurrentHashMap[String, Row]()

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.get(watched).foreach(row => seen.put(watched, row))
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()

    def get(name: String): Option[Row] = Option(seen.get(name))
    override def close(): Unit = session.listenerManager.unregister(this)
  }

  /** Attach named observed metrics to a frame and register a collector on
    * its session. The metrics materialize when the frame's next ACTION runs;
    * `close()` the collector when done with it.
    */
  def observed(df: DataFrame, name: String, metrics: Column*): (DataFrame, Collector) = {
    val collector = new Collector(df.sparkSession, name)
    df.sparkSession.listenerManager.register(collector)
    (df.observe(name, metrics.head, metrics.tail: _*), collector)
  }
}
