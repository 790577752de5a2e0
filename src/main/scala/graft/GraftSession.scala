package graft

import org.apache.spark.sql.SparkSession

/** Library front door: a SparkSession pre-configured the way every graft
  * entry point (Verify/Bench/demos) and any downstream user should run —
  * session extensions registered (custom SQL functions), AQE on, shuffle
  * partitions sized to the parallelism instead of the 200 default, UTC
  * session time (the oracle-parity requirement for every event-time query).
  *
  * `local(n)` is the single-JVM form used by the harnesses; `configure`
  * applies the same settings to any caller-supplied builder (e.g. a YARN/K8s
  * submit at cluster scale, where `spark.sql.shuffle.partitions` should be
  * 2-3× total executor cores — see SCALE.md).
  */
object GraftSession {

  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)

  def local(cores: Int, appName: String = "graft", ui: Boolean = false): SparkSession = {
    val s = configure(SparkSession.builder(), cores)
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.ui.enabled", ui.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
