package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (JVM-wide; suites run in one
  * forked JVM per build.sbt).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.local(4, appName = "graft-tests")
    s.sparkContext.setLogLevel("WARN")
    // The deliberate bin-axis/census single-partition windows (e.g.
    // SurvivalCurve's ordered threshold axis — documented safe at the use
    // sites) each emit WindowExec's "No Partition Defined" WARN; hundreds
    // of them flood the test log and bury real warnings. Silence that one
    // logger package, not WARN globally.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
