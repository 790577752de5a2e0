package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (JVM-wide; suites run in one
  * forked JVM per build.sbt).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.local(4, appName = "graft-tests")
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
