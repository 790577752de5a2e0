package graft

import org.apache.spark.sql.SparkSession
import graft.streaming.EventStreams

/** Streaming smoke main: runs the tumbling-window aggregation both as a batch
  * plan and as a Structured Streaming query over the same bounded input and
  * reports parity (SURVEY §7.4.6). Usage: runMain graft.StreamSmoke [sfDir]
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(4, appName = "graft-stream-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    val batch = EventStreams.tumblingCounts(Tables.events(spark, sfDir))
      .collect().map(_.toSeq).toSet
    val stream = EventStreams.runToMemory(
      EventStreams.tumblingCounts(EventStreams.readStream(spark, sfDir)),
      "smoke_tumbling").collect().map(_.toSeq).toSet
    val sessions = EventStreams.runToMemory(
      EventStreams.sessionAggregates(EventStreams.readStream(spark, sfDir)),
      "smoke_sessions").count()
    val profiles = EventStreams.runToMemory(
      EventStreams.statefulUserProfiles(EventStreams.readStream(spark, sfDir)).toDF(),
      "smoke_profiles", mode = "update").count()
    println(s"STREAM_SMOKE parity=${batch == stream} windows=${batch.size} " +
      s"sessions=$sessions stateful_users=$profiles")
    spark.stop()
  }
}
