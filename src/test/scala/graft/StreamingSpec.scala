package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Streaming/batch parity (SURVEY §2.12, §7.4.6): the same aggregation logic
  * over the same bounded input must agree between a Structured Streaming run
  * (memory sink, complete mode) and the batch plan.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("tumbling-window counts: streaming == batch") {
    val batch = EventStreams.tumblingCounts(Tables.events(spark, TestSpark.sfDir))
      .collect().map(_.toSeq).toSet
    val stream = EventStreams.runToMemory(
      EventStreams.tumblingCounts(EventStreams.readStream(spark, TestSpark.sfDir)),
      "tumbling_parity").collect().map(_.toSeq).toSet
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("session windows produce sane sessions under watermark") {
    val sessions = EventStreams.runToMemory(
      EventStreams.sessionAggregates(EventStreams.readStream(spark, TestSpark.sfDir)),
      "session_parity")
    val n = sessions.count()
    assert(n > 0)
    // session invariant: start <= end, positive event counts
    import org.apache.spark.sql.functions._
    assert(sessions.where(col("session_start") > col("session_end")
      || col("n_events") <= 0).count() == 0)
  }
}
