package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 WRITE path: an audit sink that counts rows and bytes
  * per task and aggregates them in the driver-side commit — the write-side
  * twin of [[ShowerEventsSource]], completing the connector surface
  * (batch read + micro-batch read + batch write).
  *
  * The two-phase commit shape is the part that matters at 100 TB: each task
  * returns a [[AuditSink.TaskCounts]] commit MESSAGE (not data) and the
  * driver's `commit` sees either ALL messages or `abort` — exactly-once
  * accounting with O(tasks) driver state, no matter how many rows flow.
  * Results are published under the job's `name` option for tests/metrics.
  *
  * Usage: df.write.format("graft.sources.AuditSink").option("name", "x")
  *   .mode("append").save()
  */
class AuditSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // accepts any incoming schema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AuditTable(schema, properties.getOrDefault("name", "default"))
}

object AuditSink {
  final case class TaskCounts(rows: Long, fields: Long) extends WriterCommitMessage

  /** Committed totals per sink name (driver-side, for tests + metrics),
    * with the last committed epoch so streaming replays are idempotent.
    */
  private final case class State(lastEpoch: Long, counts: TaskCounts)
  private val committed = new ConcurrentHashMap[String, State]()
  def result(name: String): Option[TaskCounts] =
    Option(committed.get(name)).map(_.counts)
  private[sources] def publish(name: String, c: TaskCounts): Unit =
    committed.put(name, State(-1L, c))
  /** Accumulate one epoch's counts; a REPLAYED epoch (≤ last committed) is
    * a no-op — Spark may re-invoke commit for the same epoch after a
    * failure, and blind accumulation would double-count.
    */
  private[sources] def publishEpoch(name: String, epochId: Long, c: TaskCounts): Unit =
    committed.compute(name, (_, prev) => prev match {
      case null => State(epochId, c)
      case s if epochId <= s.lastEpoch => s
      case s => State(epochId,
        TaskCounts(s.counts.rows + c.rows, s.counts.fields + c.fields))
    })
}

private[sources] class AuditTable(schema: StructType, name: String)
    extends Table with SupportsWrite {
  override def name(): String = s"audit_sink($name)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new AuditBatchWrite(name, info.schema())
        // streaming twin: per-epoch commits accumulate into the same
        // published totals (epoch id unused — counts are additive)
        override def toStreaming: StreamingWrite =
          new AuditStreamingWrite(name, info.schema().size)
      }
    }
}

private[sources] class AuditBatchWrite(name: String, schema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory(schema.size)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val total = messages.collect { case c: AuditSink.TaskCounts => c }
      .foldLeft(AuditSink.TaskCounts(0L, 0L))((a, b) =>
        AuditSink.TaskCounts(a.rows + b.rows, a.fields + b.fields))
    AuditSink.publish(name, total)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Streaming twin: per-epoch commits accumulate into the same published
  * totals (counts are additive across epochs).
  */
private[sources] class AuditStreamingWrite(name: String, nFields: Int)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      i: PhysicalWriteInfo): StreamingDataWriterFactory =
    new AuditStreamingWriterFactory(nFields)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val batch = messages.collect { case c: AuditSink.TaskCounts => c }
      .foldLeft(AuditSink.TaskCounts(0L, 0L))((a, b) =>
        AuditSink.TaskCounts(a.rows + b.rows, a.fields + b.fields))
    AuditSink.publishEpoch(name, epochId, batch)
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class AuditStreamingWriterFactory(nFields: Int)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new AuditWriterFactory(nFields).createWriter(partitionId, taskId)
}

private[sources] class AuditWriterFactory(nFields: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      override def write(record: InternalRow): Unit = rows += 1
      override def commit(): WriterCommitMessage =
        AuditSink.TaskCounts(rows, rows * nFields)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
