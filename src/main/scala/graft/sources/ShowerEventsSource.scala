package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.functions.Hashes

/** Custom DataSource V2: a deterministic synthetic shower-event generator —
  * the reference's remote dataset fetch (SURVEY §2 row 1,
  * create_train_valid_test_datasets.py:41-54) re-expressed as a first-class
  * Spark connector instead of a download step. Demonstrates the full
  * source-extension surface:
  *
  *   - **partitioned parallel reads**: the id range splits into `partitions`
  *     input partitions, one reader each — scales like any file scan;
  *   - **column pruning** (`SupportsPushDownRequiredColumns`): readers
  *     compute only the fields the query projects;
  *   - **filter pushdown** (`SupportsPushDownFilters`): range predicates on
  *     `event_id` narrow the generated id ranges at the SOURCE — the
  *     generator analog of parquet row-group skipping;
  *   - **oracle replayability**: every field derives from
  *     [[Hashes.mulHashLong]] — integer arithmetic any engine can replay,
  *     so even this custom source is hash-checked against DuckDB (q87).
  *
  * Usage: spark.read.format("graft.sources.ShowerEventsSource")
  *   .option("rows", n).option("partitions", p).load()
  */
class ShowerEventsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShowerEventsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ShowerTable(
      properties.getOrDefault("rows", "10000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object ShowerEventsSource {
  val schema: StructType = new StructType()
    .add("event_id", LongType, nullable = false)
    .add("clazz", IntegerType, nullable = false)    // 0=gamma, 1=proton
    .add("log_e", DoubleType, nullable = false)     // [14, 16)
    .add("theta", DoubleType, nullable = false)     // [0, 60)
    .add("p", DoubleType, nullable = false)         // [0, 1)

  /** Field generators — exact-integer hash arithmetic, one seed per field. */
  def clazzOf(id: Long): Int     = (Hashes.mulHashLong(id, 1) % 2).toInt
  def logEOf(id: Long): Double   = 14.0 + (Hashes.mulHashLong(id, 2) % 1000000) / 500000.0
  def thetaOf(id: Long): Double  = (Hashes.mulHashLong(id, 3) % 600000) / 10000.0
  def pOf(id: Long): Double      = (Hashes.mulHashLong(id, 4) % 1000000) / 1000000.0

  /** The same generators as DuckDB SQL over a `range(rows)` id column —
    * divisors cast to DOUBLE so the oracle computes IEEE double division
    * like the Scala readers, never DECIMAL arithmetic.
    */
  def fieldSql(field: String, id: String): String = field match {
    case "clazz" => s"CAST((${Hashes.mulHashSql(id, 1)}) % 2 AS INT)"
    case "log_e" => s"14.0 + ((${Hashes.mulHashSql(id, 2)}) % 1000000) / CAST(500000 AS DOUBLE)"
    case "theta" => s"((${Hashes.mulHashSql(id, 3)}) % 600000) / CAST(10000 AS DOUBLE)"
    case "p"     => s"((${Hashes.mulHashSql(id, 4)}) % 1000000) / CAST(1000000 AS DOUBLE)"
  }
}

private[sources] class ShowerTable(rows: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"shower_events($rows)"
  override def schema(): StructType = ShowerEventsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ShowerScanBuilder(rows, partitions)
}

private[graft] class ShowerScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = ShowerEventsSource.schema
  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("event_id", v: Long) => lo = math.max(lo, v); true
      // v+1 on Long.MaxValue would wrap negative and silently corrupt the
      // range — reject the boundary cases and let Spark evaluate them
      case GreaterThan("event_id", v: Long) if v < Long.MaxValue =>
        lo = math.max(lo, v + 1); true
      case LessThan("event_id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("event_id", v: Long) if v < Long.MaxValue =>
        hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ShowerScan(required, math.min(lo, hi), hi, partitions)
}

private[graft] case class ShowerRange(start: Long, end: Long) extends InputPartition

/** Offset = how many ids have been emitted (monotone, JSON = the number). */
private[sources] case class IdOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private[graft] class ShowerScan(required: StructType, lo: Long, hi: Long, partitions: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    ShowerScan.split(lo, hi, partitions)
  override def createReaderFactory(): PartitionReaderFactory =
    new ShowerReaderFactory(required)

  /** Streaming read: the id space is the offset axis — each micro-batch
    * covers (start, end] ids with the same partitioned readers as the batch
    * path. All remaining ids are "available", so Trigger.AvailableNow
    * drains the source in one batch and stops — the batch/stream parity
    * harness shape.
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      override def initialOffset(): Offset = IdOffset(lo)
      override def latestOffset(): Offset = IdOffset(hi)
      override def deserializeOffset(json: String): Offset = IdOffset(json.toLong)
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        ShowerScan.split(start.asInstanceOf[IdOffset].v, end.asInstanceOf[IdOffset].v,
          partitions)
      override def createReaderFactory(): PartitionReaderFactory =
        new ShowerReaderFactory(required)
    }
}

private[graft] object ShowerScan {
  def split(lo: Long, hi: Long, partitions: Int): Array[InputPartition] = {
    val total = math.max(0L, hi - lo)
    val per = math.max(1L, (total + partitions - 1) / partitions)
    (lo until hi by per).map(s => ShowerRange(s, math.min(s + per, hi)))
      .toArray[InputPartition]
  }
}

private[sources] class ShowerReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[ShowerRange]
    new PartitionReader[InternalRow] {
      private var id = r.start - 1
      private val fields = required.fieldNames
      override def next(): Boolean = { id += 1; id < r.end }
      override def get(): InternalRow = {
        val values = fields.map {
          case "event_id" => java.lang.Long.valueOf(id)
          case "clazz"    => java.lang.Integer.valueOf(ShowerEventsSource.clazzOf(id))
          case "log_e"    => java.lang.Double.valueOf(ShowerEventsSource.logEOf(id))
          case "theta"    => java.lang.Double.valueOf(ShowerEventsSource.thetaOf(id))
          case "p"        => java.lang.Double.valueOf(ShowerEventsSource.pOf(id))
        }
        new GenericInternalRow(values.toArray[Any])
      }
      override def close(): Unit = ()
    }
  }
}
