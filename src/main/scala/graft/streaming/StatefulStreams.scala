package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** The arbitrary-stateful surface Spark 4 added AFTER mapGroupsWithState:
  * `KeyValueGroupedDataset.transformWithState` with a [[StatefulProcessor]] —
  * typed per-key state variables (value/list/map), timers, and TTL, running
  * on the RocksDB state store. This module holds the processors; queries
  * drive them through the AvailableNow-inside-the-query harness and pin
  * their results to batch recomputations (stream ≡ batch is statable here
  * because the maintained state is exact integers under commutative,
  * arrival-order-insensitive updates).
  */
object StatefulStreams {

  /** transformWithState needs the RocksDB provider; the HDFS-backed default
    * store does not implement state variables.
    */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Per-key running (event count, max value) as a single ValueState —
    * count is commutative and max is order-insensitive, so the final state
    * equals the batch aggregate under ANY micro-batch slicing (the
    * exactly-once witness the q236 query asserts). Emits the running state
    * every micro-batch (Update-mode semantics); the LAST emission per key
    * is the final state, recoverable downstream as max(n) since n is
    * monotone.
    */
  /** Per-key MAP state — one counter per event type, the state-variable
    * kind a session machine keeps per-category tallies in. Counts are
    * commutative integer adds, so the final map equals the batch
    * (key, category) aggregate under any micro-batch slicing. Emits the
    * full map each batch (Update semantics — counts are monotone, so the
    * max per (key, category) downstream IS the final map).
    */
  class CategoryCounts extends StatefulProcessor[Long, (Long, String), (Long, String, Long)] {
    @transient private var st: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
                                 tv: TimerValues): Iterator[(Long, String, Long)] = {
      rows.foreach { case (_, cat) =>
        val cur = if (st.containsKey(cat)) st.getValue(cat) else 0L
        st.updateValue(cat, cur + 1L)
      }
      st.iterator().map { case (cat, n) => (key, cat, n) }.toIndexedSeq.iterator
    }
  }

  class RunningMax extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
    @transient private var st: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("agg",
        Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                                 tv: TimerValues): Iterator[(Long, Long, Long)] = {
      var (n, mx) = if (st.exists()) st.get() else (0L, Long.MinValue)
      rows.foreach { case (_, c) =>
        n += 1
        if (c > mx) mx = c
      }
      st.update((n, mx))
      Iterator.single((key, n, mx))
    }
  }
}
