package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Distributed running sum over a total order — the scalable replacement
  * for a partition-less `sum(x).over(Window.orderBy(...))`.
  *
  * A cumulative sum ordered by a global key (a document's token offset in
  * the corpus stream, an SPRT log-likelihood walk over the event log) is an
  * associative prefix sum, and the naive window form funnels the ENTIRE
  * relation through one task — fine for k-sized statistics, an anti-pattern
  * for row-scale relations (10⁹–10¹⁰ docs/events at 100 TB). The standard
  * two-pass shape, the [[GlobalRank]] discipline applied to sums:
  *
  *   1. range-partition by the sort key and sort within partitions — every
  *      partition holds a contiguous, sorted slice of the global order;
  *   2. census each partition (per-partition row count AND value total — one
  *      tiny job), prefix-sum the P totals into per-partition offsets on the
  *      driver;
  *   3. stream each partition once, emitting offset + local running sum
  *      (and, when asked, offset + local position as the row number).
  *
  * Because integer addition is associative and the order is total (the
  * caller must end `order` in a unique key), the result is bit-identical to
  * the single-task window for ANY partition count — which is why callers'
  * oracles keep stating plain `sum(x) OVER (ORDER BY ...)`: same function,
  * different (scalable) evaluation strategy.
  *
  * The sorted relation is persisted before the census so the census job and
  * the emit job read the SAME range boundaries (range partitioning samples
  * its bounds; two independent recomputations could disagree). The cache is
  * released by the runner's clearCache lifecycle like every other persisted
  * intermediate.
  */
object PrefixSum {

  /** Append a running sum of `valueCol` (and optionally a 1-based row
    * number) over the total order `order`.
    *
    * @param order     total order (MUST end in a unique key — ties would
    *                  make the running sum partition-dependent)
    * @param valueCol  non-null LongType column to sum
    * @param inclusive true → sum includes the current row
    *                  (`ROWS UNBOUNDED PRECEDING AND CURRENT ROW`);
    *                  false → exclusive (`... AND 1 PRECEDING`, 0 for the
    *                  first row)
    * @param sumName   appended LongType running-sum column
    * @param rnName    when Some, also append a 1-based LongType row number
    *                  over the same order (the `row_number()` twin rides
    *                  the census already paid for)
    * @param numPartitions range-partition fan-out; each task sums ~N/P rows
    */
  def cumsum(df: DataFrame, order: Seq[Column], valueCol: String,
             inclusive: Boolean, sumName: String,
             rnName: Option[String] = None,
             numPartitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(valueCol).dataType == LongType,
      s"PrefixSum.cumsum needs a LongType value column; " +
        s"$valueCol is ${df.schema(valueCol).dataType.catalogString}")
    val sorted = df.repartitionByRange(numPartitions, order: _*)
      .sortWithinPartitions(order: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    // census: P (rows, total) pairs to the driver — the only global state
    val census = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var rows = 0L
      var tot = 0L
      it.foreach { r => rows += 1L; tot += r.getLong(vIdx) }
      Iterator((pid, rows, tot))
    }.collect().sortBy(_._1)
    val nParts = sorted.rdd.getNumPartitions
    val rowOff = new Array[Long](nParts)
    val sumOff = new Array[Long](nParts)
    census.foreach { case (pid, rows, tot) =>
      if (pid + 1 < nParts) {
        rowOff(pid + 1) = rows
        sumOff(pid + 1) = tot
      }
    }
    var i = 1
    while (i < nParts) {
      rowOff(i) += rowOff(i - 1); sumOff(i) += sumOff(i - 1); i += 1
    }
    val schema0 = sorted.schema.add(sumName, LongType, nullable = false)
    val schema = rnName.fold(schema0)(schema0.add(_, LongType, nullable = false))
    val bRow = spark.sparkContext.broadcast(rowOff)
    val bSum = spark.sparkContext.broadcast(sumOff)
    val withRn = rnName.isDefined
    val out = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bSum.value(pid)
      var rn = bRow.value(pid)
      it.map { r =>
        val v = r.getLong(vIdx)
        rn += 1L
        val s = if (inclusive) run + v else run
        val row =
          if (withRn) Row.fromSeq(r.toSeq :+ s :+ rn)
          else Row.fromSeq(r.toSeq :+ s)
        run += v
        row
      }
    }
    spark.createDataFrame(out, schema)
  }
}
