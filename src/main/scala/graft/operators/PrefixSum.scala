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
  * released eagerly once the first job materializing the emit RDD completes
  * ([[ScaleZip.releaseAfterJobWith]]); the runner's clearCache lifecycle
  * remains the backstop.
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
    * @param numPartitions range-partition fan-out; each task sums ~N/P
    *                  rows. 0 (the default) derives it from the session's
    *                  shuffle fan-out / the input's partition count
    *                  ([[ScaleZip.fanout]]) — the result is
    *                  partition-count independent either way
    */
  def cumsum(df: DataFrame, order: Seq[Column], valueCol: String,
             inclusive: Boolean, sumName: String,
             rnName: Option[String] = None,
             numPartitions: Int = 0): DataFrame =
    cumsumN(df, order, Seq(valueCol -> sumName), inclusive, rnName,
      numPartitions)

  /** [[cumsum]] for SEVERAL value columns over ONE total order in one
    * shuffle + one census — the AUC/ROC shape (cumulative TP and FP walk
    * the same score order) would otherwise pay the range partition twice.
    *
    * @param valueCols (value column → appended running-sum name) pairs;
    *                  every value column must be non-null LongType
    */
  def cumsumN(df: DataFrame, order: Seq[Column],
              valueCols: Seq[(String, String)], inclusive: Boolean,
              rnName: Option[String] = None,
              numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    require(valueCols.nonEmpty, "PrefixSum.cumsumN needs a value column")
    valueCols.foreach { case (v, _) =>
      require(df.schema(v).dataType == LongType,
        s"PrefixSum needs LongType value columns; " +
          s"$v is ${df.schema(v).dataType.catalogString}")
    }
    val k = valueCols.size
    val sorted = df.repartitionByRange(ScaleZip.fanout(df, numPartitions),
        order: _*)
      .sortWithinPartitions(order: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vIdx = valueCols.map { case (v, _) => sorted.schema.fieldIndex(v) }
      .toArray
    // census: P (rows, totals[k]) tuples to the driver — the only global
    // state
    val census = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var rows = 0L
      val tot = new Array[Long](k)
      it.foreach { r =>
        rows += 1L
        var j = 0
        while (j < k) { tot(j) += r.getLong(vIdx(j)); j += 1 }
      }
      Iterator((pid, rows, tot))
    }.collect().sortBy(_._1)
    val nParts = sorted.rdd.getNumPartitions
    val rowOff = new Array[Long](nParts)
    val sumOff = Array.ofDim[Long](nParts, k)
    census.foreach { case (pid, rows, tot) =>
      if (pid + 1 < nParts) {
        rowOff(pid + 1) = rows
        Array.copy(tot, 0, sumOff(pid + 1), 0, k)
      }
    }
    var i = 1
    while (i < nParts) {
      rowOff(i) += rowOff(i - 1)
      var j = 0
      while (j < k) { sumOff(i)(j) += sumOff(i - 1)(j); j += 1 }
      i += 1
    }
    val schema0 = valueCols.foldLeft(sorted.schema) { case (sc, (_, n)) =>
      sc.add(n, LongType, nullable = false)
    }
    val schema = rnName.fold(schema0)(schema0.add(_, LongType, nullable = false))
    val bRow = spark.sparkContext.broadcast(rowOff)
    val bSum = spark.sparkContext.broadcast(sumOff)
    val withRn = rnName.isDefined
    val out = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val run = bSum.value(pid).clone()
      var rn = bRow.value(pid)
      it.map { r =>
        rn += 1L
        val sums = new Array[Any](k)
        var j = 0
        while (j < k) {
          val v = r.getLong(vIdx(j))
          sums(j) = if (inclusive) run(j) + v else run(j)
          run(j) += v
          j += 1
        }
        if (withRn) Row.fromSeq(r.toSeq ++ sums :+ rn)
        else Row.fromSeq(r.toSeq ++ sums)
      }
    }
    ScaleZip.releaseAfterJobWith(sorted, out.id)
    spark.createDataFrame(out, schema)
  }
}
