package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Distributed dense global rank over a total order — the scalable
  * replacement for a partition-less `row_number()` window.
  *
  * A global rank like "vocabulary id = position in (count DESC, token)
  * order" is a total-order zip, and the naive `row_number().over(
  * Window.orderBy(...))` funnels the ENTIRE relation through one task —
  * fine for k-sized stats tables, an anti-pattern for unbounded-cardinality
  * relations (a web-corpus vocabulary is 10⁷–10⁸ token types). The
  * standard two-stage shape instead:
  *
  *   1. range-partition by the sort key and sort within partitions — every
  *      partition holds a contiguous, sorted slice of the global order;
  *   2. census each partition (one tiny count job), prefix-sum the counts
  *      into per-partition offsets on the driver (P numbers);
  *   3. stream each partition once, assigning offset + local position.
  *
  * Steps 2–3 are exactly `RDD.zipWithIndex` over the sorted relation. The
  * result is IDENTICAL to the single-task window for any partition count —
  * the order is total (caller must include a unique tie-break column), so
  * partition boundaries cannot move any row's rank — which is why the q116
  * oracle keeps stating plain `row_number() OVER (ORDER BY ...)`: same
  * function, different (scalable) evaluation strategy.
  *
  * The sorted relation is persisted before zipping so the census job and
  * the emit job read the SAME range boundaries (range partitioning samples
  * its bounds; two independent recomputations could disagree). The cache is
  * released by the runner's clearCache lifecycle like every other persisted
  * intermediate.
  */
object GlobalRank {

  /** @param order total order (MUST end in a unique key — ties would make
    *              ranks partition-dependent)
    * @param numPartitions range-partition fan-out; each task ranks ~N/P rows
    * @param idName appended LongType column: 0-based dense global rank
    */
  def zipWithRank(df: DataFrame, order: Seq[Column], numPartitions: Int,
                  idName: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(numPartitions, order: _*)
      .sortWithinPartitions(order: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val schema = sorted.schema.add(idName, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed, schema)
  }
}
