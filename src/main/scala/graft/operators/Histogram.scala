package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-width histogram with dense-bin completion (SURVEY §2 row 41;
  * reference `np.histogram(p, bins=10000, range=(0,1))`,
  * train_classification.py:295-299).
  *
  * Shape at scale: the groupBy(bin) shuffles only `bins` distinct keys with
  * map-side partial aggregation, so shuffle volume is O(bins × partitions)
  * regardless of input rows. Dense completion joins against a generated
  * `spark.range(bins)` frame — tiny, so Catalyst broadcasts it.
  */
object Histogram {

  /** floor(x·bins) clamped to [0, bins-1] over domain [0,1). */
  def binOf(x: Column, bins: Int): Column =
    least(greatest(floor(x * bins).cast("long"), lit(0L)), lit(bins - 1L))

  /** Dense per-bin conditional counts of a [0,1)-valued column, one count per
    * named predicate. Missing bins filled with 0.
    */
  def conditionalHistogram(
      scored: DataFrame,
      p: Column,
      bins: Int,
      classes: Seq[(String, Column)]): DataFrame = {
    val aggs = classes.map { case (n, c) => count(when(c, 1)).as(n) }
    val counts = scored
      .groupBy(binOf(p, bins).as("bin"))
      .agg(aggs.head, aggs.tail: _*)
    val dense = scored.sparkSession.range(0, bins).toDF("bin")
    dense
      .join(counts, Seq("bin"), "left")
      .select(
        col("bin") +: classes.map { case (n, _) => coalesce(col(n), lit(0L)).as(n) }: _*)
  }
}
