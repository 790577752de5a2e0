package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame

/** Shared plumbing for the range-partition + census + zip operators
  * ([[GlobalRank]], [[PrefixSum]]): fan-out derivation and eager release of
  * the persisted sorted intermediate.
  *
  * Fan-out: a literal partition count bakes a cluster size into the plan —
  * 32 range partitions over a 100 TB relation is ~3 TB per task. When the
  * caller doesn't pin one, derive it from the session's shuffle fan-out (the
  * knob every deployment already sizes to its cluster) or the input's own
  * partition count, whichever is larger. The zip operators are
  * partition-count independent by construction (total order + associative
  * combine — PrefixSumSpec proves it across partition counts), so the
  * derived fan-out is hash-neutral.
  *
  * Release: the sorted relation must stay persisted between the census job
  * and the emit job so both read the SAME range boundaries. Once the first
  * job that materializes the emit RDD completes, the cache is dead weight —
  * but the operator returns a LAZY frame, so it cannot unpersist inline
  * without defeating the cache. A one-shot listener watches for the first
  * job whose lineage contains the emit RDD and unpersists then. This bounds
  * within-query cache pressure (a nested zip chain frees each level as the
  * downstream action sweeps through it) instead of holding every level until
  * the runner's clearCache. If a later action re-reads the emit RDD, the
  * recompute is bit-identical: the range bounds live in the captured plan's
  * shuffle dependency (sampled once), assignment and sort are deterministic
  * functions of the total order.
  *
  * Deliberate trade: when the zip OUTPUT itself feeds a range partitioner
  * (a nested zip chain), the downstream exchange's bound-sampling pass is
  * the first job over the emit RDD, so the release fires before the main
  * shuffle re-reads it — that second read recomputes the emit from the
  * parent exchange's still-present shuffle files (one extra in-partition
  * sort; the map side is not redone, and determinism makes the recompute
  * bit-identical). Holding k row-scale caches to the end of the query
  * costs more at 100 TB than one re-sorted pass per nesting level.
  */
private[operators] object ScaleZip {

  /** `requested` > 0 pins the fan-out; 0 derives it from the session. */
  def fanout(df: DataFrame, requested: Int): Int =
    if (requested > 0) requested
    else math.max(
      df.sparkSession.sessionState.conf.numShufflePartitions,
      df.rdd.getNumPartitions)

  /** Unpersist `cached` after the first completed job whose stages contain
    * `emitRddId` in their lineage, then deregister the listener.
    */
  def releaseAfterJobWith(cached: DataFrame, emitRddId: Int): Unit = {
    val sc = cached.sparkSession.sparkContext
    val listener = new SparkListener {
      @volatile private var watched: Set[Int] = Set.empty
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (js.stageInfos.exists(_.rddInfos.exists(_.id == emitRddId)))
          watched += js.jobId
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (watched.contains(je.jobId)) {
          cached.unpersist(blocking = false)
          sc.removeSparkListener(this)
        }
    }
    sc.addSparkListener(listener)
  }
}
