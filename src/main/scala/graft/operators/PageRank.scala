package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank as pure relational dataflow — the second iterative graph
  * operator next to [[Components]] (driver-coordinated rounds, each round
  * one edge⋈rank join + one hash aggregate; standard Pregel-style message
  * passing in DataFrame form).
  *
  * Determinism across engines: per-edge contributions are quantized to
  * integer 1e-12 units BEFORE the incoming-sum, so the aggregation is exact
  * integer arithmetic — float addition order (Spark partial/merge vs an
  * oracle's sequential scan) cannot perturb ranks. Ranks re-quantize to a
  * 1e-9 grid per round. Same playbook as the k-means centroid grid and the
  * cents sums (OPERATORS.md determinism rules).
  *
  * Scale: ranks/degrees are O(V) relations partitioned by vertex id; each
  * round shuffles O(E) messages on dst — identical cost shape to one
  * groupBy over the edge list. `localCheckpoint` cuts per-round lineage
  * (HDFS checkpoint at cluster scale).
  */
object PageRank {

  /** @param edges directed edge relation with `src` and `dst` columns
    * @return (id, r) after `iters` rounds of damped PageRank, uniform init
    */
  def pagerank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    val v = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val nDF = broadcast(v.agg(count(lit(1)).as("n")))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint()

    var ranks = v.crossJoin(nDF).select(col("id"), (lit(1.0) / col("n")).as("r"))
    for (_ <- 0 until iters) {
      // dangling vertices (no out-edges) would leak their mass each round —
      // standard damped PageRank redistributes it uniformly; quantized to
      // the same integer 1e-12 units as the edge messages
      val dangling = broadcast(ranks
        .join(deg.select(col("src").as("id")), Seq("id"), "left_anti")
        .agg(coalesce(sum(round(col("r") * 1e12, 0).cast("long")), lit(0L)).as("dm")))
      val msgs = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(round(col("r") / col("outdeg") * 1e12, 0).cast("long")).as("m"))
      ranks = v.crossJoin(nDF).crossJoin(dangling)
        .join(msgs, Seq("id"), "left")
        .select(col("id"),
          round(lit(1.0 - damping) / col("n")
            + lit(damping) * (coalesce(col("m"), lit(0L)) / lit(1e12)
              + (col("dm") / lit(1e12)) / col("n")), 9).as("r"))
        .localCheckpoint()
    }
    ranks
  }
}
