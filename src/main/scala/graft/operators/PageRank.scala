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
  * groupBy over the edge list. The edge relation is repartitioned on `src`
  * BEFORE its lineage-cutting checkpoint (localCheckpoint preserves the
  * hash partitioning), so every round's edge⋈rank join reuses one layout
  * instead of re-shuffling O(E) per round. The dangling-vertex id set is
  * static — computed once, not re-derived per round — and the dangling
  * mass rides the SAME fused aggregate as the edge messages (tagged rows,
  * one O(E+V) job) instead of a separate anti-join job per round.
  * `localCheckpoint` cuts per-round lineage (HDFS checkpoint at cluster
  * scale).
  */
object PageRank {

  /** @param edges directed edge relation with `src` and `dst` columns
    * @return (id, r) after `iters` rounds of damped PageRank, uniform init
    */
  def pagerank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .repartition(col("src")).localCheckpoint()
    val v = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val nDF = broadcast(v.agg(count(lit(1)).as("n")))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint()
    // dangling vertices (no out-edges) are a property of the GRAPH, not of
    // the round — derive the set once and reuse it every iteration
    val dangIds = v.join(deg.select(col("src").as("id")), Seq("id"), "left_anti")
      .localCheckpoint()

    var ranks = v.crossJoin(nDF).select(col("id"), (lit(1.0) / col("n")).as("r"))
    for (_ <- 0 until iters) {
      // fused round aggregate: per-edge messages keyed by dst PLUS the
      // dangling-vertex masses, distinguished by a tag column (no sentinel
      // id that could collide with real vertex ids) — one O(E+V) aggregate
      // job where the previous formulation ran a separate anti-join +
      // aggregate job per round. Dangling mass is redistributed uniformly
      // (standard damped PageRank), quantized to the same 1e-12 units.
      val contrib = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("id"), lit(false).as("dang"),
          round(col("r") / col("outdeg") * 1e12, 0).cast("long").as("m"))
        .union(dangIds.join(ranks, "id")
          .select(col("id"), lit(true).as("dang"),
            round(col("r") * 1e12, 0).cast("long").as("m")))
      val agg = contrib.groupBy("id", "dang").agg(sum("m").as("m"))
        .localCheckpoint()
      val dm = broadcast(agg.where(col("dang"))
        .agg(coalesce(sum(col("m")), lit(0L)).as("dm")))
      ranks = v.crossJoin(nDF).crossJoin(dm)
        .join(agg.where(!col("dang")).select(col("id"), col("m")), Seq("id"), "left")
        .select(col("id"),
          round(lit(1.0 - damping) / col("n")
            + lit(damping) * (coalesce(col("m"), lit(0L)) / lit(1e12)
              + (col("dm") / lit(1e12)) / col("n")), 9).as("r"))
        .localCheckpoint()
    }
    ranks
  }
}
