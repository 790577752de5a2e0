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
  * static (computed once), and the dangling MASS for round k is a scalar
  * over round k−1's ranks — so it rides an `observe()` on the previous
  * round's checkpoint materialization and enters round k as a folded
  * literal. That makes each round exactly ONE job (edge⋈rank join + hash
  * aggregate + rank rewrite, fused into the round checkpoint), where the
  * tagged-union formulation ran a separate aggregate checkpoint plus a
  * broadcast exchange per round. `localCheckpoint` cuts per-round lineage
  * (HDFS checkpoint at cluster scale).
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
    // the round — tag the vertex relation once and reuse it every iteration
    val vTag = v
      .join(deg.select(col("src").as("id"), lit(true).as("dang0")), Seq("id"), "left")
      .select(col("id"), col("dang0").isNull.as("dang"))
      .localCheckpoint()

    var ranks = vTag.crossJoin(nDF)
      .select(col("id"), col("dang"), (lit(1.0) / col("n")).as("r"))
    // round 0's dangling mass, in the same 1e-12 integer units every later
    // round's observe() emits — one O(V) job before the loop, never per round
    var dm = ranks.where(col("dang"))
      .agg(coalesce(sum(round(col("r") * 1e12, 0).cast("long")), lit(0L)))
      .head().getLong(0)
    for (_ <- 0 until iters) {
      // one fused job per round: per-edge messages quantized to integer
      // 1e-12 units (float addition order cannot perturb the sum), dangling
      // mass redistributed uniformly as the LITERAL observed on the previous
      // round's checkpoint; the new round's dangling mass is observed during
      // THIS checkpoint's materialization — no extra scan, no broadcast.
      val msgs = e
        .join(ranks.select(col("id").as("src"), col("r")), "src")
        .join(deg, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(round(col("r") / col("outdeg") * 1e12, 0).cast("long")).as("m"))
      val obs = org.apache.spark.sql.Observation()
      ranks = vTag.crossJoin(nDF)
        .join(msgs, Seq("id"), "left")
        .select(col("id"), col("dang"),
          round(lit(1.0 - damping) / col("n")
            + lit(damping) * (coalesce(col("m"), lit(0L)) / lit(1e12)
              + (lit(dm) / lit(1e12)) / col("n")), 9).as("r"))
        .observe(obs, coalesce(sum(when(col("dang"),
          round(col("r") * 1e12, 0).cast("long"))), lit(0L)).as("dm"))
        .localCheckpoint()
      dm = obs.get("dm").asInstanceOf[Long]
    }
    ranks.select("id", "r")
  }

  /** Personalized PageRank (random walk with restart): the teleport mass —
    * both the (1−d) restart and the dangling redistribution — lands on the
    * SEED set instead of uniformly, so ranks measure proximity TO the seeds
    * (the recommendation-expansion / related-items primitive). Same exact
    * integer-quantized message passing and per-round `observe()` dangling
    * census as [[pagerank]]; init is uniform over seeds (non-seeds start at
    * 0), and s(v) = 1/|S| replaces 1/n in both teleport terms.
    *
    * @param seeds one `id` column; must be a subset of the graph's vertices
    */
  def personalized(edges: DataFrame, seeds: DataFrame, iters: Int,
                   damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .repartition(col("src")).localCheckpoint()
    val v = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val sd = seeds.select(col("id").cast("long").as("id")).distinct()
    val nsDF = broadcast(sd.agg(count(lit(1)).as("ns")))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint()
    val vTag = v
      .join(deg.select(col("src").as("id"), lit(true).as("dang0")),
        Seq("id"), "left")
      .join(sd.select(col("id"), lit(true).as("seed0")), Seq("id"), "left")
      .select(col("id"), col("dang0").isNull.as("dang"),
        coalesce(col("seed0"), lit(false)).as("seed"))
      .localCheckpoint()

    var ranks = vTag.crossJoin(nsDF)
      .select(col("id"), col("dang"), col("seed"),
        when(col("seed"), lit(1.0) / col("ns")).otherwise(lit(0.0)).as("r"))
    var dm = ranks.where(col("dang"))
      .agg(coalesce(sum(round(col("r") * 1e12, 0).cast("long")), lit(0L)))
      .head().getLong(0)
    for (_ <- 0 until iters) {
      val msgs = e
        .join(ranks.select(col("id").as("src"), col("r")), "src")
        .join(deg, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(round(col("r") / col("outdeg") * 1e12, 0).cast("long")).as("m"))
      val obs = org.apache.spark.sql.Observation()
      val sv = when(col("seed"), lit(1.0) / col("ns")).otherwise(lit(0.0))
      ranks = vTag.crossJoin(nsDF)
        .join(msgs, Seq("id"), "left")
        .select(col("id"), col("dang"), col("seed"),
          round(lit(1.0 - damping) * sv
            + lit(damping) * (coalesce(col("m"), lit(0L)) / lit(1e12)
              + lit(dm) / lit(1e12) * sv), 9).as("r"))
        .observe(obs, coalesce(sum(when(col("dang"),
          round(col("r") * 1e12, 0).cast("long"))), lit(0L)).as("dm"))
        .localCheckpoint()
      dm = obs.get("dm").asInstanceOf[Long]
    }
    ranks.select("id", "r")
  }
}
