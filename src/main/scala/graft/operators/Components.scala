package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge relation — the clustering
  * step of a near-duplicate dedup pipeline (LSH/embedding pairs → clusters →
  * keep one representative per cluster).
  *
  * Algorithm: iterative min-label propagation. Every vertex starts labeled
  * with its own id; each round every vertex takes the minimum label among
  * itself and its neighbors; fixpoint = components labeled by their minimum
  * vertex id. This is the standard dataflow CC formulation (HashToMin /
  * Pregel-style), driver-coordinated like SURVEY §7.4's iterative-LR note —
  * each round is one shuffle join + one aggregation, O(E) per round,
  * converging in O(diameter) rounds (near-dup graphs are unions of small
  * quasi-cliques, so diameter is small in practice).
  *
  * Scale notes (100 TB):
  *   - `localCheckpoint` after each round truncates the exponentially-growing
  *     lineage — without it round k replays all rounds < k.
  *   - the symmetric edge list is repartitioned on `src` BEFORE its one-time
  *     checkpoint (localCheckpoint preserves hash partitioning), so every
  *     round's gather join reuses that layout instead of re-shuffling O(E).
  *   - the convergence signal rides the checkpoint materialization job via
  *     `observe()` metrics — no separate count job per round.
  *   - for graphs with giant high-degree components the large-star/small-star
  *     variant (Kiveris et al., "Connected Components in MapReduce") bounds
  *     the per-round skew; plain propagation is the right default for dedup
  *     graphs, whose components are tiny and numerous.
  */
object Components {

  /** @return one row per vertex that appears in ≥1 edge: (id, component),
    *         component = minimum vertex id reachable from `id`.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .repartition(col("src")).localCheckpoint()

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // gather: best label any neighbor can offer each vertex
      val offers = sym
        .join(labels.withColumnRenamed("id", "src_id"), col("src") === col("src_id"))
        .groupBy(col("dst").as("id"))
        .agg(min("comp").as("offer"))
      // the convergence count piggybacks on the checkpoint's materialization
      // job via observe() — metrics are collected DURING that job, so no
      // separate count action scans the round's output again
      val obs = org.apache.spark.sql.Observation(s"cc_round_$iter")
      val next = labels
        .join(offers, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("offer"), col("comp"))).as("comp"),
          (coalesce(col("offer"), col("comp")) < col("comp")).as("chg"))
        .observe(obs, coalesce(sum(when(col("chg"), 1L).otherwise(0L)), lit(0L))
          .as("changed"))
        .localCheckpoint()
      changed = obs.get("changed").asInstanceOf[Long]
      labels = next.select("id", "comp")
      iter += 1
    }
    // fail loudly rather than return intermediate labels: a graph whose
    // diameter exceeds maxIter would otherwise silently violate the
    // "component = minimum reachable id" contract
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still changing) — raise maxIter")
    labels
  }
}
