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

  /** Exactly `rounds` min-label propagation rounds with NO convergence test
    * — the benchmark surface behind ScaleProbe's iterative-graph shape. The
    * convergence-tested [[connectedComponents]] stops when labels stabilize,
    * so its wall clock confounds per-round cost with round count and
    * scheduler noise; pinning the round count makes the timed work exactly
    * `rounds` × O(E) at every scale multiplier, so the observed exponent
    * isolates the per-round shuffle cost the fused aggregates claim.
    * Labels after k rounds = minimum id reachable within k hops (correct
    * CC labels only if k ≥ diameter — this is a probe, not the operator).
    */
  def propagateRounds(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      rounds: Int): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .repartition(col("src")).localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    for (_ <- 0 until rounds) {
      val offers = sym
        .join(labels.withColumnRenamed("id", "src_id"), col("src") === col("src_id"))
        .groupBy(col("dst").as("id"))
        .agg(min("comp").as("offer"))
      labels = labels
        .join(offers, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("offer"), col("comp"))).as("comp"))
        .localCheckpoint()
    }
    labels
  }

  /** Large-star/small-star connected components (Kiveris et al., "Connected
    * Components in MapReduce and Beyond") — the high-diameter /
    * giant-component escape hatch next to [[connectedComponents]]'s plain
    * propagation. Same contract: (id, comp) with comp = minimum reachable
    * vertex id, one row per vertex appearing in ≥1 edge.
    *
    * Why it exists: min-label propagation needs O(diameter) rounds — fine
    * for dedup graphs (unions of small quasi-cliques), pathological for
    * long chains or web-scale giants. LS/SS alternates two neighborhood
    * rewrites that provably converge in O(log n) rounds and bound per-round
    * skew: each round is a groupBy-min plus a re-join, the same O(E) shuffle
    * shape. Each round's edge set is deduplicated, so intermediate growth is
    * capped at the star-forest size.
    */
  def largeStarSmallStar(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 40): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val init = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .localCheckpoint()
    // the vertex universe is fixed at the start: self-loop-only vertices
    // would otherwise vanish when self-edges drop out of the star rewrites
    val verts = init.select(col("a").as("id"))
      .union(init.select(col("b").as("id"))).distinct().localCheckpoint()

    // large-star: every strictly-larger neighbor of u links to
    // m(u) = min(N(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val m = sym.groupBy("a").agg(least(min(col("b")), col("a")).as("m"))
      sym.join(m, "a").where(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
    }

    // small-star: orient (hi ← lo); every ≤-neighbor of h (and h itself)
    // links to m(h) = min of the lo-neighborhood
    def smallStar(e: DataFrame): DataFrame = {
      val hl = e.select(greatest(col("a"), col("b")).as("h"),
        least(col("a"), col("b")).as("l"))
      val m = hl.groupBy("h").agg(min(col("l")).as("m"))
      hl.join(m, "h")
        .select(col("l").as("a"), col("m").as("b"))
        .union(m.select(col("h").as("a"), col("m").as("b")))
        .where(col("a") =!= col("b"))
    }

    // Fixpoint detection rides the checkpoint materialization via observe(),
    // like connectedComponents' change count: each round's edge set is
    // distinct and canonically oriented (a > b), so (count, XOR xxhash64(a,b))
    // is an order-insensitive set signature collected for free DURING the
    // checkpoint job (bit_xor, not sum: commutative AND overflow-free under
    // ANSI mode). Signature equality triggers ONE confirming anti-join
    // (|next| = |e| plus next∖e = ∅ ⇒ set equality) — so the exact check
    // runs once at convergence instead of two O(E) shuffle-scan jobs every
    // round, which on a giant graph was the dominant non-rewrite cost.
    def checkpointWithSig(df: DataFrame, name: String): (DataFrame, Long, Long) = {
      val obs = org.apache.spark.sql.Observation(name)
      val out = df.observe(obs, count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L)).as("h"))
        .localCheckpoint()
      (out, obs.get("n").asInstanceOf[Long], obs.get("h").asInstanceOf[Long])
    }

    var (e, eN, eH) = checkpointWithSig(
      init.where(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
        .distinct(),
      "lsss_init")
    var iter = 0
    var converged = eN == 0
    while (!converged && iter < maxIter) {
      val (next, nN, nH) = checkpointWithSig(
        smallStar(largeStar(e).distinct()).distinct(), s"lsss_round_$iter")
      converged = nN == eN && nH == eH && next.exceptAll(e).isEmpty
      e = next; eN = nN; eH = nH
      iter += 1
    }
    if (!converged && iter >= maxIter) throw new IllegalStateException(
      s"largeStarSmallStar did not converge in $maxIter rounds")
    // fixpoint edges are (v, root); roots label themselves, and vertices
    // whose edges were all self-loops fall back to their own id
    val starLabels = e.select(col("a").as("id"), col("b").as("comp"))
      .union(e.select(col("b").as("id"), col("b").as("comp")))
      .groupBy("id").agg(min("comp").as("comp"))
    verts.join(starLabels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }
}
