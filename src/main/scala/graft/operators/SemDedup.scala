package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Hashes, Tensors}

/** SemDeDup-style semantic deduplication (Abbas et al., arXiv:2303.09540):
  * cluster the embedding space with k-means, then inside each cluster drop
  * every vector that has a higher-priority cluster-mate (lower id) with
  * cosine similarity ≥ tau. Keeps exactly one representative per semantic
  * duplicate neighborhood — the embedding twin of the text dedup pipeline
  * (q115), as one composable operator.
  *
  * Scale shape: the corpus never self-joins globally — candidate pairs are
  * an equi-join on (cluster, sub-cell), one shuffle of each side. k bounds
  * the EXPECTED cell size (at 100 TB pick k ≈ N / target-cell-size, exactly
  * how SemDeDup runs on LAION), but k-means on web embeddings produces
  * skewed cells — near-dup blobs are precisely where dedup matters — and an
  * uncapped hot cell puts B²/2 pairs on one task. So `cap` applies the same
  * skew guard as [[MinHash.nearDuplicatesCapped]], adapted to cells (the
  * SemDeDup paper's own cell-size control, §3): a cluster of size B is
  * deterministically split into ⌈B/cap⌉ sub-cells by a salted hash of the
  * vector id, and dominance applies within a sub-cell. Join work per task is
  * bounded at ~cap²/2; the hot cluster's sub-cells land on DIFFERENT tasks
  * (the join key is the pair, not the cluster), so the guard adds
  * parallelism instead of a per-cluster sort. The census that sizes each
  * cluster is k rows — broadcast back, no extra exchange on the data path.
  * The price, as with the LSH cap, is declared: duplicates split across
  * sub-cells of an over-capped cluster are not compared — acceptable
  * because a cluster only exceeds `cap` when it is duplicate-dense, and a
  * hash-random 1/⌈B/cap⌉ co-cell rate still catches members of any
  * neighborhood that is a nontrivial fraction of the cell.
  *
  * The keep rule is one-hop dominance (no iteration to converge, no
  * connected components): deterministic because priority is the total order
  * of ids. Determinism of the clustering itself comes from [[KMeans.fit]]
  * (first-k-by-id seeds, rounded-distance argmin ties to the lowest cell,
  * 1e-9-grid centroid snapping); of the sub-cell split from
  * [[Hashes.mulHash]] — both replayable in plain SQL, so the q120 oracle
  * states cap semantics explicitly.
  */
object SemDedup {

  /** Salt for the sub-cell hash — fixed so the oracle can state it. */
  val SubSalt = 91L

  /** @param cap max cluster population compared pairwise; clusters above it
    *            split into ⌈size/cap⌉ hash sub-cells (default: no split).
    * @return one row per input vector: (vec_id, cluster, keep) — `keep` is
    *         false iff a lower-id sub-cell-mate has cos ≥ tau (cosines
    *         compared on the 1e-6 round grid like the whole similarity
    *         family, so libm last-ulp noise can't flip a keep decision).
    */
  def mark(emb: DataFrame, idCol: String, embCol: String, dim: Int,
           k: Int, iters: Int, tau: Double,
           cap: Int = Int.MaxValue): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val (assigned, _) = KMeans.fit(emb, idCol, embCol, dim, k, iters)
    val base = emb.select(col(idCol).as("vec_id"),
        col(embCol).cast("array<double>").as("x"))
      .join(assigned, "vec_id")
      .select(col("vec_id"), col("cluster"), col("x"),
        Tensors.norm(col("x")).as("nrm"))
    // census → sub-cell: k rows broadcast back; ⌈csize/cap⌉ in exact integer
    // arithmetic (`div`), sub = mulHash(id) mod nsub — all oracle-statable.
    val sizes = base.groupBy("cluster").agg(count(lit(1)).as("csize"))
    val v = base.join(broadcast(sizes), "cluster")
      .withColumn("nsub", expr(s"(csize + ${cap - 1L}) div ${cap.toLong}"))
      .withColumn("sub", Hashes.mulHash(col("vec_id"), SubSalt) % col("nsub"))
    val dominated = v.as("a").join(v.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.sub") === col("b.sub") &&
          col("a.vec_id") < col("b.vec_id"))
      .where(round(Tensors.dot(col("a.x"), col("b.x"))
        / (col("a.nrm") * col("b.nrm")), 6) >= tau)
      .select(col("b.vec_id").as("vec_id")).distinct()
    base.join(dominated.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("dup").isNull.as("keep"))
  }
}
