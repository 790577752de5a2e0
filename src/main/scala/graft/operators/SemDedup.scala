package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Tensors

/** SemDeDup-style semantic deduplication (Abbas et al., arXiv:2303.09540):
  * cluster the embedding space with k-means, then inside each cluster drop
  * every vector that has a higher-priority cluster-mate (lower id) with
  * cosine similarity ≥ tau. Keeps exactly one representative per semantic
  * duplicate neighborhood — the embedding twin of the text dedup pipeline
  * (q115), as one composable operator.
  *
  * Scale shape: the corpus never self-joins globally — candidate pairs are
  * an equi-join on the cluster id (one shuffle of each side), so pairwise
  * work is bounded by the largest cluster, which the caller controls via k
  * (at 100 TB pick k ≈ N / target-cell-size, exactly how SemDeDup runs on
  * LAION). The keep rule is one-hop dominance (no iteration to converge, no
  * connected components): deterministic because priority is the total order
  * of ids. Determinism of the clustering itself comes from [[KMeans.fit]]
  * (first-k-by-id seeds, rounded-distance argmin ties to the lowest cell,
  * 1e-9-grid centroid snapping).
  */
object SemDedup {

  /** @return one row per input vector: (vec_id, cluster, keep) — `keep` is
    *         false iff a lower-id cluster-mate has cos ≥ tau (cosines
    *         compared on the 1e-6 round grid like the whole similarity
    *         family, so libm last-ulp noise can't flip a keep decision).
    */
  def mark(emb: DataFrame, idCol: String, embCol: String, dim: Int,
           k: Int, iters: Int, tau: Double): DataFrame = {
    val (assigned, _) = KMeans.fit(emb, idCol, embCol, dim, k, iters)
    val v = emb.select(col(idCol).as("vec_id"),
        col(embCol).cast("array<double>").as("x"))
      .join(assigned, "vec_id")
      .select(col("vec_id"), col("cluster"), col("x"),
        Tensors.norm(col("x")).as("nrm"))
    val dominated = v.as("a").join(v.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .where(round(Tensors.dot(col("a.x"), col("b.x"))
        / (col("a.nrm") * col("b.nrm")), 6) >= tau)
      .select(col("b.vec_id").as("vec_id")).distinct()
    v.join(dominated.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("dup").isNull.as("keep"))
  }
}
