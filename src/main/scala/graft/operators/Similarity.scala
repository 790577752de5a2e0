package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Tensors

/** Approximate-nearest-neighbor search over an embedding column (north-star
  * similarity family).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus; one narrow map + per-query window. The 100 TB
  *    shape: corpus scan parallelizes, queries broadcast, no corpus shuffle;
  *    the top-k window partitions by query id.
  *  - [[lshBucket]] + [[bucketedTopK]]: random-hyperplane LSH — each vector
  *    gets a small integer bucket from the sign pattern of dot products with
  *    deterministic integer hyperplanes; candidates are bucket-mates only.
  *    At scale this turns the O(N·Q) scan into a bucket-equi-join, and the
  *    bucket histogram is the skew diagnostic.
  *
  * Ranking floats across engines: order by `round(cos, 6)` with id tie-break,
  * so last-ulp libm differences can't flip ranks (SURVEY §7.4.3).
  */
object Similarity {

  /** Deterministic integer hyperplane j over `dim` dimensions:
    * plane_j[d] = ((j·131 + d·31 + 7) mod 17) − 8 ∈ [−8, 8].
    */
  def plane(j: Int, dim: Int): Seq[Int] =
    (0 until dim).map(d => ((j * 131 + d * 31 + 7) % 17) - 8)

  /** Sign-pattern LSH bucket from `nPlanes` hyperplanes. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { j =>
      val dot = aggregate(
        zip_with(vec, lit(plane(j, dim).toArray), (x, p) => x.cast("double") * p),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduceLeft(_ + _)

  def lshBucketSql(vec: String, dim: Int, nPlanes: Int): String =
    (0 until nPlanes).map { j =>
      val planeList = plane(j, dim).mkString("[", ", ", "]")
      s"""CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |  list_transform(range(1, ${dim + 1}),
         |    d -> CAST($vec[d] AS DOUBLE) * ($planeList)[d])),
         |  (a, b) -> a + b) > 0 THEN ${1L << j} ELSE 0 END""".stripMargin
    }.mkString("(", " + ", ")")

  /** Shared ranking tail: candidates (query_id, qv, qn) × (neighbor_id, nv,
    * nn) → rounded-cosine top-k with (cos DESC, neighbor_id) determinism.
    * Norms are precomputed per vector (not per pair); cos = dot/(qn·nn) keeps
    * the exact expression shape the oracle uses.
    */
  private def rankTopK(candidates: DataFrame, k: Int): DataFrame = {
    val scored = candidates
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Tensors.dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6).as("cos"))
      // zero-norm vectors yield null cos (x/0 → null) and NaN elements yield
      // NaN cos, which Spark sorts ABOVE every real value under DESC — both
      // would corrupt the top-k, so undefined similarities are excluded
      .where(col("cos").isNotNull && !isnan(col("cos")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Exact cosine top-k: for each row of `queries`, the k nearest rows of
    * `corpus` (excluding self), ranked by rounded cosine then id.
    *
    * The query side is explicitly `broadcast()`: the exact baseline is only
    * ever run with a bounded query set, and the hint keeps the plan a
    * BroadcastNestedLoopJoin streaming the corpus once — without it, AQE-off
    * configurations could fall back to a cartesian product that shuffles the
    * corpus (PlanSpec asserts the broadcast survives).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    rankTopK(
      broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          Tensors.norm(col("embedding")).as("qn")))
        .crossJoin(corpus.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("nv"), Tensors.norm(col("embedding")).as("nn"))),
      k)

  /** FAISS-style IVF with LEARNED cells and multi-probe: k-means centroids
    * (operators/KMeans, deterministic seeds) instead of [[ivfTopK]]'s
    * per-label cells, and each query searches its `nprobe` nearest cells
    * instead of one — the two knobs that actually move ANN recall (q200
    * measures the per-label single-probe variant at 18% mean recall@10;
    * q201 grades this one on the identical harness). Scale shape is
    * unchanged: the centroid table is O(cells) and broadcast twice (fit
    * assignment + query probing), candidates come from an nprobe-bounded
    * cell equi-join — corpus scanned ∝ nprobe/cells, never fully.
    */
  def ivfKmeansTopK(corpus: DataFrame, queryPred: Column, dim: Int, k: Int,
                    cells: Int, iters: Int, nprobe: Int): DataFrame = {
    val (assigned, centroids) = KMeans.fit(corpus, "vec_id", "embedding", dim, cells, iters)
    val inv = assigned.join(
      corpus.select(col("vec_id"), col("embedding").as("nv"),
        Tensors.norm(col("embedding")).as("nn")), "vec_id")
    val q = corpus.where(queryPred).select(col("vec_id").as("query_id"),
      col("embedding").as("qv"),
      col("embedding").cast("array<double>").as("qd"),
      Tensors.norm(col("embedding")).as("qn"))
    // probe ranking mirrors KMeans.assign: distances compared ROUNDED with
    // the cluster id tie-break, so the probed cell SET is engine-exact
    val pw = Window.partitionBy("query_id").orderBy(col("d2"), col("cluster"))
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("qn"), col("cluster"),
        round(Tensors.distSq(col("qd"), col("centroid")), 6).as("d2"))
      .withColumn("rn", row_number().over(pw)).where(col("rn") <= nprobe)
      .select("query_id", "qv", "qn", "cluster")
    rankTopK(probes.join(inv, "cluster")
      .select(col("query_id"), col("qv"), col("qn"),
        col("vec_id").as("neighbor_id"), col("nv"), col("nn")), k)
  }

  /** IVF-style ANN: coarse quantize each vector to its nearest per-label
    * centroid cell (centroids computed from the data itself — one tiny agg),
    * then search only within the query's cell. The classic inverted-file
    * shape: the centroid table is O(cells) and broadcast; the corpus gets a
    * `cell` column in one narrow pass; candidate generation is a cell
    * equi-join. Complements [[lshBucket]] (data-independent hashing) with a
    * data-adaptive index.
    */
  def ivfTopK(corpus: DataFrame, queryPred: Column, dim: Int, k: Int): DataFrame = {
    val centroidAggs = (0 until dim).map(i =>
      avg(element_at(col("embedding"), i + 1).cast("double")).as(s"c_$i"))
    val cells = corpus.groupBy(col("label").as("cell_id"))
      .agg(centroidAggs.head, centroidAggs.tail: _*)
      .select(col("cell_id"), array((0 until dim).map(i => col(s"c_$i")): _*).as("centroid"))
    // assign: argmin squared distance over cells (broadcast the tiny table).
    // distances compared ROUNDED (1e-6) with cell_id as tie-break — the
    // centroids are float avgs whose last ulps differ by accumulation order,
    // and an unrounded argmin could flip a near-equidistant assignment
    // between engines/runs (same contract as KMeans.assign)
    val withDist = corpus.crossJoin(broadcast(cells))
      .select(col("vec_id"), col("embedding"), col("cell_id"),
        round(Tensors.distSq(col("embedding"), col("centroid")), 6).as("d2"))
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cell_id"))
    val assigned = withDist.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cell_id"),
        Tensors.norm(col("embedding")).as("nrm"))
    val queries = assigned.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"), col("cell_id"))
    rankTopK(
      queries.join(assigned.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nv"), col("nrm").as("nn"), col("cell_id")), Seq("cell_id")),
      k)
  }

  /** LSH-bucketed top-k: identical ranking but candidates restricted to the
    * query's bucket (the ANN scale path).
    */
  def bucketedTopK(corpus: DataFrame, queryPred: Column, dim: Int,
                   nPlanes: Int, k: Int): DataFrame = {
    val bucketed = corpus.select(col("vec_id"), col("embedding"),
      Tensors.norm(col("embedding")).as("nrm"),
      lshBucket(col("embedding"), dim, nPlanes).as("bucket"))
    val queries = bucketed.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"), col("bucket"))
    rankTopK(
      queries.join(bucketed.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nv"), col("nrm").as("nn"), col("bucket")), Seq("bucket")),
      k)
  }
}
