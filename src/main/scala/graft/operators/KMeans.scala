package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column, expressed as repeated relational
  * fit/apply — the same statistics-are-data pattern as the scaler pipeline
  * (SURVEY §2 row 16) generalized to an iterative fit (§7.4.5's
  * driver-coordinated loop, like spark.ml's own implementations).
  *
  * Per iteration, entirely declarative:
  *   - **assign** (apply): cross-join against the broadcast O(k·dim)
  *     centroid table, squared distance as a sequential `aggregate ∘
  *     zip_with` fold, argmin by `row_number` ordered (distance, cell) —
  *     one narrow pass over the corpus, no shuffle of the big side.
  *   - **update** (fit): per-dimension `avg` as `dim` independent aggregate
  *     expressions over `element_at` — single hash aggregate on k keys with
  *     map-side partials, NO explode (an explode formulation multiplies the
  *     corpus ×dim before shuffling — SURVEY §7.4.2's hazard).
  *
  * Determinism: seeds are the first k vectors by id; ties in assignment break
  * to the lowest cell id; every reduction is either exact (counts) or a
  * per-dimension double `avg` reproduced identically by the oracle's unrolled
  * CTEs. Iteration count is fixed (not convergence-tested) so the relational
  * trace is finite and engine-independent.
  */
object KMeans {

  /** @return (assignments: (vec_id, cluster), centroids: (cluster, centroid))
    *         after `iters` Lloyd rounds from the first-k-by-id seeds.
    */
  def fit(corpus: DataFrame, idCol: String, embCol: String,
          dim: Int, k: Int, iters: Int): (DataFrame, DataFrame) = {
    val emb = corpus.select(col(idCol).as("vec_id"),
      col(embCol).cast("array<double>").as("x"))

    // seeds = the k smallest ids (TakeOrdered — no assumption that ids are
    // dense or 0-based); cluster ids are their 0-based rank, assigned by a
    // window over the k-row seed set only
    val seedRank = Window.orderBy("vec_id")
    var centroids = emb.orderBy("vec_id").limit(k)
      .withColumn("cluster", (row_number().over(seedRank) - 1).cast("long"))
      .select(col("cluster"), col("x").as("centroid"))

    def assign(cents: DataFrame): DataFrame = {
      // distances compared ROUNDED (1e-6 grid) with the cluster id as
      // tie-break: near-ties collapse to exact ties resolved identically by
      // any engine, so sub-ulp accumulation differences can't flip an argmin
      val d2 = round(graft.functions.Tensors.distSq(col("x"), col("centroid")), 6)
      val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cluster"))
      emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("x"), col("cluster"), d2.as("d2"))
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("vec_id"), col("x"), col("cluster"))
    }

    var assigned = assign(centroids)
    for (_ <- 0 until iters) {
      // centroid means rounded to a 1e-9 grid: partial/merge double sums are
      // order-dependent across engines; snapping to the grid restores exact
      // cross-engine equality except for values within an ulp of a boundary
      val dimAvgs = (0 until dim).map(i =>
        round(avg(element_at(col("x"), i + 1)), 9).as(s"m_$i"))
      val means = assigned.groupBy("cluster")
        .agg(dimAvgs.head, dimAvgs.tail: _*)
        .select(col("cluster"),
          array((0 until dim).map(i => col(s"m_$i")): _*).as("mean_c"))
      // a cluster that received no points keeps its previous centroid —
      // groupBy alone would silently DROP it and return < k clusters
      centroids = centroids.join(means, Seq("cluster"), "left")
        .select(col("cluster"),
          coalesce(col("mean_c"), col("centroid")).as("centroid"))
        .localCheckpoint() // keep the loop's plan from nesting per round
      assigned = assign(centroids)
    }
    (assigned.select("vec_id", "cluster"), centroids)
  }
}
