package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bradley–Terry pairwise-preference model fit by the MM algorithm
  * (Hunter, "MM algorithms for generalized Bradley-Terry models", Annals of
  * Statistics 2004) — the batch-native, ORDER-INDEPENDENT arena ranking.
  * Where an ELO ladder (q453) folds the match log sequentially and gives a
  * path-dependent answer, Bradley–Terry fits strengths p_i maximizing
  * Π p_winner/(p_i+p_j) over all matches — the model an LLM preference
  * pipeline actually fits over millions of arena comparisons.
  *
  * MM update (all-positive, monotone in likelihood):
  *   p_i ← W_i / Σ_{j≠i} n_ij / (p_i + p_j)
  * where W_i = wins of i and n_ij = matches between i and j, renormalized to
  * Σ p_i = players·1e6 (e6 units) each round.
  *
  * Relational shape — the 100 TB posture, the same driver-coordinated loop
  * as operators/KMeans (statistics-are-data):
  *   - the corpus-sized work is ONE pass over the match log: the win census
  *     (groupBy winner) and the unordered-pair census (groupBy least,
  *     greatest) — two hash aggregates with map-side partials. The log is
  *     never scanned again;
  *   - every MM round joins the CENSUS relation (observed pairs — sparse in
  *     players², itself a statistic, persisted) against the k-row strengths
  *     broadcast, sums per-player denominators in the engine, and collects
  *     exactly k updated rows — the KMeans centroid-collect pattern. Driver
  *     state is O(players), never O(matches);
  *   - order independence means no sequential fold and no sorted group:
  *     shuffling or re-sharding the match log cannot change the answer (the
  *     property the ELO ladder structurally lacks).
  *
  * Determinism: fixed-point e6 arithmetic throughout. Strengths live in e6
  * units; per-pair MM terms are `n_ij·1e12 div (p_i+p_j)` (int64-safe for
  * n_ij ≤ ~9e5), the update is `W_i·1e12 div D_i` floored at 1, and the
  * renormalize runs through BigInt (HUGEINT in the oracle) so both engines
  * truncate identically. Iteration count is fixed, not convergence-tested,
  * so the relational trace is finite.
  */
object BradleyTerry {

  /** Fit strengths over a match log.
    *
    * @param matches relation with long columns (`pa`, `pb`, `awin`):
    *                players of the match and 1 iff `pa` won.
    * @param players relation with long column (`player`) enumerating the
    *                ladder (so never-matched players still get a row) —
    *                statistics-sized (the models being ranked).
    * @param nPlayers player count (the renormalization target is
    *                 nPlayers·1e6 total strength).
    * @param rounds fixed MM iteration count.
    * @return (player, wins, strength_e6) — strengths sum to ~nPlayers·1e6.
    */
  def fit(spark: SparkSession, matches: DataFrame, players: DataFrame,
          nPlayers: Int, rounds: Int): DataFrame = {
    import spark.implicits._
    val wins = matches
      .select(when(col("awin") === 1, col("pa")).otherwise(col("pb"))
        .as("player"))
      .groupBy("player").agg(count(lit(1)).as("w"))
    val census = matches
      .select(least(col("pa"), col("pb")).as("lo"),
        greatest(col("pa"), col("pb")).as("hi"))
      .groupBy("lo", "hi").agg(count(lit(1)).as("nm"))
      .persist() // scanned once per MM round; the log itself never again
    // (player, wins) — the k-row win statistic, collected once like KMeans
    // seeds; k = models being ranked, not corpus rows.
    val base: Array[(Long, Long)] = players.join(wins, Seq("player"), "left")
      .select(col("player"), coalesce(col("w"), lit(0L)).as("w"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val target = BigInt(nPlayers) * 1000000L

    var strengths: Array[(Long, Long)] = base.map { case (pl, _) => (pl, 1000000L) }
    for (_ <- 1 to rounds) {
      val pDf = strengths.toSeq.toDF("player", "p_e6")
      // engine side: census ⋈ broadcast strengths → per-pair MM term fanned
      // to both endpoints → per-player denominator sum → floored update
      val denom = census
        .join(broadcast(pDf.select(col("player").as("lo"),
          col("p_e6").as("plo"))), Seq("lo"))
        .join(broadcast(pDf.select(col("player").as("hi"),
          col("p_e6").as("phi"))), Seq("hi"))
        .select(explode(array(col("lo"), col("hi"))).as("player"),
          expr("nm * 1000000000000L div (plo + phi)").as("t_e6"))
        .groupBy("player").agg(sum("t_e6").as("d_e6"))
        .as[(Long, Long)].collect().toMap
      // driver side: the k-row statistic transform (update + renormalize),
      // BigInt so the truncation mirrors the oracle's HUGEINT `//` exactly
      val raw = base.map { case (pl, w) =>
        (pl, math.max(1L, w * 1000000000000L / denom.getOrElse(pl, 1L)))
      }
      val tot = raw.map(r => BigInt(r._2)).sum
      strengths = raw.map { case (pl, pe) =>
        (pl, (BigInt(pe) * target / tot).toLong)
      }
    }
    val out = base.zip(strengths).map { case ((pl, w), (_, pe)) => (pl, w, pe) }
    census.unpersist()
    out.toSeq.toDF("player", "wins", "strength_e6")
  }
}
