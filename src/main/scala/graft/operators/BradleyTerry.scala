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
  * n_ij ≤ ~9.2e6 — `require`d below; DuckDB's BIGINT errors loudly past the
  * same bound, so both engines FAIL rather than silently diverge), the
  * update is `W_i·1e12 div D_i` floored at 1 (W_i `require`d ≤ the same
  * bound; the driver-side product runs through BigInt regardless), and the
  * renormalize runs through BigInt (HUGEINT in the oracle) so both engines
  * truncate identically. Iteration count is fixed, not convergence-tested,
  * so the relational trace is finite. Residual caveat: the engine-side
  * denominator SUM is int64 — exact under the required bounds unless
  * strengths collapse to the floor (pathological total-skew logs), where
  * DuckDB would again error loudly while Spark wraps; the requires keep
  * real arena logs (n_ij ≪ 9e6 per pair) far from that regime.
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
    // int64-safe bound for `x * 1e12`: past it Spark's non-ANSI multiply
    // wraps SILENTLY while DuckDB's BIGINT errors — require loudly so both
    // engines fail the same way instead of diverging.
    val Int64SafeMax = Long.MaxValue / 1000000000000L // ≈ 9.2e6
    // coalesce: max over an EMPTY log is one NULL row, and decoding that as
    // Long is an opaque crash — an empty log is a defined input (every
    // never-matched player keeps strength 1e6), so bound-check 0 instead
    val maxNm = census.agg(coalesce(max("nm"), lit(0L))).as[Long]
      .collect().headOption.getOrElse(0L)
    require(maxNm <= Int64SafeMax,
      s"BradleyTerry: per-pair match count $maxNm exceeds the int64-safe " +
        s"bound $Int64SafeMax for the e12 MM term; shard the log per epoch " +
        "or rescale before fitting")
    // (player, wins) — the k-row win statistic, collected once like KMeans
    // seeds; k = models being ranked, not corpus rows.
    val base: Array[(Long, Long)] = players.join(wins, Seq("player"), "left")
      .select(col("player"), coalesce(col("w"), lit(0L)).as("w"))
      .as[(Long, Long)].collect().sortBy(_._1)
    require(base.forall(_._2 <= Int64SafeMax),
      s"BradleyTerry: a win count exceeds the int64-safe bound " +
        s"$Int64SafeMax for the e12 MM update")
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
      // (the w·1e12 product too — the require above already bounds w, but
      // BigInt makes the driver leg wrap-proof regardless)
      val raw: Array[(Long, Long)] = base.map { case (pl, w) =>
        val d: Long = denom.getOrElse(pl, 1L)
        val upd: BigInt = BigInt(w) * BigInt(1000000000000L) / BigInt(d)
        (pl, upd.max(BigInt(1)).toLong)
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
