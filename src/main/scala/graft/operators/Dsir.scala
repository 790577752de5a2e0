package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashes

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely its
  * hashed n-gram features are under a TARGET domain's bag-of-features model
  * than under the raw corpus's own, then keep the top-weighted documents.
  * This is the standard recipe for tilting a 100 TB crawl toward a
  * curated domain (e.g. Wikipedia-like text) without training a classifier.
  *
  * Shape at scale: the token stream is a narrow explode, persisted only
  * while the feature distributions are derived and released immediately
  * after (no session-lifetime cache); both distributions collapse to
  * `buckets` rows (a constant — 10⁴ in the paper), so the log-ratio table
  * broadcasts and scoring is a map-side join + one exact integer groupBy
  * per doc; selection is a TakeOrderedAndProject top-k, never a global
  * sort. No stage's cardinality depends on corpus size except the token
  * explode every tokenizer pays (twice: once building the ratio table,
  * once scoring).
  *
  * Determinism: bucket = tokenHash(token) mod buckets (the salted
  * multiplicative family — [[Hashes.tokenHashSql]] is the DuckDB twin);
  * per-occurrence log-ratios quantize to integer 1e-6 units before the
  * per-doc sum, so cross-row reduction order can't move the result. The
  * paper resamples with Gumbel noise; here the noiseless top-k variant
  * keeps the contract exact (weighted sampling exists as q112's
  * Efraimidis-Spirakis operator if sampling is wanted).
  */
object Dsir {

  /** Per-document importance weights. `docs` needs (doc_id, text); `isTarget`
    * marks the target-domain rows inside the same relation. Smoothing is
    * add-one over the `buckets` feature cells on both models.
    *
    * Output: (doc_id, n_tokens, w_e6) where w_e6 = Σ_tokens
    * round(1e6·(ln p_target(b) − ln p_raw(b))) — integer log-importance in
    * 1e-6 units.
    */
  def importanceWeights(docs: DataFrame, isTarget: Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = docs.sparkSession
    val tok = docs
      .select(col("doc_id"), isTarget.as("is_target"),
        explode(split(col("text"), " ", -1)).as("token"))
      // tokenHash is already in [0, Prime) so a plain % stays non-negative —
      // and DuckDB has no pmod, so the oracle can state the same expression
      .withColumn("b", Hashes.tokenHash(col("token")) % buckets.toLong)
      // drop the token STRING before caching — the hash bucket carries all
      // downstream information, and caching corpus text ×occurrences is
      // exactly the kind of hidden O(corpus) memory a 100 TB run dies on
      // (ScaleProbe caught this as a 1.37 scaling exponent before the fix)
      .select(col("doc_id"), col("is_target"), col("b"))
    // the persist lives only while the ≤buckets-row ratio table is derived
    // (four consumers: raw/target counts, both totals), then is RELEASED —
    // a session-lifetime cached token relation per call was a leak. The
    // scoring pass below recomputes the explode once at materialization;
    // one extra scan, bounded executor memory.
    tok.persist()
    val ratioLocal =
      try {
        val rawCnt = tok.groupBy("b").agg(count(lit(1)).as("rc"))
        val tgtCnt = tok.where(col("is_target")).groupBy("b").agg(count(lit(1)).as("tc"))
        val nRaw = tok.agg(count(lit(1)).as("nr"))
        val nTgt = tok.where(col("is_target")).agg(count(lit(1)).as("nt"))
        // every bucket that occurs in ANY doc occurs in the raw counts, so the
        // raw side is the spine; absent target cells smooth to (0+1)/(nt+B)
        val ratio = rawCnt
          .join(tgtCnt, Seq("b"), "left")
          .crossJoin(broadcast(nRaw)).crossJoin(broadcast(nTgt))
          .select(col("b"),
            round((log((coalesce(col("tc"), lit(0L)) + lit(1L)).cast("double")
                  / (col("nt") + lit(buckets.toLong)).cast("double"))
              - log((col("rc") + lit(1L)).cast("double")
                  / (col("nr") + lit(buckets.toLong)).cast("double"))) * 1e6, 0)
              .cast("long").as("lr_e6"))
        // ≤ buckets rows by construction — a driver materialization in the
        // same O(k) class as the fitted-scaler stats and PQ codebooks
        import scala.jdk.CollectionConverters._
        spark.createDataFrame(ratio.collect().toSeq.asJava, ratio.schema)
      } finally tok.unpersist()
    tok.join(broadcast(ratioLocal), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lr_e6").as("w_e6"))
  }

  /** Select the `k` highest-importance documents (ties broken by doc_id —
    * every ordering ends in a unique key). Compiles to
    * TakeOrderedAndProject: only k rows ever reach the driver side of the
    * sort, whatever the corpus size.
    */
  def select(docs: DataFrame, isTarget: Column, buckets: Int, k: Int): DataFrame =
    importanceWeights(docs, isTarget, buckets)
      .orderBy(col("w_e6").desc, col("doc_id"))
      .limit(k)

  /** The paper's actual sampler: Gumbel-top-k over the log-importance
    * weights — sampling k docs WITHOUT replacement with P(doc) ∝ exp(w) is
    * exactly taking the top k of w + Gumbel(0,1) (Vieira 2014). "Random"
    * is the playbook's salted multiplicative hash, u = (h+1)/(Prime+2) ∈
    * (0,1) strictly (u = 1 would send −ln(−ln u) to +∞), so the draw is
    * replayable in any engine; the perturbed key quantizes to integer 1e-9
    * units with doc_id as the final tiebreak. Still TakeOrderedAndProject —
    * the noise is a projection, not a shuffle.
    */
  def gumbelSample(docs: DataFrame, isTarget: Column, buckets: Int, k: Int,
                   seed: Long): DataFrame = {
    val u = (Hashes.mulHash(col("doc_id"), seed) + lit(1L))
      .cast("double") / lit(Hashes.Prime + 2).cast("double")
    importanceWeights(docs, isTarget, buckets)
      .withColumn("gkey_e9",
        round((col("w_e6").cast("double") / 1e6 - log(-log(u))) * 1e9, 0)
          .cast("long"))
      .orderBy(col("gkey_e9").desc, col("doc_id"))
      .limit(k)
  }
}
