package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashes

/** MinHash + LSH near-duplicate detection (north-star dedup family).
  *
  * Pipeline shape (the scale path): tokenize → 3-token shingles → integer
  * shingle hashes → k minhash values per doc (one narrow projection, no
  * explode) → band keys → explode only the k/bandSize band rows per doc →
  * groupBy band key → within-bucket self-join for candidates → exact Jaccard
  * verification on the candidates only.
  *
  * At 100 TB: the signature pass is a pure map (no shuffle); the only shuffle
  * is on band keys, whose cardinality ≈ docs × bands but whose *matching*
  * pairs are rare; the expensive exact-Jaccard join runs on candidates, not on
  * all O(N²) pairs. Skewed buckets (boilerplate shingles) would be salted or
  * capped in production; fixture data has no such skew.
  *
  * All hashing is plain int64 arithmetic (Hashes.scala) so a DuckDB oracle
  * replays it exactly.
  */
object MinHash {
  import Hashes.Prime

  /** Number of minhash functions and LSH band width (bands = k / bandSize). */
  val K         = 8
  val BandSize  = 2
  val Bands: Int = K / BandSize

  private def aCoef(j: Int): Long = 2L * j + 1 // odd multipliers
  private def bCoef(j: Int): Long = 12345L * j + 678

  /** 3-token shingle hashes from a token array:
    * h = (th(t_i)·961 + th(t_{i+1})·31 + th(t_{i+2})) mod P.
    *
    * Backed by a custom Catalyst expression (TextHashExprs) — the pure-HOF
    * sliding-window formulation re-tokenizes per element under interpreted
    * eval (see TextHashExprs scaladoc for the failure mode).
    */
  def shingleHashes(tokens: Column): Column =
    graft.functions.TextHashExprs.shingle_hashes(tokens)

  def shingleHashesSql(toks: String): String = {
    def th(e: String) = Hashes.tokenHashSql(e)
    s"""list_transform(range(0, len($toks) - 2),
       | i -> ((${th(s"$toks[i + 1]")}) * 961
       |     + (${th(s"$toks[i + 2]")}) * 31
       |     + (${th(s"$toks[i + 3]")})) % $Prime)""".stripMargin
  }

  def minhashSql(shingles: String, j: Int): String =
    s"list_min(list_transform($shingles, h -> (h * ${aCoef(j)} + ${bCoef(j)}) % $Prime))"

  /** Band key b (0-based): combines the band's minhashes into one int64. */
  def bandKey(sig: Seq[Column], b: Int): Column = {
    val slice = sig.slice(b * BandSize, (b + 1) * BandSize)
    slice.reduceLeft((acc, m) => (acc * 31L + m) % Prime)
  }

  /** Signature DataFrame: doc key + mh_0..mh_{K-1}. One narrow projection —
    * the k-way min runs in a single pass inside MinHashSignatureExpr.
    */
  def signatures(docs: DataFrame, key: Column, tokens: Column): DataFrame = {
    val sig = graft.functions.TextHashExprs.minhash_signature(tokens, K)
    docs.where(size(tokens) >= 3)
      .select(key.as("doc_id"), sig.as("sig"))
      .select(col("doc_id") +: (0 until K).map(j =>
        element_at(col("sig"), j + 1).as(s"mh_$j")): _*)
  }

  /** One (doc_id, band, bkey) row per band per doc. */
  private def bandRows(sigs: DataFrame): DataFrame = {
    val sigCols = (0 until K).map(j => col(s"mh_$j"))
    sigs.select(
      col("doc_id"),
      explode(array((0 until Bands).map(b =>
        struct(lit(b).as("band"), bandKey(sigCols, b).as("bkey"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  /** Within-bucket self-join → distinct ordered candidate pairs. */
  private def candidatePairs(bands: DataFrame): DataFrame =
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

  /** Exact-Jaccard verification of candidate pairs against distinct shingle
    * sets; keeps pairs with jaccard ≥ minJaccard.
    */
  private def verifyJaccard(cand: DataFrame, docs: DataFrame, key: Column,
                            tokens: Column, minJaccard: Double): DataFrame = {
    val shingleSets = docs.where(size(tokens) >= 3)
      .select(key.as("doc_id"), array_distinct(shingleHashes(tokens)).as("sset"))
    cand
      .join(shingleSets.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sset", "sset_a"), "doc_a")
      .join(shingleSets.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sset", "sset_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        // round(6) BEFORE filtering — the oracle rounds too, so threshold-
        // boundary values can't disagree across engines
        round(size(array_intersect(col("sset_a"), col("sset_b"))).cast("double") /
          size(array_union(col("sset_a"), col("sset_b"))), 6).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** Banding candidate pairs WITHOUT the exact-Jaccard verify — the raw
    * recall surface of the banding scheme, exposed so audits (q198) can
    * measure candidate-generation precision/recall against ground truth.
    */
  def candidates(docs: DataFrame, key: Column, tokens: Column): DataFrame =
    candidatePairs(bandRows(signatures(docs, key, tokens)))

  /** Candidate pairs via LSH banding + exact Jaccard on distinct shingles.
    * Returns (doc_a, doc_b, jaccard) for candidates with jaccard ≥ minJaccard.
    */
  def nearDuplicates(docs: DataFrame, key: Column, tokens: Column,
                     minJaccard: Double): DataFrame =
    verifyJaccard(candidatePairs(bandRows(signatures(docs, key, tokens))),
      docs, key, tokens, minJaccard)

  /** Cross-relation near-duplicate detection — the PROBE side (an arriving
    * batch) against the CORPUS side (the accumulated band index): band rows
    * from both, candidates from the (band, bkey) equi-join, exact-Jaccard
    * verify on candidates only. Returns (probe_id, corpus_id, jaccard) for
    * verified pairs. This is the q37 machinery split across two relations —
    * the shape a continuously-ingesting pipeline runs every micro-batch,
    * where the probe side is small and the corpus side is the stored index
    * (in production the corpus band rows and shingle sets are persisted,
    * not recomputed; recomputation here keeps the operator self-contained).
    */
  def crossNearDuplicates(probe: DataFrame, corpus: DataFrame, key: Column,
                          tokens: Column, minJaccard: Double): DataFrame = {
    val pb = bandRows(signatures(probe, key, tokens))
      .withColumnsRenamed(Map("doc_id" -> "probe_id"))
    val cb = bandRows(signatures(corpus, key, tokens))
      .withColumnsRenamed(Map("doc_id" -> "corpus_id"))
    val cand = pb.join(cb, Seq("band", "bkey"))
      .select("probe_id", "corpus_id").distinct()
    val pss = probe.where(size(tokens) >= 3)
      .select(key.as("probe_id"),
        array_distinct(shingleHashes(tokens)).as("sset_p"))
    val css = corpus.where(size(tokens) >= 3)
      .select(key.as("corpus_id"),
        array_distinct(shingleHashes(tokens)).as("sset_c"))
    cand.join(pss, "probe_id").join(css, "corpus_id")
      .select(col("probe_id"), col("corpus_id"),
        round(size(array_intersect(col("sset_p"), col("sset_c"))).cast("double")
          / size(array_union(col("sset_p"), col("sset_c"))), 6).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** [[nearDuplicates]] with a bucket-size cap: band buckets holding more
    * than `cap` docs are dropped BEFORE the self-join. This is the standard
    * skew guard for web-scale dedup — a boilerplate bucket of B docs would
    * otherwise materialize B²/2 candidate pairs on one reducer; capping
    * bounds every bucket's join work at cap²/2 while near-dup PAIRS stay
    * discoverable through their other, less common bands. A dropped bucket
    * only loses pairs whose every matching band is over-capped — for true
    * near-dups (most bands agree) that requires the doc itself to be
    * boilerplate-popular, exactly the rows a dedup pass should not be
    * quadratic in. The bucket census is a window count over the same
    * (band, bkey) shuffle the join needs anyway — no extra exchange.
    */
  def nearDuplicatesCapped(docs: DataFrame, key: Column, tokens: Column,
                           minJaccard: Double, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bands = bandRows(signatures(docs, key, tokens))
      .withColumn("bsize",
        count(lit(1)).over(Window.partitionBy("band", "bkey")))
      .where(col("bsize") <= cap)
      .drop("bsize")
    verifyJaccard(candidatePairs(bands), docs, key, tokens, minJaccard)
  }
}
