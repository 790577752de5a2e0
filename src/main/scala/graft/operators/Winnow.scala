package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection and the cross-document census over the
  * selected fingerprints — the full MOSS pipeline (Schleimer, Wilkerson,
  * Aiken, SIGMOD 2003). q168 surfaces per-doc selection stats; this object
  * owns the selection rule plus the pair-level overlap report MOSS actually
  * shows its users: documents ranked by how many selected fingerprints they
  * share.
  *
  * Selection rule (the paper's robust winnowing): slide a width-`w` window
  * over the k-gram shingle hashes and keep the RIGHTMOST minimal hash per
  * window; dedupe selections. Guarantee: any shared run of ≥ w+k−1 tokens
  * yields at least one identical fingerprint in both documents, at density
  * ~2/(w+1) of the shingle stream.
  *
  * Scale shape of the census: selection is entirely row-local (one fused
  * HOF chain inside codegen — no explode until the census). The census
  * groupBy runs on the uniform 63-bit fingerprint hash; buckets shared by
  * more than `cap` documents are dropped BEFORE the pair join (the q118
  * boilerplate guard — a license header selected by B docs would otherwise
  * put B²/2 pairs on one reducer), so each surviving bucket emits at most
  * cap·(cap−1)/2 pairs. No stage is ever all-pairs in the corpus.
  */
object Winnow {

  /** Winnowing-selected fingerprints over a shingle-hash array column:
    * array<struct<h: bigint, pos: int>>, deduped, selection order. Docs
    * with fewer than `w` shingles select nothing. Row-local — plain array
    * HOFs, evaluated inside whole-stage codegen.
    */
  def fingerprints(sh: Column, w: Int): Column = {
    require(w >= 1, s"window must be >= 1, got $w")
    val init = struct(lit(Long.MaxValue).as("h"), lit(-1).as("pos"))
    val selected = transform(sequence(lit(0), size(sh) - w),
      p => aggregate(sequence(p, p + w - 1), init,
        (acc, i) => when(element_at(sh, i + 1) <= acc.getField("h"),
          struct(element_at(sh, i + 1).as("h"), i.as("pos")))
          .otherwise(acc)))
    when(size(sh) >= w, array_distinct(selected))
      .otherwise(array().cast("array<struct<h:bigint,pos:int>>"))
  }

  /** Distinct selected fingerprint VALUES per doc (positions dropped) —
    * the unit the cross-doc census counts.
    */
  def fingerprintSet(sh: Column, w: Int): Column =
    array_distinct(transform(fingerprints(sh, w), x => x.getField("h")))

  /** MOSS overlap report: pairs of documents sharing ≥ `minShared`
    * winnowed fingerprints, with each side's fingerprint count and the
    * containment ratio shared / min(n_a, n_b).
    *
    * `docs` must provide (doc_id, sh) where sh is the shingle-hash array.
    * Fingerprints selected by more than `cap` distinct docs are treated as
    * corpus boilerplate and excluded from the census (declared semantics —
    * oracles must apply the same cap).
    *
    * @return (doc_a, doc_b, shared, n_a, n_b, containment)
    */
  def sharedPairs(docs: DataFrame, w: Int, cap: Int,
                  minShared: Int = 2): DataFrame = {
    require(cap >= 2, s"cap must be >= 2, got $cap")
    val fpd = docs
      .select(col("doc_id"), explode(fingerprintSet(col("sh"), w)).as("h"))
    // census + pair join share the same hash-partitioned exchange on h
    val census = fpd.groupBy("h")
      .agg(countDistinct("doc_id").as("nd"))
      .where(col("nd").between(2, cap))
      .select("h")
    val hits = fpd.join(census, Seq("h"), "left_semi")
    val pairs = hits.as("a")
      .join(hits.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
    val nfp = docs.select(col("doc_id"),
      size(fingerprintSet(col("sh"), w)).cast("long").as("n_fp"))
    pairs
      .join(nfp.as("na"), col("doc_a") === col("na.doc_id"))
      .join(nfp.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        col("na.n_fp").as("n_a"), col("nb.n_fp").as("n_b"),
        round(col("shared").cast("double")
          / least(col("na.n_fp"), col("nb.n_fp")), 6).as("containment"))
  }
}
