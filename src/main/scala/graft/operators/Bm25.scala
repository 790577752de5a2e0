package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 ranked retrieval (Robertson & Zaragoza 2009) — the classic
  * relevance score the RAG side of a training-data pipeline needs next to
  * TF-IDF (q50):
  *
  *   score(D,Q) = Σ_{t∈Q} ln(1 + (N−df+0.5)/(df+0.5)) ·
  *                tf·(k1+1) / (tf + k1·(1−b + b·|D|/avgdl))
  *
  * Scale shape: the corpus is exploded ONCE and immediately semi-joined to
  * the broadcast query-term set, so the only shuffle of corpus-derived data
  * is the (doc, term) aggregate over the HITS — rows mentioning a query
  * term — never the full token stream. df/stats relations are O(terms)/O(1)
  * and broadcast back. Per-term scores quantize to integer 1e-6 units
  * before the per-(query, doc) sum (the LM-score pattern, q80), so ranking
  * compares exact integers and accumulation order can't flip a rank.
  */
object Bm25 {

  /** Top-k docs per query.
    *
    * @param queries (qid: Long, term: String) — one row per query term.
    * @return (qid, rank, doc_id, score), rank 1..k by (score desc, doc_id).
    */
  def topK(docs: DataFrame, key: Column, tokens: Column, queries: DataFrame,
           k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val bl = docs.select(key.as("doc_id"), tokens.as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    val stats = bl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    val qterms = queries.select("term").distinct()
    val hits = bl.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(qterms), "term")
    val tf = hits.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    val dfRel = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf =
      log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val den = col("tf").cast("double") +
      lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / col("avgdl"))
    val sE6 = round(idf * (col("tf") * lit(k1 + 1)) / den * 1000000, 0).cast("long")
    val w = Window.partitionBy("qid").orderBy(col("sum_e6").desc, col("doc_id"))
    tf.join(broadcast(dfRel), "term").crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), sE6.as("s_e6"))
      .join(broadcast(queries), "term")
      .groupBy("qid", "doc_id").agg(sum("s_e6").as("sum_e6"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("doc_id"),
        round(col("sum_e6").cast("double") / 1000000, 6).as("score"))
  }
}
