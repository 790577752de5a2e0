package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge LEARNING (Sennrich et al. 2016, arXiv:1508.07909) — the
  * tokenizer-training step of an LLM data pipeline, as an oracle-checkable
  * iterative fit. q71 tokenizes with a fixed vocabulary; this learns the
  * vocabulary: per round, count every adjacent symbol pair across the
  * corpus (weighted by word frequency), merge the most frequent pair
  * everywhere, repeat.
  *
  * Scale shape — the reason BPE training is feasible at 100 TB: all rounds
  * run over the DISTINCT-WORD relation (vocabulary-sized, built by one
  * corpus-wide groupBy), never the token stream; each round is one
  * pair-explode + groupBy over that relation plus an O(1)-row argmax
  * collect, and merge application is a pure row-local fold. Production
  * implementations (SentencePiece, HF tokenizers) train on a sample for
  * the same reason — `words` can be any (word, freq) relation.
  *
  * Determinism (the k-means/LogisticGD playbook applied to pair
  * statistics): pair counts are exact integer sums; the argmax order is
  * total (count DESC, left, right); merge application is the SAME
  * left-to-right non-overlapping scan on both engines (a fold with a
  * one-symbol carry — "aaa" under merge (a,a) → ["aa","a"], never
  * ["a","aa"]); so the learned merge table hash-matches an oracle that
  * unrolls the rounds as CTEs with the identical fold.
  */
object BpeLearn {

  /** One learned merge: `rank` is the round (1-based), `pairCount` the
    * exact weighted count that won the argmax, `corpusTokensAfter` the
    * total corpus symbol count once the merge is applied everywhere — a
    * whole-corpus checksum of the application step, not just the pick.
    */
  final case class Merge(rank: Int, lhs: String, rhs: String,
                         pairCount: Long, corpusTokensAfter: Long)

  /** Split a word into single-character symbols (guarded: `sequence(1, 0)`
    * DESCENDS in Spark, so empty strings need the explicit empty array).
    */
  def charSymbols(word: Column): Column =
    when(length(word) >= 1,
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))))
      .otherwise(array().cast("array<string>"))

  /** Adjacent symbol pairs of `sym` as (a, b) structs; empty for length<2
    * (same descending-sequence guard).
    */
  private def adjacentPairs(sym: Column): Column =
    when(size(sym) >= 2,
      transform(sequence(lit(0), size(sym) - 2), i =>
        struct(element_at(sym, i + 1).as("a"), element_at(sym, i + 2).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))

  /** Apply ONE merge (a, b) → "ab" to a symbol array, left-to-right and
    * non-overlapping — the simultaneous-replacement semantics of one BPE
    * round. Implemented as a fold with a one-symbol carry: a merged token
    * never re-participates as the LEFT side within the same round.
    */
  def applyMerge(sym: Column, a: String, b: String): Column = {
    val noCarry = lit(null).cast("string")
    val zero = struct(array().cast("array<string>").as("out"),
      noCarry.as("carry"))
    val step = (acc: Column, s: Column) =>
      when(acc("carry").isNull, struct(acc("out").as("out"), s.as("carry")))
        .when(acc("carry") === a && s === b,
          struct(concat(acc("out"), array(lit(a + b))).as("out"),
            noCarry.as("carry")))
        .otherwise(struct(concat(acc("out"), array(acc("carry"))).as("out"),
          s.as("carry")))
    val fin = (acc: Column) =>
      when(acc("carry").isNull, acc("out"))
        .otherwise(concat(acc("out"), array(acc("carry"))))
    aggregate(sym, zero, step, fin)
  }

  /** Tokenizer APPLY: encode every word with an ordered merge table —
    * char-split, then each learned merge in rank order, the same
    * left-to-right fold as training. This is the production split: [[fit]]
    * learns on a (sampled) word-frequency relation, `encodeWords` encodes
    * the full vocabulary, and the corpus encodes by joining its token
    * stream to the resulting (word → symbols) relation on the uniform word
    * key — the fold never runs per occurrence (q137).
    */
  def encodeWords(words: DataFrame, wordCol: String,
                  merges: Seq[Merge]): DataFrame =
    merges.sortBy(_.rank).foldLeft(
      words.select(col(wordCol).as("w"), charSymbols(col(wordCol)).as("sym")))(
      (df, m) => df.select(col("w"), applyMerge(col("sym"), m.lhs, m.rhs).as("sym")))

  /** Learn `rounds` merges from a (word, freq) relation. Each round: one
    * integer pair aggregate + a 1-row argmax collect + a row-local rewrite.
    * The evolving symbol relation is persisted per round (it feeds the pair
    * count, the token checksum, and the next round) and released as soon as
    * its successor exists.
    */
  def fit(words: DataFrame, wordCol: String, freqCol: String,
          rounds: Int): Seq[Merge] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var cur = words.select(col(freqCol).cast("long").as("freq"),
      charSymbols(col(wordCol)).as("sym")).persist()
    val out = Seq.newBuilder[Merge]
    for (r <- 1 to rounds) {
      val top = cur
        .select(col("freq"), explode(adjacentPairs(col("sym"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      require(top.nonEmpty, s"round $r: no adjacent pairs left to merge")
      val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      val next = cur.select(col("freq"),
        applyMerge(col("sym"), a, b).as("sym")).persist()
      val tokens = next.agg(sum(col("freq") * size(col("sym")))).head().getLong(0)
      cur.unpersist()
      cur = next
      out += Merge(r, a, b, c, tokens)
    }
    cur.unpersist()
    out.result()
  }
}
