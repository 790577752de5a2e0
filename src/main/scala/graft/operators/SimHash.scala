package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Hashes

/** SimHash document fingerprinting (north-star dedup family).
  *
  * bits-wide signature over the token-hash stream: bit b is set when
  * Σ_tokens (±1 by bit b of the token hash) > 0. Near-duplicates then differ
  * in few bits (small Hamming distance). Pure expression tree — `bits`
  * aggregates over the token array per row, no explode, no UDF — and exact
  * integer arithmetic, so the oracle replays it.
  */
object SimHash {

  /** SimHash of a token array (default 16 bits). Backed by the one-pass
    * custom expression — the HOF formulation re-hashed the whole token stream
    * once per bit (16× wall-clock, dominated the sf0.1 bench).
    */
  def simhash(tokens: Column, bits: Int = 16): Column =
    graft.functions.TextHashExprs.simhash_expr(tokens, bits)

  /** Token-hash list SQL (compute once in a CTE, pass the column name to
    * [[simhashOverThsSql]] so the oracle doesn't re-hash per bit).
    */
  def tokenHashListSql(toks: String): String =
    s"list_transform($toks, t -> ${Hashes.tokenHashSql("t")})"

  def simhashOverThsSql(ths: String, bits: Int = 16): String =
    (0 until bits).map { b =>
      s"""CASE WHEN list_aggregate(list_transform($ths,
         |   h -> ((h >> $b) & 1) * 2 - 1), 'sum') > 0
         | THEN ${1L << b} ELSE 0 END""".stripMargin
    }.mkString("(", " + ", ")")

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftright(a.bitwiseXOR(b), i).bitwiseAND(1L)
    }.reduceLeft(_ + _)

  def hammingSql(a: String, b: String, bits: Int = 16): String =
    // DuckDB has no infix XOR operator — `#` is a parse error; use xor(a, b)
    (0 until bits).map(i => s"((xor(($a), ($b)) >> $i) & 1)").mkString("(", " + ", ")")

  /** Manku, Jain & Das Sarma's pigeonhole near-dup pair detection
    * (WWW 2007 — the production simhash dedup posture): split the
    * `bits`-wide simhash into `bands` contiguous blocks; any two hashes
    * within Hamming distance `maxHamming` < `bands` agree EXACTLY on at
    * least one block (pigeonhole), so candidates come from `bands`
    * equi-joins on (block index, block value) — never an all-pairs
    * Hamming scan — and exact bit_count verification runs on candidates
    * only. Blocks hot enough to exceed `cap` docs are dropped as
    * boilerplate before the self-join (the MinHash census-cap argument:
    * a B-doc block would emit B²/2 pairs on one reducer; true near-dups
    * stay discoverable through their other blocks).
    *
    * Returns (doc_a, doc_b, hamming) for verified pairs, doc_a < doc_b.
    */
  def hammingPairs(docs: org.apache.spark.sql.DataFrame, key: Column,
                   tokens: Column, bits: Int, bands: Int, maxHamming: Int,
                   cap: Int): org.apache.spark.sql.DataFrame = {
    require(bands > maxHamming,
      s"pigeonhole needs bands > maxHamming, got $bands <= $maxHamming")
    require(bits % bands == 0, s"bits $bits must split evenly into $bands")
    val bb = bits / bands
    val mask = (1L << bb) - 1
    val sh = docs.select(key.as("doc_id"), simhash(tokens, bits).as("sh"))
    val bv = sh.select(col("doc_id"), col("sh"),
        explode(array((0 until bands).map(lit): _*)).as("bi"))
      .withColumn("bval",
        expr(s"shiftright(sh, bi * $bb)").bitwiseAND(mask))
      .select("doc_id", "sh", "bi", "bval")
    val cen = bv.groupBy("bi", "bval").agg(count(lit(1)).as("c"))
      .where(col("c") <= cap).select("bi", "bval")
    val bvc = bv.join(cen, Seq("bi", "bval"))
    bvc.as("a").join(bvc.as("b"),
        col("a.bi") === col("b.bi") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh").as("sa"), col("b.sh").as("sb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        hamming(col("sa"), col("sb"), bits).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** DuckDB CTE chain of [[hammingPairs]] over `documents` — ends at
    * `hp(doc_a, doc_b, hamming)`.
    */
  def hammingPairsSql(toksExpr: String, bits: Int, bands: Int,
                      maxHamming: Int, cap: Int): String = {
    val bb = bits / bands
    val mask = (1L << bb) - 1
    s"""t AS (SELECT doc_id, $toksExpr AS toks FROM documents),
       |h AS (SELECT doc_id, ${tokenHashListSql("toks")} AS ths FROM t),
       |sh AS (SELECT doc_id,
       |         CAST(${simhashOverThsSql("ths", bits)} AS BIGINT) AS sh
       |       FROM h),
       |bv AS (SELECT doc_id, sh, bi,
       |              (sh >> CAST(bi * $bb AS INT)) & $mask AS bval
       |       FROM sh, unnest(range(0, $bands)) AS u(bi)),
       |cen AS (SELECT bi, bval FROM bv GROUP BY bi, bval
       |        HAVING count(*) <= $cap),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |                a.sh AS sa, b.sh AS sb
       |         FROM bv a JOIN cen USING (bi, bval) JOIN bv b
       |           USING (bi, bval)
       |         WHERE a.doc_id < b.doc_id),
       |hp AS (SELECT doc_a, doc_b,
       |              CAST(${hammingSql("sa", "sb", bits)} AS BIGINT)
       |                AS hamming
       |       FROM cand
       |       WHERE ${hammingSql("sa", "sb", bits)} <= $maxHamming)"""
      .stripMargin
  }
}
