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
}
