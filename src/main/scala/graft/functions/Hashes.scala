package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, oracle-expressible hash functions.
  *
  * The reference's random operators (stratified split, sample-with-replacement
  * — create_train_valid_test_datasets.py:78-80,119-127) use numpy RNG streams
  * that no other engine can reproduce. Per SURVEY §7.4.1 the engine *declares*
  * salted multiplicative-hash semantics instead: deterministic, partition-count
  * independent, and expressible in plain arithmetic SQL so a DuckDB oracle can
  * replay them bit-for-bit. All arithmetic stays within int64 (max intermediate
  * ~2.7e14) so it is portable to any engine with 64-bit integer math — Spark's
  * `xxhash64` would be faster but is not reproducible outside Spark.
  */
object Hashes {
  /** Knuth multiplicative constant; modulus is the classic 1e9+7 prime. */
  val Mult: Long  = 2654435761L
  val Prime: Long = 1000000007L
  /** Pre-modulus keeps `(key % PreMod + seed) * Mult` inside int64. */
  val PreMod: Long = 100003L

  /** Salted bucket hash in [0, Prime):
    * `(((key % 100003 + 100003 + seed) * 2654435761) % (1e9+7)) * (2·seed+1) % (1e9+7)`.
    * The second, seed-dependent multiplier decorrelates different seeds —
    * without it h(seed+1) = h(seed) + Mult (mod P), an affine shift that made
    * "independent" salted draws perfectly correlated.
    * The `+ PreMod` term keeps the pre-multiplier non-negative for negative
    * keys (Spark's and DuckDB's `%` both keep the dividend's sign), so the
    * [0, Prime) contract holds for the full int64 key range.
    */
  /** Seeds outside [0, 3.4e9] would break the contract silently (negative
    * final multiplier → negative hash → e.g. every split row labeled "train";
    * larger seeds overflow int64 in the pre-multiplier) — reject loudly.
    */
  val MaxSeed: Long = 3400000000L
  private def checkSeed(seed: Long): Unit =
    require(seed >= 0 && seed <= MaxSeed,
      s"hash seed must be in [0, $MaxSeed], got $seed")

  def mulHash(key: Column, seed: Long): Column = {
    checkSeed(seed)
    (((key % PreMod + PreMod + seed) * Mult) % Prime) * (2 * seed + 1) % Prime
  }

  /** Scalar (driver/executor-side) twin of [[mulHash]] — bit-identical, used
    * by the synthetic DSv2 source so its rows are oracle-replayable.
    */
  def mulHashLong(key: Long, seed: Long): Long = {
    checkSeed(seed)
    (((key % PreMod + PreMod + seed) * Mult) % Prime) * (2 * seed + 1) % Prime
  }

  /** Bucket in [0, buckets) — the split/sample primitive (SURVEY §2 rows 17-18). */
  def bucket(key: Column, seed: Long, buckets: Int): Column =
    mulHash(key, seed) % buckets

  /** Identical semantics rendered as DuckDB/ANSI SQL for the oracle. */
  def mulHashSql(key: String, seed: Long): String = {
    checkSeed(seed)
    s"(((($key) % $PreMod + $PreMod + $seed) * $Mult) % $Prime) * ${2 * seed + 1} % $Prime"
  }
  def bucketSql(key: String, seed: Long, buckets: Int): String =
    s"(${mulHashSql(key, seed)}) % $buckets"

  /** Polynomial rolling hash over a token array: fold `acc*31 +
    * tokenHash(token)` mod 1e9+7, where tokenHash is the FULL-CONTENT
    * codepoint polynomial below. Order-sensitive (a true fingerprint) and
    * replayable in DuckDB via nested `list_reduce` — the document-
    * fingerprint primitive (rolling hash over content). Rounds 1–9 folded
    * only `ascii(first) + 7·len` per token, so documents differing in
    * token interiors ("cat walked" / "cot warmed") fingerprinted equal;
    * the full-content per-token hash removes that structural collision.
    */
  def tokenRollingHash(tokens: Column): Column =
    aggregate(
      tokens,
      lit(0L),
      (acc, t) => (acc * 31L + tokenHash(t)) % Prime
    )

  def tokenRollingHashSql(tokensExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($tokensExpr, t -> ${tokenHashSql("t")})), (acc, x) -> (acc * 31 + x) % $Prime)"

  /** Per-token integer hash (shingle hashing for MinHash/SimHash): a
    * FULL-CONTENT codepoint polynomial,
    * h(t) = ((fold over codepoints: acc = (acc·131 + cp) mod P) · Mult) mod P.
    * Rounds 1–9 fingerprinted a token by (first char, last char, length)
    * only — "cat"/"cot" and "walked"/"warmed" collided BY CONSTRUCTION,
    * silently inflating every near-dup candidate set (MinHash/SimHash/
    * DSIR/DupSpans). The polynomial's only collisions are the birthday
    * bound of the 1e9+7 modulus (~1 pair per 45k distinct tokens at the
    * corpus vocabulary sizes here; q433 censuses the real rate).
    * Spark side is the codegen'd [[TextHashExprs.TokenHashExpr]] (a tight
    * per-token loop); DuckDB replays it with a char-split `list_reduce`.
    * Empty/NULL-safe: h("") = 0 on both engines (the DuckDB form filters
    * the one empty element `string_split('', '')` yields, since
    * `unicode('')` is −1 there, not 0).
    */
  def tokenHash(t: Column): Column = TextHashExprs.token_hash(t)

  def tokenHashSql(t: String): String =
    s"(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_filter(string_split($t, ''), c -> c <> ''), c -> CAST(unicode(c) AS BIGINT))), (acc, x) -> (acc * 131 + x) % $Prime) * $Mult) % $Prime"
}
