package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashes

/** Deterministic splits and samples (SURVEY §2 rows 17-19).
  *
  * The reference's `train_test_split(..., stratify=class, random_state=21)` ×2
  * (create_train_valid_test_datasets.py:119-127) and sample-with-replacement
  * augmentation draw (`:78-80`) run on numpy RNG streams that are not
  * reproducible elsewhere. The engine declares salted-hash semantics instead
  * (SURVEY §7.4.1): each row's split is a pure function of its key and the
  * seed — no shuffle, no RNG state, identical on 1 or 1000 executors, and the
  * oracle can replay it in SQL arithmetic.
  *
  * Stratification: the hash is uniform *within any key subset*, so per-class
  * proportions are preserved in expectation for every class — the property the
  * reference's `stratify=` asks for — without a per-class pass.
  */
object Split {

  /** 0..99 percentile bucket for a row key. */
  def pctBucket(key: Column, seed: Long): Column =
    Hashes.bucket(key, seed, 100)

  /** Assign train/valid/test with the reference's fractions
    * (test 0.2, valid 0.2 of remainder ⇒ 64/16/20 overall;
    * create_train_valid_test_datasets.py:14,16-17).
    */
  def assignSplit(key: Column, seed: Long): Column = {
    val b = pctBucket(key, seed)
    when(b < 64, "train").when(b < 80, "valid").otherwise("test")
  }

  /** Deterministic ~fraction sample: keep rows whose salted bucket falls under
    * `pct` of 100 (replacement-free analog of the reference's augmentation
    * draw, declared per SURVEY §2 row 18).
    */
  def sample(df: DataFrame, key: Column, seed: Long, pct: Int): DataFrame =
    df.where(pctBucket(key, seed) < pct)

  /** Oracle SQL fragments with identical arithmetic. */
  def assignSplitSql(key: String, seed: Long): String = {
    val b = Hashes.bucketSql(key, seed, 100)
    s"CASE WHEN $b < 64 THEN 'train' WHEN $b < 80 THEN 'valid' ELSE 'test' END"
  }
  def sampleSql(key: String, seed: Long, pct: Int): String =
    s"${Hashes.bucketSql(key, seed, 100)} < $pct"
}
