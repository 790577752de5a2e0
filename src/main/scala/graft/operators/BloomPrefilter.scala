package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomExprs.BloomMightContainExpr

/** Explicit Bloom-prefilter semi join (HANDOFF round-3 item; the pattern
  * Trino/Iceberg call a "dynamic filter" and Spark auto-injects as a runtime
  * bloom filter when its heuristics fire — see SCALE.md).
  *
  * Shape at 100 TB: the build side (small after its selective predicate) is
  * folded into an O(bits) Bloom filter via per-partition partials merged on a
  * tree (`treeAggregate` — bit-OR merge is associative+commutative, so the
  * result is independent of partitioning and merge order). The probe side is
  * filtered BEFORE its shuffle: rows that cannot join never enter the
  * exchange. With a 3% fpp filter, a 1%-selective join moves ~4% of the probe
  * bytes instead of 100% — the prefilter is where the scale win lives, the
  * exact semi join after it only cleans up the false positives.
  */
object BloomPrefilter {

  /** Fold a single-LONG-column relation into one Bloom filter. */
  def buildFilter(keys: DataFrame, expectedItems: Long, fpp: Double): BloomFilter =
    keys.na.drop().rdd.treeAggregate(BloomFilter.create(expectedItems, fpp))(
      (bf, row) => { bf.putLong(row.getLong(0)); bf },
      (a, b) => { a.mergeInPlace(b); a })

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Column predicate testing membership in a serialized filter. */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(
      BloomMightContainExpr(bloomBytes, GraftColumnBridge.expression(key.cast(LongType))))

  /** probe ⋉ build on long keys, with the probe side Bloom-prefiltered before
    * its shuffle. Result is EXACTLY the plain left-semi join (false positives
    * are removed by the join; false negatives are impossible).
    */
  def semiJoin(
      probe: DataFrame,
      probeKey: Column,
      build: DataFrame,
      buildKey: Column,
      expectedItems: Long,
      fpp: Double = 0.03): DataFrame = {
    val bf = buildFilter(build.select(buildKey.cast(LongType)), expectedItems, fpp)
    probe
      .filter(mightContain(serialize(bf), probeKey))
      .join(build, probeKey === buildKey, "left_semi")
  }
}
