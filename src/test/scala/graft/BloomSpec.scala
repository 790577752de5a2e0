package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomPrefilter

/** Bloom-prefilter semi join (operators/BloomPrefilter + functions/BloomExprs):
  * the no-false-negative guarantee (the correctness contract), the fpp sanity
  * bound, and end-to-end equality with the plain semi join.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives: every inserted key tests positive") {
    val keys = spark.range(0, 1000).toDF("k")
    val bf = BloomPrefilter.buildFilter(keys, expectedItems = 1000, fpp = 0.03)
    val bytes = BloomPrefilter.serialize(bf)
    val missed = keys
      .filter(!BloomPrefilter.mightContain(bytes, col("k")))
      .count()
    assert(missed == 0)
  }

  test("false-positive rate stays near the configured fpp") {
    val keys = spark.range(0, 1000).toDF("k")
    val bf = BloomPrefilter.buildFilter(keys, expectedItems = 1000, fpp = 0.03)
    val bytes = BloomPrefilter.serialize(bf)
    // 10k keys guaranteed absent (disjoint id range)
    val fp = spark.range(1000000, 1010000).toDF("k")
      .filter(BloomPrefilter.mightContain(bytes, col("k")))
      .count()
    assert(fp < 10000 * 0.03 * 5, s"false-positive count $fp way above fpp budget")
  }

  test("merge is order-independent: filter built distributed equals single-partition build") {
    val wide = spark.range(0, 5000).toDF("k").repartition(8)
    val narrow = spark.range(0, 5000).toDF("k").coalesce(1)
    val a = BloomPrefilter.serialize(BloomPrefilter.buildFilter(wide, 5000, 0.03))
    val b = BloomPrefilter.serialize(BloomPrefilter.buildFilter(narrow, 5000, 0.03))
    assert(java.util.Arrays.equals(a, b))
  }

  test("prefiltered semi join equals the plain semi join") {
    val probe = spark.range(0, 20000).select(col("id").as("k"), (col("id") % 7).as("v"))
    val build = spark.range(0, 20000).filter(col("id") % 13 === 0).select(col("id").as("bk"))
    val pre = BloomPrefilter.semiJoin(probe, col("k"), build, col("bk"), expectedItems = 4096)
      .orderBy("k").collect()
    val plain = probe.join(build, col("k") === col("bk"), "left_semi")
      .orderBy("k").collect()
    assert(pre.toSeq == plain.toSeq)
  }

  test("bloom_might_contain is SQL-registered and rejects non-literal filters") {
    val bf = BloomPrefilter.buildFilter(spark.range(0, 10).toDF("k"), 16, 0.03)
    val hex = BloomPrefilter.serialize(bf).map("%02X".format(_)).mkString
    val n = spark.sql(
      s"SELECT count(*) AS n FROM range(0, 10) WHERE bloom_might_contain(X'$hex', id)")
      .as[Long].head()
    assert(n == 10)
    val err = intercept[Exception] {
      // unhex(...) is BINARY but not a Literal at function-resolution time
      spark.sql("SELECT bloom_might_contain(unhex('AA'), id) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("BINARY literal") ||
      Option(err.getCause).exists(_.getMessage.contains("BINARY literal")))
  }
}
