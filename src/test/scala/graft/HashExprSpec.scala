package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{Hashes, TextHashExprs}
import graft.operators.{ScalerPipeline, SkewJoin}

/** Equivalence + roundtrip invariants for the custom expressions and the
  * scale helpers.
  */
class HashExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("TextHashExprs.tokenHash matches the Column-expression tokenHash") {
    val toks = Seq("alpha", "b", "gamma7", "Zz")
    val viaCol = toks.toDF("t")
      .select(Hashes.tokenHash(col("t")).as("h"))
      .collect().map(_.getLong(0))
    val viaExpr = toks.map(t => TextHashExprs.tokenHash(UTF8String.fromString(t)))
    assert(viaCol.toSeq == viaExpr)
  }

  test("shingle_hashes matches a direct Scala reimplementation") {
    val text = "a bb ccc dddd ee f"
    val toks = text.split(" ")
    val th = toks.map(t => TextHashExprs.tokenHash(UTF8String.fromString(t)))
    val expected = (0 until toks.length - 2).map(i =>
      (th(i) * 961L + th(i + 1) * 31L + th(i + 2)) % Hashes.Prime)
    val got = Seq(text).toDF("text")
      .select(TextHashExprs.shingle_hashes(split(col("text"), " ")).as("sh"))
      .head().getSeq[Long](0)
    assert(got == expected)
  }

  test("minhash_signature equals per-j mins over shingle hashes") {
    val text = "one two three four five six seven"
    val got = Seq(text).toDF("text")
      .select(TextHashExprs.minhash_signature(split(col("text"), " "), 8).as("sig"))
      .head().getSeq[Long](0)
    val sh = Seq(text).toDF("text")
      .select(TextHashExprs.shingle_hashes(split(col("text"), " ")).as("sh"))
      .head().getSeq[Long](0)
    val expected = (0 until 8).map(j =>
      sh.map(h => (h * (2L * j + 1) + 12345L * j + 678) % Hashes.Prime).min)
    assert(got == expected)
  }

  test("salted skew join equals the plain join") {
    val left = (1L to 200L).map(i => (i % 10, i)).toDF("k", "v")
    val right = (0L until 10L).map(i => (i, s"r$i")).toDF("k", "name")
    val plain = left.join(right, "k").groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", col("v"), 4)
      .groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("scaler stats survive a save/load roundtrip and apply identically") {
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val stats = ScalerPipeline.fit(df, Seq("x" -> ScalerPipeline.Standard))
    val path = "/tmp/graft_test_stats"
    ScalerPipeline.save(spark, stats, path)
    val loaded = ScalerPipeline.load(spark, path)
    assert(loaded.toSet == stats.toSet)
    val a = ScalerPipeline.apply(df, stats).select("x_scaled").collect().map(_.getDouble(0))
    val b = ScalerPipeline.apply(df, loaded).select("x_scaled").collect().map(_.getDouble(0))
    assert(a.toSeq == b.toSeq)
  }

  test("different hash seeds are decorrelated (not affine shifts)") {
    val n = 2000
    val df = (1L to n).toDF("id")
    // correlation between bucket parities across seeds should be near zero
    val both = df.select(
      (Hashes.bucket(col("id"), 1, 100) < 50).cast("int").as("a"),
      (Hashes.bucket(col("id"), 2, 100) < 50).cast("int").as("b"))
      .agg(avg(col("a") * col("b")).as("ab"), avg("a").as("a"), avg("b").as("b"))
      .head()
    val cov = both.getDouble(0) - both.getDouble(1) * both.getDouble(2)
    assert(math.abs(cov) < 0.05, s"cov=$cov")
  }
}
