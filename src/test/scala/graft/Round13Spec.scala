package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property guards for the round-9 additions: the bottom-k quantile sketch
  * (mergeability under arbitrary splits, rank-error bound against the
  * exact ranks, streamed ≡ batch) — each pinning the claim the operator
  * exists to make, not just the oracle's mirrored arithmetic.
  */
class Round13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("quantile sketch: merge of any partition == reduce over the whole") {
    import graft.functions.QuantileSketch.QSketchAgg
    val agg = new QSketchAgg(16)
    // deterministic pseudo-random stream with duplicate (h, x) pairs mixed in
    val rows = (0 until 500).map { i =>
      val h = (i * 2654435761L) % 1009
      (h, (h * 31 + i % 7) % 101)
    } ++ Seq((5L, 5L), (5L, 5L), (0L, 42L), (0L, 42L))
    val full = rows.foldLeft(agg.zero)(agg.reduce)
    // every contiguous split point, plus an interleaved 3-way split
    for (cut <- Seq(1, 7, 100, 250, 503)) {
      val (a, b) = rows.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(merged.toSeq == full.toSeq, s"split at $cut diverged")
    }
    val threeWay = (0 until 3).map(r =>
      rows.zipWithIndex.collect { case (e, i) if i % 3 == r => e }
        .foldLeft(agg.zero)(agg.reduce))
    assert(threeWay.reduce(agg.merge).toSeq == full.toSeq,
      "interleaved 3-way merge diverged")
    // the sketch holds exactly k pairs, (h, x) ascending, duplicates kept
    assert(full.length == 32)
    val pairs = full.grouped(2).map(p => (p(0), p(1))).toSeq
    assert(pairs == pairs.sorted)
    assert(pairs.count(_ == (0L, 42L)) == 2, "multiset semantics lost a dup")
  }

  test("q400 rank error stays inside the bottom-k bound") {
    val rows = run("q400_quantile_sketch").collect()
    assert(rows.length == 15, "3 flags x 5 quantiles")
    rows.foreach { r =>
      val err = r.getAs[Long]("err_ppm")
      val nHeld = r.getAs[Long]("n_held")
      // k = 1024 → rank-error std ≈ √(q(1−q)/k) ≤ 1.6% — 6% is ~4σ. A
      // flag smaller than k is sampled whole, where the only error is the
      // ceil-rank discretization (≤ 1/n plus value ties).
      assert(err <= 60000L,
        s"${r.getAs[String]("flag")} q${r.getAs[Int]("q_pct")}: " +
          s"rank error ${err} ppm (n_held=$nHeld) outside 6%")
    }
  }

  test("q401 streamed quantile sketch equals the batch sketch bit-for-bit") {
    val rows = run("q401_stream_quantiles").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("stream_eq_batch"),
        s"${r.getAs[String]("event_type")}: streamed sketch diverged")
      assert(r.getAs[Long]("p50_x") <= r.getAs[Long]("p90_x"),
        "quantile estimates not monotone")
      assert(r.getAs[Long]("h_1") <= r.getAs[Long]("h_k"))
    }
  }
}
