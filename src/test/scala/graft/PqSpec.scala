package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq

/** Product-quantization operator: encode parity with a plain-Scala
  * reference, partition-independence of codes, ADC/re-rank contracts.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 8
  private val m = 4
  private val ksub = 4

  /** 40 deterministic vectors with two obvious planted blobs per subspace. */
  private def vectors: Seq[(Long, Seq[Double])] =
    (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 0.0 else 10.0
      (i, (0 until dim).map(j => base + ((i * 7 + j * 3) % 5) * 0.1))
    }

  private def corpus = {
    import spark.implicits._
    vectors.toDF("vec_id", "embedding")
  }

  test("encode matches a plain-Scala argmin over the fitted codebooks") {
    val cb = Pq.fit(corpus, "vec_id", "embedding", dim, m, ksub, iters = 2)
    val got = Pq.encode(corpus, "vec_id", "embedding", cb)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toMap
    val sub = dim / m
    vectors.foreach { case (id, x) =>
      val want = (0 until m).map { s =>
        val quantized = (0 until ksub).map { w =>
          val d2 = (0 until sub).map { i =>
            val d = x(s * sub + i) - cb.words(s)(w)(i); d * d
          }.sum
          Math.round(d2 * 1e6)
        }
        quantized.indexOf(quantized.min)
      }.toList
      assert(got(id) == want, s"code mismatch for vec $id")
    }
  }

  test("sub-cap fit is bit-identical to an uncapped fit; a biting cap still " +
    "recovers the planted blob structure") {
    // cap >= N: the sample IS the corpus (hash order only), and KMeans seeds
    // by smallest id regardless of row order — codebooks must match exactly.
    val full = Pq.fit(corpus, "vec_id", "embedding", dim, m, ksub, iters = 2,
      sampleCap = 1 << 20)
    val default = Pq.fit(corpus, "vec_id", "embedding", dim, m, ksub, iters = 2)
    assert(default == full, "default cap changed a sub-cap corpus's codebooks")
    // cap < N: train on 12 of 40 vectors. The two planted blobs (base 0 vs
    // 10) are present in any hash-selected subset, so every subspace must
    // still learn codewords separating them: each vector's encode-time
    // nearest codeword lies in its own blob (distance << blob separation).
    val capped = Pq.fit(corpus, "vec_id", "embedding", dim, m, ksub, iters = 2,
      sampleCap = 12)
    val sub = dim / m
    vectors.foreach { case (_, x) =>
      (0 until m).foreach { s =>
        val best = (0 until ksub).map { w =>
          (0 until sub).map { i =>
            val d = x(s * sub + i) - capped.words(s)(w)(i); d * d
          }.sum
        }.min
        assert(best < 4.0, s"capped codebook lost the blob in subspace $s")
      }
    }
  }

  test("codes are identical under different partitionings") {
    val cb = Pq.fit(corpus, "vec_id", "embedding", dim, m, ksub, iters = 1)
    def codesOf(parts: Int) =
      Pq.encode(corpus.repartition(parts), "vec_id", "embedding", cb)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toList
    assert(codesOf(1) == codesOf(7))
  }

  test("ADC shortlist + exact re-rank finds the planted nearest neighbor") {
    import spark.implicits._
    val cb = Pq.fit(corpus, "vec_id", "embedding", dim, m, ksub, iters = 2)
    val codes = Pq.encode(corpus, "vec_id", "embedding", cb)
    // query = vector 0; its blob-mates (even ids) are the near set
    val q = Seq((0L, vectors(0)._2))
    val shortlist = Pq.adcTopK(codes, Pq.adcTables(spark, q, cb),
      k = 10, excludeSelf = true)
    val reranked = Pq.rerank(shortlist, corpus, "vec_id", "embedding",
      q.toDF("qid", "qv"), 5).orderBy("rank").collect()
    assert(reranked.length == 5)
    // every re-ranked neighbor must come from the same blob (even ids) —
    // cross-blob distance is ~100 per dimension vs <1 within the blob
    reranked.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") % 2 == 0,
        s"cross-blob neighbor ${r.getAs[Long]("neighbor_id")} in top-5")
    }
    // re-rank must order by exact distance: non-decreasing d2 down the ranks
    val d2s = reranked.map(_.getAs[Double]("d2")).toList
    assert(d2s == d2s.sorted)
  }

  test("ivfAdcTopK scores only vectors inside the probed cells") {
    import spark.implicits._
    val cb = Pq.fit(corpus, "vec_id", "embedding", dim, m, ksub, iters = 1)
    // coarse cells = the two planted blobs (k=2 recovers them exactly)
    val (assigned, cents) = graft.operators.KMeans.fit(
      corpus, "vec_id", "embedding", dim, k = 2, iters = 2)
    val codes = Pq.encode(corpus, "vec_id", "embedding", cb)
      .join(assigned, "vec_id")
    val q = Seq((0L, vectors(0)._2))
    val centroids = cents.orderBy("cluster").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val probes = Pq.probeCells(q, centroids, nprobe = 1)
    assert(probes.length == 1)
    val got = Pq.ivfAdcTopK(codes, Pq.adcTables(spark, q, cb),
      probes.toDF("qid", "cluster"), k = 30, excludeSelf = true).collect()
    // query 0 sits in the even blob; with nprobe=1 every scored vector must
    // share its cell, so all 19 same-blob mates and nothing else
    val ids = got.map(_.getAs[Long]("neighbor_id")).toSet
    assert(ids.forall(_ % 2 == 0), s"cross-cell ids scored: $ids")
    assert(got.length == 19)
  }

  test("adcTopK excludeSelf drops the query's own row before ranking") {
    import spark.implicits._
    val cb = Pq.fit(corpus, "vec_id", "embedding", dim, m, ksub, iters = 1)
    val codes = Pq.encode(corpus, "vec_id", "embedding", cb)
    val q = Seq((0L, vectors(0)._2))
    val withSelf = Pq.adcTopK(codes, Pq.adcTables(spark, q, cb), k = 1)
      .collect().head.getAs[Long]("neighbor_id")
    val without = Pq.adcTopK(codes, Pq.adcTables(spark, q, cb), k = 1,
      excludeSelf = true).collect().head.getAs[Long]("neighbor_id")
    assert(withSelf == 0L, "self has ADC distance 0 and must rank first")
    assert(without != 0L)
  }

  test("int8 scalar quantization: exact codes, half-up ties, zero dims") {
    import spark.implicits._
    // absmax per dim = [1.0, 2.0, 0.0]; codes = round(x·127/s), s=0 → 0.
    // 0.5·127/2.0 = 31.75 → 32; 1.0·127/2.0 = 63.5 lands EXACTLY on a .5
    // tie → away-from-zero 64 (the rule both engines share).
    val df = Seq(
      (1L, Seq(1.0, -2.0, 0.0)),
      (2L, Seq(0.5, 1.0, 0.0)),
      (3L, Seq(-0.25, 0.5, 0.0))).toDF("vec_id", "embedding")
    val got = graft.operators.ScalarQuant
      .encode(df, "vec_id", "embedding", dim = 3)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](3)).toMap
    assert(got(1L) == Seq(127L, -127L, 0L), got.toString)
    assert(got(2L) == Seq(64L, 64L, 0L), got.toString)
    assert(got(3L) == Seq(-32L, 32L, 0L), got.toString)
  }
}
