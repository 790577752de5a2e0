package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Guards for the q455-era additions (NOTE: RoundNSpec file numbers are a
  * sequential spec series, not build-round numbers — this is the build
  * round that shipped q455–q468): the Bradley–Terry MM fit (q455) — win-count-order
  * invariant on balanced schedules (Ford 1957: on a connected balanced
  * design the BT MLE ranking agrees with win totals) plus the e6
  * renormalization contract.
  */
class Round15Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Bradley-Terry reproduces win-count order on balanced schedules") {
    import spark.implicits._
    import graft.operators.BradleyTerry
    // Balanced: every pair of 4 players plays exactly 2 matches; outcomes
    // come from the salted hash so each case is deterministic.
    val pairs = for {
      i <- 0 until 4; j <- (i + 1) until 4; r <- 0 until 2
    } yield (i.toLong, j.toLong, r)
    for (seed <- 1 to 6) {
      val matches = pairs.zipWithIndex.map { case ((a, b, _), idx) =>
        val h = graft.functions.Hashes.mulHashLong(idx.toLong, seed.toLong)
        (a, b, if (h % 2 == 0) 1L else 0L)
      }
      val out = BradleyTerry.fit(spark, matches.toDF("pa", "pb", "awin"),
          spark.range(4).toDF("player"), nPlayers = 4, rounds = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      for ((pi, wi, si) <- out; (pj, wj, sj) <- out if wi > wj)
        assert(si > sj,
          s"seed=$seed: player $pi (w=$wi, s=$si) must outrank" +
            s" $pj (w=$wj, s=$sj)")
      // renormalize contract: Σ strengths ∈ (target − players, target]
      val tot = out.map(_._3).sum
      assert(tot <= 4000000L && tot > 4000000L - 4, s"seed=$seed: tot=$tot")
      assert(out.forall(_._3 >= 1L))
    }
  }

  test("Bradley-Terry strengths are match-order independent") {
    import spark.implicits._
    import graft.operators.BradleyTerry
    // ELO (q453) is path-dependent; BT must not be: reversing the match
    // log leaves every strength bit-identical.
    val log = (0 until 30).map { m =>
      val pa = (graft.functions.Hashes.mulHashLong(m.toLong, 3) % 5).toInt
      val pb = ((pa + 1 + graft.functions.Hashes.mulHashLong(m.toLong, 5) % 4) % 5).toInt
      (pa.toLong, pb.toLong,
        if (graft.functions.Hashes.mulHashLong(m.toLong, 7) % 2 == 0) 1L
        else 0L)
    }
    def strengths(ms: Seq[(Long, Long, Long)]) =
      BradleyTerry.fit(spark, ms.toDF("pa", "pb", "awin"),
          spark.range(5).toDF("player"), nPlayers = 5, rounds = 6)
        .orderBy("player").collect().map(_.getLong(2)).toSeq
    assert(strengths(log) == strengths(log.reverse))
  }

  test("fitPolicy re-derives the shipped constants from the q298/q299 fixtures") {
    import spark.implicits._
    import graft.operators.NswGraph
    // the measured pricing data the shipped constants came from: 25%
    // batches decaying 96.0% -> 91.0% over 8 unrefreshed upserts (q298,
    // ~0.6 pt/batch), one refresh recovering to 95.5% (q299), past the
    // one-shot rebuild's 94.5%
    val decay = (1 to 8).map(k =>
      (25L, 960000L - (k - 1) * (50000L / 7))).toDF("batch_pct", "recall_ppm")
    val recovery = Seq(955000L).toDF("recall_ppm")
    val p = NswGraph.fitPolicy(decay, recovery, rebuildRecallPpm = 945000L)
    assert(p.upsertMaxRatioPct == NswGraph.UpsertMaxRatioPct)
    assert(p.refreshEveryBatches == NswGraph.RefreshEveryBatches)
    assert(p.decayPpmPerBatch > 5000L && p.decayPpmPerBatch < 8000L)
    // an UNLICENSED batch size (refresh below the rebuild bar) must refuse
    val e = intercept[IllegalArgumentException](
      NswGraph.fitPolicy(decay, Seq(940000L).toDF("recall_ppm"), 945000L))
    assert(e.getMessage.contains("NOT licensed"))
  }

  test("q458 packing invariants: no bin over W, every doc packed once") {
    val out = SparkEntry.queries("q458_sequence_packing")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("tokens_used") <= 100L),
      "a bin exceeds the context window")
    assert(out.map(_.getAs[Long]("n_docs")).sum == 500L,
      "doc count must equal the corpus")
    assert(out.forall(r => r.getAs[Long]("fill_ppm") <= 1000000L))
  }

  test("q461 MMR invariants: 10 distinct picks per query, pick 1 = top rel") {
    import org.apache.spark.sql.functions.col
    val out = SparkEntry.queries("q461_mmr_diversify")(
      spark, "/root/testdata/sf0.001").collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 5)
    // the first pick is the pure-relevance argmax = the exact cosine top-1
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val top1 = graft.operators.Similarity
      .bruteForceTopK(emb, emb.where(col("vec_id") < 5), 1)
      .collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 10, s"query $q must have 10 picks")
      val nbs = rows.map(_.getAs[Long]("neighbor_id"))
      assert(nbs.distinct.length == 10, s"query $q picks must be distinct")
      val first = rows.minBy(_.getAs[Long]("pick_idx"))
      assert(first.getAs[Long]("neighbor_id") == top1(q),
        s"query $q: pick 1 must be the exact top-1 by relevance")
    }
  }

  test("ExactSubstr scrub cuts the doc_b copy, keeps doc_a, unions overlaps") {
    import spark.implicits._
    import graft.operators.ExactSubstr
    def toks(prefix: String, n: Int) = (0 until n).map(i => s"${prefix}_$i")
    val run = toks("shared", 10)
    val runB = toks("tail", 9)
    // doc 0: the kept copy. doc 1: same run (cut). doc 2: two OVERLAPPING
    // repeats vs docs 0/1 through a longer window — union per position.
    // doc 3: untouched.
    val docs = Seq(
      (0L, toks("a", 5) ++ run ++ toks("a2", 5)),
      (1L, toks("b", 3) ++ run ++ runB ++ toks("b2", 4)),
      (2L, toks("c", 2) ++ runB ++ toks("c2", 6)),
      (3L, toks("d", 12))
    ).toDF("doc_id", "toks")
    val out = ExactSubstr.scrub(docs, col("doc_id"), col("toks"),
        minLen = 8, cap = 16)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList,
        r.getSeq[String](2).toList))
    // doc 0 is only ever doc_a — untouched
    assert(out(0)._3 == out(0)._2)
    // doc 1 is doc_b of (0,1) [10-run] and doc_a of (1,2) [9-run]:
    // the shared 10-run cut, the tail run KEPT (doc 1 is the lower id)
    assert(out(1)._3 == (toks("b", 3) ++ runB ++ toks("b2", 4)).toList)
    // doc 2 is doc_b of (1,2): its 9-token tail run cut
    assert(out(2)._3 == (toks("c", 2) ++ toks("c2", 6)).toList)
    // doc 3 shares nothing — passes through
    assert(out(3)._3 == out(3)._2)
  }
}
