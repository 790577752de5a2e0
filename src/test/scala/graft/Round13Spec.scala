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

  test("q403 CUSUM changepoint lands on an interior day with a level shift") {
    val rows = run("q403_cusum_changepoint").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Long]("cp_t")
      val nd = r.getAs[Long]("n_days")
      assert(t >= 1 && t < nd, s"changepoint index $t outside (0, $nd)")
      assert(r.getAs[Long]("cusum_stat") > 0)
      // the argmax day separates two different mean levels by definition
      // of a nonzero max |S_t|
      assert(r.getAs[Long]("pre_mean_e6") != r.getAs[Long]("post_mean_e6"))
    }
  }

  test("q404 AMS F2 estimators bracket the exact self-join size") {
    val r = run("q404_ams_f2").collect()(0)
    val exact = r.getAs[Long]("f2_exact")
    assert(exact > 0)
    // 16 averaged ±1-hash estimators: relative std ≈ √(2/16) ≈ 35% — a
    // 100% band is ~3σ; the point is the right ORDER OF MAGNITUDE from
    // one mergeable pass, not precision
    assert(r.getAs[Long]("mean_err_ppm") <= 1000000L,
      s"mean estimator off by ${r.getAs[Long]("mean_err_ppm")} ppm")
    assert(r.getAs[Long]("median_err_ppm") <= 1000000L,
      s"median estimator off by ${r.getAs[Long]("median_err_ppm")} ppm")
  }

  test("q405 depth-2 CART recovers the planted rule") {
    val rows = run("q405_cart_tree").collect()
    assert(rows.length == 4, "a depth-2 tree has 4 leaves")
    val n = rows.map(_.getAs[Long]("n")).sum
    val correct = rows.map(_.getAs[Long]("n_correct")).sum
    // 10% planted label noise → a tree that recovers the rule sits ≈ 90%
    assert(correct * 100 >= n * 85,
      s"accuracy ${correct * 100 / n}% — the planted rule was not recovered")
    val pos = rows.filter(_.getAs[Long]("pred") == 1)
    assert(pos.length == 1,
      s"planted AND-rule has ONE positive cell, tree predicts ${pos.length}")
    // the positive leaf's path must be exactly {bucket > 2, prio <= 2}
    val leaf = pos(0)
    val conds = Seq(
      (leaf.getAs[String]("root_f"), leaf.getAs[Long]("root_t"),
        leaf.getAs[String]("leaf").charAt(0)),
      (leaf.getAs[String]("sub_f"), leaf.getAs[Long]("sub_t"),
        leaf.getAs[String]("leaf").charAt(1))).toSet
    assert(conds == Set(("bucket", 2L, 'R'), ("prio", 2L, 'L')),
      s"positive leaf path $conds is not the planted rule")
  }

  test("q407 Y4M sampling keeps every 2nd frame of every fixture") {
    val rows = run("q407_y4m_sample").collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val nf = r.getAs[Long]("n_frames")
      val ns = r.getAs[Long]("n_sampled")
      assert(nf == 6 + r.getAs[Long]("media_id") % 5)
      assert(ns == (nf + 1) / 2, s"stride-2 sampling: $ns of $nf")
      assert(r.getAs[Long]("sum_y") > 0 && r.getAs[Long]("wsum") > 0)
    }
    // the decoder rejects colorspaces outside {C444, C420*, C422} rather
    // than misparsing payload bytes as frame headers (C420 support is
    // Round14Spec's surface; C422 landed in round 13 — q477)
    import graft.operators.MediaCodecs
    val c411 = "YUV4MPEG2 W4 H2 F25:1 C411\nFRAME\n".getBytes("US-ASCII") ++
      Array.fill[Byte](16)(0)
    intercept[IllegalArgumentException](MediaCodecs.decodeY4m(c411))
    // C422 decodes now, but odd WIDTH still rejects (even-width-only rule)
    val oddW = "YUV4MPEG2 W5 H2 F25:1 C422\nFRAME\n".getBytes("US-ASCII") ++
      Array.fill[Byte](20)(0)
    intercept[IllegalArgumentException](MediaCodecs.decodeY4m(oddW))
    // 2×1 upsample correctness on a handcrafted frame: W4 H2, Y = 0..7,
    // U half-width rows (10,11 / 12,13), V (20,21 / 22,23) — each chroma
    // byte must cover its horizontal pair at FULL height
    val y = Array.tabulate[Byte](8)(_.toByte)
    val u = Array[Byte](10, 11, 12, 13)
    val v = Array[Byte](20, 21, 22, 23)
    val f = MediaCodecs.decodeY4m(
      "YUV4MPEG2 W4 H2 F25:1 C422\nFRAME\n".getBytes("US-ASCII") ++
        y ++ u ++ v).frames(0)
    assert(f.slice(0, 8).toSeq == y.toSeq)
    assert(f.slice(8, 16).toSeq ==
      Seq[Byte](10, 10, 11, 11, 12, 12, 13, 13))
    assert(f.slice(16, 24).toSeq ==
      Seq[Byte](20, 20, 21, 21, 22, 22, 23, 23))
  }

  test("q408 RRF fuses both modalities and ranks dual hits sensibly") {
    val rows = run("q408_rrf_fusion").collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 5)
    byQ.foreach { case (qid, rs) =>
      assert(rs.length == 5, s"query $qid: ${rs.length} fused rows")
      // fused scores non-increasing in fused_rank
      val sorted = rs.sortBy(_.getAs[Long]("fused_rank"))
      val scores = sorted.map(_.getAs[Long]("rrf_e9"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      // every fused row came from at least one list
      rs.foreach(r =>
        assert(r.getAs[Long]("in_lex") + r.getAs[Long]("in_vec") >= 1))
    }
    // score algebra: a list member contributes 1e9/(60+r) for r in 1..10,
    // so every fused row sits in [1e9 div 70, lists * (1e9 div 61)] — and
    // a dual-membership doc (when the fixture produces one) must carry
    // more than any single-list maximum
    rows.foreach { r =>
      val lists = r.getAs[Long]("in_lex") + r.getAs[Long]("in_vec")
      val sc = r.getAs[Long]("rrf_e9")
      assert(sc >= lists * (1000000000L / 70) && sc <= lists * (1000000000L / 61),
        s"rrf score $sc outside the $lists-list band")
      if (lists == 2)
        assert(sc > 1000000000L / 61, "dual hit does not outrank singles")
    }
  }

  test("q410/q412: streamed Page-CUSUM equals the batch recurrence row-for-row") {
    val batch = run("q410_page_cusum")
    val stream = run("q412_stream_cusum")
    assert(batch.exceptAll(stream).count() == 0)
    assert(stream.exceptAll(batch).count() == 0)
    // recurrence invariants on the shared trace
    batch.collect().foreach { r =>
      val sc = r.getAs[Long]("s_cusum")
      assert(sc >= 0, "CUSUM state went negative")
      assert((r.getAs[Long]("alarm") == 1) == (sc > 3 * r.getAs[Long]("refx")))
    }
  }

  test("q411 item-CF recommendations exclude held items and rank correctly") {
    import org.apache.spark.sql.functions._
    val rows = run("q411_item_cf").collect()
    assert(rows.nonEmpty)
    val byC = rows.groupBy(_.getAs[Long]("customer"))
    byC.foreach { case (c, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length).toSeq, s"customer $c ranks not dense")
      val scores = sorted.map(_.getAs[Long]("score_e12"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // no recommendation may be an item the customer already holds
    val held = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("customer"), col("l_partkey").as("item"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val key = (r.getAs[Long]("customer"), r.getAs[Long]("item"))
      assert(!held.contains(key), s"recommended an already-held item: $key")
    }
  }

  test("q413 LOGO influence: algebra consistent, slopes finite") {
    val rows = run("q413_logo_influence").collect()
    assert(rows.length == 25)
    val full = rows.map(_.getAs[Long]("slope_full_e6")).distinct
    assert(full.length == 1, "full-data slope must be one number")
    rows.foreach { r =>
      assert(r.getAs[Long]("influence_e6")
        == r.getAs[Long]("slope_loo_e6") - r.getAs[Long]("slope_full_e6"))
      assert(r.getAs[Long]("n_group") > 0)
    }
    // influence must actually vary across groups (else the census
    // subtraction is broken and every LOO slope equals the full slope)
    assert(rows.map(_.getAs[Long]("influence_e6")).distinct.length > 1)
  }

  test("q414 PPR: mass bounded, seed prominent, ranks dense") {
    val rows = run("q414_personalized_pagerank").collect()
    def num(r: org.apache.spark.sql.Row, c: String): Long =
      r.getAs[Number](c).longValue
    val byS = rows.groupBy(num(_, "seed"))
    assert(byS.size == 5)
    byS.foreach { case (seed, rs) =>
      val sorted = rs.sortBy(num(_, "rank"))
      assert(sorted.map(num(_, "rank")).toSeq == (1L to sorted.length).toSeq)
      // total mass ≤ 1e9 (restart + spread only lose mass to dangling
      // nodes and truncation, never create it)
      assert(rs.map(num(_, "ppr_e9")).sum <= 1000000000L)
      // personalization: the seed's own mass must be in its top-10
      assert(rs.exists(num(_, "node") == seed),
        s"seed $seed missing from its own top-10")
    }
  }

  test("q415 backtest ranks three models per series by measured MAE") {
    val rows = run("q415_forecast_backtest").collect()
    val byT = rows.groupBy(_.getAs[String]("event_type"))
    byT.foreach { case (t, rs) =>
      assert(rs.map(_.getAs[String]("model")).toSet ==
        Set("naive", "ewma", "holt"), s"$t models incomplete")
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      val maes = sorted.map(_.getAs[Long]("mae_cents"))
      assert(maes.zip(maes.tail).forall { case (a, b) => a <= b })
      assert(maes.forall(_ >= 0))
      assert(sorted.forall(_.getAs[Long]("n_origins") == 10))
    }
  }

  test("q409 entity resolution recovers planted variants above 90%") {
    val rows = run("q409_entity_resolution").collect()
    assert(rows.nonEmpty)
    val nVar = rows.head.getAs[Long]("n_variants")
    val nCor = rows.head.getAs[Long]("n_correct")
    // duplicate descriptors (~2% of the catalog) are the honest ceiling;
    // anything near the block-size floor means the scorer stopped
    // discriminating
    assert(nCor * 10 >= nVar * 9, s"resolution accuracy $nCor/$nVar < 90%")
    rows.foreach { r =>
      if (r.getAs[Long]("is_correct") == 1)
        assert(r.getAs[Long]("jw_e6") >= 850000,
          "a correct match scored under the resolve threshold")
    }
  }

  test("q417 UCB1 replay explores then exploits over the day grid") {
    val rows = run("q417_ucb1_replay").collect().sortBy(_.getAs[Long]("t"))
    assert(rows.nonEmpty)
    // initialization: steps 1..5 play arms 1..5 in order
    assert(rows.take(5).map(_.getAs[Long]("chosen_arm")).toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
    rows.foreach { r =>
      val a = r.getAs[Long]("chosen_arm")
      assert(a >= 1 && a <= 5)
      assert(r.getAs[Long]("r_chosen_e6") >= 0)
    }
    // the best-in-hindsight arm must be pulled more than once after the
    // exploration phase on any grid where it actually leads
    val best = rows.head.getAs[Long]("best_arm")
    assert(rows.count(_.getAs[Long]("chosen_arm") == best) >= 2,
      "UCB1 never returned to the best arm")
  }

  test("q418 IPS/SNIPS: one logged arm per step, estimates bounded") {
    val rows = run("q418_ips_offpolicy").collect()
    assert(rows.length == 5)
    val nSteps = rows.head.getAs[Long]("n_steps")
    assert(rows.forall(_.getAs[Long]("n_steps") == nSteps))
    // the uniform log records exactly ONE arm per step
    assert(rows.map(_.getAs[Long]("n_match")).sum == nSteps)
    rows.foreach { r =>
      assert(r.getAs[Long]("true_mean_e6") >= 0
        && r.getAs[Long]("true_mean_e6") <= 1000000L)
      // SNIPS is a weighted mean of observed rewards → bounded by 1e6;
      // IPS has no such bound (that's its variance problem)
      assert(r.getAs[Long]("snips_e6") >= 0
        && r.getAs[Long]("snips_e6") <= 1000000L)
    }
  }

  test("q419 IVM: delta algebra equals recompute; min boundary honest") {
    val rows = run("q419_ivm_aggregate").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("maintained_eq"),
        s"${r.getAs[String]("flag")}: maintained aggregate diverged")
      assert(r.getAs[Long]("n_maint") == r.getAs[Long]("n_recomputed"))
    }
  }

  test("q420 sketch-ntile buckets stay near quarter shares without a sort") {
    val rows = run("q420_sketch_ntile").collect()
    assert(rows.map(_.getAs[Int]("bucket")).sorted.toSeq == Seq(1, 2, 3, 4))
    rows.foreach { r =>
      // k = 1024 → rank error std ≈ 1.4% per boundary; 6% ≈ 4σ
      assert(r.getAs[Long]("skew_ppm") <= 60000L,
        s"bucket ${r.getAs[Int]("bucket")} skew " +
          s"${r.getAs[Long]("skew_ppm")} ppm — sketch boundaries broken")
    }
    assert(rows.map(_.getAs[Long]("share_ppm")).sum >= 999996L)
  }

  test("q421 prefix-sharing census is internally consistent") {
    val rows = run("q421_prefix_sharing").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_groups") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_shared_docs") <= r.getAs[Long]("n_docs"))
      // shared tokens = 4 per doc beyond each group's first
      assert(r.getAs[Long]("shared_tok")
        <= (r.getAs[Long]("n_docs") - 1) * 4)
      assert(r.getAs[Long]("sharing_ppm") <= 1000000L)
    }
  }

  test("q422 assortativity is a valid correlation") {
    val r = run("q422_assortativity").collect()(0)
    val a = r.getAs[Long]("assortativity_e6")
    assert(a >= -1000000L && a <= 1000000L, s"r=$a outside [-1, 1] e6")
    assert(r.getAs[Long]("n_directed_edges") > 0)
  }

  test("q423 k-truss peel is monotone and survivors meet the threshold") {
    val rows = run("q423_ktruss").collect().sortBy(_.getAs[Long]("round"))
    assert(rows.length == 3)
    val ns = rows.map(_.getAs[Long]("n_edges"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      s"peel grew the graph: ${ns.toSeq}")
    assert(ns.last > 0, "truss emptied — threshold census degenerate")
    val thr = rows.head.getAs[Long]("thr")
    rows.foreach { r =>
      Option(r.getAs[java.lang.Long]("sup")).foreach(sp =>
        assert(sp >= thr, "surviving edge under threshold"))
    }
  }

  test("q424 Kaplan-Meier curve is a valid survival function") {
    val rows = run("q424_kaplan_meier").collect()
      .sortBy(_.getAs[Long]("duration_days"))
    assert(rows.length >= 3, "duration census degenerate")
    val sv = rows.map(_.getAs[Long]("survival_e6"))
    assert(sv.forall(x => x >= 0 && x <= 1000000L))
    assert(sv.zip(sv.tail).forall { case (a, b) => a >= b },
      s"survival not monotone: ${sv.toSeq}")
    val risk = rows.map(_.getAs[Long]("n_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => a >= b },
      "risk set grew over time")
    // censoring matters: at least one step's deaths < its risk set
    // shrinkage (the censored leave without dying)
    assert(rows.map(_.getAs[Long]("n_churned")).sum < risk.head,
      "nobody censored — the estimator degenerates to the naive curve")
  }

  test("q425 log-rank cells are hypergeometric-consistent") {
    val rows = run("q425_logrank").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
      val d1 = r.getAs[Long]("d1"); val d2 = r.getAs[Long]("d2")
      assert(d1 <= n1 && d2 <= n2, "more deaths than at-risk")
      assert(d1 + d2 >= 1, "a death time with no deaths")
      // E1 is a share of pooled deaths: 0 ≤ E1 ≤ (d1+d2)·1e6
      val e1 = r.getAs[Long]("e1_e6")
      assert(e1 >= 0 && e1 <= (d1 + d2) * 1000000L)
      assert(r.getAs[Long]("v_e6") >= 0)
      assert(r.getAs[Long]("logrank_e6") >= 0)
    }
  }

  test("q426 RFM segments partition the users and their value exactly") {
    val rows = run("q426_rfm_segments").collect()
    rows.foreach { r =>
      val seg = r.getAs[Long]("segment")
      val (rt, ft, mt) = (seg / 100, seg / 10 % 10, seg % 10)
      assert(Seq(rt, ft, mt).forall(t => t >= 1 && t <= 3),
        s"segment $seg is not three terciles")
    }
    // shares sum to ~1e6 (truncation loses at most 1 ppm per segment)
    val shares = rows.map(_.getAs[Long]("value_share_ppm")).sum
    assert(shares >= 1000000L - rows.length && shares <= 1000000L)
  }

  test("q427 eta-squared is a valid variance share") {
    val rows = run("q427_seasonal_strength").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val eta = r.getAs[Long]("eta2_ppm")
      assert(eta >= 0 && eta <= 1000000L,
        s"${r.getAs[String]("event_type")}: eta2 $eta outside [0, 1]")
      assert(r.getAs[Long]("n_dow") <= 7)
      assert(r.getAs[Long]("f_e6") >= 0)
    }
  }

  test("q428 novelty rate starts at 100% and the corpus gets less novel") {
    val rows = run("q428_trigram_novelty").collect()
      .sortBy(_.getAs[Long]("batch"))
    assert(rows.length == 10)
    assert(rows.head.getAs[Long]("novelty_ppm") == 1000000L,
      "batch 0's trigrams are all first-seen by definition")
    // freshness declines overall: the last batch is less novel than the
    // first real measurement point
    assert(rows.last.getAs[Long]("novelty_ppm")
      < rows(1).getAs[Long]("novelty_ppm"),
      "novelty never declined — dedup census broken")
    rows.foreach(r => assert(r.getAs[Long]("n_new")
      <= r.getAs[Long]("n_distinct")))
  }

  test("q429 best F1 threshold recovers the planted score boost") {
    val rows = run("q429_f1_threshold").collect()
    val best = rows.filter(_.getAs[Boolean]("is_best"))
    assert(best.nonEmpty)
    val b = best.minBy(_.getAs[Long]("threshold"))
    // the planted boost puts positives in [300000, 1300000); the optimal
    // cut must sit inside the band where classes actually overlap
    val thr = b.getAs[Long]("threshold")
    assert(thr >= 300000L && thr < 1300000L,
      s"best threshold $thr outside the planted boost band")
    // and it must beat the all-positive baseline F1 = 2p/(n+p)
    val tp = b.getAs[Long]("tp"); val fp = b.getAs[Long]("fp")
    val fn = b.getAs[Long]("fn")
    val p = tp + fn
    val n = rows.map(_.getAs[Long]("n_pos_pred")).max
    val baseline = 2 * p * 1000000L / (n + p)
    assert(b.getAs[Long]("f1_ppm") > baseline,
      s"tuned F1 ${b.getAs[Long]("f1_ppm")} <= all-positive $baseline")
    assert(fp >= 0 && fn >= 0)
  }

  test("q430 coordinated sample estimates the join within sampling error") {
    val r = run("q430_coordinated_sample").collect()(0)
    assert(r.getAs[Long]("n_sampled") > 0,
      "coordinated sample empty — independent-sampling p² collapse?")
    // a ~2% key sample at this scale carries ~10% relative std on the
    // join count; 30% is a ~3σ band
    assert(r.getAs[Long]("n_err_ppm") <= 300000L,
      s"join-count estimate off by ${r.getAs[Long]("n_err_ppm")} ppm")
    assert(r.getAs[Long]("rev_err_ppm") <= 300000L,
      s"revenue estimate off by ${r.getAs[Long]("rev_err_ppm")} ppm")
    assert(r.getAs[Long]("n_est") == r.getAs[Long]("n_sampled") * 50)
  }

  test("q431 lifecycle chain is row-stochastic and settles to a mix") {
    val rows = run("q431_lifecycle_markov").collect()
    assert(rows.length >= 4, "transition matrix degenerate")
    rows.foreach { r =>
      val p = r.getAs[Long]("p_e6")
      assert(p >= 0 && p <= 1000000L)
      // row-stochastic within per-cell truncation (≤ 1 ppm per cell)
      val rs = r.getAs[Long]("row_sum_e6")
      assert(rs >= 1000000L - 3 && rs <= 1000000L, s"row sum $rs")
    }
    // the settled distribution is a probability mix over the from-states
    val settled = rows.map(r => (r.getAs[Long]("from_s"),
      r.getAs[Long]("settled_e6"))).distinct
    val tot = settled.map(_._2).sum
    assert(tot >= 900000L && tot <= 1000000L,
      s"settled mass $tot drifted (power-step truncation only shrinks)")
  }

  test("q406 isotonic fit is monotone and mean-preserving") {
    val rows = run("q406_isotonic_pav").collect().sortBy(_.getAs[Long]("bin"))
    assert(rows.length >= 3)
    val iso = rows.map(_.getAs[Long]("iso_e9"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      s"isotonic output not monotone: ${iso.toSeq}")
    // PAV preserves the weighted mean exactly in rationals; e9 truncation
    // moves each fitted value by < 1 ulp, so the drift is bounded by n
    val drift = rows.map(r => r.getAs[Long]("n") * r.getAs[Long]("iso_e9")
      - r.getAs[Long]("pos") * 1000000000L).sum
    val nTot = rows.map(_.getAs[Long]("n")).sum
    assert(math.abs(drift) <= nTot,
      s"weighted mean drifted by $drift over $nTot rows")
  }
}
