package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Plan-stability goldens: the physical operator skeleton (preorder class
  * names of `sparkPlan`, pre-AQE) of every scale-sensitive query, pinned to
  * checked-in files. PlanSpec asserts the properties we KNOW matter
  * (pushdown, broadcasts, bucket pruning); this net catches the regressions
  * nobody predicted — a Spark upgrade or refactor that silently swaps a
  * BroadcastHashJoin for a SortMergeJoin anywhere fails here, not on a
  * 100 TB run.
  *
  * Regenerate intentionally with GRAFT_REGEN_PLANS=1 `sbt "testOnly
  * graft.PlanGoldenSpec"` and review the diff like any code change.
  */
class PlanGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val goldenDir = Paths.get("src/test/resources/plan_goldens")
  private val regen = sys.env.get("GRAFT_REGEN_PLANS").contains("1")

  /** Skeleton = preorder physical-operator class names — no paths, sizes or
    * expression ids, so it is stable across machines and fixture dirs.
    */
  private def skeleton(df: DataFrame): String =
    df.queryExecution.sparkPlan
      .collect { case n => n.getClass.getSimpleName }
      .mkString("\n") + "\n"

  /** Non-iterative, side-effect-light queries whose plan shape IS the scale
    * contract. Iterative operators (q61/q81/q104) are excluded: their final
    * plan is just a checkpoint scan, the shape lives inside the rounds.
    */
  private val pinned = Seq(
    "q01_pruned_scan", "q03_group_count", "q07_survival_curve",
    "q11_star_join", "q13_rotation_union", "q19_spherical",
    "q26_tumbling_window", "q28_sessionize", "q30_exact_dedup",
    "q36_minhash_signature", "q38_simhash", "q40_knn_bruteforce",
    "q45_channel_stats", "q46_mappartitions_score", "q50_tfidf",
    "q56_asof_join", "q57_rollup", "q64_keep_best", "q79_top_tokens",
    "q99_bucket_prune", "q101_contamination", "q102_pack_sequences",
    "q105_data_mixture",
    "q107_heavy_hitters", "q108_chunk_windows", "q109_boilerplate_shingles",
    "q110_lm_quality_gate", "q112_weighted_sample", "q113_zorder_key",
    "q114_incremental_dedup", "q116_vocab_encode", "q117_repetition",
    "q118_lsh_capped", "q119_ingest_dedup", "q121_bm25", "q122_dup_spans",
    "q126_relative_quality", "q128_span_scrub", "q129_pii_redact",
    "q133_scrub_keep_one", "q134_count_min", "q138_vocab_coverage",
    "q139_equidepth_hist", "q140_curated_ingest", "q141_exact_spans",
    // late round-6 wave (declarative bodies only — queries that run
    // streams / driver fit loops / eager ranking during construction are
    // excluded for the same reason as the iterative graph queries)
    "q178_spatial_join", "q184_triangles", "q186_topk_agg",
    "q188_snapshot_diff", "q189_scd2", "q190_quality_constraints",
    "q191_psi_drift", "q192_ks_drift", "q196_pmi", "q197_hard_negatives",
    "q198_lsh_quality", "q199_quota_allocation", "q203_grouped_regression",
    "q204_session_paths", "q205_item_cooccurrence", "q206_datasheet",
    "q207_negative_edges", "q208_gap_fill",
    // round-7 wave (same declarative-body rule: driver-fit and streaming
    // queries — q227/q228/q229/q232/q236, iterative q238 — are excluded)
    "q230_hits", "q231_hll_intersect", "q233_ewma", "q234_span_corruption",
    "q235_window_funnel", "q237_token_budget", "q239_bootstrap_ci",
    "q241_native_asof", "q242_asof_pushdown", "q243_ab_test",
    "q245_time_travel", "q246_cascade_filter", "q247_length_batching",
    "q248_triplet_mining", "q249_knn_eval", "q250_decile_lift",
    "q255_theil_sen", "q257_asof_tolerance", "q259_linkpred_auc",
    "q261_rolling_corr", "q262_seasonal_anomaly",
    // round-7 wave 2 (declarative bodies only; q270/q272/q273/q276 run
    // driver rounds / recursion / collected vocab during construction,
    // q268/q279 drive streams — excluded by the same rule)
    "q265_multikey_asof", "q269_k_anonymity", "q271_holt_trend",
    "q274_benford", "q275_gini", "q277_calibration_ece",
    "q278_quantile_norm",
    // round-8 wave (same rule: q290/q291/q293/q294 localCheckpoint graph
    // builds during construction — excluded)
    "q289_string_asof", "q292_streaming_near_dup_gate",
    "q295_retrieval_metrics", "q296_rank_fidelity")

  pinned.foreach { name =>
    test(s"$name physical skeleton matches its golden") {
      val got = skeleton(SparkEntry.queries(name)(spark, TestSpark.sfDir))
      val file = goldenDir.resolve(s"$name.txt")
      if (regen || !Files.exists(file)) {
        Files.createDirectories(goldenDir)
        Files.writeString(file, got)
        info(s"golden ${if (regen) "regenerated" else "created"}: $file")
      } else {
        val want = Files.readString(file)
        assert(got == want,
          s"\nphysical plan skeleton drifted from $file —\n" +
            "if intentional, regenerate with GRAFT_REGEN_PLANS=1 and review " +
            s"the diff\n--- golden ---\n$want--- current ---\n$got")
      }
      spark.catalog.clearCache()
    }
  }
}
