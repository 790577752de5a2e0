package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Components, DupSpans, Metrics, MinHash, SemDedup}

/** End-to-end training-data pipeline over `documents` + `embeddings` — the
  * curation operators composed the way a 100 TB corpus build would run them,
  * in the order a production pipeline orders them (cheap row-local gates
  * before corpus-wide joins):
  *
  *   1. clean        — PII masking + whitespace normalization (pure exprs)
  *   1b. blocklist   — Aho–Corasick phrase gate (q149's kernel), row-local,
  *                     automaton plan-embedded — blocked docs never reach
  *                     any corpus-wide stage
  *   2. quality gate — unigram-LM mean log-prob band + token-count +
  *                     repetition heuristics (q110/q117 logic)
  *   3. exact dedup  — first doc per sha2 content digest (q30)
  *   3b. span scrub  — keep-one-occurrence surgery on duplicated ≥ 20-gram
  *                     spans (q133's Lee-et-al policy); token counts
  *                     re-derived from the survivors
  *   4. LSH near-dedup — bucket-CAPPED MinHash banding (q118's skew guard) →
  *                     candidate pairs → connected components → keep the
  *                     longest doc per duplicate cluster (q115)
  *   5. semantic dedup — SemDeDup over the embedding column: k-means cells,
  *                     capped within-cell dominance at cos ≥ tau (q120)
  *   6. decontamination — drop training docs whose 3-gram shingle sets
  *                     overlap the held-out eval slice ≥ 50% (q101)
  *   6b. domain tilt — DSIR importance selection toward the target domain
  *                     (q144): broadcast 64-row feature-ratio models,
  *                     TakeOrderedAndProject cap
  *   7. packing      — per-source 512-token greedy sequence buckets (q102)
  *   8. mixture      — √-size temperature quotas per source, deterministic
  *                     hash-ranked fill (q105)
  *
  * Every stage is lazy DataFrame algebra on the stage before it; the only
  * driver materializations are the iterative CC rounds, the k-means
  * centroids (both O(k·dim)), and the final stage counts. Stage plans are
  * pinned by DemoPlanSpec (golden skeletons for the non-iterative stages,
  * shape assertions for the iterative ones); DemoSpec runs the whole chain
  * and asserts the funnel invariants. Prints ONE summary line for smoke
  * checks.
  *
  * Scale shape: no stage is quadratic in anything — the LSH buckets and the
  * SemDeDup cells are both size-capped, the contamination check is a
  * shingle-hash equi-join (never doc×doc), and the only windows run
  * per-source or per-cluster, never partition-less over the corpus.
  *
  * Usage: runMain graft.DataPipelineDemo [sfDir]
  */
object DataPipelineDemo {

  /** Tokens-per-bucket for the packing stage (q102's contract). */
  val PackBudget = 512L

  /** Mixture target: total docs across sources after temperature sampling. */
  val MixtureTarget = 200L

  /** 1. PII masking + whitespace collapse — pure row-local expressions,
    * no shuffle, fully codegen'd.
    */
  def clean(raw: DataFrame): DataFrame =
    raw.select(col("doc_id"), col("source"), col("lang"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        lit("[A-Za-z0-9.]+@[A-Za-z0-9.]+"), lit("[EMAIL]")),
        lit("https?://[^ ]+"), lit("[URL]")),
        lit("  +"), lit(" ")).as("text"))

  /** 1b. Blocklist gate — drop documents containing ANY blocklist phrase:
    * one Aho–Corasick pass per document (q149's kernel via
    * [[graft.streaming.DocStreams.blocklistGate]]), the automaton
    * plan-embedded. Row-local like the clean stage, so it runs before
    * anything that shuffles — blocked docs never reach the corpus-wide
    * stages (and in the streaming edge, never enter dedup state).
    */
  val Blocklist: Seq[String] = Seq("stream spark", "slow query")

  def blockGate(docs: DataFrame): DataFrame =
    docs.where(graft.streaming.DocStreams.blocklistGate(col("text"), Blocklist))

  /** 2. Quality gate — corpus-unigram LM mean log-prob plus cheap
    * heuristics, all compared in integer units (q110's no-float-reduction
    * rule): keep docs with ≥ 3 tokens, mean log-prob above a floor, and a
    * distinct-token ratio high enough to reject degenerate repetition.
    * Carries `n_tok` forward so later stages never re-tokenize.
    */
  def qualityGate(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ", -1)).as("token"))
    val freq = tok.groupBy("token").agg(count(lit(1)).as("c"))
    val total = broadcast(tok.agg(count(lit(1)).as("n")))
    val per = tok.join(freq, "token").crossJoin(total)
      .groupBy("doc_id")
      .agg(sum(round(log(col("c") / (lit(1.0) * col("n"))) * 1000000, 0)
          .cast("long")).as("slp_e6"),
        count(lit(1)).as("n_tok"),
        countDistinct("token").as("n_distinct"))
    docs.join(per, "doc_id")
      .where(col("n_tok") >= 3 &&
        col("slp_e6") >= lit(-12000000L) * col("n_tok") && // mean lp ≥ -12
        col("n_distinct") * 5 >= col("n_tok")) // ≥ 20% distinct tokens
      .select(docs("doc_id"), col("source"), col("lang"), col("text"),
        col("n_tok"))
  }

  /** 3. Exact dedup — keep the smallest doc_id per content digest. One
    * uniform-key exchange on the 256-bit digest; the window carries only
    * digest + id.
    */
  def exactDedup(docs: DataFrame): DataFrame =
    docs
      .withColumn("digest", sha2(col("text"), 256))
      .withColumn("rn", row_number().over(
        Window.partitionBy("digest").orderBy("doc_id")))
      .where(col("rn") === 1)
      .drop("digest", "rn")

  /** 3b. Span scrub — q133's keep-one-occurrence surgery at span width 20
    * (Lee et al.'s production setting is ~50; fixture docs are shorter):
    * each duplicated ≥ width-gram span survives in exactly one document,
    * docs scrubbed to nothing drop, and `n_tok` is re-derived from the
    * survivors so packing budgets stay honest. Whole-doc duplicates were
    * already collapsed by [[exactDedup]], so this stage only ever cuts
    * PARTIAL overlap (boilerplate runs, quoted passages).
    */
  def spanScrub(docs: DataFrame, width: Int = 20): DataFrame = {
    val scrubbed = DupSpans.scrubKeepOne(docs, split(col("text"), " ", -1), width)
    docs.drop("text", "n_tok")
      .join(scrubbed.where(col("n_kept") > 0)
        .select(col("doc_id"), col("clean_text").as("text"),
          col("n_kept").as("n_tok")), "doc_id")
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        col("n_tok"))
  }

  /** 4a. LSH candidate pairs at Jaccard ≥ 0.5, bucket-capped (q118's skew
    * guard) — lazy, so DemoPlanSpec can assert no CartesianProduct ever
    * appears regardless of corpus shape.
    */
  def lshPairs(docs: DataFrame, cap: Int = 200): DataFrame =
    MinHash.nearDuplicatesCapped(docs, col("doc_id"),
      split(col("text"), " ", -1), 0.5, cap).select("doc_a", "doc_b")

  /** 4b. Near-dedup — LSH pairs → connected components (iterative,
    * O(E)-per-round min-label propagation) → keep the longest doc (doc_id
    * tie-break) per duplicate cluster.
    */
  def lshDedup(docs: DataFrame): DataFrame = {
    val clusters = Components.connectedComponents(lshPairs(docs), "doc_a", "doc_b")
    docs.join(clusters.select(col("id").as("doc_id"), col("comp")),
        Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("comp"), col("doc_id")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("cluster")
          .orderBy(length(col("text")).desc, col("doc_id"))))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        col("n_tok"))
  }

  /** 5. Semantic dedup — SemDeDup over the embedding column: k-means cells,
    * capped within-cell one-hop dominance at cosine ≥ tau. Docs without an
    * embedding row pass through (left join + coalesce on keep).
    */
  def semanticDedup(docs: DataFrame, emb: DataFrame, dim: Int = 64,
                    k: Int = 8, tau: Double = 0.995): DataFrame = {
    val marked = SemDedup.mark(
      emb.join(docs.select("doc_id"), col("vec_id") === col("doc_id"))
        .select("vec_id", "embedding"),
      "vec_id", "embedding", dim, k, iters = 2, tau, cap = 256)
    docs.join(marked.select(col("vec_id").as("doc_id"), col("keep")),
        Seq("doc_id"), "left")
      .where(coalesce(col("keep"), lit(true)))
      .drop("keep")
  }

  /** 6. Decontamination — the q101 shape: distinct 3-gram shingle hashes of
    * the held-out eval slice (doc_id % 5 = 0) equi-joined against training
    * docs' shingles; drop training docs with ≥ 50% shingle overlap. Never a
    * doc×doc comparison.
    */
  def decontaminate(docs: DataFrame): DataFrame = {
    val sh = docs.select(col("doc_id"),
      explode(MinHash.shingleHashes(split(col("text"), " ", -1))).as("sh"))
      .distinct()
    val evalSh = sh.where(col("doc_id") % 5 === 0).select("sh").distinct()
    val train = docs.where(col("doc_id") % 5 =!= 0)
    val trainSh = sh.where(col("doc_id") % 5 =!= 0)
    val frac = trainSh
      .join(evalSh.withColumn("hit", lit(1)), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"), count(col("hit")).as("n_hit"))
    train.join(frac, Seq("doc_id"), "left")
      .where(coalesce(col("n_hit") * 2 < col("n_sh"), lit(true))) // < 50% overlap
      .select(train.columns.map(col): _*)
  }

  /** 6b. Domain tilt — DSIR importance selection (q144's operator): keep
    * the `k` docs whose hashed-unigram features look most like the target
    * domain (src0 stands in for the curated corpus). Both feature models
    * are 64 broadcast rows; selection is TakeOrderedAndProject — the stage
    * costs one token-explode scan whatever the corpus size. Sized so it
    * only bites once the corpus outgrows the fixture (a cap, not a quota).
    */
  def domainTilt(docs: DataFrame, k: Int = 150): DataFrame =
    docs.join(
      graft.operators.Dsir.select(docs, col("source") === "src0", 64, k)
        .select("doc_id"),
      "doc_id")

  /** 7. Packing — q102's greedy in-order token packing into `PackBudget`
    * buckets, windowed PER SOURCE (one exchange on source, never a
    * partition-less window).
    */
  def pack(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum", sum("n_tok").over(w))
      .withColumn("bucket", expr(s"(cum - n_tok) div $PackBudget"))
      .drop("cum")
  }

  /** 8. Mixture — q105's √-size temperature quotas per source, filled by
    * deterministic hash-ranked selection. One tiny quota aggregate
    * broadcast back; one per-source window.
    */
  def mixture(docs: DataFrame): DataFrame = {
    val src = docs.groupBy("source").agg(count(lit(1)).as("n"))
    val tot = src.agg(sum(sqrt(col("n"))).as("t"))
    val quotas = src.crossJoin(broadcast(tot))
      .select(col("source"),
        round(lit(MixtureTarget) * sqrt(col("n")) / col("t"), 0)
          .cast("long").as("quota"))
    val w = Window.partitionBy("source")
      .orderBy((col("doc_id") * lit(2654435761L)) % lit(1000000007L), col("doc_id"))
    docs
      .withColumn("rk", row_number().over(w))
      .join(broadcast(quotas), "source")
      .where(col("rk") <= col("quota"))
      .drop("rk", "quota")
  }

  /** The full funnel from an already-cleaned relation (so main can wrap the
    * clean stage in observe() metrics without re-deriving it), returning
    * each stage's output so callers (main, the specs) can count/inspect
    * without re-deriving. Persists the relations consumed by several
    * downstream stages.
    */
  def stages(cleaned: DataFrame, emb: DataFrame): Map[String, DataFrame] = {
    val blocked = blockGate(cleaned)
    val quality = qualityGate(blocked).persist()
    val exact = exactDedup(quality).persist()
    val scrub = spanScrub(exact).persist()
    val near = lshDedup(scrub)
    val sem = semanticDedup(near, emb).persist()
    // localCheckpoint, not persist: the tilt stage reads decon six ways
    // (Dsir's token stream feeds both feature models, both totals, and the
    // scoring join, plus the outer keep-join), and persist() only swaps a
    // cached scan into the PHYSICAL plan — the logical/explain tree still
    // embeds the whole upstream funnel once per reference, and AQE
    // re-renders that string on every stage update. At six references the
    // funnel's plan text goes combinatorial and the DRIVER becomes the
    // bottleneck (measured: ~30 min of pure explainString CPU at sf0.001).
    // Cutting lineage at the fan-out boundary is the same discipline the
    // iterative operators already apply per round (Components, KMeans); at
    // 100 TB this boundary is where a real pipeline writes a table anyway.
    val decon = decontaminate(sem).localCheckpoint()
    val tilt = domainTilt(decon)
    val packed = pack(tilt).persist()
    val mixed = mixture(packed)
    Map("blocked" -> blocked, "quality" -> quality, "exact" -> exact, "scrub" -> scrub,
      "near" -> near, "sem" -> sem, "decon" -> decon, "tilt" -> tilt,
      "packed" -> packed, "mixed" -> mixed)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8, appName = "graft-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    val raw = Tables.documents(spark, sfDir)
    val cleanedCols = clean(raw)
    val (cleaned, metrics) = Metrics.observed(cleanedCols, "clean",
      count(lit(1)).as("rows"),
      count(when(length(col("text")) < 8, 1)).as("too_short"))

    val st = stages(cleaned, Tables.embeddings(spark, sfDir))
    val nBlocked = st("blocked").count()
    val nQuality = st("quality").count()
    val nExact = st("exact").count()
    val nScrub = st("scrub").count()
    val nNear = st("near").count()
    val nSem = st("sem").count()
    val nDecon = st("decon").count()
    val nTilt = st("tilt").count()
    val packed = st("packed")
    val nBuckets = packed.select("source", "bucket").distinct().count()
    val mixed = st("mixed").persist()
    val perSource = mixed.groupBy("source")
      .agg(count(lit(1)).as("docs"), sum("n_tok").as("tokens"))
      .orderBy("source").collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}d/${r.getLong(2)}t")
      .mkString(",")
    val cleanRows = metrics.get("clean").map(_.getLong(0)).getOrElse(-1L)
    metrics.close()

    println(s"DATA_PIPELINE raw=${raw.count()} clean_observed=$cleanRows " +
      s"blocked=$nBlocked quality=$nQuality exact=$nExact scrub=$nScrub " +
      s"near=$nNear sem=$nSem " +
      s"decontaminated=$nDecon tilt=$nTilt pack_buckets=$nBuckets " +
      s"mixture=[$perSource]")
    require(nBlocked >= nQuality && nQuality >= nExact && nExact >= nScrub &&
      nScrub >= nNear && nSem >= nDecon && nDecon >= nTilt,
      "pipeline funnel must be monotone non-increasing across dedup stages")
    require(nDecon > 0, "pipeline produced no surviving documents")
    spark.stop()
  }
}
