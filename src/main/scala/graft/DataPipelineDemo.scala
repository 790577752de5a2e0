package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Components, Metrics, MinHash}

/** End-to-end training-data pipeline over `documents` — the north-star ops
  * composed the way a 100 TB corpus build would run them:
  *
  *   1. clean      — PII masking + whitespace normalization (pure exprs)
  *   2. exact dedup — first doc per content digest
  *   3. near-dedup  — MinHash/LSH candidate pairs → connected components →
  *                    keep the longest doc per duplicate cluster
  *   4. quality     — unigram LM score + stopword/length heuristics filter
  *   5. budget      — per-source surviving docs and token counts
  *
  * Every stage is lazy DataFrame algebra on the stage before it; the only
  * driver materializations are the iterative CC rounds and the final stage
  * counts. In-flight `observe` metrics report the clean-stage row count
  * without a second pass. Prints ONE summary line for smoke checks.
  *
  * Usage: runMain graft.DataPipelineDemo [sfDir]
  */
object DataPipelineDemo {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8, appName = "graft-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    // 1. clean — masking + space collapse, with observed in-flight metrics
    val raw = Tables.documents(spark, sfDir)
    val cleanedCols = raw.select(col("doc_id"), col("source"), col("lang"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        lit("[A-Za-z0-9.]+@[A-Za-z0-9.]+"), lit("[EMAIL]")),
        lit("https?://[^ ]+"), lit("[URL]")),
        lit("  +"), lit(" ")).as("text"))
    val (cleaned, metrics) = Metrics.observed(cleanedCols, "clean",
      count(lit(1)).as("rows"),
      count(when(length(col("text")) < 8, 1)).as("too_short"))

    // 2. exact dedup — keep the smallest doc_id per content digest
    val exact = cleaned
      .withColumn("digest", sha2(col("text"), 256))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("digest").orderBy("doc_id")))
      .where(col("rn") === 1)
      .drop("digest", "rn")
      .persist() // consumed by the pair join, CC seeds, and the final joins

    // 3. near-dedup — LSH pairs at Jaccard ≥ 0.5 → clusters → keep longest
    val pairs = MinHash.nearDuplicates(exact, col("doc_id"),
      split(col("text"), " ", -1), 0.5).select("doc_a", "doc_b")
    val clusters = Components.connectedComponents(pairs, "doc_a", "doc_b")
    val clustered = exact.join(
      clusters.select(col("id").as("doc_id"), col("comp")), Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("comp"), col("doc_id")))
    val keepBest = clustered
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("cluster").orderBy(length(col("text")).desc, col("doc_id"))))
      .where(col("rn") === 1)
      .select("doc_id", "source", "lang", "text")

    // 4. quality — corpus-unigram LM mean log-prob + cheap heuristics
    val tok = keepBest.select(col("doc_id"),
      explode(split(col("text"), " ", -1)).as("token")).persist()
    val freq = tok.groupBy("token").agg(count(lit(1)).as("c"))
    val total = broadcast(tok.agg(count(lit(1)).as("n")))
    val lm = tok.join(freq, "token").crossJoin(total)
      .groupBy("doc_id")
      .agg(avg(log(col("c") / (lit(1.0) * col("n")))).as("mean_lp"),
        count(lit(1)).as("n_tokens"))
    val scored = keepBest.join(lm, "doc_id")
      .where(col("n_tokens") >= 3 && col("mean_lp") > lit(-12.0))

    // 5. budget — per-source survivors + token budget
    val budget = scored.groupBy("source")
      .agg(count(lit(1)).as("docs"), sum("n_tokens").as("tokens"))
      .orderBy("source")

    val perSource = budget.collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}d/${r.getLong(2)}t")
      .mkString(",")
    val nExact = exact.count()
    val nKept = scored.count()
    val cleanRows = metrics.get("clean").map(_.getLong(0)).getOrElse(-1L)
    metrics.close()
    println(s"DATA_PIPELINE raw=${raw.count()} clean_observed=$cleanRows " +
      s"exact_dedup=$nExact kept=$nKept sources=[$perSource]")
    require(nKept > 0, "pipeline produced no surviving documents")
    spark.stop()
  }
}
