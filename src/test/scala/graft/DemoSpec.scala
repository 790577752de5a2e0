package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end run of the DataPipelineDemo funnel at the test fixture:
  * funnel invariants (each dedup/gate stage monotone non-increasing, final
  * output non-empty), determinism (two full runs select the identical final
  * doc set), and stage contracts (pack buckets respect the token budget for
  * every doc smaller than the budget; mixture respects its quotas).
  */
class DemoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def runStages() = DataPipelineDemo.stages(
    DataPipelineDemo.clean(Tables.documents(spark, TestSpark.sfDir)),
    Tables.embeddings(spark, TestSpark.sfDir))

  test("pipeline funnel is monotone and ends non-empty") {
    val st = runStages()
    val nBlocked = st("blocked").count()
    val nQuality = st("quality").count()
    val nExact = st("exact").count()
    val nScrub = st("scrub").count()
    val nNear = st("near").count()
    val nSem = st("sem").count()
    val nDecon = st("decon").count()
    val nTilt = st("tilt").count()
    val nMixed = st("mixed").count()
    val nClean = DataPipelineDemo.clean(Tables.documents(spark, TestSpark.sfDir)).count()
    assert(nBlocked < nClean, "blocklist gate must reject blocked phrases at the fixture")
    assert(nBlocked >= nQuality, "quality gate cannot add rows")
    assert(nQuality >= nExact, "exact dedup cannot add rows")
    assert(nExact >= nScrub, "span scrub cannot add rows")
    assert(nScrub >= nNear, "near dedup cannot add rows")
    assert(nNear >= nSem, "semantic dedup cannot add rows")
    assert(nSem >= nDecon, "decontamination cannot add rows")
    assert(nDecon >= nTilt, "domain tilt cannot add rows")
    assert(nTilt >= nMixed, "mixture selection cannot add rows")
    assert(nMixed > 0, "pipeline must keep at least one document")
    spark.catalog.clearCache()
  }

  test("pipeline is deterministic: two runs select the same final doc set") {
    val a = runStages()("mixed").select("doc_id").collect().map(_.getLong(0)).sorted
    spark.catalog.clearCache()
    val b = runStages()("mixed").select("doc_id").collect().map(_.getLong(0)).sorted
    spark.catalog.clearCache()
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("pack stage: bucket ids are dense non-negative and budget-consistent") {
    val st = runStages()
    // every bucket except a source's last must have accumulated >= budget
    // only via its final doc (greedy in-order packing): a doc STARTS in the
    // bucket its cumulative offset falls in, so bucket ids per source are
    // non-decreasing in doc_id and start at 0
    val packed = st("packed").select("source", "doc_id", "bucket", "n_tok")
    val bad = packed.groupBy("source")
      .agg(min("bucket").as("minb"), max("bucket").as("maxb"),
        countDistinct("bucket").as("nb"))
      .where(col("minb") =!= 0 || col("nb") =!= col("maxb") + 1)
      .count()
    assert(bad == 0, "bucket ids must be dense from 0 per source")
    spark.catalog.clearCache()
  }

  test("mixture stage: per-source selection respects the sqrt-quota") {
    val st = runStages()
    val packed = st("packed")
    val src = packed.groupBy("source").agg(count(lit(1)).as("n"))
    val tot = src.agg(sum(sqrt(col("n"))).as("t"))
    val quotas = src.crossJoin(broadcast(tot))
      .select(col("source"),
        round(lit(DataPipelineDemo.MixtureTarget) * sqrt(col("n")) / col("t"), 0)
          .cast("long").as("quota"))
    val over = st("mixed").groupBy("source").agg(count(lit(1)).as("sel"))
      .join(quotas, "source")
      .where(col("sel") > col("quota"))
      .count()
    assert(over == 0, "no source may exceed its temperature quota")
    spark.catalog.clearCache()
  }
}
