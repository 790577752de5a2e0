package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan pinning for the DataPipelineDemo stages — the end-to-end funnel's
  * scale contract, stage by stage. The lazy stages get golden physical
  * skeletons (same mechanism as PlanGoldenSpec, same regen flag); the
  * iterative stages (CC inside lshDedup, k-means inside semanticDedup) are
  * covered through their lazy sub-plans (lshPairs) plus shape assertions:
  * no CartesianProduct anywhere, and the mixture/pack windows are always
  * partitioned.
  */
class DemoPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val goldenDir = Paths.get("src/test/resources/plan_goldens")
  private val regen = sys.env.get("GRAFT_REGEN_PLANS").contains("1")

  private def skeleton(df: DataFrame): String =
    df.queryExecution.sparkPlan
      .collect { case n => n.getClass.getSimpleName }
      .mkString("\n") + "\n"

  private def checkGolden(name: String, df: DataFrame): Unit = {
    val got = skeleton(df)
    val file = goldenDir.resolve(s"$name.txt")
    if (regen || !Files.exists(file)) {
      Files.createDirectories(goldenDir)
      Files.writeString(file, got)
      info(s"golden ${if (regen) "regenerated" else "created"}: $file")
    } else {
      val want = Files.readString(file)
      assert(got == want,
        s"\ndemo stage plan drifted from $file —\n" +
          "if intentional, regenerate with GRAFT_REGEN_PLANS=1 and review " +
          s"the diff\n--- golden ---\n$want--- current ---\n$got")
    }
  }

  // lazy composition up to the last non-iterative stage: clean → blocklist →
  // quality → exact → {lshPairs, decontaminate, pack, mixture}
  private def cleaned = DataPipelineDemo.clean(Tables.documents(spark, TestSpark.sfDir))
  private def blocked = DataPipelineDemo.blockGate(cleaned)
  private def exact = DataPipelineDemo.exactDedup(DataPipelineDemo.qualityGate(blocked))

  private val lazyStages: Seq[(String, () => DataFrame)] = Seq(
    "demo_clean" -> (() => cleaned),
    "demo_blocklist" -> (() => blocked),
    "demo_quality" -> (() => DataPipelineDemo.qualityGate(blocked)),
    "demo_exact" -> (() => exact),
    "demo_span_scrub" -> (() => DataPipelineDemo.spanScrub(exact)),
    "demo_lsh_pairs" -> (() => DataPipelineDemo.lshPairs(exact)),
    "demo_decontaminate" -> (() => DataPipelineDemo.decontaminate(exact)),
    "demo_domain_tilt" -> (() => DataPipelineDemo.domainTilt(exact)),
    "demo_pack" -> (() => DataPipelineDemo.pack(exact)),
    "demo_mixture" -> (() => DataPipelineDemo.mixture(exact)))

  lazyStages.foreach { case (name, df) =>
    test(s"$name physical skeleton matches its golden") {
      checkGolden(name, df())
      spark.catalog.clearCache()
    }
  }

  test("no demo stage plan contains a CartesianProduct or unpartitioned window") {
    lazyStages.foreach { case (name, df) =>
      val plan = df().queryExecution.sparkPlan
      val cart = plan.collect {
        case n if n.getClass.getSimpleName.contains("Cartesian") => n
      }
      assert(cart.isEmpty, s"$name must not cross-join the corpus")
      val badWindow = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      assert(badWindow.isEmpty,
        s"$name must not run a partition-less window over the corpus")
    }
    spark.catalog.clearCache()
  }

  test("lsh pairs plan joins band buckets, never the corpus against itself") {
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val plan = DataPipelineDemo.lshPairs(exact).queryExecution.sparkPlan
    // the candidate self-join must be an equi-join on (band, bkey) — a
    // nested-loop join between two corpus-sized sides means the banding
    // collapsed. The only nested-loop joins allowed are the scalar-census
    // pattern: one side reduces to a single row (aggregate with no grouping
    // keys) before broadcasting, which every stage uses for corpus totals.
    plan.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
      val scalarSide = Seq(j.left, j.right).exists(_.collectFirst {
        case a: HashAggregateExec if a.groupingExpressions.isEmpty => a
      }.isDefined)
      assert(scalarSide,
        s"nested-loop join without a scalar build side in lshPairs:\n$j")
    }
    assert(plan.collect {
      case n if n.getClass.getSimpleName.contains("Cartesian") => n
    }.isEmpty)
    spark.catalog.clearCache()
  }
}
