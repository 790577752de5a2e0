package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The flagship query (SURVEY §2 row 46, §7.2): cumulative-threshold survival
  * curves — the reference's actual scientific output
  * (train_classification.py:284-312, evaluate_classification.py:109-134).
  *
  * The reference recomputes each of 10 000 threshold counts from scratch —
  * O(N·bins). Here: one conditional histogram (O(N) scan, map-side combined,
  * `bins`-key shuffle) + one cumulative window over the dense bin axis +
  * window totals — O(N + bins). At 100 TB the scan dominates and parallelizes
  * perfectly; the window only ever sees `bins` rows, never raw data, so its
  * single-partition `orderBy(bin)` is deliberate and safe.
  */
object SurvivalCurve {

  /** @param scored   relation carrying a [0,1) score and a binary label
    * @param p        score column (probability-like)
    * @param isClass0 predicate for class 0 (gamma analog); complement = class 1
    * @param bins     number of threshold edges
    * @return dense (bin, right_edge, survived_0_frac, survived_1_frac), bin ASC
    */
  def curve(scored: DataFrame, p: Column, isClass0: Column, bins: Int): DataFrame = {
    val hist = Histogram.conditionalHistogram(
      scored, p, bins,
      Seq("c0" -> isClass0, "c1" -> !isClass0))
    val w    = Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("cum0", sum(col("c0")).over(w))
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("tot0", sum(col("c0")).over(wAll))
      .withColumn("tot1", sum(col("c1")).over(wAll))
      .select(
        col("bin"),
        round((col("bin") + 1).cast("double") / bins, 9).as("right_edge"),
        // guard: an empty class yields NULL fractions, not a 0/0 ANSI error
        round(when(col("tot0") > 0, col("cum0").cast("double") / col("tot0")), 9)
          .as("survived_0_frac"),
        round(when(col("tot1") > 0, col("cum1").cast("double") / col("tot1")), 9)
          .as("survived_1_frac"))
      .orderBy(col("bin"))
  }
}
