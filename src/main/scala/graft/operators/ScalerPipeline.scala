package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fit/apply scaling with literal folding (SURVEY §2 rows 5, 16, 26-27, §7.4.4).
  *
  * The reference fits scalers on train, persists them, and re-applies them to
  * unseen splits without refitting (train_classification.py:184-207,
  * evaluate_classification.py:54-66). Here statistics are *data*: a tiny stats
  * DataFrame (one row per target column) that is collected to the driver and
  * folded into the apply-side projection as literals. Catalyst's
  * ConstantFolding then simplifies `(x - lit(mu)) / lit(sigma)` into a single
  * codegen'd expression — no broadcast join, no shuffle, and the apply side
  * stays a narrow map over the scan (SURVEY §4 row "Constant folding").
  */
object ScalerPipeline {

  sealed trait Kind { def name: String }
  case object Standard extends Kind { val name = "standard" } // (x-μ)/σ, ddof=0
  case object MinMax   extends Kind { val name = "minmax" }   // (x-min)/(max-min)
  case object Log1pStandard extends Kind { val name = "log1p_standard" } // (log1p(x)-μ)/σ

  final case class Stat(target: String, kind: String,
                        mean: Double, stddev: Double, min: Double, max: Double)

  /** Fitted statistics are snapped to a 1e-9 grid (decimal HALF_UP — the same
    * rule as Spark's `round`). Cross-engine float aggregation (Spark's
    * partial/merge tree vs a sequential scan) can move μ/σ by a last-ulp
    * amount, which then propagates through EVERY scaled row; snapping makes
    * the persisted stats relation bit-identical across engines while changing
    * the fitted values by < 5e-10 (far below any physical meaning).
    */
  private def snap9(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Fit: one aggregate pass over the fit relation, all targets at once. */
  def fit(df: DataFrame, targets: Seq[(String, Kind)]): Seq[Stat] = {
    val aggs = targets.flatMap { case (c, kind) =>
      val x = kind match {
        case Log1pStandard => log1p(col(c))
        case _             => col(c)
      }
      Seq(avg(x).as(s"${c}_mean"), stddev_pop(x).as(s"${c}_std"),
          min(x).as(s"${c}_min"), max(x).as(s"${c}_max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    targets.zipWithIndex.map { case ((c, kind), i) =>
      // an empty fit relation / all-null column yields null aggregates —
      // surface that as a clear error, not an NPE from getDouble
      if (row.isNullAt(4 * i)) throw new IllegalStateException(
        s"scaler fit for '$c': fit relation is empty or the column is all null")
      Stat(c, kind.name,
        snap9(row.getDouble(4 * i)), snap9(row.getDouble(4 * i + 1)),
        snap9(row.getDouble(4 * i + 2)), snap9(row.getDouble(4 * i + 3)))
    }
  }

  /** Persist / reload the stats relation (the fit/apply state of SURVEY §7.4.4
    * — persisted data, never a hidden object).
    */
  def save(spark: SparkSession, stats: Seq[Stat], path: String): Unit = {
    import spark.implicits._
    stats.toDF().coalesce(1).write.mode("overwrite").parquet(path)
  }
  def load(spark: SparkSession, path: String): Seq[Stat] = {
    import spark.implicits._
    spark.read.parquet(path).as[Stat].collect().toSeq
  }

  /** Zero-variance / zero-range columns scale by 1 instead of dividing by 0
    * (sklearn's handle_zeros_in_scale semantics) — a constant column comes
    * out centered at 0, not Infinity/NaN.
    */
  private def safeScale(s: Double): Double = if (s == 0.0) 1.0 else s

  /** Apply: literal-folded projection, one scaled column per stat — built on
    * the same Physics expressions as every other scaling path (one formula,
    * one place to fix).
    */
  def transformColumn(stat: Stat): Column = {
    import graft.functions.Physics
    stat.kind match {
      case "standard" =>
        Physics.standardScale(col(stat.target), stat.mean, safeScale(stat.stddev))
      case "minmax" =>
        Physics.minMaxScale(col(stat.target), stat.min,
          stat.min + safeScale(stat.max - stat.min))
      case "log1p_standard" =>
        Physics.standardScale(Physics.log1pScale(col(stat.target)),
          stat.mean, safeScale(stat.stddev))
      case other => throw new IllegalArgumentException(s"unknown scaler kind: $other")
    }
  }

  def apply(df: DataFrame, stats: Seq[Stat], suffix: String = "_scaled"): DataFrame =
    stats.foldLeft(df)((d, s) => d.withColumn(s.target + suffix, transformColumn(s)))
}
