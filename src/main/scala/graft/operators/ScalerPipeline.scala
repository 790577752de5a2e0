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

  /** μ/σ are derived from ORDER-INDEPENDENT exact-integer aggregates, not
    * from float `avg`/`stddev_pop`. Float partial/merge accumulation order is
    * nondeterministic across runs (task completion order) and differs from a
    * sequential scan, so a rounding snap applied afterwards still flips when
    * the true value sits near a grid boundary — that is exactly how q49
    * failed in one harness run while passing in another. Instead each row is
    * quantized to integer 1e-6 units once, summed exactly (decimal(38,0) on
    * the Spark side, HUGEINT in the oracle — exact for |x| up to ~9.2e12,
    * far past any physical channel here; the quantization `round(x*1e6)
    * .cast(long)` is the binding bound), and μ/σ come from those integers through a fixed
    * IEEE op sequence that the DuckDB oracle mirrors token by token:
    * identical integers + identical ops = identical bits, every run, either
    * engine, any partitioning. The 1e-6 input grid perturbs the fitted value
    * by < 5e-7 relative to an unquantized fit — far below physical meaning.
    * min/max stay raw: they are selections, order-independent by nature.
    */
  val QuantScale = 1e6

  /** Fit: one aggregate pass over the fit relation, all targets at once. */
  def fit(df: DataFrame, targets: Seq[(String, Kind)]): Seq[Stat] = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val aggs = targets.flatMap { case (c, kind) =>
      // log(x+1), not log1p — must be the same IEEE function the oracle's
      // `ln(x + 1)` states, or fit integers drift by one ulp (see
      // Physics.log1pScale).
      val x = kind match {
        case Log1pStandard => log(col(c) + lit(1.0))
        case _             => col(c)
      }
      val y = round(x * lit(QuantScale), 0).cast("long").cast(dec)
      Seq(count(y).as(s"${c}_n"), sum(y).as(s"${c}_s1"), sum(y * y).as(s"${c}_s2"),
          min(x).as(s"${c}_min"), max(x).as(s"${c}_max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    targets.zipWithIndex.map { case ((c, kind), i) =>
      val n = row.getLong(5 * i)
      // an empty fit relation / all-null column yields zero-count aggregates —
      // surface that as a clear error, not an NPE from getDouble
      if (n == 0L) throw new IllegalStateException(
        s"scaler fit for '$c': fit relation is empty or the column is all null")
      // Mirrored in every fit oracle SQL: mu = (s1/n)/1e6,
      // sigma = sqrt(max(s2/n - (s1/n)^2, 0))/1e6 — keep the op sequence
      // in lockstep with the SQL or parity breaks.
      val nd  = n.toDouble
      val s1d = row.getDecimal(5 * i + 1).doubleValue()
      val s2d = row.getDecimal(5 * i + 2).doubleValue()
      val muq  = s1d / nd
      val varq = { val v = s2d / nd - muq * muq; if (v < 0.0) 0.0 else v }
      Stat(c, kind.name,
        muq / QuantScale, math.sqrt(varq) / QuantScale,
        row.getDouble(5 * i + 3), row.getDouble(5 * i + 4))
    }
  }

  /** The oracle-side mirror of `fit` for one column: SQL deriving (mu, sigma)
    * from the same exact-integer sums with the same IEEE op sequence.
    * `expr` is the (already log-transformed, if applicable) SQL expression.
    */
  def fitStatsSql(expr: String, from: String): String =
    // y is widened to HUGEINT before squaring: BIGINT*BIGINT errors in DuckDB
    // once |y| > ~3.0e9 (|expr| > ~3037), while the Spark side squares in
    // decimal(38,0) — both sums are exact over the full quantized domain.
    s"""SELECT (CAST(sum(y) AS DOUBLE) / count(y)) / CAST(1000000 AS DOUBLE) AS mu,
       |       sqrt(CASE WHEN CAST(sum(y * y) AS DOUBLE) / count(y)
       |                      - (CAST(sum(y) AS DOUBLE) / count(y))
       |                        * (CAST(sum(y) AS DOUBLE) / count(y)) < 0 THEN 0
       |                 ELSE CAST(sum(y * y) AS DOUBLE) / count(y)
       |                      - (CAST(sum(y) AS DOUBLE) / count(y))
       |                        * (CAST(sum(y) AS DOUBLE) / count(y)) END)
       |       / CAST(1000000 AS DOUBLE) AS sigma
       |FROM (SELECT CAST(CAST(round(($expr) * 1000000, 0) AS BIGINT) AS HUGEINT) AS y
       |      FROM $from)""".stripMargin

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
