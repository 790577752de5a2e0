package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic full-batch gradient descent for logistic regression — the
  * oracle-checkable form of the reference's iterative fit (SURVEY §2 row 45,
  * train_classification.py's epoch loop). q48 keeps the spark.ml LBFGS fit
  * as the production path; THIS operator exists so the iterative-fit
  * semantics themselves are cross-engine verifiable, the same way KMeans
  * made Lloyd rounds oracle-checkable.
  *
  * Determinism playbook (OPERATORS.md / the k-means pattern):
  *   - per-row gradient contributions quantized to integer 1e-6 units
  *     BEFORE the sum, so the cross-row reduction is exact integer
  *     arithmetic (summation order cannot perturb it);
  *   - weights snapped to a 1e-9 decimal grid (HALF_UP — Spark round's
  *     rule) after every update, so round k+1 starts from bit-identical
  *     literals in both engines;
  *   - the update uses one fixed expression shape,
  *     `w − lr·(S/1e6/n)`, evaluated with the same double-op order the
  *     oracle SQL writes.
  *
  * Scale: each round is ONE aggregate job over the data (map-side partials,
  * O(features) output), weights live on the driver as literals — the same
  * broadcast-stats-apply shape as ScalerPipeline, rounds × one-pass cost.
  */
object LogisticGD {

  final case class Weights(bias: Double, w: Seq[Double])

  private def snap9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** @param features feature expressions (evaluated per row each round)
    * @param label    0/1 double expression
    * @return weights after `iters` full-batch rounds from zero init
    */
  def fit(df: DataFrame, features: Seq[Column], label: Column,
          lr: Double, iters: Int): Weights =
    fitTrajectory(df, features, label, lr, iters).last

  /** The full training trajectory: weights after EVERY round (element k =
    * the `iters = k+1` fit — prefixes of one deterministic trajectory).
    * One aggregate pass per round; q251's cartography consumes all
    * checkpoints of one call instead of refitting per k.
    */
  def fitTrajectory(df: DataFrame, features: Seq[Column], label: Column,
                    lr: Double, iters: Int): Seq[Weights] = {
    var b = 0.0
    var w = Vector.fill(features.size)(0.0)
    val out = Vector.newBuilder[Weights]
    for (_ <- 0 until iters) {
      val z = features.zip(w).foldLeft(lit(b): Column) {
        case (acc, (f, wi)) => acc + f * lit(wi)
      }
      val err = lit(1.0) / (lit(1.0) + exp(-z)) - label
      val gradTerms = err +: features.map(f => err * f)
      val aggs = gradTerms.zipWithIndex.map { case (c, i) =>
        sum(round(c * 1e6, 0).cast("long")).as(s"g_$i")
      } :+ count(lit(1)).as("n")
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(gradTerms.size)
      def upd(old: Double, s: Long): Double =
        snap9(old - lr * (s.toDouble / 1000000.0 / n.toDouble))
      b = upd(b, row.getLong(0))
      w = w.indices.map(i => upd(w(i), row.getLong(i + 1))).toVector
      out += Weights(b, w)
    }
    out.result()
  }
}
