package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Batched map-style model scoring (SURVEY §2 row 50).
  *
  * The reference streams 64-row batches through a CNN and collects
  * (scores, labels) (tools.py:15-31, cnn_model.py:18-43). The engine models
  * this as a `mapPartitions` over a typed Dataset behind a pluggable
  * [[BatchScorer]]: rows are buffered into fixed-size batches inside each
  * partition (the DataLoader analog — no shuffle, no driver involvement) and
  * scored batch-at-a-time, so a vectorized/JNI model kernel can amortize per-
  * call overhead exactly like the reference's GPU batches.
  *
  * The *linear* head stays a Catalyst expression (Physics.sigmoid ∘
  * linearScore) — only genuinely opaque kernels belong here (SURVEY §7.3).
  */
trait BatchScorer extends Serializable {
  /** Score one batch of feature vectors; must return one score per row. */
  def scoreBatch(batch: Array[Array[Double]]): Array[Double]
}

/** Logistic head as a batch kernel: p = σ(b + w·x), accumulated left-to-right
  * so results are bit-identical to the SQL expression form.
  */
final case class LinearSigmoidScorer(bias: Double, weights: Array[Double])
    extends BatchScorer {
  override def scoreBatch(batch: Array[Array[Double]]): Array[Double] =
    batch.map { x =>
      var z = bias
      var i = 0
      while (i < weights.length) { z += weights(i) * x(i); i += 1 }
      1.0 / (1.0 + math.exp(-z))
    }
}

object Scorer {
  /** Keyed batch scoring: (key1, key2, features) → (key1, key2, score).
    * Batches of `batchSize` per partition, preserving row order.
    */
  def scoreKeyed(
      ds: Dataset[(Long, Int, Array[Double])],
      scorer: BatchScorer,
      batchSize: Int = 64): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { group =>
        val batch = group.toArray
        val scores = scorer.scoreBatch(batch.map(_._3))
        batch.iterator.zip(scores.iterator).map { case ((k1, k2, _), p) => (k1, k2, p) }
      }
    }.toDF("key1", "key2", "score")
  }
}
