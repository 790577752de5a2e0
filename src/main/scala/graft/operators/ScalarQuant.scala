package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ChannelStats

/** Int8 scalar quantization of an embedding column — the standard 4×
  * memory/bandwidth reduction an ANN serving layer applies before (or
  * instead of) product quantization: one absolute-max scale per dimension,
  * codes q_d = round(x_d · 127 / s_d) ∈ [−127, 127]. Complements
  * [[Pq]] (sub-vector codebooks, 32×+) at the cheap end of the compression
  * spectrum — dot products on int8 codes are exact integer arithmetic.
  *
  * Scale shape: the fit is the no-explode [[ChannelStats]] aggregate
  * (Scan → partial agg → O(dim) shuffle — row count never multiplies), the
  * dim-sized scale vector broadcasts, and encoding is a row-local
  * `zip_with` projection. Nothing here shuffles the corpus.
  *
  * Determinism: per-dim absmax is an order-insensitive max (exact — no
  * accumulation), and codes are `round()` of identical IEEE double
  * expressions, so the integer codes are bit-equal cross-engine with no
  * quantization grid needed. The reconstruction contract is exact by
  * construction: |x·127/s − q| ≤ 0.5 for every dimension (the q147 oracle
  * counts violations and both engines must count zero).
  */
object ScalarQuant {

  /** One-row (scales: array<double>) — per-dimension absolute max, fitted
    * without explode; s_d = max(|min_d|, |max_d|).
    */
  def fitScales(corpus: DataFrame, embCol: String, dim: Int): DataFrame =
    corpus.agg(ChannelStats.channelStats(col(embCol), dim).as("st"))
      .select(transform(col("st"),
        s => greatest(abs(s.getField("min")), abs(s.getField("max"))))
        .as("scales"))

  /** Encode each vector against the broadcast scales: (id, x, scales,
    * codes array<long> in [−127, 127]); an all-zero dimension (s = 0)
    * codes to 0.
    */
  def encode(corpus: DataFrame, idCol: String, embCol: String,
             dim: Int): DataFrame = {
    val x = col(embCol).cast("array<double>")
    corpus.crossJoin(broadcast(fitScales(corpus, embCol, dim)))
      .select(col(idCol), x.as("x"), col("scales"),
        zip_with(x, col("scales"), (xv, s) =>
          when(s === 0.0, lit(0L))
            .otherwise(round(xv * 127.0 / s, 0).cast("long"))).as("codes"))
  }
}
