package graft.operators

/** Driver-side exact power iteration over a k×k moment matrix — the PCA
  * companion to the k-means/LR driver-coordinated fits (SURVEY §7.4.5): the
  * matrix is O(k²) STATISTICS (k = 16 here), never data, so iterating on the
  * driver is the same posture as broadcasting scaler means or PQ codebooks.
  *
  * Determinism contract (mirrored 1:1 by the q229 oracle CTE chain):
  *   - every fold is ascending-index from a 0.0 init (j for the mat-vec, i
  *     for the norm and the Rayleigh quotient);
  *   - the iterate is snapped to the 1e-9 round grid AFTER normalizing, so
  *     both engines walk identical doubles into the next round;
  *   - rounding is HALF_UP away from zero — the semantics both Spark's and
  *     DuckDB's `round` apply;
  *   - sqrt/division are IEEE correctly-rounded in both, so no other
  *     quantization is needed inside a round.
  *
  * The caller feeds EXACT integer covariance entries (n·Σxy − Σx·Σy on a
  * quantized integer grid) cast to double — exact below 2^53 — so the only
  * float state is the iterate itself.
  */
object PowerIteration {

  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** `iters` rounds from e₁, returning (unit eigenvector estimate, Rayleigh
    * quotient vᵀCv of the final snapped iterate).
    */
  def topEigenvector(c: Array[Array[Double]], iters: Int): (Array[Double], Double) = {
    val k = c.length
    def matVec(v: Array[Double]): Array[Double] =
      Array.tabulate(k) { i =>
        var acc = 0.0
        var j = 0
        while (j < k) { acc += c(i)(j) * v(j); j += 1 }
        acc
      }
    var v = Array.tabulate(k)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 0 until iters) {
      val w = matVec(v)
      var s = 0.0
      var i = 0
      while (i < k) { s += w(i) * w(i); i += 1 }
      val nrm = math.sqrt(s)
      // a zero image (zero matrix, or C annihilating the iterate) would
      // turn every later round into NaN via 0/0 — keep the previous
      // iterate instead; the Rayleigh quotient then reads λ = 0 off it
      if (nrm != 0.0) v = w.map(x => r9(x / nrm))
    }
    val u = matVec(v)
    var lam = 0.0
    var i = 0
    while (i < k) { lam += v(i) * u(i); i += 1 }
    (v, lam)
  }
}
