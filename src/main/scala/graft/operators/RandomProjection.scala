package graft.operators

import graft.functions.Hashes
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection for the embedding surface.
  *
  * Projects a `dimIn`-d float vector to `dimOut` dims through a dense ±1
  * sign matrix (Achlioptas 2003: Rademacher entries preserve pairwise
  * distances in expectation exactly like Gaussian ones, and need no float
  * RNG): `y_j = (1/√dimOut) · Σ_d x_d · s(j, d)` with
  * `s(j, d) = ±1` drawn from the engine's salted multiplicative hash of the
  * (j, d) cell — deterministic, partition-independent, and replayable in
  * plain integer SQL, so the DuckDB oracle recomputes the SAME matrix
  * (SURVEY §7.4.1 posture; never an RNG stream).
  *
  * Scale shape: the projection is row-local — a transform+aggregate HOF
  * chain over the vector column, zero shuffle, zero driver state, no
  * broadcast (the matrix never materializes; each cell's sign is hashed on
  * demand). This is the standard cheap pre-step that makes downstream ANN /
  * clustering O(dimOut) instead of O(dimIn) per distance.
  *
  * Determinism: both engines fold d in ascending order from a 0.0 init
  * (Spark `aggregate` ≡ DuckDB `list_reduce` with a prepended 0), float
  * inputs widen to double exactly, and 1/√dimOut is exact when dimOut is a
  * power of four — callers should keep it one (16 → ×0.25) so the scale
  * step introduces no rounding.
  */
object RandomProjection {

  /** Hash cell (j, d) to ±1. 4096 ≥ any real dimIn keeps cells distinct. */
  private def signCell(j: Column, d: Column, seed: Long): Column =
    when(Hashes.mulHash(j * 4096L + d, seed) % 2 === 0, 1.0d).otherwise(-1.0d)

  /** One projected coordinate `y_j` of `vec` (j is a column, 0-based). */
  def coord(vec: Column, j: Column, dimIn: Int, dimOut: Int, seed: Long): Column = {
    require(dimOut >= 1 && (dimOut & (dimOut - 1)) == 0,
      s"dimOut should be a power of two for an exact scale step, got $dimOut")
    val terms = transform(sequence(lit(0), lit(dimIn - 1)),
      d => element_at(vec, d + 1).cast("double") * signCell(j, d.cast("long"), seed))
    aggregate(terms, lit(0.0d), (a, x) => a + x) * (1.0 / math.sqrt(dimOut.toDouble))
  }

  /** All `dimOut` coordinates as (j, y) pairs via posexplode-ready array. */
  def projected(vec: Column, dimIn: Int, dimOut: Int, seed: Long): Column =
    transform(sequence(lit(0), lit(dimOut - 1)),
      j => coord(vec, j.cast("long"), dimIn, dimOut, seed))

  /** DuckDB mirror of [[coord]]: same hash, same ascending-d fold, same
    * exact scale. `j` is an SQL expression (e.g. a correlated column).
    */
  def coordSql(vec: String, j: String, dimIn: Int, dimOut: Int, seed: Long): String = {
    val sign = s"(CASE WHEN (${Hashes.mulHashSql(s"($j) * 4096 + (i - 1)", seed)}) % 2 = 0" +
      " THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)"
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(range(1, ${dimIn + 1}),
       |    i -> CAST($vec[i] AS DOUBLE) * $sign)),
       |  (x, y) -> x + y) * ${1.0 / math.sqrt(dimOut.toDouble)}""".stripMargin
  }

  /** Squared Euclidean distance between two equal-length double arrays,
    * folded in ascending order (the JL-contract measurement kernel).
    */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))),
      lit(0.0d), (acc, x) => acc + x)

  def sqDistSql(a: String, b: String, dim: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(range(1, ${dim + 1}),
       |    i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
       |         * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)))),
       |  (x, y) -> x + y)""".stripMargin
}
