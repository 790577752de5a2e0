package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Higher-order-function builders for the reference's array/tensor operators
  * (SURVEY §2 rows 32-37). All of these compile to Catalyst `transform` /
  * `aggregate` expression trees over `ArrayType` columns — no explode, no UDF,
  * so a 16×16 grid op costs one projection, not a 256× row blow-up.
  */
object Tensors {

  /** 90°·k counter-clockwise rotation of an n×n grid stored as
    * array<array<T>> (reference `np.rot90(m, k, axes=(1,2))`,
    * create_train_valid_test_datasets.py:72-74).
    *
    * Closed-form index map per k — one transform layer, 2 element accesses
    * per output cell. Composing single rotations (`once(once(m))`) would
    * re-evaluate the inner rotation expression per outer element: O(n^(2k))
    * cell evaluations per row once projections collapse.
    *
    * Matrix argument should be a materialized column (attribute), not a
    * large inline expression, for the same re-evaluation reason.
    */
  def rot90(matrix: Column, n: Int, k: Int): Column = {
    require(n > 0)
    val m = matrix
    def cell(f: (Column, Column) => (Column, Column)): Column =
      transform(sequence(lit(0), lit(n - 1)), r =>
        transform(sequence(lit(0), lit(n - 1)), c => {
          val (row1, col1) = f(r, c) // 1-based
          element_at(element_at(m, row1), col1)
        }))
    ((k % 4) + 4) % 4 match {
      case 0 => m
      case 1 => cell((r, c) => (c + 1, lit(n) - r))          // out[r][c]=m[c][n-1-r]
      case 2 => cell((r, c) => (lit(n) - r, lit(n) - c))     // 180°
      case 3 => cell((r, c) => (lit(n) - c, r + 1))          // out[r][c]=m[n-1-c][r]
    }
  }

  /** Flat-array form of [[rot90]]: the same permutation on a row-major flat
    * grid as ONE codegen'd copy loop (functions/VectorExprs.GridRot90Expr) —
    * no reshape/flatten HOF tree. Bit-equal to
    * `flatten(rot90(reshape(flat, n, n), n, k))`.
    */
  def rot90Flat(flat: Column, n: Int, k: Int): Column = {
    val kk = ((k % 4) + 4) % 4
    if (kk == 0) flat
    else {
      import org.apache.spark.sql.GraftColumnBridge
      GraftColumnBridge.column(VectorExprs.GridRot90Expr(
        GraftColumnBridge.expression(flat), n, kk))
    }
  }

  /** Matrix transpose via nested transform (reference dataset.py:11 axis swap). */
  def transposeGrid(matrix: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)), j =>
      transform(sequence(lit(0), lit(n - 1)), i =>
        element_at(element_at(matrix, i + 1), j + 1)))

  /** One-hot encode an int label into a float array of width nClass
    * (reference dataset.py:12).
    */
  def oneHot(label: Column, nClass: Int): Column =
    transform(sequence(lit(0), lit(nClass - 1)), c =>
      when(label === c, 1.0).otherwise(0.0))

  /** 0-based argmax of an array (reference torch.argmax, tools.py:26).
    * First-match semantics on ties, like numpy/torch.
    */
  def argmax(arr: Column): Column =
    (array_position(arr, array_max(arr)) - 1).cast("int")

  /** Flatten an n×n grid row-major (reference .flatten(),
    * train_classification.py:184).
    */
  def flattenGrid(matrix: Column): Column = flatten(matrix)

  /** Reshape a flat array into rows of `width` (reference .reshape(N,16,16)). */
  def reshape(flat: Column, rows: Int, width: Int): Column =
    transform(sequence(lit(0), lit(rows - 1)), r =>
      slice(flat, r * width + 1, lit(width)))

  /** Dot product of two float arrays via zip_with + aggregate — the
    * similarity-search kernel. Accumulates in double, sequential fold
    * (deterministic, oracle-replayable).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(VectorExprs.DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** The pure-HOF dot formulation `dot` replaces (kept for the equivalence
    * test: identical sequential accumulation, so bit-equal results).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 distance Σ(aᵢ−bᵢ)² (codegen'd fused loop). */
  def distSq(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(VectorExprs.L2DistSqExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
