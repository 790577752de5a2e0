package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expression for the embedding dot product — the innermost
  * loop of every similarity/ANN/clustering operator (SURVEY preference order
  * (b): native Expression with codegen beats HOF trees beats UDFs).
  *
  * Why custom: the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation
  * allocates an intermediate products array per row and evaluates its lambdas
  * interpreted, per element. This expression emits one static call doing the
  * whole fused multiply-accumulate in a primitive loop — no allocation, no
  * per-element lambda dispatch — while computing the IDENTICAL sequential
  * double accumulation (same order, same casts), so results stay bit-equal
  * to the HOF form and the DuckDB oracles are unaffected.
  *
  * Null/ragged contract (same as the fixture data guarantees): elements
  * non-null, equal lengths; a shorter side truncates the loop.
  */
object VectorExprs {

  def dotData(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def distSqData(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vec_dot expects array<float|double>, got $other")
  }

  /** Analysis-time type validation (shared by both expressions) — a wrong
    * input should be an AnalysisException, not a codegen-time crash.
    */
  private def checkVecInputs(name: String, l: Expression, r: Expression): TypeCheckResult =
    (l.dataType, r.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$name expects two array<float|double> inputs, got " +
          s"${l.dataType.catalogString} and ${r.dataType.catalogString}")
    }

  /** dot(a, b) over array<float|double> columns, double-precision result. */
  case class DotProductExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      checkVecInputs(prettyName, left, right)
    private lazy val lFloat = isFloatArray(left)
    private lazy val rFloat = isFloatArray(right)

    override def nullSafeEval(l: Any, r: Any): Any =
      dotData(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], lFloat, rFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c1, c2) =>
        s"${ev.value} = graft.functions.VectorExprs.dotData($c1, $c2, $lFloat, $rFloat);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(newLeft, newRight)
    override def prettyName: String = "vec_dot"
  }

  /** Flat 90°·k rotation of an n×n grid stored row-major — the same index
    * maps as [[Tensors.rot90]]'s nested-HOF form (numpy rot90 convention),
    * as one primitive copy loop over the flat array. k must be 1..3 (the
    * builder short-circuits k≡0 to the child).
    */
  def rot90Data(a: ArrayData, n: Int, k: Int, isFloat: Boolean): ArrayData = {
    val sz = n * n
    require(a.numElements() >= sz,
      s"grid_rot90: need $sz elements for an ${n}x$n grid, got ${a.numElements()}")
    @inline def src(p: Int): Int = {
      val r = p / n; val c = p % n
      k match {
        case 1 => c * n + (n - 1 - r)       // out[r][c] = in[c][n-1-r]
        case 2 => (n - 1 - r) * n + (n - 1 - c)
        case _ => (n - 1 - c) * n + r       // k = 3
      }
    }
    if (isFloat) {
      val out = new Array[Float](sz)
      var p = 0
      while (p < sz) { out(p) = a.getFloat(src(p)); p += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Double](sz)
      var p = 0
      while (p < sz) { out(p) = a.getDouble(src(p)); p += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  /** grid_rot90(flat, n, k): the rot90 permutation without the
    * reshape→nested-transform→flatten HOF tree (which costs ~9× the scan at
    * sf0.1 — measured; this is the vec_dot story again). Pure permutation:
    * results are bit-equal to the HOF form.
    */
  case class GridRot90Expr(child: Expression, n: Int, k: Int)
      extends UnaryExpression {
    require(n > 0 && k >= 1 && k <= 3, s"grid_rot90: bad n=$n k=$k")
    override def dataType: DataType = child.dataType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double>, got ${other.catalogString}")
    }
    private lazy val isFloat = isFloatArray(child)

    override def nullSafeEval(a: Any): Any =
      rot90Data(a.asInstanceOf[ArrayData], n, k, isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.VectorExprs.rot90Data($c, $n, $k, $isFloat);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "grid_rot90"
  }

  /** Σ(aᵢ−bᵢ)² — the assignment loop of IVF/k-means, same fused-loop and
    * bit-equality contract as [[DotProductExpr]] (the HOF form computes
    * (x−y)*(x−y) per element in the same sequential order).
    */
  case class L2DistSqExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      checkVecInputs(prettyName, left, right)
    private lazy val lFloat = isFloatArray(left)
    private lazy val rFloat = isFloatArray(right)

    override def nullSafeEval(l: Any, r: Any): Any =
      distSqData(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], lFloat, rFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c1, c2) =>
        s"${ev.value} = graft.functions.VectorExprs.distSqData($c1, $c2, $lFloat, $rFloat);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(newLeft, newRight)
    override def prettyName: String = "vec_dist_sq"
  }

  /** Product-quantization encode: nearest-codeword index per subspace, as
    * one primitive triple loop. `cb` is the flat codebook —
    * `cb((s·ksub + w)·sub + i)` = dim i of codeword w in subspace s.
    * Distances compare on the 1e-6 integer grid (Math.round, exact for the
    * non-negative squared distances here) with the LOWEST codeword index
    * winning ties, so a vector's code is identical under any partitioning.
    */
  def pqEncodeData(a: ArrayData, m: Int, ksub: Int, cb: Array[Double],
                   isFloat: Boolean): ArrayData = {
    val sub = cb.length / (m * ksub)
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestW = 0
      var bestQ = Long.MaxValue
      var w = 0
      while (w < ksub) {
        var d2 = 0.0
        var i = 0
        val base = (s * ksub + w) * sub
        val off = s * sub
        while (i < sub) {
          val x = if (isFloat) a.getFloat(off + i).toDouble else a.getDouble(off + i)
          val d = x - cb(base + i)
          d2 += d * d
          i += 1
        }
        val q = Math.round(d2 * 1e6)
        if (q < bestQ) { bestQ = q; bestW = w }
        w += 1
      }
      out(s) = bestW
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** pq_encode(x): code array<int> of length m — the codegen'd form of the
    * unrolled m·ksub·(dim/m) literal-distance argmin tree, which at 8×16×8
    * terms exceeds janino's method limit and falls back to interpreted
    * eval. One reference-object codebook + one fused loop instead.
    */
  case class PqEncodeExpr(child: Expression, m: Int, ksub: Int,
                          cb: Array[Double]) extends UnaryExpression {
    require(m > 0 && ksub > 0 && cb.length % (m * ksub) == 0,
      s"pq_encode: codebook length ${cb.length} must be m*ksub*sub")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double>, got ${other.catalogString}")
    }
    private lazy val isFloat = isFloatArray(child)

    override def nullSafeEval(a: Any): Any =
      pqEncodeData(a.asInstanceOf[ArrayData], m, ksub, cb, isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.VectorExprs.pqEncodeData($c, $m, $ksub, $cbRef, $isFloat);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "pq_encode"
  }

  /** All `bands` sign-LSH band signatures of a vector in one fused pass —
    * the signature stage of the scalable NSW build (NswGraph). Semantics
    * are IDENTICAL to the HOF formulation (ascending-d double fold from
    * 0.0 per plane, sign bit = proj ≥ 0, band sig = Σ bit·2^pos with exact
    * small-power weights), so results stay bit-equal and the DuckDB oracle
    * is unaffected; what changes is dim·bands·rbits interpreted lambda
    * dispatches per row becoming one primitive loop.
    */
  def lshBandSigsData(a: ArrayData, isFloat: Boolean, bands: Int, rbits: Int,
                      dim: Int, seed: Long): ArrayData = {
    require(a.numElements() >= dim,
      s"lsh_band_sigs: need $dim elements, got ${a.numElements()}")
    val out = new Array[Long](bands)
    var b = 0
    var j = 0L
    while (b < bands) {
      var sig = 0L
      var i = 0
      while (i < rbits) {
        var acc = 0.0
        var d = 0
        while (d < dim) {
          val x = if (isFloat) a.getFloat(d).toDouble else a.getDouble(d)
          val s = if (Hashes.mulHashLong(j * 4096L + d, seed) % 2 == 0) 1.0 else -1.0
          acc += x * s
          d += 1
        }
        if (acc >= 0) sig += (1L << i)
        i += 1
        j += 1
      }
      out(b) = sig
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** lsh_band_sigs(vec): array<long> of the `bands` band signatures. */
  case class LshBandSigsExpr(child: Expression, bands: Int, rbits: Int,
                             dim: Int, seed: Long) extends UnaryExpression {
    require(bands > 0 && rbits > 0 && rbits < 63 && dim > 0)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double>, got ${other.catalogString}")
    }
    private lazy val isFloat = isFloatArray(child)

    override def nullSafeEval(a: Any): Any =
      lshBandSigsData(a.asInstanceOf[ArrayData], isFloat, bands, rbits, dim, seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.VectorExprs.lshBandSigsData($c, $isFloat, $bands, $rbits, $dim, ${seed}L);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "lsh_band_sigs"
  }
}
