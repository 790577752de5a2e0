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
}
