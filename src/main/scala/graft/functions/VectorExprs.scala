package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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
