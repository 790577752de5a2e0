package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native codegen expression.
  *
  * Why custom (SURVEY preference order (b)): Spark ships `levenshtein` but no
  * Jaro family, and the algorithm (greedy windowed matching + transposition
  * count) is a per-pair double loop that no HOF composition expresses without
  * falling out of whole-stage codegen. One tight kernel per pair keeps the
  * fuzzy-match join stage fully codegen'd.
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity` (the RapidFuzz
  * formulation), verified pairwise before adoption:
  *   - either string empty → 0.0 (NOT the textbook 1.0 for both-empty);
  *   - match window = max(|a|,|b|)/2 − 1 (floored at 0);
  *   - jaro = (m/|a| + m/|b| + (m − ⌊T/2⌋)/m) / 3;
  *   - Winkler prefix boost (ℓ ≤ 4, p = 0.1) ONLY when jaro > 0.7.
  * That makes the oracle a genuinely independent second implementation —
  * the two engines share no code, only the published algorithm.
  */
object StringSimExprs {

  /** The kernel — static so generated code calls it directly. Operates on
    * CODEPOINTS, not UTF-16 code units: DuckDB/RapidFuzz count an emoji or
    * non-BMP CJK character as ONE symbol, and a code-unit loop would both
    * inflate lengths (surrogate pair = 2) and allow per-half surrogate
    * matches — scoring such strings differently from the pinned oracle.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString.codePoints().toArray
    val s2 = b.toString.codePoints().toArray
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val sim = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (sim <= 0.7) return sim
    var pref = 0
    val pmax = math.min(4, math.min(l1, l2))
    while (pref < pmax && s1(pref) == s2(pref)) pref += 1
    sim + pref * 0.1 * (1.0 - sim)
  }

  case class JaroWinklerExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two string inputs, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
      }
    override def nullSafeEval(l: Any, r: Any): Any =
      jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c1, c2) =>
        s"${ev.value} = graft.functions.StringSimExprs.jaroWinkler($c1, $c2);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(newLeft, newRight)
    override def prettyName: String = "jaro_winkler"
  }

  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinklerExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
