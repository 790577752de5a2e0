package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Fixed-point integer ELO expectation — the [[IntLn]] discipline applied
  * to the arena family's one remaining libm surface (playbook #49):
  *
  *   e_e6 = round(1e6 / (1 + 10^(d/400))),  d = rating(b) − rating(a)
  *
  * computed with INTEGER arithmetic only: y = min(4000, |d|),
  * x = y·ln10 // 400 (e12), split x = k·ln2 + r with r ∈ [0, ln2),
  * exp(r) by a 17-term Taylor sum in e12 truncating fixed point,
  * E = exp(r)·2^k, then the sign-split round
  *   d ≥ 0: e = round(1e18 / (1e12 + E))
  *   d < 0: e = round(1e6·E / (1e12 + E))       (1/(1+10^{−a}) = E/(1+E))
  * with round(n/m) = (2n + m) // (2m) on positive integers. The y-clamp at
  * 4000 is exact: e rounds to 0 / 1e6 for every |d| ≥ 2522 already.
  *
  * Three coordinated implementations, one step list:
  * [[eloExpectE6]] (the JVM mirror the q453 fold calls — BigInt, truncating
  * division), [[duckEloE]] (the nested-select rendering inside the
  * recursive oracle CTE — HUGEINT), and [[sparkCols]] (decimal(38,0), used
  * by the spec to pin mirror ≡ rendering). All divisions are positive, so
  * BigInt `/`, DuckDB `//` and Spark `div` all truncate identically.
  *
  * Overflow audit (y ≤ 4000): x ≤ 2.31e13, k ≤ 33, per-term product
  * ≤ 0.7e12·0.7e12 ≈ 5e23 (wide), E ≤ 2.7e12·2^33 ≈ 2.4e22,
  * 2·1e6·E ≤ 4.8e28 — all inside HUGEINT/decimal(38,0); every division
  * RESULT ≤ 1e18 fits BIGINT.
  */
object IntExp {

  /** ln10 · 1e12, nearest. */
  val Ln10E12 = 2302585092994L

  private val E12 = "1000000000000"

  /** The shared exp core over an `iex_x` column (e12, ≥ 0): split off the
    * 2^k part, Taylor on the remainder, E = exp(x)·1e12 as `iex_e2`, and
    * the rounding denominator `iex_den` = 1e12 + E.
    *
    * `fastInt64 = true` (the Spark rendering) computes the 16 Taylor terms
    * in PURE int64 instead of decimal(38,0): the per-term 128-bit product
    * t·r (≤ 5e23) is split exactly as
    *   ⌊t·r/1e12⌋ = tH·rH + ⌊((tH·rL + tL·rH)·1e6 + tL·rL) / 1e12⌋
    * with tH = t div 1e6, tL = t % 1e6 (every intermediate ≤ 1.4e18 by the
    * r, t < 0.7e12 bound, and the identity is exact for non-negative ints —
    * a·b = (aH·bH)·1e12 + B with B the bracketed term). Only the e2/den
    * tail (E ≤ 2.4e22) stays decimal. This removes ~48 decimal ops per row
    * from the hot path (guide §4: prefer codegen-friendly primitives —
    * measured 25.6 s → int64 chain for 600 k rows in q20); values are
    * bit-identical to the decimal/HUGEINT/BigInt forms by the shared
    * positive-truncating-division construction, which the IntExp specs pin.
    */
  private def core(big: String => String, shl: String => String,
                   idiv: String,
                   fastInt64: Boolean = false): Seq[(String, String)] = {
    // t1 = r exactly (1e12·r // 1e12 // 1), so the chain starts from iex_r
    val taylor = (2 to 17).map { n =>
      val prev = if (n == 2) "iex_r" else s"iex_t${n - 1}"
      if (fastInt64)
        s"iex_t$n" -> (s"(((($prev div 1000000) * iex_rh)" +
          s" + ((((($prev div 1000000) * iex_rl)" +
          s" + (($prev % 1000000) * iex_rh)) * 1000000)" +
          s" + (($prev % 1000000) * iex_rl)) $idiv $E12) $idiv $n)")
      else
        s"iex_t$n" -> s"(${big(prev)} * iex_r $idiv $E12 $idiv $n)"
    }
    val sum = "1000000000000 + iex_r + " +
      (2 to 17).map(n => s"iex_t$n").mkString(" + ")
    val rSplit =
      if (fastInt64)
        Seq("iex_rh" -> "(iex_r div 1000000)",
          "iex_rl" -> "(iex_r % 1000000)")
      else Seq.empty
    Seq(
      "iex_k" -> s"(iex_x $idiv ${IntLn.Ln2E12})",
      "iex_r" -> s"(iex_x - iex_k * ${IntLn.Ln2E12})") ++
      rSplit ++ taylor ++ Seq(
      "iex_s" -> s"($sum)",
      "iex_e2" -> s"(${big("iex_s")} * ${shl("iex_k")})",
      "iex_den" -> s"(${big(E12)} + iex_e2)")
  }

  /** ELO step list over an input column `d` (BIGINT rating diff); the
    * final step is named `e`.
    */
  private def steps(d: String, big: String => String, shl: String => String,
                    idiv: String,
                    fastInt64: Boolean = false): Seq[(String, String)] =
    Seq(
      "iex_d" -> s"($d)",
      "iex_y" -> "least(4000, abs(iex_d))",
      "iex_x" -> s"(iex_y * $Ln10E12 $idiv 400)") ++
      core(big, shl, idiv, fastInt64) ++ Seq(
      "e" -> (s"(CASE WHEN iex_d >= 0" +
        s" THEN (2 * ${big("1000000000000000000")} + iex_den)" +
        s" $idiv (2 * iex_den)" +
        s" ELSE (2 * (1000000 * iex_e2) + iex_den)" +
        s" $idiv (2 * iex_den) END)"))

  /** Sigmoid step list over an input column `z` (e12 natural-log units):
    * p_e6 = round(1e6·σ(z)). y clamps at 16e12 — exact, since σ already
    * rounds to 0 / 1e6 past |z| = 14.51. Sign branch is the ELO one
    * flipped (σ(z) = 1 − elo-e of the same magnitude).
    */
  private def sigmoidSteps(z: String, big: String => String,
                           shl: String => String,
                           idiv: String,
                           fastInt64: Boolean = false): Seq[(String, String)] =
    Seq(
      "iex_d" -> s"($z)",
      "iex_y" -> "least(16000000000000, abs(iex_d))",
      "iex_x" -> "iex_y") ++
      core(big, shl, idiv, fastInt64) ++ Seq(
      "p_e6" -> (s"(CASE WHEN iex_d >= 0" +
        s" THEN (2 * (1000000 * iex_e2) + iex_den)" +
        s" $idiv (2 * iex_den)" +
        s" ELSE (2 * ${big("1000000000000000000")} + iex_den)" +
        s" $idiv (2 * iex_den) END)"))

  /** DuckDB: wrap `inner` (a SELECT carrying every needed column) in nested
    * SELECTs; the outermost adds BIGINT column `e` (helpers carry along —
    * callers project explicitly above this).
    */
  def duckEloE(inner: String, d: String): String = {
    val chain = steps(d,
      big = x => s"CAST($x AS HUGEINT)",
      shl = k => s"(CAST(1 AS BIGINT) << CAST(iex_k AS INTEGER))",
      idiv = "//")
    val nested = chain.dropRight(1).foldLeft(inner) {
      case (acc, (name, e)) => s"SELECT *, $e AS $name FROM ($acc)"
    }
    val (_, eExpr) = chain.last
    s"SELECT *, CAST($eExpr AS BIGINT) AS e FROM ($nested)"
  }

  /** Spark rendering of the same steps (spec use). */
  def sparkCols(df: DataFrame, d: String): DataFrame =
    steps(d,
      big = x => s"cast($x as decimal(38,0))",
      shl = _ => "cast(shiftleft(cast(1 as bigint), cast(iex_k as int)) as decimal(38,0))",
      idiv = "div", fastInt64 = true)
      .foldLeft(df) { case (acc, (name, e)) =>
        acc.withColumn(name, expr(if (name == "e") s"cast($e as bigint)" else e))
      }

  /** DuckDB sigmoid: wrap `inner` (carrying an e12 column expression `z`)
    * in nested SELECTs; the outermost adds BIGINT column `p_e6`.
    */
  def duckSigmoidE6(inner: String, z: String): String = {
    val chain = sigmoidSteps(z,
      big = x => s"CAST($x AS HUGEINT)",
      shl = _ => s"(CAST(1 AS BIGINT) << CAST(iex_k AS INTEGER))",
      idiv = "//")
    val nested = chain.dropRight(1).foldLeft(inner) {
      case (acc, (name, e)) => s"SELECT *, $e AS $name FROM ($acc)"
    }
    val (_, pExpr) = chain.last
    s"SELECT *, CAST($pExpr AS BIGINT) AS p_e6 FROM ($nested)"
  }

  /** Spark sigmoid: add the step columns (final BIGINT `p_e6`) over an
    * e12 input column expression `z`.
    */
  def sparkSigmoidCols(df: DataFrame, z: String): DataFrame =
    sigmoidSteps(z,
      big = x => s"cast($x as decimal(38,0))",
      shl = _ => "cast(shiftleft(cast(1 as bigint), cast(iex_k as int)) as decimal(38,0))",
      idiv = "div", fastInt64 = true)
      .foldLeft(df) { case (acc, (name, e)) =>
        acc.withColumn(name,
          expr(if (name == "p_e6") s"cast($e as bigint)" else e))
      }

  /** Half-life decay step list over an input column `age` (non-negative
    * integer time units) with half-life `hl` in the same units:
    * w_e6 = round(1e6·2^(−age/hl)) = round(1e6·e^(−age·ln2/hl)). Fully
    * integer end to end — the age is integral, so not even the z
    * quantization of the sigmoid path is needed. x clamps at 16e12
    * (exact: the weight already rounds to 0 past x = 14.51).
    */
  private def decaySteps(age: String, hl: Long, big: String => String,
                         shl: String => String,
                         idiv: String,
                         fastInt64: Boolean = false): Seq[(String, String)] =
    Seq(
      "iex_xw" -> s"(${big(s"($age)")} * ${IntLn.Ln2E12} $idiv $hl)",
      "iex_x" -> ("(CASE WHEN iex_xw >= 16000000000000" +
        " THEN 16000000000000 ELSE iex_xw END)")) ++
      core(big, shl, idiv, fastInt64) ++ Seq(
      "w_e6" -> (s"((2 * ${big("1000000000000000000")} + iex_e2)" +
        s" $idiv (2 * iex_e2))"))

  /** DuckDB decay rendering (outermost column: BIGINT `w_e6`). */
  def duckDecayE6(inner: String, age: String, hl: Long): String = {
    val chain = decaySteps(age, hl,
      big = x => s"CAST($x AS HUGEINT)",
      shl = _ => s"(CAST(1 AS BIGINT) << CAST(iex_k AS INTEGER))",
      idiv = "//")
    val nested = chain.dropRight(1).foldLeft(inner) {
      case (acc, (name, e)) => s"SELECT *, $e AS $name FROM ($acc)"
    }
    s"SELECT *, CAST(${chain.last._2} AS BIGINT) AS w_e6 FROM ($nested)"
  }

  /** Spark decay rendering. */
  def sparkDecayCols(df: DataFrame, age: String, hl: Long): DataFrame =
    decaySteps(age, hl,
      big = x => s"cast($x as decimal(38,0))",
      shl = _ => "cast(shiftleft(cast(1 as bigint), cast(iex_k as int)) as decimal(38,0))",
      idiv = "div", fastInt64 = true)
      .foldLeft(df) { case (acc, (name, e)) =>
        acc.withColumn(name,
          expr(if (name == "w_e6") s"cast($e as bigint)" else e))
      }

  /** Query-path renderings: ONE codegen'd static call per row to the JVM
    * mirrors below (the [[graft.functions.VectorExprs]] escape-hatch
    * pattern). The 22-step column chain costs 40+ µs/row however it is
    * rendered — decimal(38,0) ops, or 23 stacked wide projections — where
    * the compiled mirror is a sub-µs method call, and equality with the
    * mirror holds BY CONSTRUCTION (the chain renderings stay for the specs,
    * which pin mirror ≡ rendering; the DuckDB HUGEINT rendering remains the
    * independent cross-engine form the oracle gate checks). Measured on
    * q20: 25.6 s → ~3 s for 600 k rows (guide §4: non-codegen-friendly
    * expression work in the hot path).
    */
  def sigmoidE6Col(z: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    mirrorCall("sigmoidE6", Seq(z))

  def decayE6Col(age: org.apache.spark.sql.Column, hl: Long): org.apache.spark.sql.Column =
    mirrorCall("decayE6", Seq(age, org.apache.spark.sql.functions.lit(hl)))

  def eloExpectE6Col(d: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    mirrorCall("eloExpectE6", Seq(d))

  private def mirrorCall(fn: String,
                         args: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.types.LongType
    GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        IntExp.getClass, LongType, fn,
        args.map(GraftColumnBridge.expression),
        inputTypes = args.map(_ => LongType),
        propagateNull = true, returnNullable = false))
  }

  /** JVM decay mirror. */
  def decayE6(age: Long, hl: Long): Long = {
    require(age >= 0 && hl > 0)
    val xw = BigInt(age) * IntLn.Ln2E12 / hl
    val x = if (xw >= 16000000000000L) 16000000000000L else xw.toLong
    val k = (x / IntLn.Ln2E12).toInt
    val r = x - k.toLong * IntLn.Ln2E12
    val e12 = BigInt(1000000000000L)
    var t = BigInt(r)
    var s = e12 + t
    var n = 2
    while (n <= 17) { t = t * r / e12 / n; s += t; n += 1 }
    val bigE = s * (BigInt(1) << k)
    ((2 * BigInt("1000000000000000000") + bigE) / (2 * bigE)).toLong
  }

  /** JVM sigmoid mirror — same steps over BigInt. */
  def sigmoidE6(zE12: Long): Long = {
    val y = math.min(16000000000000L, math.abs(zE12))
    val k = (y / IntLn.Ln2E12).toInt
    val r = y - k.toLong * IntLn.Ln2E12
    val e12 = BigInt(1000000000000L)
    var t = BigInt(r)
    var s = e12 + t
    var n = 2
    while (n <= 17) {
      t = t * r / e12 / n
      s += t
      n += 1
    }
    val bigE = s * (BigInt(1) << k)
    val den = e12 + bigE
    val p =
      if (zE12 >= 0) (2 * (BigInt(1000000L) * bigE) + den) / (2 * den)
      else (2 * BigInt("1000000000000000000") + den) / (2 * den)
    p.toLong
  }

  /** The JVM mirror — the exact same steps over BigInt; the q453 fold's
    * per-match expectation. Bit-identical to the SQL renderings by shared
    * construction (every division positive and truncating).
    */
  def eloExpectE6(d: Long): Long = {
    val y = math.min(4000L, math.abs(d))
    val x = y * Ln10E12 / 400
    val k = (x / IntLn.Ln2E12).toInt
    val r = x - k.toLong * IntLn.Ln2E12
    val e12 = BigInt(1000000000000L)
    var t = BigInt(r)
    var s = e12 + t
    var n = 2
    while (n <= 17) {
      t = t * r / e12 / n
      s += t
      n += 1
    }
    val bigE = s * (BigInt(1) << k)
    val den = e12 + bigE
    val e =
      if (d >= 0) (2 * BigInt("1000000000000000000") + den) / (2 * den)
      else (2 * (BigInt(1000000L) * bigE) + den) / (2 * den)
    e.toLong
  }
}
