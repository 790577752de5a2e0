package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PowerIteration

/** Unit invariants for the round-7 operators: power iteration, the phonetic
  * skeleton, and the integer-HITS normalization arithmetic.
  */
class Round7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("power iteration recovers the dominant eigenvector of a known matrix") {
    // diag(10, 4, 1) rotated is overkill — a plain diagonal already pins
    // the answer: dominant direction e1, eigenvalue 10.
    val c = Array(
      Array(10.0, 0.0, 0.0),
      Array(0.0, 4.0, 0.0),
      Array(0.0, 0.0, 1.0))
    val (v, lam) = PowerIteration.topEigenvector(c, 4)
    assert(math.abs(v(0)) > 0.999 && math.abs(v(1)) < 0.05 && math.abs(v(2)) < 0.05)
    assert(math.abs(lam - 10.0) < 0.2)
  }

  test("power iteration: off-diagonal coupling, sign pinned by the e1 start") {
    // [[2, 1], [1, 2]] has eigenpairs (3, [1,1]/√2) and (1, [1,-1]/√2);
    // starting from e1 the iterate converges to the POSITIVE [1,1] direction
    val c = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (v, lam) = PowerIteration.topEigenvector(c, 8)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(v(0) - s) < 1e-3 && math.abs(v(1) - s) < 1e-3)
    assert(math.abs(lam - 3.0) < 1e-3)
  }

  test("power iteration is deterministic and unit-norm after snapping") {
    val c = Array.tabulate(16, 16)((i, j) => ((i * 31 + j * 17) % 13).toDouble)
    val sym = Array.tabulate(16, 16)((i, j) => c(i)(j) + c(j)(i))
    val (v1, l1) = PowerIteration.topEigenvector(sym, 4)
    val (v2, l2) = PowerIteration.topEigenvector(sym, 4)
    assert(v1.sameElements(v2) && l1 == l2)
    val n = v1.map(x => x * x).sum
    assert(math.abs(n - 1.0) < 1e-6)
  }

  test("q229 Spark run matches its own oracle shape and lambda is positive") {
    val out = SparkEntry.queries("q229_pca_power")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(3) > 0)) // covariance Rayleigh quotient > 0
  }

  test("phonetic skeleton is invariant under vowel removal (q228's F pass)") {
    val rows = Seq(
      "machine learning with spark engines",
      "The quick brown fox jumps over 42 dogs").toDF("pre")
    val sk = rows.select(
      graft.queries.PhoneticSql.skelCol(col("pre")).as("a"),
      graft.queries.PhoneticSql
        .skelCol(regexp_replace(col("pre"), "[aeiou]", "")).as("b"))
      .collect()
    sk.foreach(r => assert(r.getString(0) == r.getString(1)))
    // and the code actually maps classes: 'btd' → 1 3 3 (b→1, t→3, d→3)
    val one = Seq("btd").toDF("pre")
      .select(graft.queries.PhoneticSql.skelCol(col("pre"))).head.getString(0)
    assert(one == "133")
  }

  test("integer HITS mass normalization: scores sum to ~the unit per side") {
    val out = SparkEntry.queries("q230_hits")(spark, "/root/testdata/sf0.001")
      .collect()
    val auth = out.filter(_.getString(0) == "auth")
    val hub = out.filter(_.getString(0) == "hub")
    assert(auth.nonEmpty && hub.nonEmpty)
    // top-15 slices of an L1-normalized mass: each score is positive and no
    // single score exceeds the whole unit
    assert(auth.forall(r => r.getLong(3) > 0 && r.getLong(3) <= 1000000000L))
    assert(hub.forall(r => r.getLong(3) > 0 && r.getLong(3) <= 1000000L))
  }
}
