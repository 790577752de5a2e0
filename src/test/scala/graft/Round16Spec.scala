package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Guards for the round that shipped the ULP hardening (IntLn) and the
  * q455-oracle materialization fix. (RoundNSpec numbers are a sequential
  * spec series, not build-round numbers.)
  */
class Round16Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Driver-side mirror of IntLn's exact step list — BigInt, truncating
    * division, same constants. If either engine's rendering ever drifts
    * from this arithmetic, the accuracy assertions below catch it.
    */
  private def refLnE12(v: Long): Long = {
    require(v >= 1)
    val E12 = BigInt(1000000000000L)
    val b = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val m = BigInt(v) * E12 / (BigInt(1) << b)
    val z = (m - E12) * E12 / (m + E12)
    val z2 = z * z / E12
    var zk = z * z2 / E12 // z^3
    var s = z
    for (k <- List(3, 5, 7, 9, 11, 13, 15, 17)) {
      s += zk / k
      zk = zk * z2 / E12
    }
    (BigInt(b) * graft.functions.IntLn.Ln2E12 + 2 * s).toLong
  }

  test("IntLn Spark rendering matches the BigInt reference step-for-step") {
    import spark.implicits._
    val vs = (1L to 2048L) ++ Seq(1L << 20, (1L << 31) - 1, 1L << 40,
      987654321098L, Long.MaxValue / 2, Long.MaxValue)
    val df = graft.functions.IntLn.sparkCols(
      vs.toDF("v"), "v", "t_")
      .select(col("v"), col("t_ln_e12")).collect()
    df.foreach { r =>
      val v = r.getLong(0)
      assert(r.getLong(1) === refLnE12(v), s"v=$v")
    }
  }

  test("IntLn is within 1 e6-unit of libm ln and monotone") {
    import spark.implicits._
    val vs = (1L to 5000L)
    val rows = graft.functions.IntLn.sparkCols(vs.toDF("v"), "v", "t_")
      .select(col("v"),
        expr(graft.functions.IntLn.roundE6("t_", "div")).as("e6"))
      .orderBy("v").collect()
    var prev = Long.MinValue
    rows.foreach { r =>
      val v = r.getLong(0); val e6 = r.getLong(1)
      val libm = math.round(math.log(v.toDouble) * 1e6)
      assert(math.abs(e6 - libm) <= 1, s"v=$v e6=$e6 libm=$libm")
      assert(e6 >= prev, s"non-monotone at v=$v")
      prev = e6
    }
  }

  // NOTE: the q455/q310 MATERIALIZED-oracle guards moved to
  // OracleHealthSpec (round 14) — the consolidated oracle-health table.

  test("fitPolicy refuses mixed batch percents and non-singleton recovery") {
    import spark.implicits._
    import graft.operators.NswGraph
    val mixed = Seq((25L, 900000L), (50L, 880000L))
      .toDF("batch_pct", "recall_ppm")
    val rec1 = Seq(990000L).toDF("recall_ppm")
    val e1 = intercept[IllegalArgumentException] {
      NswGraph.fitPolicy(mixed, rec1, 950000L)
    }
    assert(e1.getMessage.contains("mixes batch percents"))
    val ok = Seq((25L, 900000L), (25L, 880000L)).toDF("batch_pct", "recall_ppm")
    val rec0 = rec1.where(col("recall_ppm") < 0L)
    val e2 = intercept[IllegalArgumentException] {
      NswGraph.fitPolicy(ok, rec0, 950000L)
    }
    assert(e2.getMessage.contains("expected exactly 1"))
  }

  test("IntExp ELO expectation: JVM mirror == Spark rendering, near libm, monotone") {
    import spark.implicits._
    import graft.functions.IntExp
    val ds = ((-5000L to 5000L by 7) ++ Seq(-5000L, -2522L, -1L, 0L, 1L,
      399L, 400L, 2522L, 5000L)).distinct.sorted
    // mirror == Spark-rendered step chain (the DuckDB rendering shares the
    // step list; its equality is proven by q453's oracle gate)
    val rendered = IntExp.sparkCols(ds.toDF("d"), "d")
      .select(col("d"), col("e")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var prev = Long.MaxValue
    ds.foreach { d =>
      val e = IntExp.eloExpectE6(d)
      assert(e === rendered(d), s"mirror != rendering at d=$d")
      val libm = math.round(1000000.0 / (1 + math.pow(10, d / 400.0)))
      assert(math.abs(e - libm) <= 1, s"d=$d e=$e libm=$libm")
      assert(e <= prev, s"non-monotone at d=$d")
      prev = e
    }
    assert(IntExp.eloExpectE6(0L) === 500000L)
    assert(IntExp.eloExpectE6(-5000L) === 1000000L)
    assert(IntExp.eloExpectE6(5000L) === 0L)
  }

  test("IntExp mirror-call columns (query fast path) == step-chain renderings") {
    // r15 optimization: the query paths call the JVM mirrors through ONE
    // codegen'd StaticInvoke per row instead of the 22-step column chain.
    // Pin invoke ≡ chain over the same sweeps the chain tests use, so the
    // three-way anchor (mirror / chain / HUGEINT-oracle) extends to four.
    import spark.implicits._
    import graft.functions.IntExp
    val zs = ((-20000000000000L to 20000000000000L by 371000000001L) ++
      Seq(0L, 1L, -1L, 16000000000000L, -16000000000000L)).distinct.sorted
    val viaInvoke = zs.toDF("z")
      .withColumn("p_e6", IntExp.sigmoidE6Col(col("z")))
      .select(col("z"), col("p_e6")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaChain = IntExp.sparkSigmoidCols(zs.toDF("z"), "z")
      .select(col("z"), col("p_e6")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    zs.foreach(z => assert(viaInvoke(z) === viaChain(z), s"sigmoid at z=$z"))
    val hl = 86400000000L
    val ages = ((0L to 30L * hl by 1234567891L) ++ Seq(0L, 1L, hl, 100L * hl))
      .distinct.sorted
    val dInvoke = ages.toDF("a")
      .withColumn("w_e6", IntExp.decayE6Col(col("a"), hl))
      .select(col("a"), col("w_e6")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ages.foreach(a => assert(dInvoke(a) === IntExp.decayE6(a, hl), s"decay at $a"))
    val ds = ((-5000L to 5000L by 7) ++ Seq(0L, 1L, -1L)).distinct.sorted
    val eInvoke = ds.toDF("d")
      .withColumn("e", IntExp.eloExpectE6Col(col("d")))
      .select(col("d"), col("e")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ds.foreach(dd => assert(eInvoke(dd) === IntExp.eloExpectE6(dd), s"elo at $dd"))
  }

  test("IntExp sigmoid: mirror == Spark rendering, near libm, saturating, symmetric") {
    import spark.implicits._
    import graft.functions.IntExp
    val zs = ((-20000000000000L to 20000000000000L by 371000000001L) ++
      Seq(0L, 1L, -1L, 16000000000000L, -16000000000000L,
        14510000000000L, 2500000000000L)).distinct.sorted
    val rendered = IntExp.sparkSigmoidCols(zs.toDF("z"), "z")
      .select(col("z"), col("p_e6")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    zs.foreach { z =>
      val p = IntExp.sigmoidE6(z)
      assert(p === rendered(z), s"mirror != rendering at z=$z")
      val libm = math.round(1000000.0 / (1 + math.exp(-z / 1e12)))
      assert(math.abs(p - libm) <= 1, s"z=$z p=$p libm=$libm")
      // symmetry: sigma(z) + sigma(-z) = 1e6 on the shared |z| chain
      assert(p + IntExp.sigmoidE6(-z) === 1000000L, s"asymmetric at z=$z")
    }
    assert(IntExp.sigmoidE6(0L) === 500000L)
    assert(IntExp.sigmoidE6(20000000000000L) === 1000000L)
    assert(IntExp.sigmoidE6(-20000000000000L) === 0L)
  }

  test("IntExp decay: mirror == Spark rendering, near libm, halving per half-life") {
    import spark.implicits._
    import graft.functions.IntExp
    val hl = 86400000000L
    val ages = (0L to 30L * hl by 1234567891L) ++
      Seq(0L, 1L, hl, 2 * hl, hl / 2, 100L * hl)
    val rendered = IntExp.sparkDecayCols(ages.distinct.toDF("a"), "a", hl)
      .select(col("a"), col("w_e6")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ages.distinct.foreach { a =>
      val w = IntExp.decayE6(a, hl)
      assert(w === rendered(a), s"mirror != rendering at age=$a")
      val libm = math.round(1000000.0 * math.exp(-a.toDouble / hl * math.log(2.0)))
      assert(math.abs(w - libm) <= 1, s"age=$a w=$w libm=$libm")
    }
    assert(IntExp.decayE6(0L, hl) === 1000000L)
    assert(IntExp.decayE6(hl, hl) === 500000L)
    assert(IntExp.decayE6(2 * hl, hl) === 250000L)
    assert(IntExp.decayE6(100L * hl, hl) === 0L)
  }

  test("Heaps' law fit pins beta = 1 on all-unique and beta = 0 on single-token corpora") {
    import spark.implicits._
    // 8 docs x 64 tokens, every token globally unique => V(n) = n at every
    // checkpoint => the OLS slope is EXACTLY 1e6 (x_k = y_k pointwise)
    val uniq = (0L until 8L).map { d =>
      (d, (0 until 64).map(j => s"t${d}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val r1 = graft.queries.TextQueries.heapsLaw(uniq).collect().head
    assert(r1.getAs[Long]("beta_e6") === 1000000L)
    assert(r1.getAs[Long]("n_tokens") === 512L)
    assert(r1.getAs[Long]("vocab") === 512L)
    // one token repeated => V_k = 1 at every checkpoint => slope exactly 0
    val mono = (0L until 8L).map { d =>
      (d, Seq.fill(64)("a").mkString(" "))
    }.toDF("doc_id", "text")
    val r2 = graft.queries.TextQueries.heapsLaw(mono).collect().head
    assert(r2.getAs[Long]("beta_e6") === 0L)
    assert(r2.getAs[Long]("vocab") === 1L)
  }

  test("q460 bias is zero-guarded when a side never occurs") {
    // Direct expression check: the guarded form returns 0 (not NULL/error)
    // for an all-zero side — the engine/oracle divergence the advice named.
    import spark.implicits._
    val r = Seq((0L, 0L, 3L, 2L)).toDF("n_first", "w_first", "n_second", "w_second")
      .select(expr("(CASE WHEN n_first = 0 THEN 0L" +
        " ELSE w_first * 1000000 div n_first END)" +
        " - (CASE WHEN n_second = 0 THEN 0L" +
        " ELSE w_second * 1000000 div n_second END)").as("bias_ppm"))
      .collect()
    assert(r.head.getLong(0) === -666666L)
  }
}
