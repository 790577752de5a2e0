package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property guards for q365–q377: each pins the CLAIM the operator exists
  * to make — decontamination catching the planted cross-split copies, the
  * perplexity gate dropping exactly a quintile, Fellegi–Sunter separating
  * planted clones from co-blocked strangers, Cox's positive activity
  * hazard, boosting's monotone SSE descent, the waterfill budget
  * identity, EM's growing separation, Shapley's efficiency axiom, Luhn
  * validating exactly the uncorrupted plants, and Brandes putting the
  * bipartite bridges on top.
  */
class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q365 decontamination: flags a small planted tail, never the bulk") {
    val rows = run("q365_decontamination").collect()
    val nTrain = rows.map(_.getAs[Long]("n_train")).sum
    val nContam = rows.map(_.getAs[Long]("n_contaminated")).sum
    assert(nContam >= 1, "the planted cross-split near-copies must be caught")
    assert(nContam * 20 < nTrain, s"$nContam of $nTrain flagged — too many")
  }

  test("q366 perplexity filter: drops exactly the bottom quintile") {
    val rows = run("q366_perplexity_filter").collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val nDrop = rows.map(_.getAs[Long]("n_dropped")).sum
    // ntile(5) puts ceil(n/5) in the first tile (within 1 of n/5)
    assert(math.abs(nDrop - nDocs / 5) <= 1, s"dropped $nDrop of $nDocs")
  }

  test("q367 Fellegi-Sunter: planted clones and strangers separate") {
    val rows = run("q367_fellegi_sunter").collect()
    def n(truth: Boolean, dec: String): Long = rows
      .filter(r => r.getAs[Boolean]("truth") == truth
        && r.getAs[String]("decision") == dec)
      .map(_.getAs[Long]("n_pairs")).sum
    val trueTotal = n(true, "match") + n(true, "possible") + n(true, "non_match")
    assert(n(true, "match") * 5 >= trueTotal * 4,
      s"true-match recall ${n(true, "match")}/$trueTotal below 80%")
    assert(n(true, "non_match") == 0, "a planted clone fell to non_match")
    assert(n(false, "match") == 0, "a stranger pair scored as a match")
  }

  test("q368 Cox: more-active users convert faster (beta > 0)") {
    val rows = run("q368_cox_score").collect()
    val betas = rows.map(_.getAs[Long]("beta_e6")).distinct
    assert(betas.length == 1, "beta must be a single global estimate")
    assert(betas.head > 0, s"beta_e6=${betas.head}")
    // information terms are variances — nonnegative by construction
    rows.foreach(r => assert(r.getAs[Long]("i_term_e6") >= 0))
  }

  test("q372 GBDT: SSE falls every round and rounds chain exactly") {
    val rows = run("q372_gbdt_round").collect().sortBy(_.getAs[Long]("round"))
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("sse_after_e6") < r.getAs[Long]("sse_before_e6"),
        s"round ${r.getAs[Long]("round")} did not descend")
    }
    assert(rows(0).getAs[Long]("sse_after_e6")
      == rows(1).getAs[Long]("sse_before_e6"), "rounds must chain")
  }

  test("q371 tree root recovers the shipyear boundary") {
    val rows = run("q371_histogram_tree").collect()
    val root = rows.find(_.getAs[String]("node") == "root").get
    assert(root.getAs[String]("feat") == "f3",
      s"root split on ${root.getAs[String]("feat")}, expected shipyear")
  }

  test("q373 waterfill: budget respected, saturation consistent") {
    val rows = run("q373_unimax_mixture").collect()
    val toks = rows.map(_.getAs[Long]("toks")).sum
    val alloc = rows.map(_.getAs[Long]("allocated")).sum
    val budget = toks * 95 / 100
    assert(alloc <= budget, s"allocated $alloc over budget $budget")
    assert(budget - alloc < rows.length + budget / 100,
      s"slack ${budget - alloc} too large for an integer waterline")
    rows.foreach { r =>
      val sat = r.getAs[Boolean]("saturated")
      assert(sat == (r.getAs[Long]("toks") <= r.getAs[Long]("waterline")))
      if (sat) assert(r.getAs[Long]("allocated") == r.getAs[Long]("toks"))
    }
  }

  test("q374 GMM EM: means stay ordered, planted modes never collapse") {
    val rows = run("q374_gmm_em").collect().sortBy(_.getAs[Long]("iter"))
    assert(rows.length == 2)
    rows.foreach(r =>
      assert(r.getAs[Long]("mu2_e6") > r.getAs[Long]("mu1_e6")))
    // planted shift is +3.0 in log space (3_000_000 e6). EM guarantees
    // likelihood ascent, not monotone separation — with overlapping
    // components the means settle slightly inward. The claim the planted
    // mixture exists to make: the recovered separation stays NEAR the
    // plant (no collapse — raw unimodal log-price collapses toward 0).
    val sep = rows.map(r => r.getAs[Long]("mu2_e6") - r.getAs[Long]("mu1_e6"))
    sep.foreach(d => assert(d > 2000000L && d < 4000000L,
      s"separation left the planted band: ${sep.mkString(",")}"))
    assert(math.abs(sep(1) - sep(0)) * 4 < sep(0),
      s"separation moved >25% between iterations: ${sep.mkString(",")}")
  }

  test("q375 Shapley: efficiency axiom holds on the completed game") {
    val rows = run("q375_shapley_attribution").collect()
    assert(rows.length == 4)
    val phiSum = rows.map(_.getAs[Long]("phi_e9")).sum
    // v(grand) − v(∅) from the same touch-set census the query uses
    import org.apache.spark.sql.functions._
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("t"))
    val p = e.where(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("t").as("pt"))
    def touched(ch: String) =
      max(when(col("event_type") === ch
        && (col("pt").isNull || col("t") < col("pt")), 1L).otherwise(0L))
    val tch = e.join(p, Seq("user_id"), "left").groupBy("user_id")
      .agg(touched("view").as("bv"), touched("click").as("bc"),
        touched("signup").as("bs"), touched("error").as("be"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      .select((col("bv") + col("bc") * 2 + col("bs") * 4 + col("be") * 8)
        .as("st"), col("conv"))
    val full = tch.where(col("st") === 15)
      .agg(count(lit(1)).as("n"), sum("conv").as("c")).collect()(0)
    val empty = tch.where(col("st") === 0)
      .agg(count(lit(1)).as("n"), sum("conv").as("c")).collect()(0)
    def rate(r: org.apache.spark.sql.Row) =
      if (r.getAs[Long]("n") == 0) 0d
      else r.getAs[Long]("c").toDouble / r.getAs[Long]("n")
    val expected = ((rate(full) - rate(empty)) * 1e9).round
    // 32 quantized terms → ±16e0 rounding slack in e9 units
    assert(math.abs(phiSum - expected) <= 32, s"$phiSum vs $expected")
  }

  test("q376 Luhn: exactly the uncorrupted plants validate") {
    val rows = run("q376_luhn_pii").collect()
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val planted = docs
      .where(graft.functions.Hashes.bucket(col("doc_id"), 59, 5) === 0)
    val nPlanted = planted.count()
    val nValid = planted
      .where(graft.functions.Hashes.bucket(col("doc_id"), 61, 2) === 0)
      .count()
    assert(rows.map(_.getAs[Long]("n_candidates")).sum == nPlanted)
    assert(rows.map(_.getAs[Long]("n_luhn_valid")).sum == nValid)
    assert(rows.map(_.getAs[Long]("n_luhn_invalid")).sum == nPlanted - nValid)
  }

  test("q377 betweenness: the bipartite bridges rank on top") {
    val rows = run("q377_betweenness").collect()
    assert(rows.nonEmpty)
    rows.take(5).foreach(r => assert(r.getAs[Long]("id") > 1000000L,
      s"customer ${r.getAs[Long]("id")} outranked the supplier bridges"))
    val bc = rows.map(_.getAs[Long]("bc_e6"))
    assert(bc.zip(bc.tail).forall { case (a, b) => a >= b }, "not sorted")
  }
}
