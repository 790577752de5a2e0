package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property guards for the round-8 continuation additions (q351–q364):
  * each pins the CLAIM the operator exists to make, not just its hash —
  * RANSAC's outlier rejection, whitening's identity covariance, the
  * isolation forest's planted-anomaly capture, Borůvka's forest
  * invariant, ALS beating the trivial predictor, and the bandit replay's
  * accounting identity.
  */
class Round10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q353 RANSAC: consensus recovers the planted line against outliers") {
    val rows = run("q353_ransac").collect()
    val n = Tables.lineitem(spark, sf).count()
    val bestInliers = rows.map(_.getAs[Long]("inliers")).max
    // ~90% of points are planted inliers; the winning hypothesis must
    // capture nearly all of them (not a line through outliers)
    assert(bestInliers > (n * 8) / 10, s"best=$bestInliers of $n")
    val slope = rows.head.getAs[Long]("slope_e6")
    val icept = rows.head.getAs[Long]("intercept_e6")
    assert(slope > 4900000L && slope < 5100000L, s"slope_e6=$slope")
    assert(icept > 6000000L && icept < 8000000L, s"intercept_e6=$icept")
  }

  test("q361 whitening: transformed covariance is the identity") {
    run("q361_whitening").collect().foreach { r =>
      val (i, j) = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      val w = r.getAs[Long]("wcov_e6")
      if (i == j) assert(math.abs(w - 1000000L) < 1000, s"diag($i)=$w")
      else assert(math.abs(w) < 1000, s"off($i,$j)=$w")
    }
  }

  test("q362 isolation forest: planted corruption owns the top-20") {
    val rows = run("q362_oblivious_iforest").collect()
    assert(rows.length == 20)
    val planted = rows.map(_.getAs[Long]("planted")).sum
    assert(planted >= 18, s"only $planted of 20 top anomalies are planted")
  }

  test("q364 Borůvka: each round's chosen edges form a forest") {
    import graft.operators.Components
    // re-derive round-1 nominations exactly as the query does
    val ew = {
      import graft.functions.Hashes
      val pts = Tables.customer(spark, sf).select(
        col("c_custkey").as("id"),
        (Hashes.mulHash(col("c_custkey"), 11) % 1000).as("x"),
        (Hashes.mulHash(col("c_custkey"), 13) % 1000).as("y"))
      val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
      val a = pts.select(col("id").as("u"), col("x").as("ax"),
          col("y").as("ay"), explode(offsets).as("off"))
        .select(col("u"), col("ax"), col("ay"),
          (expr("ax div 25") + col("off.dx")).as("cx"),
          (expr("ay div 25") + col("off.dy")).as("cy"))
      val b = pts.select(col("id").as("v"), col("x").as("bx"),
        col("y").as("by"), expr("bx div 25").as("cx"),
        expr("by div 25").as("cy"))
      a.join(b, Seq("cx", "cy"))
        .where(col("u") < col("v")
          && (col("ax") - col("bx")) * (col("ax") - col("bx"))
             + (col("ay") - col("by")) * (col("ay") - col("by")) <= 625)
        .select(col("u"), col("v"),
          ((col("ax") - col("bx")) * (col("ax") - col("bx"))
            + (col("ay") - col("by")) * (col("ay") - col("by"))).as("d2"))
    }
    val ch1 = ew.select(col("u").as("comp"), col("d2"), col("u"), col("v"))
      .unionAll(ew.select(col("v").as("comp"), col("d2"), col("u"),
        col("v")))
      .groupBy("comp")
      .agg(min(struct(col("d2"), col("u"), col("v"))).as("me"))
      .select(col("me.u").as("u"), col("me.v").as("v"))
      .distinct().localCheckpoint()
    val nEdges = ch1.count()
    val nVerts = ch1.select(col("u").as("id"))
      .unionAll(ch1.select(col("v").as("id"))).distinct().count()
    val nComps = Components.connectedComponents(ch1, "u", "v")
      .select("comp").distinct().count()
    // a forest satisfies |E| = |V| − |CC| exactly (no cycles)
    assert(nEdges == nVerts - nComps,
      s"edges=$nEdges verts=$nVerts comps=$nComps")
  }

  test("q354 ALS: factor model beats the raw second moment") {
    val mse = run("q354_als_rank1").collect().head.getAs[Long]("mse_e6")
    val r = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_quantity").cast("long").as("r"))
    val m2 = r.agg(avg(col("r") * col("r"))).collect().head.getDouble(0)
    assert(mse < (m2 * 1000000L).toLong,
      s"mse_e6=$mse vs raw second moment ${(m2 * 1e6).toLong}")
  }

  test("q358 bandit replay: pull census equals the match count") {
    run("q358_bandit_replay").collect().foreach { row =>
      val pulls = (0 to 4).map(a => row.getAs[Long](s"n$a")).sum
      assert(pulls == row.getAs[Long]("matches"),
        s"coh=${row.getAs[Long]("coh")}: pulls=$pulls " +
          s"matches=${row.getAs[Long]("matches")}")
      assert(row.getAs[Long]("rsum") <= row.getAs[Long]("matches"))
    }
  }
}
