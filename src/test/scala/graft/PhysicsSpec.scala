package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Physics, Tensors}

/** Algebraic invariants the reference implies (SURVEY §5.3). */
class PhysicsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rot90 composed four times is the identity (2x2, expression composition)") {
    val df = Seq(Tuple1(Seq(Seq(1f, 2f), Seq(3f, 4f)))).toDF("m")
    val four = (1 to 4).foldLeft(col("m"))((m, _) => Tensors.rot90(m, 2, 1))
    val got = df.select(flatten(four).as("r"), flatten(col("m")).as("orig"))
      .selectExpr("r = orig as same").head().getBoolean(0)
    assert(got)
  }

  test("rot90 closed forms for k=2,3 match composed single rotations") {
    val df = Seq(Tuple1(Seq(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f), Seq(7f, 8f, 9f)))).toDF("m")
    for (k <- 2 to 3) {
      val composed = (1 to k).foldLeft(col("m"))((m, _) => Tensors.rot90(m, 3, 1))
      val closed = Tensors.rot90(col("m"), 3, k)
      val same = df.select(flatten(closed).as("a"), flatten(composed).as("b"))
        .selectExpr("a = b as same").head().getBoolean(0)
      assert(same, s"k=$k")
    }
  }

  test("rot90 k=1 matches the numpy rot90 convention (out[j][i] = m[i][n-1-j])") {
    val df = Seq(Tuple1(Seq(Seq(1f, 2f), Seq(3f, 4f)))).toDF("m")
    // np.rot90([[1,2],[3,4]]) == [[2,4],[1,3]]
    val r = df.select(flatten(Tensors.rot90(col("m"), 2, 1))).head().getSeq[Float](0)
    assert(r == Seq(2f, 4f, 1f, 3f))
  }

  test("transpose is an involution and rot90 = transpose of row-reversed") {
    val df = Seq(Tuple1(Seq(Seq(1f, 2f), Seq(3f, 4f)))).toDF("m")
    val twice = Tensors.transposeGrid(Tensors.transposeGrid(col("m"), 2), 2)
    assert(df.select(flatten(twice).as("t"), flatten(col("m")).as("o"))
      .selectExpr("t = o as same").head().getBoolean(0))
    // np.rot90(m) == transpose(m)[rows reversed] — transpose then reverse rows
    val viaTranspose = reverse(Tensors.transposeGrid(col("m"), 2))
    assert(df.select(flatten(viaTranspose).as("a"),
        flatten(Tensors.rot90(col("m"), 2, 1)).as("b"))
      .selectExpr("a = b as same").head().getBoolean(0))
  }

  test("azimuth rotation stays in [0, 360)") {
    val df = (0 until 360 by 7).map(_.toDouble).toDF("az")
    for (k <- 1 to 3) {
      val bad = df.select(Physics.rotateAz(col("az"), k).as("r"))
        .where(col("r") < 0 || col("r") >= 360).count()
      assert(bad == 0, s"k=$k")
    }
  }

  test("spherical direction is a unit vector and round-trips zenith") {
    val df = Seq.tabulate(50)(i => (i + 1.0, i * 7.2 % 360)).toDF("zen", "az")
    val checked = df.select(
      Physics.dirX(col("zen"), col("az")).as("x"),
      Physics.dirY(col("zen"), col("az")).as("y"),
      Physics.dirZ(col("zen")).as("z"), col("zen"))
      .select(
        abs(col("x") * col("x") + col("y") * col("y") + col("z") * col("z") - 1).as("normErr"),
        abs(Physics.zenithOf(col("x"), col("y")) - col("zen")).as("zenErr"))
      .agg(max("normErr"), max("zenErr")).head()
    assert(checked.getDouble(0) < 1e-12)
    assert(checked.getDouble(1) < 1e-9)
  }

  test("one-hot then argmax recovers the label; one-hot sums to 1") {
    val df = (0 until 10).toDF("label")
    val bad = df.select(col("label"),
        Tensors.oneHot(col("label"), 10).as("oh"))
      .select(col("label"), Tensors.argmax(col("oh")).as("am"),
        aggregate(col("oh"), lit(0.0), (a, v) => a + v).as("s"))
      .where(col("am") =!= col("label") || col("s") =!= 1.0).count()
    assert(bad == 0)
  }

  test("standard scaling then unscaling is identity; sigmoid is in (0,1)") {
    // (sigmoid saturates to exactly 1.0 in doubles around |x|≈37, so keep x moderate)
    val df = Seq(1.0, 5.0, -3.0, 10.0).toDF("x")
    val err = df.select(
      abs(Physics.standardScale(col("x"), 2.0, 3.0) * 3.0 + 2.0 - col("x")).as("e"))
      .agg(max("e")).head().getDouble(0)
    assert(err < 1e-12)
    val sig = df.select(Physics.sigmoid(col("x")).as("p"))
      .where(col("p") <= 0 || col("p") >= 1).count()
    assert(sig == 0)
  }
}
