package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GlobalRank, PrefixSum}

/** The bit-identity claims behind round 13's window migrations, pinned
  * mechanically: for ANY data and ANY partition count, the two-pass
  * PrefixSum zip equals the partition-less window form (inclusive and
  * exclusive cumsum + row number), and GlobalRank.zipWithNtile equals
  * `ntile(n) OVER (ORDER BY ...)` — including the N % n ≠ 0 and N < n
  * bucket-boundary cases where the (rank·n) div N rule would diverge.
  * The data is seeded pseudo-random with DUPLICATE sort values (the
  * unique-key tie-break carries the total order) and negative values
  * (the SPRT walk's signed steps).
  */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def data(n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    // duplicate-heavy sort key (x in 0..9), signed values
    (0 until n).map(i => (i.toLong, rnd.nextInt(10).toLong,
      (rnd.nextInt(2001) - 1000).toLong))
      .toDF("id", "x", "v")
  }

  test("PrefixSum.cumsum ≡ partition-less window (inclusive + exclusive + row number), any partition count") {
    for (n <- Seq(0, 1, 7, 500); parts <- Seq(1, 3, 32)) {
      val df = data(n, seed = 42L + n)
      val ord = Seq(col("x"), col("id"))
      val w = Window.orderBy("x", "id")
      val expected = df.select(col("id"),
          sum("v").over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)).as("inc"),
          coalesce(sum("v").over(w.rowsBetween(Window.unboundedPreceding,
            -1)), lit(0L)).as("exc"),
          row_number().over(w).cast("long").as("rn"))
        .orderBy("id").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val inc = PrefixSum.cumsum(df, ord, "v", inclusive = true,
        sumName = "inc", rnName = Some("rn"), numPartitions = parts)
      val exc = PrefixSum.cumsum(df, ord, "v", inclusive = false,
        sumName = "exc", numPartitions = parts)
      val got = inc.select("id", "inc", "rn")
        .join(exc.select("id", "exc"), Seq("id"))
        .select(col("id"), col("inc"), col("exc"), col("rn"))
        .orderBy("id").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq === expected.toSeq, s"n=$n parts=$parts")
      spark.catalog.clearCache()
    }
  }

  test("GlobalRank.zipWithNtile ≡ ntile window — N % n ≠ 0, N < n, descending orders") {
    for ((n, tiles) <- Seq((10, 3), (7, 3), (8, 5), (4, 10), (500, 7), (1, 1));
         parts <- Seq(1, 32)) {
      val df = data(n, seed = 7L * n + tiles)
      val w = Window.orderBy(col("v").desc, col("id"))
      val expected = df.select(col("id"),
          ntile(tiles).over(w).cast("long").as("t"))
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val got = GlobalRank.zipWithNtile(df,
          Seq(col("v").desc, col("id")), tiles, parts, "t")
        .select("id", "t")
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq === expected.toSeq, s"n=$n tiles=$tiles parts=$parts")
      spark.catalog.clearCache()
    }
  }

  test("PrefixSum requires a LongType value column") {
    val df = Seq((1L, 1.5)).toDF("id", "v")
    val e = intercept[IllegalArgumentException](
      PrefixSum.cumsum(df, Seq(col("id")), "v", inclusive = true, "s"))
    assert(e.getMessage.contains("LongType"))
  }
}
