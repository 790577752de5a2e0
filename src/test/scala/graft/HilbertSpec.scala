package graft

import graft.operators.{Hilbert, ZOrder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HilbertSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Scalar reference walk — the same public xy2d algorithm, imperatively. */
  private def ref(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var (x, y, d) = (x0 % n, y0 % n, 0L)
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = (x >> i) & 1L
      val ry = (y >> i) & 1L
      d += s * s * (if (rx == 1) 3 - ry else ry)
      if (ry == 0) {
        val (nx, ny) =
          if (rx == 1) (n - 1 - y, n - 1 - x) else (y, x)
        x = nx; y = ny
      }
      i -= 1
    }
    d
  }

  test("hilbert index is a bijection on the 16x16 grid and the curve is " +
    "continuous: consecutive indexes are always grid neighbors") {
    val bits = 4
    val cells = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val got = Hilbert.withKey(cells.toDF("a", "b"), col("a"), col("b"), "h", bits)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.values.toSet === (0L until 256L).toSet, "bijection onto [0,256)")
    // THE property Z-order lacks: walk the curve in index order — every step
    // moves exactly one cell in exactly one dimension
    val byD = got.toSeq.map { case ((x, y), d) => d -> (x, y) }.sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve jump between ($x1,$y1) and ($x2,$y2)")
    }
    // Morton on the same grid takes long jumps — quantify the contrast
    val zByD = cells.map { case (x, y) =>
      (0 until bits).map { i =>
        (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))
      }.sum -> (x, y)
    }.sortBy(_._1).map(_._2)
    val zJumps = zByD.sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(zJumps > 0, "Morton is expected to be discontinuous on this grid")
  }

  test("column walk matches the scalar reference at bits=8 on scattered keys") {
    val rows = (0L until 4096L).map(i => (i * 7919 % 100000, i * 104729 % 100000))
    val got = Hilbert.withKey(rows.toDF("a", "b"), col("a"), col("b"), "h")
      .collect().map(_.getLong(2)).toSeq
    assert(got === rows.map { case (a, b) => ref(a % 256, b % 256, 8) })
  }

  test("hilbert layout: disjoint per-file ranges; the origin box maps to ONE " +
    "contiguous index range, so the box touches the minimum file set") {
    val out = "/tmp/graft_hilbert_spec"
    val df = spark.range(20000).select(
      (col("id") * 7919 % 256).as("a"), (col("id") * 104729 % 256).as("b"))
    Hilbert.writeClustered(df, col("a"), col("b"), out, files = 8)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size == 8)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("hval"), max("hval")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping file h-ranges: $ranges")
    }
    // the recursive fill makes the 16×16 origin box EXACTLY the curve prefix
    // d < 256 (Z-order only bounds it) — one contiguous range, maximal skip
    val matches = spark.read.parquet(out).where(col("a") < 16 && col("b") < 16)
    assert(matches.agg(max("hval")).head().getLong(0) < 256)
    assert(matches.count() > 0)
    val needed = ranges.count { case (lo, _) => lo < 256 }
    assert(needed <= 2, s"box should touch ≤2 of 8 files, needed=$needed")
  }
}
