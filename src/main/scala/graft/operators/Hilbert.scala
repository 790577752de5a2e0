package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering key — the locality-preserving refinement of
  * [[ZOrder]].
  *
  * Both curves linearize a 2-d grid so one sort key clusters two filter
  * dimensions at once, but the Morton curve takes long diagonal jumps at
  * every power-of-two boundary (cell 0b0111 → 0b1000 crosses half the grid),
  * so a compact z-range can cover a fragmented region in (a, b) space. The
  * Hilbert curve is CONTINUOUS: consecutive indexes are always
  * grid-neighbors (proved per-cell in HilbertSpec), so a contiguous index
  * range is a connected blob — tighter per-file min/max envelopes and fewer
  * files touched per 2-d box predicate at the same file count.
  *
  * The index is the classic iterative quadrant walk (public algorithm, e.g.
  * Hamilton's compact-Hilbert notes / the Wikipedia `xy2d` formulation): at
  * each scale s = 2^i the quadrant (rx, ry) contributes s²·((3·rx) XOR ry)
  * and the remaining coordinates are rotated/flipped into that quadrant's
  * frame. The per-scale state update is expressed ONCE and emitted twice —
  * as a chain of Spark projections (each scale is one `withColumn` step, so
  * Catalyst never inlines the tree into an exponential expression) and as
  * the identical chain of DuckDB CTEs for the oracle.
  *
  * At 100 TB the usage is identical to [[ZOrder.writeClustered]]: reduce (or
  * quantile-bucket) each dimension to 2^bits, compute the key, then
  * `repartitionByRange(files, key).sortWithinPartitions(key)`.
  */
object Hilbert {

  /** Max bits per dimension: d < 4^30 keeps s·s and the sum well inside
    * a signed 64-bit long.
    */
  private val MaxBits = 30

  /** Append `out` = Hilbert index of (a mod 2^bits, b mod 2^bits) to `df`.
    *
    * One projection step per scale: temp columns carry the rotated (x, y)
    * and the accumulated d, so the physical plan is `bits` narrow
    * codegen'd projections, not one exponentially-duplicated tree.
    */
  def withKey(df: DataFrame, a: Column, b: Column, out: String,
              bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= MaxBits,
      s"hilbert bits must be in [1,$MaxBits], got $bits")
    val n = 1L << bits
    val init = df
      .withColumn("_hx", a.cast("long") % n)
      .withColumn("_hy", b.cast("long") % n)
      .withColumn("_hd", lit(0L))
    val walked = (bits - 1 to 0 by -1).foldLeft(init) { (cur, i) =>
      val s = 1L << i
      val rx = shiftright(col("_hx"), i).bitwiseAND(1L)
      val ry = shiftright(col("_hy"), i).bitwiseAND(1L)
      // (3·rx) XOR ry without a xor builtin: rx=1 → 3−ry, rx=0 → ry
      val quad = when(rx === 1L, lit(3L) - ry).otherwise(ry)
      // ry=1: frame unchanged; ry=0 ∧ rx=1: flip both then swap; else swap
      val nx = when(ry === 1L, col("_hx"))
        .when(rx === 1L, lit(n - 1) - col("_hy"))
        .otherwise(col("_hy"))
      val ny = when(ry === 1L, col("_hy"))
        .when(rx === 1L, lit(n - 1) - col("_hx"))
        .otherwise(col("_hx"))
      cur.withColumn("_hd", col("_hd") + lit(s * s) * quad)
        .withColumn("_hx2", nx).withColumn("_hy2", ny)
        .drop("_hx", "_hy")
        .withColumnRenamed("_hx2", "_hx").withColumnRenamed("_hy2", "_hy")
    }
    walked.withColumnRenamed("_hd", out).drop("_hx", "_hy")
  }

  /** DuckDB mirror of [[withKey]]: the same walk as a CTE chain. Returns the
    * full `WITH`-prefixed query; `from` supplies the source relation (tables
    * + WHERE), `carry` the pass-through columns, (`a`, `b`) the dimension
    * expressions, and the final SELECT exposes carry + `out`.
    */
  def keySql(from: String, carry: Seq[String], a: String, b: String,
             out: String, bits: Int = 8, orderBy: String = ""): String = {
    require(bits >= 1 && bits <= MaxBits,
      s"hilbert bits must be in [1,$MaxBits], got $bits")
    val n = 1L << bits
    val cols = carry.mkString(", ")
    val init = s"h_init AS (SELECT $cols, CAST($a AS BIGINT) % $n AS hx, " +
      s"CAST($b AS BIGINT) % $n AS hy, CAST(0 AS BIGINT) AS hd FROM $from)"
    val steps = (bits - 1 to 0 by -1).zipWithIndex.map { case (i, step) =>
      val s = 1L << i
      val prev = if (step == 0) "h_init" else s"h_${step - 1}"
      val rx = s"((hx >> $i) & 1)"
      val ry = s"((hy >> $i) & 1)"
      val quad = s"(CASE WHEN $rx = 1 THEN 3 - $ry ELSE $ry END)"
      val nx = s"(CASE WHEN $ry = 1 THEN hx WHEN $rx = 1 THEN ${n - 1} - hy ELSE hy END)"
      val ny = s"(CASE WHEN $ry = 1 THEN hy WHEN $rx = 1 THEN ${n - 1} - hx ELSE hx END)"
      s"h_$step AS (SELECT $cols, $nx AS hx, $ny AS hy, " +
        s"hd + ${s * s} * $quad AS hd FROM $prev)"
    }
    val order = if (orderBy.isEmpty) "" else s" ORDER BY $orderBy"
    (Seq(init) ++ steps).mkString("WITH ", ", ", "") +
      s" SELECT $cols, hd AS $out FROM h_${bits - 1}$order"
  }

  /** Write `df` clustered by the Hilbert index of (a, b) — same layout move
    * as [[ZOrder.writeClustered]], tighter envelopes per file.
    */
  def writeClustered(df: DataFrame, a: Column, b: Column, path: String,
                     files: Int = 8, bits: Int = 8): Unit =
    withKey(df, a, b, "hval", bits)
      .repartitionByRange(files, col("hval"))
      .sortWithinPartitions("hval")
      .write.mode("overwrite").parquet(path)
}
