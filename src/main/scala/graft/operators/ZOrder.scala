package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve clustering for multi-dimensional data layout.
  *
  * A single sort key cannot cluster two independent filter dimensions at
  * once; interleaving their bits can. Writing files range-partitioned and
  * sorted by the interleaved key gives every file a tight min/max envelope in
  * BOTH dimensions, so a conjunctive 2-d box predicate prunes most files from
  * their parquet column statistics alone — the layout trick behind
  * Delta/Iceberg OPTIMIZE ZORDER, expressed here as plain Spark:
  * `repartitionByRange(n, z).sortWithinPartitions(z)`.
  *
  * The key is a pure bit-arithmetic expression tree (shifts/masks, codegen,
  * no UDF), and the identical arithmetic is emitted as SQL for the DuckDB
  * oracle. Keys are first reduced mod 2^bits: at 100 TB you would instead
  * range-bucket each dimension into 2^bits quantiles; the interleave step is
  * the same either way.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `a` (even positions) and `b` (odd
    * positions) into a single z-value in [0, 4^bits).
    */
  def zvalue(a: Column, b: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, s"zorder bits must be in [1,31], got $bits")
    val am = a.cast("long") % (1L << bits)
    val bm = b.cast("long") % (1L << bits)
    (0 until bits).map { i =>
      shiftleft(shiftright(am, i).bitwiseAND(1L), 2 * i)
        .plus(shiftleft(shiftright(bm, i).bitwiseAND(1L), 2 * i + 1))
    }.reduceLeft(_ + _)
  }

  /** DuckDB mirror of [[zvalue]] — same shifts, same masks, same sum. */
  def zvalueSql(a: String, b: String, bits: Int = 8): String = {
    val mod = 1L << bits
    val am = s"(CAST($a AS BIGINT) % $mod)"
    val bm = s"(CAST($b AS BIGINT) % $mod)"
    (0 until bits).map { i =>
      s"((($am >> $i) & 1) << ${2 * i}) + ((($bm >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
  }

  /** Write `df` clustered by the z-value of (a, b): range-partitioned into
    * `files` output files, each sorted by z — every file covers a compact
    * z-range, i.e. a compact box in (a, b) space.
    */
  def writeClustered(df: DataFrame, a: Column, b: Column, path: String,
                     files: Int = 8, bits: Int = 8): Unit =
    df.withColumn("zval", zvalue(a, b, bits))
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(path)
}
