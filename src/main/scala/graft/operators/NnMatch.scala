package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 1-D nearest-neighbor matching without the quadratic join.
  *
  * For every treated row, find the control row with the nearest covariate
  * value. The naive plan is a treated×control theta-join; in one dimension
  * the nearest control is always the closest control to the LEFT or RIGHT
  * in covariate order. A single `Window.orderBy` would compute that — in
  * ONE partition (Spark moves everything to one task; the first probe
  * measured exactly that) — so this runs the distributed form instead:
  *
  *   1. range-repartition + sort by (x, treated, key) — the one shuffle;
  *   2. per-PARTITION running-edge windows (parallel) for the nearest
  *      control to the left/right within the partition;
  *   3. boundary repair: a P-row census (each partition's first/last
  *      control as an atomic struct) carries the nearest control ACROSS
  *      partition edges — the only sequential window runs over P rows.
  *
  * Ties at equal distance resolve to the left (smaller-covariate) control;
  * among equal-covariate controls the (x, key)-order last/first one carries
  * the payload — stated deterministically by the total order, and
  * independent of where the sampled range boundaries land.
  *
  * Used by q330 (causal ATT matching); NnMatchSpec-style case in
  * Round9Spec pins the distance against the brute-force quadratic minimum.
  */
object NnMatch {

  /** Input columns: x (Long covariate), treated (0/1 Long), key (unique
    * Long, the tie-break), payload (a column to carry from the matched
    * control). Output: one row per TREATED input row — (key, x, payload,
    * dist, matched_payload), where dist = |x − nearest control x| and
    * dist/matched_payload are NULL when no control exists at all.
    */
  def nearest1d(df: DataFrame, x: String, treated: String, key: String,
                payload: String, partitions: Int = 32): DataFrame = {
    val ord = Seq(col(x), col(treated), col(key))
    val sorted = df.select(col(key), col(x), col(treated), col(payload))
      .repartitionByRange(partitions, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("pid", spark_partition_id())
    // a control row as one atomic (x, key, payload) struct — x leads, key
    // second, so struct MIN/MAX order the controls exactly like `ord` does
    // (treated is constant 0 among controls)
    val ctrl = when(col(treated) === 0,
      struct(col(x).as("cx"), col(key).as("ck"),
        col(payload).as("cp")))
    // Both edges as GROWING frames (unboundedPreceding → -1): Spark
    // evaluates growing frames incrementally (O(n) per partition), while a
    // shrinking frame (1 → unboundedFollowing) re-aggregates the remaining
    // rows for EVERY row — O(n²) per partition, measured super-linear by
    // ScaleProbe `nn_match` before this rewrite. "Nearest control to the
    // RIGHT" is therefore expressed as last-non-null over the REVERSED
    // order: same row, linear frame.
    val ordDesc = ord.map(_.desc)
    val wp = Window.partitionBy("pid").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wn = Window.partitionBy("pid").orderBy(ordDesc: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val s = sorted.select(col(key), col(x), col(treated), col(payload),
      col("pid"),
      last(ctrl, ignoreNulls = true).over(wp).as("pv"),
      last(ctrl, ignoreNulls = true).over(wn).as("nv"))
    // P-row boundary census: each partition's extreme controls, then the
    // nearest control BEFORE/AFTER every partition via running-edge windows
    // over the census (the only global-ordered pass — P rows, not data)
    val census = sorted.groupBy("pid")
      .agg(max(ctrl).as("lastc"), min(ctrl).as("firstc"))
    val cwp = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cwn = Window.orderBy(col("pid").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = census.select(col("pid"),
      last(col("lastc"), ignoreNulls = true).over(cwp).as("prevc"),
      last(col("firstc"), ignoreNulls = true).over(cwn).as("nextc"))
    val j = s.join(broadcast(carry), "pid")
      .select(col(key), col(x), col(treated), col(payload),
        coalesce(col("pv"), col("prevc")).as("pv"),
        coalesce(col("nv"), col("nextc")).as("nv"))
    j.where(col(treated) === 1).select(col(key), col(x), col(payload),
      when(col("pv").isNull && col("nv").isNull, lit(null))
        .when(col("nv").isNull, col(x) - col("pv.cx"))
        .when(col("pv").isNull, col("nv.cx") - col(x))
        .when(col(x) - col("pv.cx") <= col("nv.cx") - col(x),
          col(x) - col("pv.cx"))
        .otherwise(col("nv.cx") - col(x)).as("dist"),
      when(col("pv").isNull && col("nv").isNull, lit(null))
        .when(col("nv").isNull, col("pv.cp"))
        .when(col("pv").isNull, col("nv.cp"))
        .when(col(x) - col("pv.cx") <= col("nv.cx") - col(x), col("pv.cp"))
        .otherwise(col("nv.cp")).as("matched_payload"))
  }
}
