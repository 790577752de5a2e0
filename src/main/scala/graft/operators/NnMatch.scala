package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 1-D nearest-neighbor matching without the quadratic join.
  *
  * For every treated row, find the control row with the nearest covariate
  * value. The naive plan is a treated×control theta-join; in one dimension
  * the nearest control is always the closest control to the LEFT or RIGHT
  * in covariate order, so ONE global sort (range-partitioned at scale) and
  * two IGNORE-NULLS running-edge windows replace it. Ties at equal
  * distance resolve to the left (smaller-covariate) control; among equal-
  * covariate controls the sort order's last one carries the payload —
  * both stated deterministically by the (x, treated, key) total order.
  *
  * Used by q330 (causal ATT matching); NnMatchSpec pins the distance
  * against the brute-force quadratic minimum on the fixture.
  */
object NnMatch {

  /** Input columns: x (Long covariate), treated (0/1 Long), key (unique
    * Long, the tie-break), payload (a column to carry from the matched
    * control). Output: one row per TREATED input row — (key, x, payload,
    * dist, matched_payload), where dist = |x − nearest control x| and
    * dist/matched_payload are NULL when no control exists at all.
    */
  def nearest1d(df: DataFrame, x: String, treated: String, key: String,
                payload: String): DataFrame = {
    val ord = Seq(col(x), col(treated), col(key))
    val wp = Window.orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wn = Window.orderBy(ord: _*)
      .rowsBetween(1, Window.unboundedFollowing)
    val ctrlX = when(col(treated) === 0, col(x))
    val ctrlP = when(col(treated) === 0, col(payload))
    val s = df.select(col(key), col(x), col(treated), col(payload),
      last(ctrlX, ignoreNulls = true).over(wp).as("px"),
      last(ctrlP, ignoreNulls = true).over(wp).as("pp"),
      first(ctrlX, ignoreNulls = true).over(wn).as("nx"),
      first(ctrlP, ignoreNulls = true).over(wn).as("np"))
    s.where(col(treated) === 1).select(col(key), col(x), col(payload),
      when(col("px").isNull && col("nx").isNull, lit(null))
        .when(col("nx").isNull, col(x) - col("px"))
        .when(col("px").isNull, col("nx") - col(x))
        .when(col(x) - col("px") <= col("nx") - col(x), col(x) - col("px"))
        .otherwise(col("nx") - col(x)).as("dist"),
      when(col("px").isNull && col("nx").isNull, lit(null))
        .when(col("nx").isNull, col("pp"))
        .when(col("px").isNull, col("np"))
        .when(col(x) - col("px") <= col("nx") - col(x), col("pp"))
        .otherwise(col("np")).as("matched_payload"))
  }
}
