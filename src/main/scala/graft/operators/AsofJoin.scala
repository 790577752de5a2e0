package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the greatest right-side
  * time that is ≤ the left row's time, within the same key partition — the
  * "latest quote for each trade" / "latest view before each purchase" join.
  *
  * Spark-first formulation: NO join operator at all. Both sides are unioned,
  * tagged, and swept with a running `max` over a (key, time)-ordered window.
  * Cost = one shuffle on the key + one linear pass per partition, regardless
  * of how many right rows precede each left row. The naive alternatives
  * either explode (non-equi range join → per-row probe of the whole right
  * partition) or need the right side broadcast-small. This union form is the
  * one that survives 100 TB: it is exactly as scalable as any groupBy on the
  * same key.
  *
  * Ties: a right row at the identical timestamp as a left row IS matched
  * (at-or-before semantics) — the right side sorts before the left at equal
  * times via the tag column.
  *
  * Determinism: the attached value is order-insensitive under ties — every
  * left row at time t sees ALL right rows at times ≤ t (the running max over
  * any tie order of equal-time rows is identical) — so no tie-break column
  * is needed for a deterministic result.
  */
object AsofJoin {

  /** @param left      rows to enrich (kept in full)
    * @param right     rows supplying the as-of time
    * @param keys      equi-partition columns present in both sides
    * @param leftTime  monotone-comparable time column on `left`
    * @param rightTime time column on `right`
    * @param asofCol   name of the added column (last right time ≤ leftTime;
    *                  null when no right row precedes)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: Column,
      rightTime: Column,
      asofCol: String): DataFrame = {
    val keyCols = keys.map(col)
    // Right rows carry only (keys, time); left rows carry their full payload
    // as a struct so the union schema stays fixed and narrow.
    val l = left.select(
      keyCols :+ leftTime.as("__t") :+ lit(1).as("__side")
        :+ struct(left.columns.map(col).toIndexedSeq: _*).as("__row"): _*)
    // SQL join semantics: null keys never match — drop null-keyed right rows
    // (Window.partitionBy would otherwise group them with null-keyed LEFT
    // rows and hand those an as-of value); null-keyed left rows are kept and
    // get a null asofCol, like an unmatched left-join row.
    val r = right
      .where(keys.map(k => col(k).isNotNull).reduce(_ && _))
      .select(
        keyCols :+ rightTime.as("__t") :+ lit(0).as("__side")
          :+ lit(null).cast(l.schema("__row").dataType).as("__row"): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(asofCol, max(when(col("__side") === 0, col("__t"))).over(w))
      .where(col("__side") === 1)
      .select(col("__row.*"), col(asofCol))
  }
}
