package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (100 TB design note).
  *
  * When one join key dominates (a hot user, a boilerplate shingle bucket), a
  * plain hash join sends the whole hot key to one task. Salting splits each
  * left-side row into one of `salts` sub-keys and replicates the right side
  * across all sub-keys: the hot key fans out over `salts` tasks at the cost
  * of a `salts`× blowup of the (small) right side.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) covers sort-merge joins automatically; this helper is the
  * explicit fallback for broadcast-ineligible dimension joins and for
  * deterministic testing of the pattern.
  */
object SkewJoin {

  /** Inner equi-join `left.key = right.key` with `salts`-way salting.
    * The salt on the left is derived from a hash of salt-source columns so
    * results are deterministic and partition-independent.
    */
  def saltedInnerJoin(
      left: DataFrame, right: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }
}
