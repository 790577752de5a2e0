package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot upsert/delete merge — `MERGE INTO` semantics (the CDC-apply /
  * incremental-refresh step of a continuously curated corpus) as plain
  * relational algebra, no table format required.
  *
  * `changes` carries an `op` column: `"U"` upserts the row (insert or
  * replace by key), `"D"` deletes the key. The new snapshot is
  *
  *   (base ANTI-JOIN changed-keys)  UNION ALL  (changes WHERE op = 'U')
  *
  * — untouched base rows survive, every changed key takes exactly its new
  * version, deleted keys vanish. The changes relation must hold at most one
  * row per key (the caller dedups to last-wins first; [[latestPerKey]] does
  * it by a version column) — enforced here is only the algebra.
  *
  * Scale shape: one exchange of each side on the key — and Spark broadcasts
  * the anti join's right side when the change batch is small (the common
  * CDC case: daily delta ≪ snapshot), which keeps the base table's scan
  * shuffle-free; the union is free. This is exactly the plan Delta/Iceberg
  * MERGE compiles to in the rewrite-all case, minus the file-level skipping
  * a format's transaction log adds.
  */
object Upsert {

  /** Last-wins dedup of a change stream: keep each key's highest-`version`
    * row (ties to the physically-later op marker 'U' < 'D' being irrelevant
    * because versions are unique per key in a sane CDC feed — the order
    * still ends in `op` so the pick is total either way).
    */
  def latestPerKey(changes: DataFrame, key: Seq[String],
                   version: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(version).desc, col("op").desc)
    changes.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
  }

  /** Apply one deduped change batch to a snapshot. `changes` = base schema
    * + an `op` column ("U"/"D"); at most one row per key.
    */
  def apply(base: DataFrame, changes: DataFrame, key: Seq[String]): DataFrame = {
    val survivors = base.join(changes.select(key.map(col): _*), key, "left_anti")
    survivors.unionByName(changes.where(col("op") === "U").drop("op"))
  }
}
