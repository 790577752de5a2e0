package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog management for bucketed tables — the 100 TB fact⋈fact strategy
  * (SURVEY §2.12 extension; HANDOFF round-1 list).
  *
  * Bucketing trades one up-front shuffle at write time for zero exchanges on
  * every later join/aggregate on the bucket key, and an equality predicate on
  * the key scans only the matching bucket's files (bucket pruning —
  * `SelectedBucketsCount: 1 out of N` in the scan). Registration is
  * idempotent per table name: create once per session, reuse across queries —
  * the same existence-check contract as the reference's `download_dataset`
  * and [[graft.sources.NpzIngest.npzToParquet]].
  */
object BucketCatalog {

  /** Register `df` as a bucketed (and optionally sorted) catalog table if it
    * doesn't already exist. `df` is by-name so an existing table costs no
    * plan construction.
    */
  def ensure(spark: SparkSession, name: String, df: => DataFrame, key: String,
             buckets: Int = 8, sorted: Boolean = true): Unit =
    if (!spark.catalog.tableExists(name)) {
      val w = df.write.mode("overwrite")
        .option("path", s"/tmp/graft_buckets/$name")
        .bucketBy(buckets, key)
      (if (sorted) w.sortBy(key) else w).saveAsTable(name)
    }
}
