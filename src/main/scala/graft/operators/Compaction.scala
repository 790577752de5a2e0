package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every long-running
  * ingest needs (Delta/Iceberg `OPTIMIZE`, expressed as plain Spark).
  *
  * Streaming and micro-batch sinks write one file per task per trigger;
  * after a week a 100 TB table is millions of KB-sized files, and every
  * scan pays per-file open/footer/scheduling cost that dwarfs the I/O
  * (NameNode/object-store metadata pressure included). Compaction rewrites
  * a directory into few, large, sorted files:
  *
  *   - output file count is derived from the INPUT'S ACTUAL BYTES over a
  *     target file size — not a guessed repartition constant that rots as
  *     the table grows;
  *   - rows are range-clustered on a caller-chosen key, so each output
  *     file carries a tight min/max envelope and post-compaction scans
  *     prune files from parquet stats alone (the [[ZOrder]] layout idea,
  *     one-dimensional here);
  *   - the rewrite is REPLAYABLE: same input, same order key (ending in a
  *     unique column), same target → same files, so a failed compaction
  *     job can simply rerun.
  *
  * Scale shape: one `repartitionByRange` exchange (range bounds from
  * Spark's reservoir sample over the sort key) + an in-partition sort —
  * the minimum any layout-changing rewrite pays. No driver materialization
  * of data; only file metadata (sizes) is listed on the driver.
  */
object Compaction {

  /** Parquet files under `dir` (recursive), via the session's Hadoop FS —
    * works for any scheme Spark can read, not just `file://`.
    */
  def listDataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        buf += ((f.getPath.toString, f.getLen))
    }
    buf.toSeq
  }

  /** Rewrite `inDir` into `outDir` with ⌈input bytes / targetBytes⌉ files,
    * range-clustered and sorted by `order` (END IN A UNIQUE KEY for a
    * replayable layout). Returns the output file count.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              order: Seq[Column], targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val inputBytes = listDataFiles(spark, inDir).map(_._2).sum
    val files = math.max(1, math.ceil(inputBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartitionByRange(files, order: _*)
      .sortWithinPartitions(order: _*)
      .write.mode("overwrite").parquet(outDir)
    files
  }
}
