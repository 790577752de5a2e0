package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated fixture tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Keeping all reads behind this
  * object means every query starts from a plain columnar `FileScan parquet`
  * that Catalyst can prune/push into — the analog of the reference's
  * column-at-once `.npz`/`.npy` scans (reference:
  * create_train_valid_test_datasets.py:116-117, train_classification.py:171-177).
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame    = read(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = read(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = read(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = read(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = read(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = read(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = read(spark, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects outright. Read nanos as long (legacy flag) and truncate to
    * microseconds — the same ns→µs truncation DuckDB's `epoch_us` applies, so
    * event-time arithmetic stays exactly comparable across engines.
    *
    * Domain assumption, relied on by every epoch-bucketing query (q27, q69,
    * q78, q83, q94): timestamps are AT-OR-AFTER the epoch, so Spark's `div`
    * (truncate toward zero) and DuckDB's `//` (floor) agree. Pre-1970 event
    * times would bucket differently by one unit and need an explicit
    * floor-div formulation on the Spark side.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integer `div`, NOT floor(x/1000): epoch-nanos (~1.7e18) exceed double's
    // exact-integer range, so the double path is off by ±1 µs on some rows
    read(spark, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, d: String): DataFrame = read(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = read(spark, d, "embeddings")
}
