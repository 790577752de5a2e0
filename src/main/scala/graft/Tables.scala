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
  /** `events.ts` has shipped as two different physical types across fixture
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects outright — read nanos as long via the legacy flag and truncate
    * to microseconds) and parquet TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (which Spark infers as TIMESTAMP_NTZ by default). Normalize BOTH to a
    * plain session-UTC `TimestampType` at microsecond precision, so
    * `unix_micros(ts)` equals DuckDB's `epoch_us(ts)` row for row on either
    * generation and every downstream query is schema-generation-agnostic.
    *
    * Domain assumption, relied on by every epoch-bucketing query (q27, q69,
    * q78, q83, q94): timestamps are AT-OR-AFTER the epoch, so Spark's `div`
    * (truncate toward zero) and DuckDB's `//` (floor) agree. Pre-1970 event
    * times would bucket differently by one unit and need an explicit
    * floor-div formulation on the Spark side.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, NOT floor(x/1000): epoch-nanos (~1.7e18) exceed
        // double's exact-integer range, so the double path is off ±1 µs
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // session tz is UTC (GraftSession), so this cast is a micros identity
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = read(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = read(spark, d, "embeddings")
}
