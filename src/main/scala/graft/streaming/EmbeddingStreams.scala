package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Pq

/** Continuous PQ encoding of an embedding stream — the index-build half of a
  * streaming retrieval pipeline: embedding batches land as parquet files,
  * each micro-batch is compressed to PQ codes ([[Pq.encode]] — a row-local
  * codegen'd expression, so it streams without any stateful operator), and
  * the codes append to the searchable index under the file sink's
  * exactly-once commit log.
  *
  * Why this shape at 100 TB: the embedding firehose (new documents being
  * embedded continuously) must reach the ANN index without a batch rebuild.
  * Because encode is stateless and the codebook a broadcast constant, the
  * stream needs no watermark, no state store, and no shuffle — ingest
  * parallelism IS file parallelism, and the index grows append-only (codes
  * partition-prunable by coarse cell when composed with IVF, q127's layout).
  * Codebooks retrain offline on a sample; a codebook swap is a new sink
  * directory, never an in-place mutation.
  *
  * Determinism: [[Pq.encode]]'s argmins compare rounded (1e-6) distances
  * with first-index ties, so a vector's code is identical in any micro-batch
  * partitioning — streaming output ≡ batch output row for row (q135 pins
  * this against the oracle; StreamingSpec pins micro-batch ≡ batch parity).
  */
object EmbeddingStreams {

  /** Landing schema = the embeddings table's columns (label dropped — the
    * encoder consumes (vec_id, embedding) only).
    */
  val landingSchema: StructType = new StructType()
    .add("vec_id", LongType)
    .add("embedding", ArrayType(FloatType))

  /** File-stream source over a landing directory of parquet batches. */
  def readLanding(spark: SparkSession, landingDir: String,
                  maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(landingSchema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(landingDir)
  }

  /** Mode-agnostic encode transform — hand it the streaming landing relation
    * or the equivalent batch relation; [[Pq.encode]] is a pure projection so
    * the identical plan runs in both modes.
    */
  def encoded(embeddings: DataFrame, cb: Pq.Codebooks): DataFrame =
    Pq.encode(embeddings, "vec_id", "embedding", cb)

  /** Land → encode → parquet append, exactly-once, drain-all-and-stop
    * (Trigger.AvailableNow — the incremental-batch idiom shared with the
    * NPZ converter and [[DocStreams.runIngest]]): a retried batch never
    * double-writes codes, and a re-run against an unchanged landing
    * directory is a no-op against the same checkpoint.
    */
  def runEncode(spark: SparkSession, landingDir: String, cb: Pq.Codebooks,
                outDir: String, checkpointDir: String,
                maxFilesPerTrigger: Option[Int] = None): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val q = encoded(readLanding(spark, landingDir, maxFilesPerTrigger), cb)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
