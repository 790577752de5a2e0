package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star brief): media as opaque `binary`
  * columns with typed metadata, and batched decode/feature-extract over
  * `mapPartitions`.
  *
  * The real decode (image/audio codecs) is STUBBED — those libraries are not
  * in this container — behind [[MediaDecoder]]; `FakeByteDecoder` is a
  * deterministic stand-in. Everything Spark-side is real and tested: the
  * binary+metadata schema, the batched partition iteration (batch shape =
  * `batchSize` rows, mirroring an inference server's request batching), and
  * the output feature schema. Swapping in a real codec changes only the
  * decoder body.
  *
  * At 100 TB: binary payloads stay columnar in parquet, metadata predicates
  * (format/size) push down without touching bytes, and decode parallelism is
  * the scan parallelism — no shuffle anywhere.
  */
object Multimodal {

  /** Decoder contract: one batch of (id, payload) → one feature row each. */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Array[(Long, Array[Byte])]): Array[MediaFeatures]
  }

  final case class MediaFeatures(id: Long, nBytes: Int, firstByte: Int, byteSum16: Long)

  /** Deterministic fake decode: length, first byte, sum of the first 16 bytes.
    * A real implementation would decode pixels/samples here (`???` in prod).
    */
  object FakeByteDecoder extends MediaDecoder {
    override def decodeBatch(batch: Array[(Long, Array[Byte])]): Array[MediaFeatures] =
      batch.map { case (id, bytes) =>
        val head = bytes.take(16)
        MediaFeatures(id, bytes.length,
          if (bytes.isEmpty) -1 else bytes(0) & 0xff,
          head.foldLeft(0L)((acc, b) => acc + (b & 0xff)))
      }
  }

  /** Wrap a text table as a media table: (id, media binary, meta struct). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("media"),
      struct(
        lit("text/plain").as("format"),
        length(col("text").cast("binary")).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  val featureSchema: StructType = new StructType()
    .add("media_id", LongType).add("n_bytes", IntegerType)
    .add("first_byte", IntegerType).add("byte_sum16", LongType)

  /** "Resize": deterministic stand-in for an image resize — keeps every
    * `factor`-th byte (a real codec would decode → scale → re-encode; `???`
    * in prod). Pure projection: binary in, smaller binary + updated meta out,
    * no shuffle, parallelism = scan parallelism.
    */
  def resizeStub(media: DataFrame, factor: Int): DataFrame = {
    require(factor > 1)
    val resize = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else bytes.grouped(factor).map(_.head).toArray
    }
    media.withColumn("media", resize(col("media")))
      .withColumn("meta", struct(
        col("meta.format"),
        length(col("media")).as("n_bytes"),
        col("meta.origin")))
  }

  /** "Frame sampling": treat the payload as fixed-size frames and keep every
    * `stride`-th frame — the video-keyframe-extraction shape. Emits one row
    * per kept frame (Generator-style fan-out), frame index preserved.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    val frames = udf { (bytes: Array[Byte]) =>
      if (bytes == null) Seq.empty[(Int, Array[Byte])]
      else bytes.grouped(frameBytes).zipWithIndex
        .collect { case (frame, i) if i % stride == 0 => (i, frame) }.toSeq
    }
    media.select(col("media_id"), explode(frames(col("media"))).as("f"))
      .select(col("media_id"), col("f._1").as("frame_idx"), col("f._2").as("frame"))
  }

  /** Batched decode over partitions: the mapInPandas-shaped plumbing, Scala
    * edition — fixed batch size, zero shuffle, pluggable decoder.
    */
  def decodeFeatures(media: DataFrame, decoder: MediaDecoder,
                     batchSize: Int = 32): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("media")).rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { group =>
          // null payloads decode as empty media rather than NPE-ing the task
          val batch = group.map(r => (r.getLong(0),
            Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte]))).toArray
          decoder.decodeBatch(batch).iterator
            .map(f => Row(f.id, f.nBytes, f.firstByte, f.byteSum16))
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
