package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Arrow IPC *stream* ingest — the wire format of the in-memory columnar
  * standard (public: apache/arrow), read with the Arrow Java libraries that
  * already ship on Spark's own classpath (Spark uses them for its columnar
  * interchange; no new dependency).
  *
  * Spark-first shape, same as the other container lanes (NPZ, TFRecord,
  * WebDataset): `binaryFile` distributes whole `.arrows` files — an IPC
  * stream has no random-access footer, so the FILE is the parallel unit —
  * and each task walks its stream's record batches with `ArrowStreamReader`,
  * emitting one row per Arrow row. Decode is flatMap-local: no shuffle until
  * whatever aggregation the caller adds. Allocator lifecycle is per-file and
  * closed eagerly; a leaked buffer fails the task rather than poisoning the
  * executor.
  *
  * Reference analog: the binary tensor ingest
  * (create_train_valid_test_datasets.py:116) — a packed columnar archive
  * scanned into the unified relation.
  */
object ArrowIngest {

  /** Decode one IPC stream into (batch_idx, id, val, tag) rows. `val` is
    * nullable — validity bitmaps must round-trip, so absent slots surface as
    * null, not 0.0.
    */
  def decodeStream(bytes: Array[Byte]): Seq[(Int, Long, Option[Double], String)] = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector}
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    val out = Seq.newBuilder[(Int, Long, Option[Double], String)]
    val alloc = new RootAllocator()
    try {
      val reader = new ArrowStreamReader(
        new java.io.ByteArrayInputStream(bytes), alloc)
      try {
        val root = reader.getVectorSchemaRoot
        var batch = 0
        while (reader.loadNextBatch()) {
          val ids = root.getVector("id").asInstanceOf[BigIntVector]
          val vals = root.getVector("val").asInstanceOf[Float8Vector]
          val tags = root.getVector("tag").asInstanceOf[VarCharVector]
          var i = 0
          while (i < root.getRowCount) {
            out += ((batch, ids.get(i),
              if (vals.isNull(i)) None else Some(vals.get(i)),
              new String(tags.get(i), "UTF-8")))
            i += 1
          }
          batch += 1
        }
      } finally reader.close()
    } finally alloc.close()
    out.result()
  }

  /** Scan a directory of Arrow IPC stream files into
    * (shard, batch_idx, id, val, tag) rows.
    */
  def scanStreams(spark: SparkSession, dir: String, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
      .select(input_file_name().as("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val shard = path.split("/").last
        decodeStream(content).map { case (b, id, v, tag) =>
          (shard, b, id, v, tag)
        }
      }
      .toDF("shard", "batch_idx", "id", "val", "tag")
  }
}
