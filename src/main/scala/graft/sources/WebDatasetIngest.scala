package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset tar-shard ingest — the sharded container convention for
  * multimodal training data (public: webdataset/webdataset): a sample is
  * the group of ADJACENT tar members sharing a basename, one member per
  * modality extension (`000017.ppm` + `000017.txt` → sample "000017" with
  * an image and a caption). Shards are plain POSIX ustar archives, so the
  * reader is a 512-byte header walk: name (100 bytes, NUL-padded), size
  * (octal at offset 124), typeflag (156), data rounded up to 512.
  *
  * Spark-first shape: `binaryFile` distributes whole shards (tar has no
  * internal index — the FILE is the parallel unit, which is exactly why
  * the convention shards corpora into many tars), member walking + sample
  * grouping run inside a `flatMap`, and downstream decode composes with
  * the [[graft.operators.MediaCodecs]] surface — the payload columns are
  * the same opaque binary the rest of the multimodal pipeline consumes.
  */
object WebDatasetIngest {

  /** (name, bytes) for every regular-file member, in archive order. */
  def tarMembers(shard: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    while (off + 512 <= shard.length && shard(off) != 0) {
      val name = {
        var end = off
        while (end < off + 100 && shard(end) != 0) end += 1
        new String(shard, off, end - off, "US-ASCII")
      }
      val sizeStr = new String(shard, off + 124, 12, "US-ASCII")
        .takeWhile(c => c >= '0' && c <= '7')
      require(sizeStr.nonEmpty, s"tar member $name: unparseable size field")
      val size = java.lang.Long.parseLong(sizeStr, 8)
      require(size >= 0 && off + 512 + size <= shard.length,
        s"tar member $name: size $size exceeds shard")
      val typeflag = shard(off + 156)
      if (typeflag == '0' || typeflag == 0)
        out += ((name,
          java.util.Arrays.copyOfRange(shard, off + 512, off + 512 + size.toInt)))
      off += 512 + ((size.toInt + 511) / 512) * 512
    }
    out.result()
  }

  /** Group members into samples by basename: (key, ext → bytes). Adjacency
    * is the convention's contract, but grouping by full key is order-safe.
    */
  def samples(members: Seq[(String, Array[Byte])]): Seq[(String, Map[String, Array[Byte]])] =
    members.groupBy { case (name, _) =>
      val i = name.lastIndexOf('.')
      if (i < 0) name else name.substring(0, i)
    }.map { case (key, ms) =>
      key -> ms.map { case (name, b) =>
        name.substring(name.lastIndexOf('.') + 1) -> b
      }.toMap
    }.toSeq

  /** Scan tar shards into (shard, key, image, txt) sample rows — image is
    * the opaque binary the codec surface decodes, txt the UTF-8 caption.
    */
  def scanSamples(spark: SparkSession, dir: String, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
      .select(input_file_name().as("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val shard = path.split("/").last
        samples(tarMembers(content)).map { case (key, mods) =>
          (shard, key, mods.getOrElse("ppm", Array.emptyByteArray),
            mods.get("txt").map(new String(_, "UTF-8")).getOrElse(""))
        }
      }
      .toDF("shard", "key", "image", "txt")
  }
}
