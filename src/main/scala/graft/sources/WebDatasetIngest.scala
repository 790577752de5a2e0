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

  /** One POSIX ustar header block: NUL-padded name, octal size/mode/mtime,
    * the spaces-then-octal checksum dance, magic "ustar\0" + version "00".
    * mtime is pinned to 0 so a rewrite of identical content is bit-identical.
    */
  def ustarHeader(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("US-ASCII").length <= 100, s"tar name too long: $name")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)
    put(100, "0000644\u0000")
    put(108, "0000000\u0000")
    put(116, "0000000\u0000")
    put(124, f"$size%011o\u0000")
    put(136, "00000000000\u0000")
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum field as spaces
    h(156) = '0'
    put(257, "ustar\u0000")
    put(263, "00")
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    put(148, f"$sum%06o\u0000 ")
    h
  }

  /** Distributed WebDataset SINK: every partition writes its own tar shard
    * (`part-NNNNN.tar`) — task parallelism = shard parallelism, no driver
    * funnel, the exact posture of [[TfRecordIngest.writeExamples]]. Each
    * sample row lands as two ADJACENT members (`key.ppm` + `key.txt`), which
    * is the convention's sequential-read contract. Payload binaries are
    * written verbatim, so scan → write → scan round-trips image bytes
    * bit-exactly (proven through the decoding contract in q173). Input
    * schema: (key string, image binary, txt string).
    */
  def writeSamples(df: DataFrame, dir: String): Unit = {
    import df.sparkSession.implicits._
    import org.apache.hadoop.fs.Path
    val path = new Path(dir)
    val fs0 = path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs0.delete(path, true)
    fs0.mkdirs(path)
    val conf = new SerializableHadoopConf(df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col("key"), col("image"), col("txt"))
      .as[(String, Array[Byte], String)]
      .rdd.mapPartitionsWithIndex { case (part, rows) =>
        val fs = new Path(dir).getFileSystem(conf.value)
        val out = fs.create(new Path(dir, f"part-$part%05d.tar"), true)
        def member(name: String, bytes: Array[Byte]): Unit = {
          out.write(ustarHeader(name, bytes.length.toLong))
          out.write(bytes)
          val pad = (512 - bytes.length % 512) % 512
          if (pad > 0) out.write(new Array[Byte](pad))
        }
        var n = 0L
        rows.foreach { case (key, image, txt) =>
          member(s"$key.ppm", image)
          member(s"$key.txt", txt.getBytes("UTF-8"))
          n += 1
        }
        out.write(new Array[Byte](1024)) // end-of-archive: two zero blocks
        out.close()
        Iterator.single(n)
      }.sum(): Unit
  }

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
