package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.NpzIngest

/** NPY/NPZ decode contract: header parsing across format versions and dtypes,
  * zip member iteration (STORED + DEFLATED), the distributed reader's row
  * shape, and converter idempotence.
  */
class NpzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Hand-build a v1.0 `.npy` buffer — independent of the numpy that wrote
    * the fixtures, so the parser is checked against the spec, not itself.
    */
  private def npyBytes(descr: String, shape: Seq[Int], put: ByteBuffer => Unit,
                       elemSize: Int): Array[Byte] = {
    val dict = s"{'descr': '$descr', 'fortran_order': False, " +
      s"'shape': (${shape.mkString(", ")}${if (shape.length == 1) "," else ""}), }"
    val padded = dict + " " * ((64 - (10 + dict.length + 1) % 64) % 64) + "\n"
    val n = shape.product
    val out = ByteBuffer.allocate(10 + padded.length + n * elemSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(0x93.toByte).put("NUMPY".getBytes("US-ASCII"))
      .put(1.toByte).put(0.toByte)
      .putShort(padded.length.toShort)
      .put(padded.getBytes("US-ASCII"))
    put(out)
    out.array()
  }

  test("parses v1.0 headers for f4/f8/i4/i8 with correct values and shapes") {
    val f4 = NpzIngest.parseNpy(npyBytes("<f4", Seq(2, 3),
      b => (0 until 6).foreach(i => b.putFloat(i / 16f)), 4))
    assert(f4.shape == Seq(2, 3) && f4.data.toSeq == (0 until 6).map(_ / 16.0))

    val f8 = NpzIngest.parseNpy(npyBytes("<f8", Seq(4),
      b => (0 until 4).foreach(i => b.putDouble(i * 1.5)), 8))
    assert(f8.shape == Seq(4) && f8.data.toSeq == Seq(0.0, 1.5, 3.0, 4.5))

    val i4 = NpzIngest.parseNpy(npyBytes("<i4", Seq(3),
      b => Seq(-7, 0, 41).foreach(b.putInt), 4))
    assert(i4.data.toSeq == Seq(-7.0, 0.0, 41.0))

    val i8 = NpzIngest.parseNpy(npyBytes("<i8", Seq(2),
      b => Seq(1L << 40, -5L).foreach(b.putLong), 8))
    assert(i8.data.toSeq == Seq(math.pow(2, 40), -5.0))
  }

  test("parses v2.0 headers (4-byte little-endian header length)") {
    val dict = "{'descr': '<f8', 'fortran_order': False, 'shape': (3,), }"
    val padded = dict + " " * ((64 - (12 + dict.length + 1) % 64) % 64) + "\n"
    val out = ByteBuffer.allocate(12 + padded.length + 3 * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(0x93.toByte).put("NUMPY".getBytes("US-ASCII"))
      .put(2.toByte).put(0.toByte)
      .putInt(padded.length)
      .put(padded.getBytes("US-ASCII"))
    Seq(1.25, -2.5, 3.0).foreach(out.putDouble)
    val arr = NpzIngest.parseNpy(out.array())
    assert(arr.shape == Seq(3) && arr.data.toSeq == Seq(1.25, -2.5, 3.0))
  }

  test("rejects fortran_order, bad magic, and unknown dtypes") {
    val fortran = npyBytes("<f8", Seq(2), b => (0 until 2).foreach(i => b.putDouble(i)), 8)
    val asStr = new String(fortran, "ISO-8859-1").replace("False", "True ")
    intercept[IllegalArgumentException] {
      NpzIngest.parseNpy(asStr.getBytes("ISO-8859-1"))
    }
    intercept[IllegalArgumentException] { NpzIngest.parseNpy("junkjunkjunk".getBytes) }
    intercept[IllegalArgumentException] {
      NpzIngest.parseNpy(npyBytes("<c16", Seq(1), b => b.putDouble(0).putDouble(0), 16))
    }
  }

  test("corrupted archives fail loudly — no silent partial decode") {
    val intact = Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/npz/demo_matrices.npz"))
    // truncation: the deflate stream ends mid-entry
    val truncated = intact.take(intact.length / 2)
    intercept[Exception] {
      NpzIngest.npzEntries(truncated).foreach { case (_, b) => NpzIngest.parseNpy(b) }
    }
    // bit-flip in the compressed payload: zip CRC must reject it
    val flipped = intact.clone()
    flipped(intact.length / 2) = (flipped(intact.length / 2) ^ 0x55).toByte
    intercept[Exception] {
      NpzIngest.npzEntries(flipped).foreach { case (_, b) => NpzIngest.parseNpy(b) }
    }
  }

  test("npzEntries iterates STORED and DEFLATED members with stripped names") {
    val member = npyBytes("<f8", Seq(2), b => Seq(1.0, 2.0).foreach(b.putDouble), 8)
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("alpha.npy")); zos.write(member); zos.closeEntry()
    zos.putNextEntry(new ZipEntry("beta.npy")); zos.write(member); zos.closeEntry()
    zos.close()
    val got = NpzIngest.npzEntries(bos.toByteArray).toSeq
    assert(got.map(_._1) == Seq("alpha", "beta"))
    assert(got.forall { case (_, b) => NpzIngest.parseNpy(b).data.toSeq == Seq(1.0, 2.0) })
  }

  test("read() emits one row per leading-axis slice from the repo fixtures") {
    val df = NpzIngest.read(spark, "fixtures/npz/*.npz")
    val byArray = df.groupBy("array").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byArray == Map("matrices" -> 24L, "features" -> 24L))
    val dims = df.select("array", "dims").distinct().collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(dims("matrices") == Seq(16, 16, 3) && dims("features") == Seq(12))
  }

  test("writeNpz → reader roundtrip across dtypes; cross-checked vs numpy fixture") {
    val dir = Files.createTempDirectory("npz_write").toString
    val vals = Array(0.0, 1.5, -2.25, 127.0, -0.5, 3.75)
    NpzIngest.writeNpz(spark, s"$dir/own.npz", Seq(
      ("a", "<f4", Seq(2, 3), vals),
      ("b", "<f8", Seq(6), vals),
      ("c", "<i8", Seq(3, 2), Array(1.0, -2, 3, -4, 5, -6))))
    val got = NpzIngest.npzEntries(
      Files.readAllBytes(java.nio.file.Paths.get(dir, "own.npz")))
      .map { case (n, b) => n -> NpzIngest.parseNpy(b) }.toMap
    assert(got("a").shape == Seq(2, 3) && got("a").data.toSeq == vals.toSeq)
    assert(got("b").shape == Seq(6) && got("b").data.toSeq == vals.toSeq)
    assert(got("c").data.toSeq == Seq(1.0, -2, 3, -4, 5, -6))
    // cross-engine anchor: our writer must produce the same decoded relation
    // as numpy's own savez for identical contents (fixture features archive)
    val K = 2654435761L
    val featureVals = Array.tabulate(24 * 12) { f =>
      if (f % 12 == 0) (f / 12 % 3).toDouble else ((f * K) % 4096) / 16.0
    }
    NpzIngest.writeNpz(spark, s"$dir/features_clone.npz",
      Seq(("features", "<f8", Seq(24, 12), featureVals)))
    val ours = NpzIngest.read(spark, s"$dir/features_clone.npz")
      .selectExpr("idx", "values").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val numpys = NpzIngest.read(spark, "fixtures/npz/demo_features.npz")
      .selectExpr("idx", "values").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(ours == numpys)
  }

  test("streamToParquet drains incrementally with exactly-once checkpointing") {
    val base = Files.createTempDirectory("npz_stream")
    val landing = Files.createDirectory(base.resolve("landing"))
    val dest = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    Files.copy(java.nio.file.Paths.get("fixtures/npz/demo_features.npz"),
      landing.resolve("demo_features.npz"))

    NpzIngest.streamToParquet(spark, landing.toString, dest, ckpt)
    assert(spark.read.parquet(dest).count() == 24)

    // a second drain with nothing new must add nothing (exactly-once) ...
    NpzIngest.streamToParquet(spark, landing.toString, dest, ckpt)
    assert(spark.read.parquet(dest).count() == 24)

    // ... and a newly-landed archive is picked up WITHOUT re-decoding the old
    Files.copy(java.nio.file.Paths.get("fixtures/npz/demo_matrices.npz"),
      landing.resolve("demo_matrices.npz"))
    NpzIngest.streamToParquet(spark, landing.toString, dest, ckpt)
    val df = spark.read.parquet(dest)
    assert(df.count() == 48)
    assert(df.groupBy("array").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("features" -> 24L, "matrices" -> 24L))
  }

  test("npzToParquet converts once, then skips (idempotent like download_dataset)") {
    val dest = Files.createTempDirectory("npz_idem").toString + "/out"
    assert(NpzIngest.npzToParquet(spark, "fixtures/npz/demo_features.npz", dest))
    val rows = spark.read.parquet(dest).count()
    assert(rows == 24)
    assert(!NpzIngest.npzToParquet(spark, "fixtures/npz/demo_features.npz", dest))
    assert(spark.read.parquet(dest).count() == rows)
  }
}
