package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem
import org.scalatest.funsuite.AnyFunSuite

/** A non-`file://` Hadoop FileSystem scheme backed by local disk — the
  * unit-mockable stand-in for an object store (SURVEY §2 row 1: the
  * reference's `download_dataset` S3 pull). Registered via `fs.<scheme>.impl`
  * exactly like `s3a://` registers S3AFileSystem; paths resolve through the
  * same Hadoop FS abstraction every `Tables.read`/write already uses.
  */
class GraftObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}

/** Proof that the engine's read path is URI-scheme pluggable: the SAME
  * `Tables.read` that serves `file://` fixtures serves any registered Hadoop
  * FS scheme — swapping in `s3a://bucket/...` is configuration, not code
  * (see README "Object-store inputs").
  */
class RemoteFsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def registerScheme(): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftObjectStoreFs].getName)

  test("Tables.read resolves a non-file:// Hadoop FS URI scheme") {
    registerScheme()
    val viaScheme = Tables.read(spark, s"graftfs://${TestSpark.sfDir}", "region")
    val viaFile = Tables.read(spark, TestSpark.sfDir, "region")
    assert(viaScheme.count() == viaFile.count())
    assert(viaScheme.schema == viaFile.schema)
    assert(viaScheme.collect().map(_.toString).sorted.toSeq ==
      viaFile.collect().map(_.toString).sorted.toSeq)
  }

  test("writes (the idempotent converter path) work through the scheme too") {
    registerScheme()
    val dest = s"graftfs:///tmp/graft_remote_fs_${System.nanoTime()}"
    assert(graft.sources.NpzIngest.npzToParquet(
      spark, "fixtures/npz/demo_features.npz", dest))
    assert(spark.read.parquet(dest).count() == 24)
    // second call sees the _SUCCESS marker through the same FS abstraction
    assert(!graft.sources.NpzIngest.npzToParquet(
      spark, "fixtures/npz/demo_features.npz", dest))
  }
}
