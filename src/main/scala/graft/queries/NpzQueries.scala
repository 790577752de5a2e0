package graft.queries

import java.io.File

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.sources.NpzIngest

/** NPZ-archive ingest surface (SURVEY §2 row 2) over the checked-in
  * `fixtures/npz/` archives. Fixture values are a pure function of the flat
  * index (tools/gen_npz_fixture.py): v[f] = ((f·2654435761) mod 4096)/16,
  * with features col 0 = event%3 — so the DuckDB oracle REPLAYS the expected
  * contents from `range()` arithmetic while Spark decodes the actual bytes.
  * A hash match therefore proves every byte of the zip + npy-header + buffer
  * decode path. All values are multiples of 1/16 under 256: exact in float32,
  * so ×16 returns the original integers and the checksums are integer sums.
  */
object NpzQueries {

  private val Events = 24
  private val MatRow = 16 * 16 * 3 // one event's matrix slice, C-order
  private val NFeat  = 12

  /** Resolve the repo fixture dir whether the JVM runs from the repo root or
    * elsewhere (the driver launches sbt from the repo).
    */
  private def fixtureDir: String =
    Seq("fixtures/npz", "/root/repo/fixtures/npz")
      .map(new File(_)).find(_.isDirectory)
      .getOrElse(throw new IllegalStateException(
        "fixtures/npz not found — run tools/gen_npz_fixture.py"))
      .getAbsolutePath

  /** Conversion sink keyed on fixture path + total bytes, so regenerating the
    * fixture invalidates the idempotence marker instead of serving stale rows.
    */
  private def parquetDest(dir: String): String = {
    val bytes = new File(dir).listFiles().map(_.length()).sum
    s"/tmp/graft_npz_parquet_${math.abs(dir.hashCode.toLong)}_$bytes"
  }

  private def quant(c: Column): Column = round(c * 16, 0).cast("long")

  val defs: Seq[QueryDef] = Seq(

    // Full-decode proof: per (array, slice) value count + integer checksum +
    // min/max of the quantized values, vs the oracle's replayed arithmetic.
    QueryDef("q97_npz_decode",
      s"""WITH m AS (
         |  SELECT 'matrices' AS array_name, i // $MatRow AS idx,
         |         (i * 2654435761) % 4096 AS vq
         |  FROM (SELECT unnest(range(0, ${Events * MatRow})) AS i)),
         |f AS (
         |  SELECT 'features' AS array_name, i // $NFeat AS idx,
         |         CASE WHEN i % $NFeat = 0 THEN ((i // $NFeat) % 3) * 16
         |              ELSE (i * 2654435761) % 4096 END AS vq
         |  FROM (SELECT unnest(range(0, ${Events * NFeat})) AS i)),
         |u AS (SELECT * FROM m UNION ALL SELECT * FROM f)
         |SELECT array_name, idx, count(*) AS n_vals,
         |       CAST(sum(vq) AS BIGINT) AS checksum,
         |       CAST(min(vq) AS BIGINT) AS min_q,
         |       CAST(max(vq) AS BIGINT) AS max_q
         |FROM u GROUP BY array_name, idx
         |ORDER BY array_name, idx""".stripMargin) { (s, _) =>
      NpzIngest.read(s, fixtureDir + "/*.npz")
        .select(col("array").as("array_name"), col("idx"),
          explode(col("values")).as("v"))
        .groupBy("array_name", "idx")
        .agg(count(lit(1)).as("n_vals"),
          sum(quant(col("v"))).as("checksum"),
          min(quant(col("v"))).as("min_q"),
          max(quant(col("v"))).as("max_q"))
        .orderBy("array_name", "idx")
    },

    // Converter + unified-schema assembly: idempotent NPZ→Parquet (skip when
    // the sink's _SUCCESS exists, like download_dataset's existence check),
    // re-scan the Parquet, then the §1.4 positional zip-join — matrices[i] ↔
    // features[i] aligned by the slice index the decoder emitted (SURVEY §2
    // row 15's retained-split-storage path) — aggregated per class label.
    QueryDef("q98_npz_unified",
      s"""WITH e AS (
         |  SELECT i AS idx, CAST(i % 3 AS INT) AS label,
         |         ((i * $NFeat + 1) * 2654435761) % 4096 AS energy_q
         |  FROM (SELECT unnest(range(0, $Events)) AS i)),
         |m AS (
         |  SELECT i // $MatRow AS idx, (i * 2654435761) % 4096 AS vq
         |  FROM (SELECT unnest(range(0, ${Events * MatRow})) AS i)),
         |ms AS (SELECT idx, CAST(sum(vq) AS BIGINT) AS mat_checksum
         |       FROM m GROUP BY idx)
         |SELECT label, count(*) AS n,
         |       CAST(sum(e.energy_q) AS BIGINT) AS energy_checksum,
         |       CAST(sum(ms.mat_checksum) AS BIGINT) AS matrix_checksum
         |FROM e JOIN ms USING (idx)
         |GROUP BY label ORDER BY label""".stripMargin) { (s, _) =>
      val dest = parquetDest(fixtureDir)
      NpzIngest.npzToParquet(s, fixtureDir + "/*.npz", dest)
      val base = s.read.parquet(dest)
      val feats = base.where(col("array") === "features")
        .select(col("idx"),
          element_at(col("values"), 1).cast("int").as("label"),
          quant(element_at(col("values"), 2)).as("energy_q"))
      val mats = base.where(col("array") === "matrices")
        .select(col("idx"),
          aggregate(col("values"), lit(0L), (a, v) => a + quant(v))
            .as("mat_checksum"))
      feats.join(mats, "idx")
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(col("energy_q")).as("energy_checksum"),
          sum(col("mat_checksum")).as("matrix_checksum"))
        .orderBy("label")
    }
  )
}
