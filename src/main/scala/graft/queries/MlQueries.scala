package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ChannelStats
import graft.operators.{BradleyTerry, KMeans, LinearSigmoidScorer, Multimodal, Scorer}

/** The ML-adjacent operator surface: the custom no-explode channel-stats
  * aggregate (SURVEY §4 #1), batched mapPartitions scoring (row 50), the
  * iterative LR fit (row 45), and multimodal binary decode plumbing.
  */
object MlQueries {

  /** q455's oracle SQL, exposed for the materialization guard in
    * Round16Spec (the round-11 CTE-inlining failure must stay fixed).
    */
  private[graft] def btOracleForTest: String = MediaSql.BtSql.sql

  /** The q217-family embedding logistic score, libm-free (round 12): the
    * linear z is pure IEEE float arithmetic (bit-identical across
    * engines), quantized ONCE at e12, and the sigmoid runs as IntExp's
    * integer step chain. Shared by q217/q218/q250/q311/q340/q346.
    */
  private val EmbZSql: String =
    "CAST(round((-0.2 + CAST(embedding[1] AS DOUBLE) * 1.5" +
      " - CAST(embedding[2] AS DOUBLE) * 0.8" +
      " + CAST(embedding[3] AS DOUBLE) * 0.5" +
      " - CAST(embedding[4] AS DOUBLE) * 1.1) * 1000000000000) AS BIGINT)"

  /** Oracle side: nested selects producing `extra` columns + `p_e6`. */
  private def embSigSql(extra: String): String =
    graft.functions.IntExp.duckSigmoidE6(
      s"SELECT $extra, $EmbZSql AS z FROM embeddings", "z")

  /** Engine side: the embeddings relation + `p_e6` (helper columns ride
    * along; callers project).
    */
  private def embSigmoid(s: SparkSession, d: String): DataFrame = {
    def e(i: Int) = element_at(col("embedding"), i).cast("double")
    val z = lit(-0.2) + e(1) * 1.5 - e(2) * 0.8 + e(3) * 0.5 - e(4) * 1.1
    Tables.embeddings(s, d)
      .withColumn("z", round(z * 1000000000000L, 0).cast("long"))
      .withColumn("p_e6", graft.functions.IntExp.sigmoidE6Col(col("z")))
  }

  val defs: Seq[QueryDef] = Seq(

    // SURVEY §2 rows 34,39 + §4 custom #1: single-pass per-dimension Welford
    // stats over the embedding array — no explode; the oracle *does* explode
    // (768× blowup is fine for DuckDB at sf0.01, not for Spark at 100 TB).
    QueryDef("q45_channel_stats",
      """SELECT CAST(i AS INT) AS dim,
        |       round(avg(CAST(embedding[i + 1] AS DOUBLE)), 6) AS mean,
        |       round(stddev_pop(CAST(embedding[i + 1] AS DOUBLE)), 6) AS stddev,
        |       round(min(CAST(embedding[i + 1] AS DOUBLE)), 6) AS min,
        |       round(max(CAST(embedding[i + 1] AS DOUBLE)), 6) AS max
        |FROM embeddings, (SELECT unnest(range(0, 64)) AS i)
        |GROUP BY i ORDER BY dim""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .agg(ChannelStats.channelStats(col("embedding"), 64).as("stats"))
        .select(posexplode(col("stats")).as(Seq("dim", "st")))
        .select(col("dim"),
          round(col("st.mean"), 6).as("mean"),
          round(col("st.stddev"), 6).as("stddev"),
          round(col("st.min"), 6).as("min"),
          round(col("st.max"), 6).as("max"))
        .orderBy("dim")
    },

    // SURVEY §2 row 50: batched mapPartitions scoring behind the BatchScorer
    // trait — the CNN-inference stand-in with a linear kernel, so the oracle
    // can replay it in SQL exactly.
    // Calibration audit (reliability bins + ECE) — the model-eval op the
    // confusion/AUC family doesn't cover: ARE the scores probabilities?
    // q07's scoring expression plays the model; rows bin by floor(p·10)
    // (the q07 binning precedent — identical double expression on both
    // engines, then integer bins), and per bin the confidence (exact mean
    // of round(p·1e6) units) is compared to the empirical positive rate.
    // ECE = Σ n_b·|conf−emp| / N — entirely integer ppm once the per-row
    // quantization lands, so no float crosses a row boundary. Output: the
    // 10-bin reliability table every calibration plot draws, each row
    // carrying the global ECE.
    QueryDef("q277_calibration_ece",
      """WITH scored AS (
        |  SELECT CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END AS pos,
        |         (l_discount * 10 + l_quantity / 50.0 + l_tax * 12.5) / 3
        |           AS p
        |  FROM lineitem WHERE l_quantity >= 5 AND l_quantity < 45),
        |b AS (SELECT LEAST(GREATEST(CAST(floor(p * 10) AS BIGINT), 0), 9)
        |        AS bin,
        |        CAST(round(p * 1000000, 0) AS BIGINT) AS p_e6, pos
        |      FROM scored),
        |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(pos) AS BIGINT) AS n_pos,
        |        CAST(sum(p_e6) AS BIGINT) AS sum_e6
        |      FROM b GROUP BY bin),
        |r AS (SELECT bin, n, n_pos,
        |        CAST(sum_e6 // n AS BIGINT) AS conf_ppm,
        |        CAST(n_pos * 1000000 // n AS BIGINT) AS emp_ppm
        |      FROM g),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
        |        CAST(sum(n * abs(conf_ppm - emp_ppm)) AS BIGINT) AS w
        |      FROM r)
        |SELECT r.bin, r.n, r.n_pos, r.conf_ppm, r.emp_ppm,
        |       CAST(t.w // t.total AS BIGINT) AS ece_ppm
        |FROM r, t ORDER BY r.bin""".stripMargin) { (s, d) =>
      val scored = Tables.lineitem(s, d)
        .where(col("l_quantity") >= 5 && col("l_quantity") < 45)
        .select(when(col("l_linestatus") === "F", 1L).otherwise(0L).as("pos"),
          ((col("l_discount") * 10 + col("l_quantity") / 50.0
            + col("l_tax") * 12.5) / 3).as("p"))
      val b = scored.select(
        least(greatest(floor(col("p") * 10).cast("long"), lit(0L)), lit(9L))
          .as("bin"),
        round(col("p") * 1000000, 0).cast("long").as("p_e6"), col("pos"))
      val g = b.groupBy("bin").agg(count(lit(1)).as("n"),
        sum("pos").as("n_pos"), sum("p_e6").as("sum_e6"))
      val r = g.select(col("bin"), col("n"), col("n_pos"),
        expr("sum_e6 div n").as("conf_ppm"),
        expr("n_pos * 1000000 div n").as("emp_ppm"))
      val t = r.agg(sum("n").as("total"),
        sum(col("n") * abs(col("conf_ppm") - col("emp_ppm"))).as("w"))
      r.crossJoin(broadcast(t))
        .select(col("bin"), col("n"), col("n_pos"), col("conf_ppm"),
          col("emp_ppm"), expr("w div total").as("ece_ppm"))
        .orderBy("bin")
    },

    QueryDef("q46_mappartitions_score",
      """SELECT l_orderkey AS key1, l_linenumber AS key2,
        |       round(1 / (1 + exp(-(-2.0 + 4.0 * (l_discount * 10) + 1.0 * (l_quantity / 50.0)))), 6) AS score
        |FROM lineitem ORDER BY key1, key2""".stripMargin) { (s, d) =>
      import s.implicits._
      val ds = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          array(col("l_discount") * 10, col("l_quantity") / 50.0).as("features"))
        .as[(Long, Int, Array[Double])]
      Scorer.scoreKeyed(ds, LinearSigmoidScorer(-2.0, Array(4.0, 1.0)))
        .select(col("key1"), col("key2"), round(col("score"), 6).as("score"))
        .orderBy("key1", "key2")
    },

    // Multimodal image decode, REAL bytes end to end: the checked-in PPM
    // fixture (tools/gen_media_fixture.py) has pixels that are a pure
    // function of (file id, flat index), so the oracle replays the decoded
    // channel sums from range() arithmetic while Spark parses the actual
    // container — header, comments, payload — through the batched
    // mapPartitions plumbing. A hash match proves every byte of the decode.
    QueryDef("q47_multimodal_decode", MediaSql.imageSql) { (s, _) =>
      Multimodal.decodeFeatures(
        Multimodal.readMedia(s, MediaSql.fixtureDir, "*.ppm"),
        Multimodal.PpmImageDecoder)
        .orderBy("media_id")
    },

    // Audio twin of q47: RIFF/WAVE PCM16 decode (chunk walking incl. the
    // LIST chunk odd fixtures carry) → integer amplitude aggregates the
    // oracle replays arithmetically.
    QueryDef("q123_wav_decode", MediaSql.audioSql) { (s, _) =>
      Multimodal.decodeFeatures(
        Multimodal.readMedia(s, MediaSql.fixtureDir, "*.wav"),
        Multimodal.WavAudioDecoder)
        .orderBy("media_id")
    },

    // Third real codec: 24-bit BMP — the container with actual layout
    // quirks (bottom-up row order for even fixtures, top-down for odd,
    // BGR byte order, rows zero-padded to 4-byte boundaries; widths 7/11/15
    // so padding is never zero). The oracle replays pixels in IMAGE order
    // from arithmetic; the position-weighted checksum wsum = Σ (f+1)·p
    // makes the contract order-sensitive — an un-flipped row, a BGR swap,
    // or one pad byte leaking into the payload each break the hash, which
    // plain channel sums would forgive.
    QueryDef("q136_bmp_decode", MediaSql.bmpSql) { (s, _) =>
      Multimodal.decodeFeatures(
        Multimodal.readMedia(s, MediaSql.fixtureDir, "*.bmp"),
        Multimodal.BmpImageDecoder)
        .orderBy("media_id")
    },

    // Fourth real codec, and the first COMPRESSED one: truecolor PNG. The
    // payload crosses a genuine zlib DEFLATE stream (JDK Inflater) and five
    // per-row filter predictors (None/Sub/Up/Average/Paeth — fixture row y
    // of file i uses filter (i+y) % 5, so every file exercises all five);
    // i%3==0 files carry a tEXt chunk the parser must skip, odd i splits
    // IDAT in two chunks the parser must concatenate before inflating. The
    // oracle replays pixels from arithmetic; wsum = Σ (f+1)·p catches any
    // mis-predicted filter byte, which corrupts the rest of its row/column.
    QueryDef("q142_png_decode", MediaSql.pngSql) { (s, _) =>
      Multimodal.decodeFeatures(
        Multimodal.readMedia(s, MediaSql.fixtureDir, "*.png"),
        Multimodal.PngImageDecoder)
        .orderBy("media_id")
    },

    // Fifth real codec, second COMPRESSED one, and a different compression
    // family than PNG's DEFLATE: GIF89a with variable-width LZW, a 256-color
    // palette indirection, 4-pass interlaced row order (odd fixtures),
    // local-color-table precedence (i%4==2 zeroes the global table — a
    // decoder that reads the wrong table emits all-black pixels and fails
    // wsum), and extension blocks to skip. The oracle replays the decoded
    // RGB from palette[index(q)] arithmetic.
    QueryDef("q148_gif_decode", MediaSql.gifSql) { (s, _) =>
      Multimodal.decodeFeatures(
        Multimodal.readMedia(s, MediaSql.fixtureDir, "*.gif"),
        Multimodal.GifImageDecoder)
        .orderBy("media_id")
    },

    // Sixth real codec, third COMPRESSION FAMILY (QOI's byte-wise op
    // stream: runs, the 64-entry color cache, wrapping delta ops — next to
    // DEFLATE and LZW). The fixture's run groups of 4 identical pixels and
    // 8-step value grid force RUN and INDEX ops through the decoder; the
    // oracle replays pixels from the group arithmetic.
    QueryDef("q153_qoi_decode", MediaSql.qoiSql) { (s, _) =>
      Multimodal.decodeFeatures(
        Multimodal.readMedia(s, MediaSql.fixtureDir, "*.qoi"),
        Multimodal.QoiImageDecoder)
        .orderBy("media_id")
    },

    // Seventh real codec, and the compressed-AUDIO family WAV left open:
    // FLAC. Lossless ⇒ decoded PCM is bit-exact, so the q123 replay
    // contract extends unchanged across rice-coded residuals, fixed
    // predictors 0–4 (cycled per frame/channel), escape partitions (j=3),
    // CRC-8/CRC-16 verification, metadata-block skipping (odd j), and all
    // four stereo decorrelation modes (cycled per frame). Stereo fixtures
    // interleave L,R in the SAME flat formula, so every container choice
    // changes the bytes but never the oracle's arithmetic.
    QueryDef("q159_flac_decode", MediaSql.flacSql) { (s, _) =>
      Multimodal.decodeFeatures(
        Multimodal.readMedia(s, MediaSql.fixtureDir, "*.flac"),
        Multimodal.FlacAudioDecoder)
        .orderBy("media_id")
    },

    // VIDEO — the modality the media family (images, audio) left open:
    // YUV4MPEG2 is the uncompressed interchange container real video
    // pipelines pass between decode and encode stages (pure header parse
    // + raw C444 planes — honestly decodable in this dependency-free
    // environment, unlike H.264/VP9 bitstreams). The decoder parses the
    // parameter header, skips FRAME-line params, and SAMPLES every 2nd
    // frame — the stride-k frame sampling a video training pipeline runs
    // at ingest; the (t+1)-weighted Y checksum pins WHICH frames were
    // kept. Oracle replays plane bytes from the fixture arithmetic over
    // exactly the sampled frame grid.
    QueryDef("q407_y4m_sample", MediaSql.y4mSql) { (s, _) =>
      Multimodal.decodeFeatures(
        // vid_* only: the C420 fixtures (vid420_*) are q434's surface
        Multimodal.readMedia(s, MediaSql.fixtureDir, "vid_*.y4m"),
        Multimodal.Y4mVideoDecoder)
        .orderBy("media_id")
    },

    // 4:2:0 chroma subsampling — what real-world video interchange
    // overwhelmingly carries (q407's C444 is the full-resolution rung).
    // The decoder reads quarter-size U/V planes and UPSAMPLES on read
    // (2×2 nearest-neighbor) into the same full-res plane relation, so
    // every downstream operator is untouched; the oracle states the
    // upsampling as arithmetic — full-res chroma sums are EXACTLY 4× the
    // subsampled plane sums, so a decoder that skipped the upsample (or
    // misparsed the half-size planes as frame headers) hash-mismatches.
    // Fixtures cycle the C420jpeg siting alias (same plane layout) and
    // FRAME-line params.
    QueryDef("q434_y4m_420", MediaSql.y4m420Sql) { (s, _) =>
      Multimodal.decodeFeatures(
        Multimodal.readMedia(s, MediaSql.fixtureDir, "vid420_*.y4m"),
        Multimodal.Y4mVideoDecoder)
        .orderBy("media_id")
    },

    // 4:2:2 chroma subsampling (round 13 — the broadcast/capture
    // interchange layout, closing the last loudly-rejected Y4M variant
    // short of compressed bitstreams): half-WIDTH, full-height chroma
    // planes upsampled 2×1 on read into the same full-res plane relation.
    // The oracle's 2× chroma factor proves the upsample ran (q434's 4×
    // discipline on a new axis); ODD frame heights prove the even-width-
    // only dimension rule.
    QueryDef("q477_y4m_422", MediaSql.y4m422Sql) { (s, _) =>
      Multimodal.decodeFeatures(
        Multimodal.readMedia(s, MediaSql.fixtureDir, "vid422_*.y4m"),
        Multimodal.Y4mVideoDecoder)
        .orderBy("media_id")
    },

    // Eighth real codec and the TRANSFORM-CODING family: baseline
    // sequential JPEG — the most-hit real image format a multimodal ingest
    // sees (the one the media family had deliberately left out until now).
    // The fixtures live in the DC-only subspace where lossy decode is
    // EXACT (every block constant, qDC = 8), so the oracle replays pixels
    // from block arithmetic + the integer YCbCr→RGB while the engine
    // crosses the full bitstream: Huffman decode, DC prediction, restart
    // resets, dequant/IDCT, MCU crop. 4:4:4 here; q470 is the 4:2:0 twin.
    QueryDef("q469_jpeg_decode", MediaSql.jpeg444Sql) { (s, _) =>
      Multimodal.decodeFeatures(
        Multimodal.readMedia(s, MediaSql.fixtureDir, "jpg444_*.jpg"),
        Multimodal.JpegImageDecoder)
        .orderBy("media_id")
    },

    // 4:2:0 subsampled JPEG — what real camera/web JPEGs overwhelmingly
    // carry (mirrors the q407→q434 Y4M pair): 2×2-sampled luma MCUs, one
    // chroma block per 16×16 upsampled on decode, non-MCU-aligned frame
    // sizes cropping padding blocks, DRI=1 files resetting the DC
    // predictor at every MCU boundary.
    QueryDef("q470_jpeg_420", MediaSql.jpeg420Sql) { (s, _) =>
      Multimodal.decodeFeatures(
        Multimodal.readMedia(s, MediaSql.fixtureDir, "jpg420_*.jpg"),
        Multimodal.JpegImageDecoder)
        .orderBy("media_id")
    },

    // PROGRESSIVE JPEG (SOF2) — the next-most-common real-world variant
    // after baseline (the round-12 verdict's first-in-line gap): multi-scan
    // coefficient reassembly — an interleaved DC first pass at Al=1, a DC
    // refinement bit pass, per-component AC band scans and AC refinements
    // coded as EOBRUN — with varied scan order, DHT redefinition between
    // scans, and DRI resets inside every scan. Fixtures stay in the
    // DC-only exact subspace (q469's discipline) so the oracle replays
    // pixels from block formulas; the nonzero-AC progressive path is
    // pinned by JpegSpec against the baseline decode of the same
    // coefficients.
    QueryDef("q475_jpeg_progressive", MediaSql.jpegProgSql) { (s, _) =>
      Multimodal.decodeFeatures(
        Multimodal.readMedia(s, MediaSql.fixtureDir, "jpgprog_*.jpg"),
        Multimodal.JpegImageDecoder)
        .orderBy("media_id")
    },

    // SURVEY §2 rows 4-5: partitioned parquet sink + re-scan, and the
    // fitted-statistics relation persisted and reloaded (stats are *data* —
    // SURVEY §7.4.4). The oracle computes the same result without the
    // roundtrip, so the check proves write→read fidelity.
    QueryDef("q49_sink_roundtrip",
      s"""WITH o AS (SELECT o_totalprice,
         |             ${graft.operators.Split.assignSplitSql("o_orderkey", 21)} AS split
         |           FROM orders),
         |stats AS (${graft.operators.ScalerPipeline.fitStatsSql(
                       "ln(o_totalprice + 1)", "(SELECT * FROM o WHERE split = 'train')")})
         |SELECT split, count(*) AS n,
         |       round(CAST(sum(CAST(round(((ln(o_totalprice + 1) - mu) / sigma)
         |                 * 1000000, 0) AS BIGINT)) AS DOUBLE)
         |             / count(*) / 1000000, 6) + 0.0 AS avg_s
         |FROM o, stats GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
      import graft.operators.{ScalerPipeline, Split}
      // keyed on the FULL fixture path (not basename) — two dirs sharing a
      // basename must not clobber each other's pending round trips
      val out = "/tmp/graft_roundtrip_" + math.abs(d.hashCode.toLong)
      Tables.orders(s, d)
        .withColumn("split", Split.assignSplit(col("o_orderkey"), 21))
        .write.mode("overwrite").partitionBy("split").parquet(s"$out/orders")
      val reread = s.read.parquet(s"$out/orders")
      val stats = ScalerPipeline.fit(
        reread.where(col("split") === "train"),
        Seq("o_totalprice" -> ScalerPipeline.Log1pStandard))
      ScalerPipeline.save(s, stats, s"$out/stats")
      val loaded = ScalerPipeline.load(s, s"$out/stats")
      // Stats derive from exact-integer sums at fit time (bit-identical across
      // engines AND across runs — no accumulation-order dependence), and the
      // per-row scaled value is quantized to integer 1e-6 units before the
      // average so the cross-row reduction is exact integer arithmetic —
      // float summation order (partial/merge vs sequential) can't move it.
      // The train split's avg_s is ≈0 BY CONSTRUCTION (μ is the train mean),
      // so the final round(…,6) lands on ±0.0 depending on the sign of a
      // ~1e-11 residual — playbook rule #7: `+ 0.0` on BOTH engines
      // normalizes -0.0 to +0.0 (this exact cell flipped in r2 and r3).
      ScalerPipeline.apply(reread, loaded)
        .withColumn("q", round(col("o_totalprice_scaled") * 1e6, 0).cast("long"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          (round(sum(col("q")).cast("double") / count(lit(1)) / 1e6, 6) + lit(0.0))
            .as("avg_s"))
        .orderBy("split")
    },

    // Mergeability contract for the fitted-statistics family: fitting on
    // partition halves and MERGING the integer sums must equal the global
    // one-pass fit EXACTLY — the map-side-partials correctness property
    // that makes the ScalerPipeline distributed-safe, stated as data. Both
    // paths derive (n, mu, sigma, lo, hi) from the same exact-integer
    // aggregates through the same IEEE op sequence, so the two output rows
    // are bit-identical in BOTH engines; a float-accumulation fit would
    // break the merged row's hash here run-dependently (the q49 lesson,
    // promoted to an explicit contract).
    QueryDef("q157_stats_merge",
      """WITH y AS (SELECT CAST(CAST(round(ln(o_totalprice + 1) * 1000000, 0)
        |                  AS BIGINT) AS HUGEINT) AS y,
        |                  ln(o_totalprice + 1) AS x, o_orderkey % 2 AS half
        |           FROM orders),
        |h AS (SELECT half, count(*) AS n, sum(y) AS s1, sum(y * y) AS s2,
        |             min(x) AS lo, max(x) AS hi FROM y GROUP BY half),
        |m AS (SELECT sum(n) AS n, sum(s1) AS s1, sum(s2) AS s2,
        |             min(lo) AS lo, max(hi) AS hi FROM h),
        |g AS (SELECT count(*) AS n, sum(y) AS s1, sum(y * y) AS s2,
        |             min(x) AS lo, max(x) AS hi FROM y)
        |SELECT path, CAST(n AS BIGINT) AS n,
        |       round((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / 1000000, 9)
        |         + 0.0 AS mu,
        |       round(sqrt(CASE WHEN CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |                    - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |                      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) < 0
        |                  THEN 0
        |                  ELSE CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |                    - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |                      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) END)
        |             / 1000000, 9) + 0.0 AS sigma,
        |       round(lo, 9) AS lo, round(hi, 9) AS hi
        |FROM (SELECT 'global' AS path, * FROM g
        |      UNION ALL SELECT 'merged', * FROM m)
        |ORDER BY path""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(38, 0)
      val x = log(col("o_totalprice") + lit(1.0))
      val y = round(x * lit(1e6), 0).cast("long").cast(dec)
      val orders = Tables.orders(s, d)
      val halves = orders.groupBy((col("o_orderkey") % 2).as("half"))
        .agg(count(y).as("n"), sum(y).as("s1"), sum(y * y).as("s2"),
          min(x).as("lo"), max(x).as("hi"))
      val merged = halves.agg(sum("n").as("n"),
        sum("s1").cast(dec).as("s1"), sum("s2").cast(dec).as("s2"),
        min("lo").as("lo"), max("hi").as("hi"))
      val global = orders.agg(count(y).as("n"), sum(y).as("s1"),
        sum(y * y).as("s2"), min(x).as("lo"), max(x).as("hi"))
      def derive(df: org.apache.spark.sql.DataFrame, path: String) = {
        val s1d = col("s1").cast("double") / col("n").cast("double")
        val s2d = col("s2").cast("double") / col("n").cast("double")
        val v = s2d - s1d * s1d
        df.select(lit(path).as("path"), col("n").cast("long").as("n"),
          (round(s1d / 1e6, 9) + lit(0.0)).as("mu"),
          (round(sqrt(when(v < 0, lit(0.0)).otherwise(v)) / 1e6, 9) + lit(0.0))
            .as("sigma"),
          round(col("lo"), 9).as("lo"), round(col("hi"), 9).as("hi"))
      }
      derive(global, "global").unionAll(derive(merged, "merged"))
        .orderBy("path")
    },

    // SURVEY §2 row 45: iterative logistic-regression fit (spark.ml,
    // driver-coordinated treeAggregate loop). LBFGS weights can't hash-match
    // any other engine, but their CONTRACT is checkable (the q54/q96
    // error-bound pattern): the oracle replays the deterministic GD anchor
    // (q103's unrolled-CTE arithmetic) and asserts TRUE for the bound
    // column, while Spark emits whether |lbfgs − gd_anchor| stayed within
    // ε for every parameter. An LBFGS fit that walks away from the anchor
    // becomes a hash mismatch instead of an invisible rows-only pass.
    QueryDef("q48_lr_fit", LrGdSql.boundSql) { (s, d) =>
      import org.apache.spark.ml.classification.LogisticRegression
      import org.apache.spark.ml.feature.VectorAssembler
      val data = Tables.lineitem(s, d).select(
        (col("l_discount") * 10).as("f0"),
        (col("l_quantity") / 50.0).as("f1"),
        when(col("l_linestatus") === "O", 1.0).otherwise(0.0).as("label"))
      val assembled = new VectorAssembler()
        .setInputCols(Array("f0", "f1")).setOutputCol("features")
        .transform(data)
      val model = new LogisticRegression()
        .setMaxIter(10).setRegParam(0.1).setStandardization(false)
        .fit(assembled)
      // weights exported as a stats relation (SURVEY §7.4.5) — inference can
      // then run as the pure expression of q20/q46
      val lbfgs = Map("bias" -> model.intercept,
        "w0" -> model.coefficients(0), "w1" -> model.coefficients(1))
      // the deterministic anchor: same features/label, q103's exact GD
      val gd = graft.operators.LogisticGD.fit(
        Tables.lineitem(s, d),
        Seq(col("l_discount") * 10, col("l_quantity") / 50.0),
        when(col("l_linestatus") === "O", 1.0).otherwise(0.0),
        lr = 0.5, iters = 3)
      val anchor = Map("bias" -> gd.bias, "w0" -> gd.w(0), "w1" -> gd.w(1))
      import s.implicits._
      anchor.toSeq.map { case (p, a) =>
        (p, BigDecimal(a).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0,
          math.abs(lbfgs(p) - a) <= LrGdSql.BoundEps)
      }.toDF("param", "gd_value", "within_bound").orderBy("param")
    },

    // Multimodal → similarity chaining: batched REAL image decode (q47's
    // kernel) produces a channel-sum feature vector per image, which flows
    // straight into cosine top-3 within the same-height group — the
    // decode→embed→ANN shape of a multimodal training-data pipeline, with
    // every stage on the same DataFrame plan.
    QueryDef("q76_media_knn", MediaSql.knnSql) { (s, _) =>
      import graft.functions.Tensors
      import org.apache.spark.sql.expressions.Window
      val feats = Multimodal.decodeFeatures(
          Multimodal.readMedia(s, MediaSql.fixtureDir, "*.ppm"),
          Multimodal.PpmImageDecoder)
        .select(col("media_id"), col("height"),
          array(col("sum_r").cast("double"), col("sum_g").cast("double"),
            col("sum_b").cast("double")).as("v"))
      val n = feats.withColumn("nrm", Tensors.norm(col("v")))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("neighbor_id"))
      n.as("a").join(n.as("b"),
          col("a.height") === col("b.height") &&
            col("a.media_id") =!= col("b.media_id"))
        .select(col("a.media_id").as("query_id"), col("b.media_id").as("neighbor_id"),
          round(Tensors.dot(col("a.v"), col("b.v"))
            / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
        .orderBy("query_id", "rank")
    },

    // Perceptual-hash image dedup (Multimodal.DhashDecoder): REAL PPM decode
    // → dHash (9×8 grid, adjacent-gray comparisons, 64 bits as four 16-bit
    // bands) → band-bucket candidate join → exact Hamming ≤ 6 — SimHash's
    // banded near-dup shape lifted to the multimodal column. The corpus is
    // each fixture image under three pixel variants (identity, corner
    // watermark +1000, brightness +2000): the watermark is a true NEAR-dup
    // (Hamming 1-3 — only the corner grid cells flip), brightness is
    // dHash's designed invariance (distance 0), and distinct images sit at
    // ≥ 12 — so the threshold at 6 recovers exactly the 24 planted
    // triangles while the band join's false candidates (~87 pairs here)
    // are rejected by the exact filter, proving both stages bite. Scale:
    // decode+hash is row-local scan work; candidates come from a band
    // equi-join (never all-pairs); the Hamming filter touches candidate
    // rows only — identical inventory to q37/q38's text near-dup.
    QueryDef("q162_media_dhash_dedup", MediaSql.dhashSql) { (s, _) =>
      def bandsOf(dec: Multimodal.MediaDecoder[Multimodal.DhashBands],
                  offset: Long): org.apache.spark.sql.DataFrame =
        Multimodal.decodeFeatures(
            Multimodal.readMedia(s, MediaSql.fixtureDir, "*.ppm"), dec)
          .select((col("media_id") + offset).as("id"),
            array(col("b0"), col("b1"), col("b2"), col("b3")).as("bv"))
      val variants = bandsOf(Multimodal.DhashIdentity, 0L)
        .unionAll(bandsOf(Multimodal.DhashWatermark, 1000L))
        .unionAll(bandsOf(Multimodal.DhashBrighten, 2000L))
      val banded = variants.select(col("id"), col("bv"),
        posexplode(col("bv")).as(Seq("band", "val")))
      val cand = banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.val") === col("b.val") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.bv").as("bva"), col("b.bv").as("bvb"))
        .distinct()
      val ham = (0 until 4).map(i =>
        bit_count(element_at(col("bva"), i + 1)
          .bitwiseXOR(element_at(col("bvb"), i + 1))))
        .reduce(_ + _)
      cand.select(col("id_a"), col("id_b"), ham.cast("long").as("hamming"))
        .where(col("hamming") <= 6)
        .orderBy("id_a", "id_b")
    },

    // Audio twin of q162 (Multimodal.AudioFpDecoder): REAL WAV decode →
    // frame-energy fingerprint (33 integer Σ|s| energies, 32 comparison
    // bits as two 16-bit bands) → band-bucket join → Hamming ≤ 6. Variants
    // plant the same triangle: exact gain ×2 is monotone in |s| (every
    // comparison survives — distance 0), a silenced first eighth flips
    // only the bits of the frames it touches (distance 1-4), distinct
    // clips sit at ≥ 11. Same scale inventory as q162: row-local
    // decode+hash, banded candidates, exact filter on candidates only.
    QueryDef("q164_audio_fp_dedup", MediaSql.audioFpSql) { (s, _) =>
      def bandsOf(dec: Multimodal.MediaDecoder[Multimodal.AudioFpBands],
                  offset: Long): org.apache.spark.sql.DataFrame =
        Multimodal.decodeFeatures(
            Multimodal.readMedia(s, MediaSql.fixtureDir, "*.wav"), dec)
          .select((col("media_id") + offset).as("id"),
            array(col("b0"), col("b1")).as("bv"))
      val variants = bandsOf(Multimodal.AudioFpIdentity, 0L)
        .unionAll(bandsOf(Multimodal.AudioFpGain, 100L))
        .unionAll(bandsOf(Multimodal.AudioFpSilence, 200L))
      val banded = variants.select(col("id"), col("bv"),
        posexplode(col("bv")).as(Seq("band", "val")))
      val cand = banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.val") === col("b.val") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.bv").as("bva"), col("b.bv").as("bvb"))
        .distinct()
      val ham = (0 until 2).map(i =>
        bit_count(element_at(col("bva"), i + 1)
          .bitwiseXOR(element_at(col("bvb"), i + 1))))
        .reduce(_ + _)
      cand.select(col("id_a"), col("id_b"), ham.cast("long").as("hamming"))
        .where(col("hamming") <= 6)
        .orderBy("id_a", "id_b")
    },

    // SURVEY §2 row 45 made oracle-checkable: deterministic full-batch
    // gradient descent for the logistic fit (operators/LogisticGD), the same
    // move KMeans made for Lloyd rounds. Per-row gradient terms quantize to
    // integer 1e-6 units before the sum; weights snap to a 1e-9 grid per
    // round; the oracle unrolls all 3 rounds as CTEs with the identical
    // update expression — the fitted weights hash-match exactly. q48 keeps
    // spark.ml LBFGS as the production path.
    QueryDef("q103_lr_gd", LrGdSql.sql) { (s, d) =>
      import graft.operators.LogisticGD
      val wts = LogisticGD.fit(
        Tables.lineitem(s, d),
        Seq(col("l_discount") * 10, col("l_quantity") / 50.0),
        when(col("l_linestatus") === "O", 1.0).otherwise(0.0),
        lr = 0.5, iters = 3)
      import s.implicits._
      Seq(("bias", wts.bias), ("w0", wts.w(0)), ("w1", wts.w(1)))
        .toDF("param", "value").orderBy("param")
    },

    // Deterministic k-means (2 Lloyd rounds, first-k-by-id seeds) — the
    // iterative fit/apply loop as pure relational algebra (operators/KMeans).
    // The oracle unrolls both rounds as CTEs: assign = argmin-distance
    // cross join, update = per-dimension avg — identical arithmetic, so the
    // final cluster sizes and centroid norms hash-match exactly.
    QueryDef("q65_kmeans", KMeansSql.sql) { (s, d) =>
      val (assigned, centroids) = KMeans.fit(
        Tables.embeddings(s, d), "vec_id", "embedding",
        SimilarityQueries.Dim, k = 4, iters = 2)
      assigned.groupBy("cluster").agg(count(lit(1)).as("n"))
        .join(centroids, "cluster")
        .select(col("cluster").as("cluster_id"), col("n"),
          round(sqrt(aggregate(transform(col("centroid"), v => v * v),
            lit(0.0), (a, b) => a + b)), 6).as("centroid_norm"))
        .orderBy("cluster_id")
    },

    // Calibration curve — the model-eval table reliability diagrams draw:
    // scores bucket into fixed-width bins and each bin reports observed
    // positive rate next to mean predicted score; a calibrated scorer has
    // rate ≈ score per bin. The score is a literal-folded sigmoid (q20's
    // proven expression shape over the first four embedding dims), rounded
    // to the 1e-6 grid BEFORE binning so bin edges are decided on identical
    // doubles; rates and mean scores are exact integer ppm / 1e-6 units.
    // One census aggregate — model evaluation at 100 TB costs one scan.
    QueryDef("q217_calibration_bins", {
      val sc = embSigSql("CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS pos")
      s"""WITH s AS (SELECT pos, p_e6 FROM ($sc)),
        |b AS (SELECT least(p_e6 * 10 // 1000000, 9) AS bin, pos, p_e6
        |      FROM s)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(pos) AS BIGINT) AS n_pos,
        |       CAST(sum(pos) * 1000000 // count(*) AS BIGINT) AS rate_ppm,
        |       CAST(sum(p_e6) // count(*) AS BIGINT) AS avg_score_e6
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin
    }) { (s, d) =>
      embSigmoid(s, d)
        .select(when(col("label") % 2 === 0, 1L).otherwise(0L).as("pos"),
          col("p_e6"))
        .select(least(expr("p_e6 * 10 div 1000000"), lit(9L)).cast("long")
          .as("bin"), col("pos"), col("p_e6"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"),
          expr("sum(pos) * 1000000 div count(*)").as("rate_ppm"),
          expr("sum(p_e6) div count(*)").as("avg_score_e6"))
        .orderBy("bin")
    },

    // Exact ROC-AUC by rank statistics — the companion metric to q217's
    // calibration, computed the Mann–Whitney way with EXACT tie handling:
    // AUC = P(score_pos > score_neg) + ½·P(tie), so on the 1e-6-quantized
    // score grid 2·U = Σ over distinct scores of npos(s)·(2·negs_below(s)
    // + negs_at(s)) — every term an integer, no float ranks, no sampling.
    // The cumulative window runs over the DISTINCT-SCORE relation (bounded
    // at 1e6 rows by the quantization grid itself — the q07 bounded-window
    // discipline), after one map-side-combined score census; AUC lands as
    // integer ppm of 2·n_pos·n_neg. Model evaluation at 100 TB = one
    // census + a grid-bounded window.
    QueryDef("q218_auc", {
      val sc = embSigSql("CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS pos")
      s"""WITH s AS (SELECT pos, p_e6 FROM ($sc)),
        |c AS (SELECT p_e6, CAST(sum(pos) AS BIGINT) AS np_s,
        |             CAST(count(*) - sum(pos) AS BIGINT) AS nn_s
        |      FROM s GROUP BY p_e6),
        |w AS (SELECT p_e6, np_s, nn_s,
        |        CAST(coalesce(sum(nn_s) OVER (ORDER BY p_e6
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS cum_nn
        |      FROM c),
        |t AS (SELECT CAST(sum(np_s * (2 * cum_nn + nn_s)) AS BIGINT) AS u2,
        |             CAST(sum(np_s) AS BIGINT) AS np,
        |             CAST(sum(nn_s) AS BIGINT) AS nn
        |      FROM w)
        |SELECT np AS n_pos, nn AS n_neg, u2,
        |       CAST(u2 * 1000000 // (2 * np * nn) AS BIGINT) AS auc_ppm
        |FROM t""".stripMargin
    }) { (s, d) =>
      val sRel = embSigmoid(s, d)
        .select(when(col("label") % 2 === 0, 1L).otherwise(0L).as("pos"),
          col("p_e6"))
      val c = sRel.groupBy("p_e6")
        .agg(sum("pos").as("np_s"),
          (count(lit(1)) - sum("pos")).as("nn_s"))
      // exclusive cumsum over the (unique) score grid — two-pass PrefixSum
      // (round 14): bit-identical to the partition-less window, so the
      // oracle keeps its plain `sum(..) OVER (ORDER BY p_e6)` text; the
      // exclusive frame starts at 0, which replaces the coalesce
      val t = graft.operators.PrefixSum.cumsum(c, Seq(col("p_e6")), "nn_s",
          inclusive = false, sumName = "cum_nn")
        .agg(sum(col("np_s") * (lit(2) * col("cum_nn") + col("nn_s"))).as("u2"),
          sum("np_s").as("np"), sum("nn_s").as("nn"))
      t.select(col("np").as("n_pos"), col("nn").as("n_neg"), col("u2"),
        expr("u2 * 1000000 div (2 * np * nn)").as("auc_ppm"))
    },

    // PCA by power iteration — the missing classical decomposition next to
    // k-means/LR/OLS, composed Spark-first: JL-project 64-d → 16-d (q175's
    // row-local exact-micro-unit kernel), quantize coordinates to an
    // integer 1e-3 grid, then ONE posexploded aggregation emits the whole
    // second-moment surface (256 product cells + 16 dim sums + the count as
    // one 273-slot stats array with map-side combine — a single exchange of
    // O(k²) cells regardless of corpus size). The centered covariance is
    // EXACT integer arithmetic (n·Σqᵢqⱼ − ΣqᵢΣqⱼ — no float sum ever
    // crosses rows), the 16×16 matrix is O(k²) statistics iterated on the
    // driver (the PQ-codebook posture), and operators/PowerIteration runs 4
    // snapped rounds whose every fold the oracle replays as CTEs. Output:
    // per-label projection mass onto the top principal direction + the
    // Rayleigh quotient — the "does one direction separate my classes"
    // diagnostic, with eigenvector sign pinned by the e₁ start.
    // Dataset cartography (Swayamdipta et al. 2020) — the training-dynamics
    // data map: each example's CONFIDENCE (mean probability assigned to its
    // true class across training checkpoints) and VARIABILITY (spread of
    // that probability) locate it as easy-to-learn / ambiguous / hard —
    // the signal used to prune easy mass and surface label noise. The
    // checkpoints are a deterministic-GD trajectory on a LEARNABLE task
    // (quantity > 25 with quantity/50 among the features, lr 50 — see
    // CartographySql for why q103's task would collapse the map):
    // LogisticGD.fitTrajectory exposes every round's weights from ONE fit
    // (snap-9 weights, integer-quantized gradients — deterministic), so
    // w₁/w₂/w₃ are replayable constants the oracle re-derives with the
    // same unrolled chain — every intermediate weight visible. Per-example
    // probabilities quantize to integer 1e-6; confidence is an integer
    // mean and variability the EXACT integer dispersion 3Σx² − (Σx)² — no
    // float crosses a row. Scale: scoring is three literal-weight
    // row-local sigmoids in one pass; the fits are k × the q103 aggregate.
    QueryDef("q251_cartography", CartographySql.sql) { (s, d) =>
      import graft.operators.LogisticGD
      val li = Tables.lineitem(s, d)
      val f = Seq(col("l_discount") * 10, col("l_quantity") / 50.0)
      val y = when(col("l_quantity") > 25, 1.0).otherwise(0.0)
      val ws = LogisticGD.fitTrajectory(li, f, y,
        lr = CartographySql.Lr, iters = 3)
      def p(wk: LogisticGD.Weights) = {
        val z = lit(wk.bias) + f(0) * lit(wk.w(0)) + f(1) * lit(wk.w(1))
        round((lit(1.0) / (lit(1.0) + exp(-z))) * 1000000, 0).cast("long")
      }
      val sc = li.select(y.as("y"),
        p(ws(0)).as("p1"), p(ws(1)).as("p2"), p(ws(2)).as("p3"))
      def tc(pc: String) = when(col("y") === 1.0, col(pc))
        .otherwise(lit(1000000L) - col(pc))
      val r = sc
        .select(tc("p1").as("x1"), tc("p2").as("x2"), tc("p3").as("x3"))
        .select(expr("(x1 + x2 + x3) div 3").as("conf_e6"),
          (lit(3L) * (col("x1") * col("x1") + col("x2") * col("x2")
            + col("x3") * col("x3"))
            - (col("x1") + col("x2") + col("x3"))
              * (col("x1") + col("x2") + col("x3"))).as("varx"))
      val region = when(col("conf_e6") >= 600000, "easy")
        .when(col("conf_e6") <= 400000, "hard")
        .otherwise("ambiguous")
      r.groupBy(region.as("region"))
        .agg(count(lit(1)).as("n_examples"),
          expr("sum(conf_e6) div count(*)").as("mean_conf_e6"),
          expr("sum(varx) div count(*)").as("mean_varx"))
        .orderBy("region")
    },

    // Decile lift table — how every ranking-model filter gets judged in
    // production: rank the corpus by the classifier score, cut into ten
    // equal-frequency bins (q139's (rank·10) div n rule via GlobalRank, no
    // unbounded window), and report per-decile positive rate plus
    // cumulative lift over the base rate — the table behind "the top 10%
    // of the score captures 2.3× its share of positives". Score/label are
    // q218's literal sigmoid and parity label, so the three eval query
    // families (AUC / calibration / lift) grade the SAME model. Exact
    // integer ppm throughout; the cumulative window runs over ten rows.
    QueryDef("q250_decile_lift", {
      val sc = embSigSql(
        "vec_id, CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS pos")
      s"""WITH s AS (SELECT vec_id, pos, p_e6 FROM ($sc)),
        |t AS (SELECT count(*) AS n, CAST(sum(pos) AS BIGINT) AS np FROM s),
        |r AS (SELECT pos,
        |        row_number() OVER (ORDER BY p_e6 DESC, vec_id) - 1 AS rk
        |      FROM s),
        |g AS (SELECT (rk * 10) // n AS decile,
        |             CAST(count(*) AS BIGINT) AS n_rows,
        |             CAST(sum(pos) AS BIGINT) AS n_pos
        |      FROM r, t GROUP BY 1),
        |c AS (SELECT decile, n_rows, n_pos,
        |        CAST(sum(n_rows) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
        |        CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos
        |      FROM g)
        |SELECT CAST(decile AS BIGINT) AS decile, n_rows, n_pos,
        |       CAST(n_pos * 1000000 // n_rows AS BIGINT) AS pos_rate_ppm,
        |       CAST(cum_pos * t.n * 1000000 // (cum_n * t.np) AS BIGINT)
        |         AS cum_lift_ppm
        |FROM c, t ORDER BY decile""".stripMargin
    }) { (s, d) =>
      import graft.operators.GlobalRank
      import org.apache.spark.sql.expressions.Window
      val sRel = embSigmoid(s, d)
        .select(col("vec_id"),
          when(col("label") % 2 === 0, 1L).otherwise(0L).as("pos"),
          col("p_e6"))
      val t = sRel.agg(count(lit(1)).as("n"), sum("pos").as("np"))
      val ranked = GlobalRank.zipWithRank(sRel,
        Seq(col("p_e6").desc, col("vec_id")), idName = "rk")
      val g = ranked.crossJoin(broadcast(t))
        .groupBy(expr("(rk * 10) div n").as("decile"))
        .agg(count(lit(1)).as("n_rows"), sum("pos").as("n_pos"))
      val w = Window.orderBy("decile")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("cum_n", sum("n_rows").over(w))
        .withColumn("cum_pos", sum("n_pos").over(w))
        .crossJoin(broadcast(t))
        .select(col("decile"), col("n_rows"), col("n_pos"),
          expr("n_pos * 1000000 div n_rows").as("pos_rate_ppm"),
          expr("cum_pos * n * 1000000 div (cum_n * np)").as("cum_lift_ppm"))
        .orderBy("decile")
    },

    // Multinomial Naive Bayes fit + apply — the count-based generative
    // classifier next to the discriminative family (q48/q103 logistic,
    // q150 hashed-feature quality LR): the fit IS one aggregation pass
    // (per-(class, token) counts, per-class token totals, class priors —
    // all mergeable, no gradient loop), the exact property that makes NB
    // the first classifier anyone runs at corpus scale. Laplace-smoothed
    // log-likelihoods round to 1e-6 integer units at the ONE libm call
    // (the q80 posture); everything downstream — per-document score sums,
    // the (score DESC, class ASC) argmax — is exact integer arithmetic.
    // Train on doc_id%10<8, score the held-out fifth, emit the
    // lang-vs-predicted confusion census (q34's heuristic langid is the
    // rule-based counterpart of this learned one). Scale: the likelihood
    // relation is vocab × n_class rows keyed by token (the scoring join's
    // shuffle key); classes and priors broadcast; the ×n_class scoring
    // fan-out is bounded by the class count.
    QueryDef("q303_naive_bayes",
      """WITH tr AS (SELECT doc_id, lang, text FROM documents
        |            WHERE doc_id % 10 < 8),
        |te AS (SELECT doc_id, lang, text FROM documents
        |       WHERE doc_id % 10 >= 8),
        |trtok AS (SELECT lang, unnest(string_split(text, ' ')) AS token
        |          FROM tr),
        |vocab AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v
        |          FROM trtok),
        |cls AS (SELECT lang AS c, CAST(count(*) AS BIGINT) AS n_docs
        |        FROM tr GROUP BY lang),
        |ctot AS (SELECT lang AS c, CAST(count(*) AS BIGINT) AS n_tok
        |         FROM trtok GROUP BY lang),
        |prior AS (
        |  SELECT cls.c,
        |         CAST(round(ln(CAST(cls.n_docs AS DOUBLE)
        |           / (SELECT sum(n_docs) FROM cls)) * 1000000, 0) AS BIGINT)
        |           AS prior_e6,
        |         CAST(round(ln(CAST(1 AS DOUBLE) / (ctot.n_tok + vocab.v))
        |           * 1000000, 0) AS BIGINT) AS def_e6
        |  FROM cls JOIN ctot ON ctot.c = cls.c CROSS JOIN vocab),
        |lp AS (
        |  SELECT t.lang AS c, t.token,
        |         CAST(round(ln(CAST(count(*) + 1 AS DOUBLE)
        |           / (max(ctot.n_tok) + max(vocab.v))) * 1000000, 0) AS BIGINT)
        |           AS lp_e6
        |  FROM trtok t JOIN ctot ON ctot.c = t.lang CROSS JOIN vocab
        |  GROUP BY t.lang, t.token),
        |tetok AS (
        |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |        FROM te) GROUP BY doc_id, token),
        |scored AS (
        |  SELECT tt.doc_id, p.c,
        |         max(p.prior_e6)
        |           + sum(tt.cnt * coalesce(lp.lp_e6, p.def_e6)) AS score
        |  FROM tetok tt CROSS JOIN prior p
        |  LEFT JOIN lp ON lp.c = p.c AND lp.token = tt.token
        |  GROUP BY tt.doc_id, p.c),
        |pred AS (
        |  SELECT doc_id, c AS predicted,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY score DESC, c) AS rn
        |  FROM scored)
        |SELECT te.lang, pred.predicted, CAST(count(*) AS BIGINT) AS n
        |FROM te JOIN pred ON pred.doc_id = te.doc_id AND pred.rn = 1
        |GROUP BY te.lang, pred.predicted
        |ORDER BY te.lang, pred.predicted""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val tr = docs.where(col("doc_id") % 10 < 8)
      val te = docs.where(col("doc_id") % 10 >= 8)
      val trtok = tr.select(col("lang"),
          explode(split(col("text"), " ", -1)).as("token"))
        .persist() // vocab + class totals + likelihood counts share it
      val vocab = trtok.agg(countDistinct("token").as("v"))
      val cls = tr.groupBy(col("lang").as("c")).agg(count(lit(1)).as("n_docs"))
      val ctot = trtok.groupBy(col("lang").as("c"))
        .agg(count(lit(1)).as("n_tok"))
      val nTrain = broadcast(cls.agg(sum("n_docs").as("nd")))
      val prior = cls.join(ctot, "c").crossJoin(broadcast(vocab))
        .crossJoin(nTrain)
        .select(col("c"),
          round(log(col("n_docs").cast("double") / col("nd")) * 1000000, 0)
            .cast("long").as("prior_e6"),
          round(log(lit(1.0).cast("double") / (col("n_tok") + col("v")))
            * 1000000, 0).cast("long").as("def_e6"))
      val lp = trtok.groupBy(col("lang").as("c"), col("token"))
        .agg(count(lit(1)).as("cnt"))
        .join(ctot, "c").crossJoin(broadcast(vocab))
        .select(col("c"), col("token"),
          round(log((col("cnt") + 1).cast("double")
            / (col("n_tok") + col("v"))) * 1000000, 0)
            .cast("long").as("lp_e6"))
      val tetok = te.select(col("doc_id"),
          explode(split(col("text"), " ", -1)).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      val scored = tetok.crossJoin(broadcast(prior))
        .join(lp, Seq("c", "token"), "left")
        .groupBy("doc_id", "c")
        .agg((max("prior_e6")
          + sum(col("cnt") * coalesce(col("lp_e6"), col("def_e6"))))
          .as("score"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("c"))
      val pred = scored.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("c").as("predicted"))
      te.select(col("doc_id"), col("lang")).join(pred, "doc_id")
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    },

    // Bradley–Terry preference ratings (MM algorithm, Hunter 2004) — the
    // model behind pairwise-preference data: P(i beats j) =
    // rᵢ/(rᵢ+rⱼ), fitted by three minorization-maximization rounds of
    // rᵢ ← Wᵢ / Σⱼ nᵢⱼ/(rᵢ+rⱼ). Matches derive deterministically from
    // the fixture: per order, the two smallest supplier keys compete and
    // the larger line-revenue total wins (ties to the smaller key). Each
    // MM round is ONE pair-keyed join + aggregate (the PageRank shuffle
    // shape); per-opponent contributions quantize to 1e-12 integer units
    // BEFORE summing (order-insensitive exact sums — the q81 posture) and
    // ratings live on the 1e-9 grid. Every player also plays one win and
    // one loss against a FIXED reference of rating 1 — the standard
    // regularizer that pins the scale, keeps zero-win players off 0, and
    // guards every denominator. Top-20 by (rating DESC, supplier).
    QueryDef("q310_bradley_terry", {
      // every round references $prev THREE times (ri/rj/prv) — DuckDB
      // inlines multiply-referenced CTEs (playbook #43/#48), so the
      // 3-round chain expands ~3^3 over the lineitem base: 12.2 s at
      // sf0.01 against the sweep's 10 s per-oracle budget. MATERIALIZED
      // pins each round to one evaluation; same rows.
      def round_(k: Int, prev: String) =
        s"""c$k AS MATERIALIZED (
           |  SELECT p.i,
           |         sum(CAST(round(p.n / (ri.r + rj.r) * 1e12, 0) AS BIGINT))
           |           AS s
           |  FROM pairs p JOIN $prev ri ON ri.id = p.i
           |               JOIN $prev rj ON rj.id = p.j
           |  GROUP BY p.i),
           |r$k AS MATERIALIZED (
           |  SELECT w.id,
           |         round((w.wins + 1) * 1e12 /
           |           (c$k.s + CAST(round(CAST(2 AS DOUBLE) / (prv.r + 1) * 1e12,
           |                               0) AS BIGINT)),
           |           9) AS r
           |  FROM w JOIN c$k ON c$k.i = w.id JOIN $prev prv ON prv.id = w.id)""".stripMargin
      s"""WITH sup AS MATERIALIZED (
         |  SELECT l_orderkey AS k, l_suppkey AS s,
         |         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS cents
         |  FROM lineitem GROUP BY l_orderkey, l_suppkey),
         |rk AS (SELECT k, s, cents,
         |         row_number() OVER (PARTITION BY k ORDER BY s) AS rn
         |       FROM sup),
         |duel AS (
         |  SELECT a.k, a.s AS s1, a.cents AS c1, b.s AS s2, b.cents AS c2
         |  FROM rk a JOIN rk b ON a.k = b.k AND a.rn = 1 AND b.rn = 2),
         |matches AS MATERIALIZED (
         |  SELECT CASE WHEN c2 > c1 THEN s2 ELSE s1 END AS winner,
         |         CASE WHEN c2 > c1 THEN s1 ELSE s2 END AS loser
         |  FROM duel),
         |pairs AS MATERIALIZED (
         |  SELECT i, j, CAST(count(*) AS BIGINT) AS n FROM (
         |    SELECT winner AS i, loser AS j FROM matches
         |    UNION ALL SELECT loser, winner FROM matches)
         |  GROUP BY i, j),
         |w AS MATERIALIZED (
         |  SELECT p.id, coalesce(v.wins, 0) AS wins, p.games FROM
         |    (SELECT i AS id, sum(n) AS games FROM pairs GROUP BY i) p
         |    LEFT JOIN (SELECT winner AS id, CAST(count(*) AS BIGINT) AS wins
         |               FROM matches GROUP BY winner) v ON v.id = p.id),
         |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS r FROM w),
         |${round_(1, "r0")},
         |${round_(2, "r1")},
         |${round_(3, "r2")}
         |SELECT w.id AS suppkey, CAST(w.games AS BIGINT) AS games,
         |       CAST(w.wins AS BIGINT) AS wins, round(r3.r, 6) AS rating
         |FROM w JOIN r3 ON r3.id = w.id
         |ORDER BY rating DESC, suppkey LIMIT 20""".stripMargin
    }) { (s, d) =>
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("s")
      val sup = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("k"), col("l_suppkey").as("s"))
        .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
          .as("cents"))
        .withColumn("rn", row_number().over(wOrd))
      val duel = sup.where(col("rn") === 1)
        .select(col("k"), col("s").as("s1"), col("cents").as("c1"))
        .join(sup.where(col("rn") === 2)
          .select(col("k"), col("s").as("s2"), col("cents").as("c2")), "k")
      val matches = duel.select(
          when(col("c2") > col("c1"), col("s2")).otherwise(col("s1"))
            .as("winner"),
          when(col("c2") > col("c1"), col("s1")).otherwise(col("s2"))
            .as("loser"))
        .persist() // pair census + win census share it
      val pairs = matches.select(col("winner").as("i"), col("loser").as("j"))
        .unionAll(matches.select(col("loser").as("i"), col("winner").as("j")))
        .groupBy("i", "j").agg(count(lit(1)).as("n"))
        .persist() // probed once per MM round
      val wins = matches.groupBy(col("winner").as("id"))
        .agg(count(lit(1)).as("wins"))
      val w = pairs.groupBy(col("i").as("id")).agg(sum("n").as("games"))
        .join(wins, Seq("id"), "left")
        .select(col("id"), coalesce(col("wins"), lit(0L)).as("wins"),
          col("games"))
        .persist() // joined every round + final output
      var r = w.select(col("id"), lit(1.0).as("r")).localCheckpoint()
      for (_ <- 1 to 3) {
        val c = pairs
          .join(r.select(col("id").as("i"), col("r").as("ri")), "i")
          .join(r.select(col("id").as("j"), col("r").as("rj")), "j")
          .groupBy("i")
          .agg(sum(round(col("n") / (col("ri") + col("rj")) * 1e12, 0)
            .cast("long")).as("s"))
        r = w.join(c, col("id") === col("i"))
          .join(r.select(col("id").as("pid"), col("r").as("prv")),
            col("id") === col("pid"))
          .select(col("id"),
            round((col("wins") + 1) * 1e12
              / (col("s")
                + round(lit(2.0) / (col("prv") + 1) * 1e12, 0).cast("long")),
              9).as("r"))
          .localCheckpoint() // round plans must not nest
      }
      w.join(r, "id")
        .select(col("id").as("suppkey"), col("games"), col("wins"),
          round(col("r"), 6).as("rating"))
        .orderBy(col("rating").desc, col("suppkey"))
        .limit(20)
    },

    // Isotonic regression (pool-adjacent-violators) — THE calibration
    // fitter (q217 diagnoses miscalibration, q277 scores it; this one
    // FIXES it): the best monotone non-decreasing fit of observed
    // positive rate to predicted score. PAV's sequential pooling looks
    // un-distributable, but the fit only depends on the SCORE CENSUS
    // (distinct score → count, positives — one aggregate scan), and on a
    // census of m rows the closed-form minimax characterization
    // ŷᵢ = max_{j≤i} min_{k≥i} avg(y over [j,k]) is exact: prefix sums
    // over the census, the m×m upper-triangle grid via a broadcast
    // nested-loop self-join (m ≈ 100 two-decimal score bins —
    // statistics-sized, the scaler posture), one suffix-min window, one
    // max-aggregate. Averages are ratios of exact integer prefix sums —
    // min/max over identical doubles commute, so both engines agree
    // without any mid-chain rounding; fitted values round to 1e-6 at the
    // END. Output is the per-bin calibration map; its monotonicity is
    // the isotonic guarantee.
    QueryDef("q311_isotonic", {
      val scq = embSigSql("CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS pos")
      s"""WITH s AS (SELECT pos, p_e6 FROM ($scq)),
        |census AS (
        |  SELECT (p_e6 + 5000) // 10000 AS sc,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(pos) AS BIGINT) AS sy
        |  FROM s GROUP BY 1),
        |pre AS (
        |  SELECT sc, n, sy,
        |         sum(n) OVER (ORDER BY sc) AS cn,
        |         sum(sy) OVER (ORDER BY sc) AS cy
        |  FROM census),
        |grid AS (
        |  SELECT a.sc AS jsc, b.sc AS ksc,
        |         CAST(b.cy - (a.cy - a.sy) AS DOUBLE)
        |           / (b.cn - (a.cn - a.n)) AS avg_jk
        |  FROM pre a JOIN pre b ON a.sc <= b.sc),
        |mn AS (
        |  SELECT jsc, ksc,
        |         min(avg_jk) OVER (PARTITION BY jsc ORDER BY ksc
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS m
        |  FROM grid),
        |fit AS (SELECT ksc AS sc, max(m) AS f FROM mn GROUP BY ksc)
        |SELECT c.sc, c.n, c.sy,
        |       CAST(c.sy * 1000000 // c.n AS BIGINT) AS rate_ppm,
        |       CAST(round(f.f * 1000000, 0) AS BIGINT) AS fitted_e6
        |FROM census c JOIN fit f ON f.sc = c.sc
        |ORDER BY c.sc""".stripMargin
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val census = embSigmoid(s, d)
        .select(when(col("label") % 2 === 0, 1L).otherwise(0L).as("pos"),
          col("p_e6"))
        .groupBy(expr("(p_e6 + 5000) div 10000").as("sc"))
        .agg(count(lit(1)).as("n"), sum("pos").as("sy"))
        .persist() // grid sides + final join share the census
      // both cumulative walks (cn over n, cy over sy) ride ONE two-pass
      // PrefixSum over the unique sc grid (round 14) — bit-identical to the
      // partition-less windows, so the oracle keeps the plain window text
      val pre = graft.operators.PrefixSum.cumsumN(census, Seq(col("sc")),
          Seq("n" -> "cn", "sy" -> "cy"), inclusive = true)
        .select(col("sc"), col("n"), col("sy"), col("cn"), col("cy"))
      val a = pre.select(col("sc").as("jsc"), (col("cy") - col("sy")).as("cyp"),
        (col("cn") - col("n")).as("cnp"))
      val b = pre.select(col("sc").as("ksc"), col("cy"), col("cn"))
      val grid = broadcast(a).join(b, col("jsc") <= col("ksc"))
        .select(col("jsc"), col("ksc"),
          ((col("cy") - col("cyp")).cast("double")
            / (col("cn") - col("cnp"))).as("avg_jk"))
      val sw = Window.partitionBy("jsc").orderBy("ksc")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val fit = grid
        .select(col("ksc"), min("avg_jk").over(sw).as("m"))
        .groupBy(col("ksc").as("fsc")).agg(max("m").as("f"))
      census.join(fit, col("sc") === col("fsc"))
        .select(col("sc"), col("n"), col("sy"),
          expr("sy * 1000000 div n").as("rate_ppm"),
          round(col("f") * 1000000, 0).cast("long").as("fitted_e6"))
        .orderBy("sc")
    },

    // Weight-of-Evidence encoding + Information Value — the credit-scoring
    // categorical encoder (and the feature-screening statistic IV that
    // rides on it): per category, WOE = ln of the positive-share to
    // negative-share ratio, with the ±0.5 Laplace guard folded into exact
    // integers by multiplying through by 2 — ln((2·pos+1)·N / ((2·neg+1)
    // ·P)) has an all-BIGINT argument, ONE libm call on identical
    // doubles, rounded to 1e-6 (the q80 posture). IV contributions reuse
    // the ROUNDED woe so both engines integerize identically. One census
    // aggregate over orders; priorities vs a fixed price threshold.
    QueryDef("q317_woe_iv",
      """WITH base AS (
        |  SELECT o_orderpriority AS cat,
        |         CASE WHEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
        |                   > 15000000 THEN 1 ELSE 0 END AS y
        |  FROM orders),
        |c AS (SELECT cat, CAST(sum(y) AS BIGINT) AS pos,
        |             CAST(count(*) - sum(y) AS BIGINT) AS neg
        |      FROM base GROUP BY cat),
        |t AS (SELECT CAST(sum(pos) AS BIGINT) AS tp,
        |             CAST(sum(neg) AS BIGINT) AS tn FROM c),
        |w AS (
        |  SELECT cat, pos, neg,
        |         CAST(round(ln(CAST((2 * pos + 1) * tn AS DOUBLE)
        |           / ((2 * neg + 1) * tp)) * 1000000, 0) AS BIGINT) AS woe_e6
        |  FROM c CROSS JOIN t)
        |SELECT cat, pos, neg, woe_e6,
        |       CAST(round(CAST(pos * tn - neg * tp AS DOUBLE) / (tp * tn)
        |         * woe_e6, 0) AS BIGINT) AS iv_e6
        |FROM w CROSS JOIN t ORDER BY cat""".stripMargin) { (s, d) =>
      val base = Tables.orders(s, d).select(
        col("o_orderpriority").as("cat"),
        when(round(col("o_totalprice") * 100, 0).cast("long") > 15000000L,
          1L).otherwise(0L).as("y"))
      val c = base.groupBy("cat")
        .agg(sum("y").as("pos"), (count(lit(1)) - sum("y")).as("neg"))
      val t = broadcast(c.agg(sum("pos").as("tp"), sum("neg").as("tn")))
      c.crossJoin(t)
        .select(col("cat"), col("pos"), col("neg"), col("tp"), col("tn"),
          round(log(((lit(2) * col("pos") + 1) * col("tn")).cast("double")
            / ((lit(2) * col("neg") + 1) * col("tp"))) * 1000000, 0)
            .cast("long").as("woe_e6"))
        .select(col("cat"), col("pos"), col("neg"), col("woe_e6"),
          round((col("pos") * col("tn") - col("neg") * col("tp"))
            .cast("double") / (col("tp") * col("tn")) * col("woe_e6"), 0)
            .cast("long").as("iv_e6"))
        .orderBy("cat")
    },

    // Out-of-fold target encoding — the leakage-safe categorical encoder
    // (the q163/q258 leakage discipline applied to features): a row in
    // fold f gets its category's mean target computed WITHOUT fold f,
    // shrunk toward the global mean with strength m=10 — enc = (S_cat −
    // S_fold + m·μ) / (N_cat − N_fold + m). Everything is two census
    // aggregates (category totals, category×fold totals) joined back —
    // no per-row leakage-safe recompute, which is the whole trick; sums
    // are exact integer cents and the single division lands on the 1e-6
    // grid. Output is the (category, fold) encoding map a feature
    // pipeline broadcasts at apply time.
    QueryDef("q318_target_encoding",
      """WITH base AS (
        |  SELECT l_returnflag AS cat, CAST(l_orderkey % 5 AS BIGINT) AS fold,
        |         CAST(round(l_quantity * 100, 0) AS BIGINT) AS t
        |  FROM lineitem),
        |cf AS (SELECT cat, fold, CAST(sum(t) AS BIGINT) AS sf,
        |              CAST(count(*) AS BIGINT) AS nf
        |       FROM base GROUP BY cat, fold),
        |c AS (SELECT cat, CAST(sum(sf) AS BIGINT) AS sc,
        |             CAST(sum(nf) AS BIGINT) AS nc FROM cf GROUP BY cat),
        |g AS (SELECT CAST(sum(sc) AS BIGINT) AS sg,
        |             CAST(sum(nc) AS BIGINT) AS ng FROM c)
        |SELECT cf.cat, cf.fold, cf.nf,
        |       CAST(round((CAST(c.sc - cf.sf AS DOUBLE)
        |           + 10 * (CAST(g.sg AS DOUBLE) / g.ng))
        |         / (c.nc - cf.nf + 10) * 10000, 0) AS BIGINT) AS enc_e4
        |FROM cf JOIN c USING (cat) CROSS JOIN g
        |ORDER BY cf.cat, cf.fold""".stripMargin) { (s, d) =>
      val base = Tables.lineitem(s, d).select(
        col("l_returnflag").as("cat"),
        (col("l_orderkey") % 5).cast("long").as("fold"),
        round(col("l_quantity") * 100, 0).cast("long").as("t"))
      val cf = base.groupBy("cat", "fold")
        .agg(sum("t").as("sf"), count(lit(1)).as("nf"))
        .persist() // category rollup + output share it
      val c = cf.groupBy("cat").agg(sum("sf").as("sc"), sum("nf").as("nc"))
      val g = broadcast(c.agg(sum("sc").as("sg"), sum("nc").as("ng")))
      cf.join(c, "cat").crossJoin(g)
        .select(col("cat"), col("fold"), col("nf"),
          round(((col("sc") - col("sf")).cast("double")
              + lit(10) * (col("sg").cast("double") / col("ng")))
            / (col("nc") - col("nf") + 10) * 10000, 0)
            .cast("long").as("enc_e4"))
        .orderBy("cat", "fold")
    },

    // Second principal component by DEFLATION — the step from "top
    // eigenvector" (q229) to an actual PCA basis: C₂ = C − λ₁·v₁v₁ᵀ
    // removes the leading component's variance (Hotelling deflation), and
    // the same 4 snapped power rounds on C₂ yield v₂. The deflation
    // arithmetic runs in raw IEEE doubles with ONE stated expression
    // shape (c − λ·vᵢ·vⱼ, the un-rounded Rayleigh λ) — both engines
    // compute identical doubles because C's entries are exact integers
    // and v₁ is on the 1e-9 snap grid, so no extra quantization is
    // needed. Output: both components on the e9 grid, their eigenvalues,
    // the orthogonality witness v₁·v₂ (≈0 — deflation's own correctness
    // check), and λ₁'s explained-variance share of the top-2 subspace.
    QueryDef("q284_pca_deflation", DeflateSql.sql) { (s, d) =>
      import graft.operators.{PowerIteration, RandomProjection}
      import s.implicits._
      val k = PcaSql.K
      val e = Tables.embeddings(s, d)
        .select(transform(
          RandomProjection.projected(col("embedding"), 64, k, PcaSql.Seed),
          y => round(y * 1000, 0).cast("long")).as("q"))
      val statsArr = concat(
        flatten(transform(col("q"), qi => transform(col("q"), qj => qi * qj))),
        col("q"), array(lit(1L)))
      val cells = e.select(posexplode(statsArr).as(Seq("idx", "x")))
        .groupBy("idx").agg(sum("x").as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val n = cells(k * k + k)
      val si = Array.tabulate(k)(i => cells(k * k + i))
      val c = Array.tabulate(k, k)((i, j) =>
        (n * cells(i * k + j) - si(i) * si(j)).toDouble)
      val (v1, l1) = PowerIteration.topEigenvector(c, DeflateSql.Iters)
      val c2 = Array.tabulate(k, k)((i, j) => c(i)(j) - l1 * v1(i) * v1(j))
      val (v2, l2) = PowerIteration.topEigenvector(c2, DeflateSql.Iters)
      def e9(x: Double): Long = BigDecimal(x * 1000000000d)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
      def r0(x: Double): Long =
        BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
      var ortho = 0.0
      var i = 0
      while (i < k) { ortho += v1(i) * v2(i); i += 1 }
      val share = BigDecimal(l1 / (l1 + l2) * 1000000d)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
      val rows =
        v1.toSeq.zipWithIndex.map { case (x, ci) =>
          (1L, ci.toLong + 1, e9(x), r0(l1), e9(ortho), share)
        } ++ v2.toSeq.zipWithIndex.map { case (x, ci) =>
          (2L, ci.toLong + 1, e9(x), r0(l2), e9(ortho), share)
        }
      rows.toDF("comp", "ci", "v_e9", "lambda", "ortho_e9", "share1_ppm")
        .orderBy("comp", "ci")
    },

    QueryDef("q229_pca_power", PcaSql.sql) { (s, d) =>
      import graft.operators.{PowerIteration, RandomProjection}
      val k = PcaSql.K
      val e = Tables.embeddings(s, d)
        .select(col("label").cast("long").as("label"),
          transform(
            RandomProjection.projected(col("embedding"), 64, k, PcaSql.Seed),
            y => round(y * 1000, 0).cast("long")).as("q"))
        .persist() // feeds the one-pass moment census AND the projection
      val statsArr = concat(
        flatten(transform(col("q"), qi => transform(col("q"), qj => qi * qj))),
        col("q"), array(lit(1L)))
      val cells = e.select(posexplode(statsArr).as(Seq("idx", "x")))
        .groupBy("idx").agg(sum("x").as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val n = cells(k * k + k)
      val si = Array.tabulate(k)(i => cells(k * k + i))
      val c = Array.tabulate(k, k)((i, j) =>
        (n * cells(i * k + j) - si(i) * si(j)).toDouble)
      val (v, lam) = PowerIteration.topEigenvector(c, PcaSql.Iters)
      val lambda = BigDecimal(lam)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val varr = array(v.map(lit).toIndexedSeq: _*)
      e.select(col("label"),
          round(aggregate(
            zip_with(col("q"), varr, (qi, vi) => qi.cast("double") * vi),
            lit(0.0d), (a, x) => a + x), 0).cast("long").as("p"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_rows"), sum("p").as("proj_sum_e3"))
        .withColumn("lambda", lit(lambda))
        .orderBy("label")
    },

    // Split conformal prediction (Vovk et al.; Lei et al. JASA 2018) — the
    // distribution-free uncertainty interval every deployed regressor needs:
    // fit on the train fold, take the ⌈0.9(n+1)⌉-th smallest absolute
    // residual on the CALIBRATION fold as q̂, and the interval pred ± q̂ is
    // guaranteed ≥90% coverage on exchangeable test rows — no model or
    // noise assumptions. Model here is the per-flag train mean, kept exact
    // by scaling residuals through the train count (|n·y − S| — constant
    // factor within a group, so order statistics and coverage are
    // unaffected); q̂ is the exact order statistic via a per-group
    // row_number (the contract; q96's sketch is the approximate path at
    // 100 TB where calibration is a bounded sample anyway). Folds are the
    // deterministic hash split (q16's primitive) on the line's composite
    // key. Coverage lands within noise of the 90% target — the guarantee
    // the query exists to witness.
    QueryDef("q322_conformal", {
      import graft.functions.Hashes
      s"""WITH base AS (
         |  SELECT l_returnflag AS flag,
         |         (${Hashes.mulHashSql("l_orderkey * 8 + l_linenumber", 53)})
         |           % 3 AS fold,
         |         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
         |  FROM lineitem),
         |tr AS (
         |  SELECT flag, CAST(sum(y) AS BIGINT) AS sg,
         |         CAST(count(*) AS BIGINT) AS ng
         |  FROM base WHERE fold = 0 GROUP BY flag),
         |cal AS (
         |  SELECT base.flag, abs(base.y * tr.ng - tr.sg) AS r
         |  FROM base JOIN tr USING (flag) WHERE base.fold = 1),
         |kk AS (
         |  SELECT flag, CAST(count(*) AS BIGINT) AS n_cal,
         |         least((9 * (count(*) + 1) + 9) // 10, count(*)) AS k
         |  FROM cal GROUP BY flag),
         |rn AS (
         |  SELECT flag, r,
         |         row_number() OVER (PARTITION BY flag ORDER BY r) AS rn
         |  FROM cal),
         |qh AS (
         |  SELECT rn.flag, kk.n_cal, kk.k, CAST(rn.r AS BIGINT) AS qhat
         |  FROM rn JOIN kk ON rn.flag = kk.flag AND rn.rn = kk.k),
         |tst AS (
         |  SELECT base.flag, CAST(count(*) AS BIGINT) AS n_test,
         |         CAST(sum(CASE WHEN abs(base.y * tr.ng - tr.sg) <= qh.qhat
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS covered
         |  FROM base JOIN tr USING (flag) JOIN qh USING (flag)
         |  WHERE base.fold = 2 GROUP BY base.flag)
         |SELECT tst.flag, qh.n_cal, qh.k, qh.qhat, tst.n_test, tst.covered,
         |       tst.covered * 1000000 // tst.n_test AS coverage_ppm,
         |       2 * (qh.qhat // tr.ng) AS width_cents
         |FROM tst JOIN qh ON tst.flag = qh.flag
         |         JOIN tr ON tst.flag = tr.flag
         |ORDER BY tst.flag""".stripMargin
    }) { (s, d) =>
      import graft.functions.Hashes
      import org.apache.spark.sql.expressions.Window
      val base = Tables.lineitem(s, d).select(
        col("l_returnflag").as("flag"),
        (Hashes.mulHash(col("l_orderkey") * 8 + col("l_linenumber"), 53) % 3)
          .as("fold"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("y"))
        .persist() // train census + calibration + test share the split
      val tr = base.where(col("fold") === 0).groupBy("flag")
        .agg(sum("y").as("sg"), count(lit(1)).as("ng"))
      val cal = base.where(col("fold") === 1).join(broadcast(tr), "flag")
        .select(col("flag"), abs(col("y") * col("ng") - col("sg")).as("r"))
        .persist() // count census + order statistic
      val kk = cal.groupBy("flag").agg(count(lit(1)).as("n_cal"),
        least(expr("(9 * (count(*) + 1) + 9) div 10"), count(lit(1))).as("k"))
      val rn = cal.withColumn("rn",
        row_number().over(Window.partitionBy("flag").orderBy("r")))
      val qh = rn.join(broadcast(kk), Seq("flag"))
        .where(col("rn") === col("k"))
        .select(col("flag"), col("n_cal"), col("k"), col("r").as("qhat"))
      val tst = base.where(col("fold") === 2)
        .join(broadcast(tr), "flag").join(broadcast(qh.select("flag", "qhat")), "flag")
        .groupBy("flag").agg(count(lit(1)).as("n_test"),
          sum(when(abs(col("y") * col("ng") - col("sg")) <= col("qhat"), 1L)
            .otherwise(0L)).as("covered"))
      tst.join(qh, "flag").join(tr.select("flag", "ng"), "flag")
        .select(col("flag"), col("n_cal"), col("k"), col("qhat"),
          col("n_test"), col("covered"),
          expr("covered * 1000000 div n_test").as("coverage_ppm"),
          (lit(2L) * expr("qhat div ng")).as("width_cents"))
        .orderBy("flag")
    },

    // Balanced GroupKFold — CV folds that are leakage-safe by construction
    // (every customer's orders land in ONE fold, the q163 discipline) AND
    // size-balanced: groups sorted by row count and dealt round-robin
    // (the greedy-LPT shape scikit-learn's GroupKFold approximates), so a
    // few whale customers can't make one fold 2× another. The sequential
    // part runs on the GROUP CENSUS (one row per customer — the q304
    // window-over-census posture), never the data; rows then join their
    // group's fold by key. Per fold, the row-count deviation from perfect
    // balance, side-by-side with q16-style group HASHING — the measured
    // gap is why balanced dealing exists.
    QueryDef("q326_group_kfold", {
      import graft.functions.Hashes
      s"""WITH gs AS (
         |  SELECT o_custkey AS g, CAST(count(*) AS BIGINT) AS n
         |  FROM orders GROUP BY o_custkey),
         |bal AS (
         |  SELECT g, n,
         |         (row_number() OVER (ORDER BY n DESC, g) - 1) % 5 AS fold
         |  FROM gs),
         |hsh AS (
         |  SELECT g, n, (${Hashes.mulHashSql("g", 29)}) % 5 AS fold
         |  FROM gs),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM gs),
         |b AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_groups,
         |             CAST(sum(n) AS BIGINT) AS rows_bal
         |      FROM bal GROUP BY fold),
         |h AS (SELECT fold, CAST(sum(n) AS BIGINT) AS rows_hash
         |      FROM hsh GROUP BY fold)
         |SELECT b.fold, b.n_groups, b.rows_bal, h.rows_hash,
         |       abs(b.rows_bal * 5 - tot.t) * 1000000 // tot.t
         |         AS bal_dev_ppm,
         |       abs(h.rows_hash * 5 - tot.t) * 1000000 // tot.t
         |         AS hash_dev_ppm
         |FROM b JOIN h USING (fold) CROSS JOIN tot
         |ORDER BY b.fold""".stripMargin
    }) { (s, d) =>
      import graft.functions.Hashes
      import org.apache.spark.sql.expressions.Window
      val gs = Tables.orders(s, d).groupBy(col("o_custkey").as("g"))
        .agg(count(lit(1)).as("n"))
        .persist() // balanced deal + hash fold + total share it
      // groups are customers — row-scale — so the balanced deal ranks via
      // the two-stage zip (round 13); 0-based rank ≡ row_number − 1
      val bal = graft.operators.GlobalRank.zipWithRank(gs,
          Seq(col("n").desc, col("g")), idName = "rk")
        .withColumn("fold", (col("rk") % 5).cast("long"))
      val hsh = gs.withColumn("fold", Hashes.mulHash(col("g"), 29) % 5)
      val tot = broadcast(gs.agg(sum("n").as("t")))
      val b = bal.groupBy("fold").agg(count(lit(1)).as("n_groups"),
        sum("n").as("rows_bal"))
      val h = hsh.groupBy("fold").agg(sum("n").as("rows_hash"))
      b.join(h, "fold").crossJoin(tot)
        .select(col("fold"), col("n_groups"), col("rows_bal"),
          col("rows_hash"),
          expr("abs(rows_bal * 5 - t) * 1000000 div t").as("bal_dev_ppm"),
          expr("abs(rows_hash * 5 - t) * 1000000 div t").as("hash_dev_ppm"))
        .orderBy("fold")
    },

    // Nearest-neighbor covariate matching (the propensity-matching
    // estimator shape; Rubin 1973) — the causal complement to q243's
    // randomized A/B: estimate the urgent-priority effect on order
    // fulfillment by pairing every treated order with the control order
    // of NEAREST total price (1-NN with replacement, $100 caliper). The
    // naive match is a quadratic treated×control join; the 1-D shape
    // collapses it to ONE global sort by the covariate (range-partitioned
    // at scale — Spark's sort shuffle) + two IGNORE-NULLS running-edge
    // windows: the nearest control is always the closest control row to
    // the LEFT or RIGHT in covariate order. Every arithmetic output is an
    // exact integer count/sum; ATT lands in ppm.
    QueryDef("q330_nn_matching",
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x,
        |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
        |           AS treated,
        |         CASE WHEN o_orderstatus = 'F' THEN CAST(1 AS BIGINT)
        |              ELSE CAST(0 AS BIGINT) END AS y
        |  FROM orders),
        |s AS (
        |  SELECT k, x, treated, y,
        |         last_value(CASE WHEN treated = 0 THEN x END IGNORE NULLS)
        |           OVER wp AS px,
        |         last_value(CASE WHEN treated = 0 THEN y END IGNORE NULLS)
        |           OVER wp AS py,
        |         first_value(CASE WHEN treated = 0 THEN x END IGNORE NULLS)
        |           OVER wn AS nx,
        |         first_value(CASE WHEN treated = 0 THEN y END IGNORE NULLS)
        |           OVER wn AS ny
        |  FROM o
        |  WINDOW wp AS (ORDER BY x, treated, k
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |  wn AS (ORDER BY x, treated, k
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        |m AS (
        |  SELECT k, y,
        |         CASE WHEN px IS NULL AND nx IS NULL THEN NULL
        |              WHEN nx IS NULL THEN py
        |              WHEN px IS NULL THEN ny
        |              WHEN x - px <= nx - x THEN py ELSE ny END AS yc,
        |         CASE WHEN px IS NULL AND nx IS NULL THEN NULL
        |              WHEN nx IS NULL THEN x - px
        |              WHEN px IS NULL THEN nx - x
        |              WHEN x - px <= nx - x THEN x - px ELSE nx - x END
        |           AS dist
        |  FROM s WHERE treated = 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_treated,
        |       CAST(sum(CASE WHEN dist <= 10000 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_matched,
        |       CAST(sum(CASE WHEN dist <= 10000 THEN y ELSE 0 END)
        |            AS BIGINT) AS sum_y_treated,
        |       CAST(sum(CASE WHEN dist <= 10000 THEN yc ELSE 0 END)
        |            AS BIGINT) AS sum_y_control,
        |       (CAST(sum(CASE WHEN dist <= 10000 THEN y ELSE 0 END)
        |             AS BIGINT)
        |        - CAST(sum(CASE WHEN dist <= 10000 THEN yc ELSE 0 END)
        |               AS BIGINT)) * 1000000
        |         // CAST(sum(CASE WHEN dist <= 10000 THEN 1 ELSE 0 END)
        |                AS BIGINT) AS att_ppm
        |FROM m""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d).select(
        col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100, 0).cast("long").as("x"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("treated"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val m = graft.operators.NnMatch
        .nearest1d(o, "x", "treated", "k", "y")
        .select(col("k"), col("y"), col("matched_payload").as("yc"),
          col("dist"))
      val inCal = col("dist") <= 10000
      m.agg(count(lit(1)).as("n_treated"),
        sum(when(inCal, 1L).otherwise(0L)).as("n_matched"),
        sum(when(inCal, col("y")).otherwise(0L)).as("sum_y_treated"),
        sum(when(inCal, col("yc")).otherwise(0L)).as("sum_y_control"),
        expr("(sum(CASE WHEN dist <= 10000 THEN y ELSE 0 END)" +
          " - sum(CASE WHEN dist <= 10000 THEN yc ELSE 0 END)) * 1000000" +
          " div sum(CASE WHEN dist <= 10000 THEN 1 ELSE 0 END)")
          .as("att_ppm"))
    },

    // Uplift by targeting decile + Qini — q250 grades a classifier's LIFT;
    // an uplift model is graded on the TREATMENT-EFFECT gradient instead:
    // rank users by a targeting score (activity here), and per decile
    // compare treated vs control conversion — plus the cumulative Qini
    // statistic q(k) = cumconv_t(k) − cumconv_c(k)·cumn_t(k)/cumn_c(k),
    // the area under which is the standard uplift-model metric
    // (Radcliffe 2007). Every cell is an exact integer census count; the
    // per-user table the deciles rank over is the aggregate of the event
    // stream (users ≪ events — the census posture), and Qini is kept
    // exact by cross-multiplying instead of dividing.
    QueryDef("q333_uplift_qini", {
      import graft.functions.Hashes
      s"""WITH u AS (
         |  SELECT user_id,
         |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |              AS BIGINT) AS views,
         |         CASE WHEN sum(CASE WHEN event_type = 'purchase'
         |                            THEN 1 ELSE 0 END) > 0
         |              THEN 1 ELSE 0 END AS conv,
         |         (${Hashes.mulHashSql("user_id", 59)}) % 2 AS arm
         |  FROM events GROUP BY user_id),
         |dec AS (
         |  SELECT arm, conv,
         |         ntile(10) OVER (ORDER BY views DESC, user_id) AS decile
         |  FROM u),
         |cell AS (
         |  SELECT decile,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c_t,
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c_c
         |  FROM dec GROUP BY decile),
         |cum AS (
         |  SELECT decile, n_t, c_t, n_c, c_c,
         |         CAST(sum(n_t) OVER w AS BIGINT) AS cn_t,
         |         CAST(sum(c_t) OVER w AS BIGINT) AS cc_t,
         |         CAST(sum(n_c) OVER w AS BIGINT) AS cn_c,
         |         CAST(sum(c_c) OVER w AS BIGINT) AS cc_c
         |  FROM cell
         |  WINDOW w AS (ORDER BY decile
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT decile, n_t, c_t, n_c, c_c,
         |       CASE WHEN n_t = 0 OR n_c = 0 THEN CAST(0 AS BIGINT)
         |            ELSE c_t * 1000000 // n_t - c_c * 1000000 // n_c
         |       END AS uplift_ppm,
         |       CASE WHEN cn_c = 0 THEN CAST(0 AS BIGINT)
         |            ELSE (cc_t * cn_c - cc_c * cn_t) * 1000000 // cn_c
         |       END AS qini_e6
         |FROM cum ORDER BY decile""".stripMargin
    }) { (s, d) =>
      import graft.functions.Hashes
      import org.apache.spark.sql.expressions.Window
      // per-user deciles: users grow with the data (row-scale relation),
      // so ntile(10) runs as GlobalRank's two-stage zip with exact NTILE
      // bucket arithmetic — NOT a partition-less window. The oracle keeps
      // the plain `ntile(10) OVER (ORDER BY views DESC, user_id)`: the
      // order is total (user_id tie-break), so the bucket of every row is
      // identical under both evaluation strategies (round-13 fix).
      val u = graft.operators.GlobalRank.zipWithNtile(
          Tables.events(s, d).groupBy("user_id")
            .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
                .as("views"),
              when(sum(when(col("event_type") === "purchase", 1L)
                .otherwise(0L)) > 0, 1L).otherwise(0L).as("conv")),
          Seq(col("views").desc, col("user_id")), tiles = 10,
          outName = "decile")
        .select((Hashes.mulHash(col("user_id"), 59) % 2).as("arm"),
          col("conv"), col("decile"))
      val cell = u.groupBy("decile").agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("c_t"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("c_c"))
      val w = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cell.select(col("decile"), col("n_t"), col("c_t"), col("n_c"),
          col("c_c"),
          sum("n_t").over(w).as("cn_t"), sum("c_t").over(w).as("cc_t"),
          sum("n_c").over(w).as("cn_c"), sum("c_c").over(w).as("cc_c"))
        .select(col("decile"), col("n_t"), col("c_t"), col("n_c"),
          col("c_c"),
          expr("CASE WHEN n_t = 0 OR n_c = 0 THEN CAST(0 AS BIGINT)" +
            " ELSE c_t * 1000000 div n_t - c_c * 1000000 div n_c END")
            .as("uplift_ppm"),
          expr("CASE WHEN cn_c = 0 THEN CAST(0 AS BIGINT)" +
            " ELSE (cc_t * cn_c - cc_c * cn_t) * 1000000 div cn_c END")
            .as("qini_e6"))
        .orderBy("decile")
    },

    // Winsorized + trimmed means — the robust-location pair next to
    // q215's MAD: clamp (winsorize) or drop (trim) everything outside the
    // exact per-group [P5, P95] before averaging, so a handful of fat
    // tails can't move the estimate. The percentile bounds are exact
    // order statistics (ceil(0.05n)/ceil(0.95n)-th smallest via the
    // per-group rank window — q322's contract; the sketch path is q96),
    // broadcast back as a 1-row-per-group census; all sums/counts stay
    // exact BIGINTs and the means are integer 1e-2-cent divisions.
    QueryDef("q336_robust_means",
      """WITH v AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS x
        |  FROM lineitem),
        |cnt AS (SELECT flag, CAST(count(*) AS BIGINT) AS n
        |        FROM v GROUP BY flag),
        |kk AS (SELECT flag, n, (5 * n + 99) // 100 AS k05,
        |              (95 * n + 99) // 100 AS k95 FROM cnt),
        |rn AS (SELECT flag, x,
        |              row_number() OVER (PARTITION BY flag ORDER BY x) AS rn
        |       FROM v),
        |p AS (SELECT kk.flag, kk.n, lo.x AS p05, hi.x AS p95
        |      FROM kk JOIN rn lo ON lo.flag = kk.flag AND lo.rn = kk.k05
        |              JOIN rn hi ON hi.flag = kk.flag AND hi.rn = kk.k95),
        |w AS (SELECT v.flag, p.n, p.p05, p.p95,
        |             CASE WHEN x < p05 THEN p05
        |                  WHEN x > p95 THEN p95 ELSE x END AS wx,
        |             CASE WHEN x >= p05 AND x <= p95 THEN x END AS tx
        |      FROM v JOIN p ON v.flag = p.flag)
        |SELECT flag, max(n) AS n, max(p05) AS p05, max(p95) AS p95,
        |       CAST(sum(wx) AS BIGINT) * 100 // max(n) AS win_mean_e2,
        |       CAST(count(tx) AS BIGINT) AS n_trim,
        |       CAST(sum(tx) AS BIGINT) * 100 // CAST(count(tx) AS BIGINT)
        |         AS trim_mean_e2
        |FROM w GROUP BY flag ORDER BY flag""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val v = Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("x"))
        .persist() // rank window + clamp pass
      val kk = v.groupBy("flag").agg(count(lit(1)).as("n"))
        .select(col("flag"), col("n"),
          expr("(5 * n + 99) div 100").as("k05"),
          expr("(95 * n + 99) div 100").as("k95"))
      val rn = v.withColumn("rn",
        row_number().over(Window.partitionBy("flag").orderBy("x")))
      val p = rn.join(broadcast(kk), Seq("flag"))
        .where(col("rn") === col("k05") || col("rn") === col("k95"))
        .groupBy("flag").agg(max("n").as("n"),
          min(when(col("rn") === col("k05"), col("x"))).as("p05"),
          min(when(col("rn") === col("k95"), col("x"))).as("p95"))
      v.join(broadcast(p), "flag")
        .select(col("flag"), col("n"), col("p05"), col("p95"),
          when(col("x") < col("p05"), col("p05"))
            .when(col("x") > col("p95"), col("p95"))
            .otherwise(col("x")).as("wx"),
          when(col("x") >= col("p05") && col("x") <= col("p95"), col("x"))
            .as("tx"))
        .groupBy("flag").agg(max("n").as("n"), max("p05").as("p05"),
          max("p95").as("p95"),
          expr("sum(wx) * 100 div max(n)").as("win_mean_e2"),
          count(col("tx")).as("n_trim"),
          expr("sum(tx) * 100 div count(tx)").as("trim_mean_e2"))
        .orderBy("flag")
    },

    // A/B sample-size (power) analysis — the question every experiment
    // review starts with: at the OBSERVED baseline conversion rate, how
    // many users per arm does it take to detect an absolute lift of
    // 1/2/5 points at α=0.05 (two-sided) with 80% power? n per arm =
    // (z_{α/2}+z_β)²·2p̄(1−p̄)/δ². The normal quantiles are fixed
    // published constants embedded identically in both engines (the SPRT
    // literal posture); the baseline p comes from the conversion census
    // (exact integers), and each row's n is one stated double expression
    // rounded up. The answer pairs with q243 (the test those samples
    // feed) and q334 (the sequential alternative when n is too dear).
    QueryDef("q338_power_analysis", {
      val z2 = "2.8016" // z_{0.025} + z_{0.20} = 1.9600 + 0.8416
      s"""WITH u AS (
         |  SELECT user_id,
         |         CASE WHEN sum(CASE WHEN event_type = 'purchase'
         |                            THEN 1 ELSE 0 END) > 0
         |              THEN 1 ELSE 0 END AS conv
         |  FROM events GROUP BY user_id),
         |c AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
         |             CAST(sum(conv) AS BIGINT) AS n_conv FROM u),
         |d AS (SELECT unnest([10000, 20000, 50000]) AS delta_ppm)
         |SELECT d.delta_ppm, c.n_users, c.n_conv,
         |       c.n_conv * 1000000 // c.n_users AS baseline_ppm,
         |       CAST(ceil(
         |         CAST($z2 AS DOUBLE) * CAST($z2 AS DOUBLE)
         |           * 2 * (CAST(c.n_conv AS DOUBLE) / c.n_users)
         |           * (1 - CAST(c.n_conv AS DOUBLE) / c.n_users)
         |           / ((CAST(d.delta_ppm AS DOUBLE) / 1000000)
         |              * (CAST(d.delta_ppm AS DOUBLE) / 1000000)))
         |         AS BIGINT) AS n_per_arm
         |FROM c CROSS JOIN d ORDER BY delta_ppm""".stripMargin
    }) { (s, d) =>
      val z2 = lit(2.8016)
      val u = Tables.events(s, d).groupBy("user_id")
        .agg(when(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)) > 0, 1L).otherwise(0L).as("conv"))
      val c = broadcast(u.agg(count(lit(1)).as("n_users"),
        sum("conv").as("n_conv")))
      val deltas = s.range(1).select(
        explode(array(lit(10000L), lit(20000L), lit(50000L)))
          .as("delta_ppm"))
      val p = col("n_conv").cast("double") / col("n_users")
      val dd = col("delta_ppm").cast("double") / 1000000
      c.crossJoin(deltas)
        .select(col("delta_ppm"), col("n_users"), col("n_conv"),
          expr("n_conv * 1000000 div n_users").as("baseline_ppm"),
          ceil(z2 * z2 * 2 * p * (lit(1) - p) / (dd * dd)).cast("long")
            .as("n_per_arm"))
        .orderBy("delta_ppm")
    },

    // Cross-validated AUC stability — a single AUC (q218) says nothing
    // about VARIANCE; model review wants the per-fold spread. Five
    // hash-assigned folds, each scored by the fixed q250 sigmoid index,
    // each fold's AUC from the rank-sum identity AUC = (R₊ − n₊(n₊+1)/2)
    // / (n₊n₋) — computed on the per-(fold, score) census with doubled
    // average ranks (the q321 trick: ranks never materialize per row, the
    // window runs over the census partitioned by fold). The cross-fold
    // max−min spread rides on every row; all arithmetic is exact integer
    // ppm.
    QueryDef("q340_cv_auc", {
      val sc = embSigSql(
        s"(${graft.functions.Hashes.mulHashSql("vec_id", 37)}) % 5 AS fold," +
          " CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS pos")
      s"""WITH s AS (SELECT fold, pos, p_e6 FROM ($sc)),
         |census AS (
         |  SELECT fold, p_e6, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(pos) AS BIGINT) AS np
         |  FROM s GROUP BY fold, p_e6),
         |ranked AS (
         |  SELECT fold, n, np,
         |         2 * CAST(coalesce(sum(n) OVER (PARTITION BY fold
         |             ORDER BY p_e6
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) + n + 1 AS ar2
         |  FROM census),
         |f AS (
         |  SELECT fold, CAST(sum(np) AS BIGINT) AS n_pos,
         |         CAST(sum(n) - sum(np) AS BIGINT) AS n_neg,
         |         CAST(sum(np * ar2) AS BIGINT) AS r2_pos
         |  FROM ranked GROUP BY fold),
         |a AS (
         |  SELECT fold, n_pos, n_neg,
         |         (r2_pos - 2 * n_pos * (n_pos + 1) // 2) * 500000
         |           // (n_pos * n_neg) AS auc_ppm
         |  FROM f)
         |SELECT a.fold, a.n_pos, a.n_neg, a.auc_ppm,
         |       (SELECT max(auc_ppm) - min(auc_ppm) FROM a) AS spread_ppm
         |FROM a ORDER BY a.fold""".stripMargin
    }) { (s, d) =>
      import graft.functions.Hashes
      import org.apache.spark.sql.expressions.Window
      val sRel = embSigmoid(s, d)
        .select((Hashes.mulHash(col("vec_id"), 37) % 5).as("fold"),
          when(col("label") % 2 === 0, 1L).otherwise(0L).as("pos"),
          col("p_e6"))
      val census = sRel.groupBy("fold", "p_e6")
        .agg(count(lit(1)).as("n"), sum("pos").as("np"))
      val wPre = Window.partitionBy("fold").orderBy("p_e6")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = census.select(col("fold"), col("n"), col("np"),
        (lit(2L) * coalesce(sum("n").over(wPre), lit(0L)) + col("n") + 1L)
          .as("ar2"))
      val f = ranked.groupBy("fold").agg(sum("np").as("n_pos"),
        (sum("n") - sum("np")).as("n_neg"),
        sum(col("np") * col("ar2")).as("r2_pos"))
      val a = f.select(col("fold"), col("n_pos"), col("n_neg"),
        expr("(r2_pos - 2 * n_pos * (n_pos + 1) div 2) * 500000" +
          " div (n_pos * n_neg)").as("auc_ppm"))
        .persist() // rows + the spread census
      val spread = broadcast(a.agg(
        (max("auc_ppm") - min("auc_ppm")).as("spread_ppm")))
      a.crossJoin(spread)
        .select(col("fold"), col("n_pos"), col("n_neg"), col("auc_ppm"),
          col("spread_ppm"))
        .orderBy("fold")
    },

    // 1-D Wasserstein (earth-mover) distance — the drift metric that sees
    // what q191's PSI bins and q192's KS sup-gap blur: W₁ = ∫|F_A − F_B|dx
    // integrates BOTH how far and how much mass moved, in the metric's own
    // units (cents here). Discrete exact form: over the sorted value
    // census, Σ |cumA·n_B − cumB·n_A| · gap / (n_A·n_B) — cumulative
    // counts and gaps are exact integers, the cross-multiplied terms ride
    // in DECIMAL(38,0) (the q305 overflow posture), and one integer
    // division lands the answer in 1e-2 cents. Distributions: purchase
    // values of the two q321 hash arms.
    QueryDef("q341_wasserstein", {
      import graft.functions.Hashes
      s"""WITH p AS (
         |  SELECT (${Hashes.mulHashSql("user_id", 97)}) % 2 AS arm,
         |         CAST(round(value * 100, 0) AS BIGINT) AS x
         |  FROM events WHERE event_type = 'purchase'),
         |census AS (
         |  SELECT x,
         |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS na,
         |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS nb
         |  FROM p GROUP BY x),
         |tot AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
         |               CAST(sum(nb) AS BIGINT) AS tb FROM census),
         |cum AS (
         |  SELECT x,
         |         CAST(sum(na) OVER w AS BIGINT) AS ca,
         |         CAST(sum(nb) OVER w AS BIGINT) AS cb,
         |         lead(x) OVER (ORDER BY x) AS nx
         |  FROM census
         |  WINDOW w AS (ORDER BY x
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |terms AS (
         |  SELECT abs(CAST(ca AS DECIMAL(38, 0)) * tb
         |             - CAST(cb AS DECIMAL(38, 0)) * ta)
         |           * (nx - x) AS term
         |  FROM cum CROSS JOIN tot WHERE nx IS NOT NULL)
         |SELECT tot.ta AS n_a, tot.tb AS n_b,
         |       CAST(floor(sum(term) * 100 / (CAST(tot.ta AS DECIMAL(38, 0))
         |         * tot.tb)) AS BIGINT) AS w1_e2_cents
         |FROM terms CROSS JOIN tot GROUP BY tot.ta, tot.tb""".stripMargin
    }) { (s, d) =>
      import graft.functions.Hashes
      import org.apache.spark.sql.expressions.Window
      val p = Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .select((Hashes.mulHash(col("user_id"), 97) % 2).as("arm"),
          round(col("value") * 100, 0).cast("long").as("x"))
      val census = p.groupBy("x").agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"))
        .persist() // totals + cumulative pass
      val tot = broadcast(census.agg(sum("na").as("ta"), sum("nb").as("tb")))
      val wCum = Window.orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = census.select(col("x"),
        sum("na").over(wCum).as("ca"), sum("nb").over(wCum).as("cb"),
        lead("x", 1).over(Window.orderBy("x")).as("nx"))
      val dec = "decimal(38,0)"
      cum.crossJoin(tot).where(col("nx").isNotNull)
        .select(col("ta"), col("tb"),
          (abs(col("ca").cast(dec) * col("tb") - col("cb").cast(dec)
            * col("ta")) * (col("nx") - col("x"))).as("term"))
        .groupBy("ta", "tb").agg(
          floor(sum("term") * 100 / (col("ta").cast(dec) * col("tb")))
            .cast("long").as("w1_e2_cents"))
        .select(col("ta").as("n_a"), col("tb").as("n_b"),
          col("w1_e2_cents"))
    },

    // Optimal operating point by Youden's J — q217 diagnoses calibration
    // and q218 grades ranking; DEPLOYING the classifier needs a threshold,
    // and J = TPR − FPR picks the point that maximizes balanced
    // informedness. Every distinct score is a candidate threshold: one
    // score census, suffix-sum windows (score descending) give TP/FP at
    // every candidate simultaneously, and the argmax is a top-1 over the
    // census (ties → the LOWER threshold, stated identically). All counts
    // exact BIGINTs; J in integer ppm.
    QueryDef("q346_youden_threshold", {
      val sc = embSigSql("CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS pos")
      s"""WITH s AS (SELECT pos, p_e6 FROM ($sc)),
        |census AS (
        |  SELECT p_e6, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(pos) AS BIGINT) AS np
        |  FROM s GROUP BY p_e6),
        |tot AS (SELECT CAST(sum(np) AS BIGINT) AS p,
        |               CAST(sum(n) - sum(np) AS BIGINT) AS neg FROM census),
        |suf AS (
        |  SELECT p_e6,
        |         CAST(sum(np) OVER w AS BIGINT) AS tp,
        |         CAST(sum(n - np) OVER w AS BIGINT) AS fp
        |  FROM census
        |  WINDOW w AS (ORDER BY p_e6 DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |j AS (
        |  SELECT p_e6 AS threshold_e6, tp, fp,
        |         tot.p - tp AS fn, tot.neg - fp AS tn,
        |         tp * 1000000 // tot.p - fp * 1000000 // tot.neg AS j_ppm
        |  FROM suf CROSS JOIN tot)
        |SELECT threshold_e6, tp, fp, fn, tn, j_ppm FROM j
        |ORDER BY j_ppm DESC, threshold_e6 LIMIT 1""".stripMargin
    }) { (s, d) =>
      val sRel = embSigmoid(s, d)
        .select(when(col("label") % 2 === 0, 1L).otherwise(0L).as("pos"),
          col("p_e6"))
      val census = sRel.groupBy("p_e6")
        .agg(count(lit(1)).as("n"), sum("pos").as("np"))
        .persist() // totals + suffix pass
      val tot = broadcast(census.agg(sum("np").as("p"),
        (sum("n") - sum("np")).as("neg")))
      // both suffix walks (tp over np, fp over n−np) ride ONE two-pass
      // PrefixSum down the DESC score order (round 14) — bit-identical to
      // the partition-less windows; the oracle keeps the plain window text
      graft.operators.PrefixSum.cumsumN(
          census.withColumn("nn", col("n") - col("np")),
          Seq(col("p_e6").desc), Seq("np" -> "tp", "nn" -> "fp"),
          inclusive = true)
        .select(col("p_e6"), col("tp"), col("fp"))
        .crossJoin(tot)
        .select(col("p_e6").as("threshold_e6"), col("tp"), col("fp"),
          (col("p") - col("tp")).as("fn"), (col("neg") - col("fp")).as("tn"),
          expr("tp * 1000000 div p - fp * 1000000 div neg").as("j_ppm"))
        .orderBy(col("j_ppm").desc, col("threshold_e6")).limit(1)
    },

    // One-way ANOVA F — do the three return-flag populations share a mean
    // quantity? The k-group generalization the test family still lacked
    // (q243 two proportions, q321 two distributions, q331 2×2). The trap
    // this query exists to dodge: Σ_g S_g²/n_g is a cross-group FLOAT sum
    // whose order neither engine guarantees — so the three groups pivot
    // into ONE ROW of nine exact BIGINT moments (one conditional-sum
    // pass, the q331 cells posture) and F = (SSB/(k−1))/(SSW/(N−k)) is a
    // single FIXED-ORDER double expression over them. η² (effect size)
    // rides along. Quantities are exact integers in the fixture, so the
    // moment census is exact.
    QueryDef("q347_anova_f",
      """WITH q AS (
        |  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS y
        |  FROM lineitem),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN flag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN flag = 'A' THEN y ELSE 0 END) AS BIGINT) AS s_a,
        |    CAST(sum(CASE WHEN flag = 'A' THEN y * y ELSE 0 END) AS BIGINT) AS ss_a,
        |    CAST(sum(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_n,
        |    CAST(sum(CASE WHEN flag = 'N' THEN y ELSE 0 END) AS BIGINT) AS s_n,
        |    CAST(sum(CASE WHEN flag = 'N' THEN y * y ELSE 0 END) AS BIGINT) AS ss_n,
        |    CAST(sum(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
        |    CAST(sum(CASE WHEN flag = 'R' THEN y ELSE 0 END) AS BIGINT) AS s_r,
        |    CAST(sum(CASE WHEN flag = 'R' THEN y * y ELSE 0 END) AS BIGINT) AS ss_r
        |  FROM q),
        |f AS (
        |  SELECT n_a, n_n, n_r, n_a + n_n + n_r AS nt,
        |         CAST(s_a AS DOUBLE) * s_a / n_a
        |           + CAST(s_n AS DOUBLE) * s_n / n_n
        |           + CAST(s_r AS DOUBLE) * s_r / n_r AS grp,
        |         CAST(s_a + s_n + s_r AS DOUBLE) AS st,
        |         CAST(ss_a + ss_n + ss_r AS DOUBLE) AS sst
        |  FROM c)
        |SELECT n_a, n_n, n_r, nt,
        |       CAST(round((grp - st * st / nt) / 2
        |         / ((sst - grp) / (nt - 3)) * 1000000, 0) AS BIGINT)
        |         AS f_e6,
        |       CAST(round((grp - st * st / nt)
        |         / (sst - st * st / nt) * 1000000, 0) AS BIGINT)
        |         AS eta2_e6
        |FROM f""".stripMargin) { (s, d) =>
      val q = Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("y"))
      def cell(fl: String, what: org.apache.spark.sql.Column, name: String) =
        sum(when(col("flag") === fl, what).otherwise(0L)).as(name)
      val c = q.agg(
        cell("A", lit(1L), "n_a"), cell("A", col("y"), "s_a"),
        cell("A", col("y") * col("y"), "ss_a"),
        cell("N", lit(1L), "n_n"), cell("N", col("y"), "s_n"),
        cell("N", col("y") * col("y"), "ss_n"),
        cell("R", lit(1L), "n_r"), cell("R", col("y"), "s_r"),
        cell("R", col("y") * col("y"), "ss_r"))
      val grp = col("s_a").cast("double") * col("s_a") / col("n_a") +
        col("s_n").cast("double") * col("s_n") / col("n_n") +
        col("s_r").cast("double") * col("s_r") / col("n_r")
      val st = (col("s_a") + col("s_n") + col("s_r")).cast("double")
      val sst = (col("ss_a") + col("ss_n") + col("ss_r")).cast("double")
      val nt = col("n_a") + col("n_n") + col("n_r")
      c.select(col("n_a"), col("n_n"), col("n_r"), nt.as("nt"),
        round((grp - st * st / nt) / 2 / ((sst - grp) / (nt - 3))
          * 1000000, 0).cast("long").as("f_e6"),
        round((grp - st * st / nt) / (sst - st * st / nt) * 1000000, 0)
          .cast("long").as("eta2_e6"))
    },

    // RANSAC robust line fit (Fischler & Bolles 1981) — the hypothesize-
    // and-verify complement to q255's Theil-Sen: points carry a planted
    // y = 5x + 7 band plus 10% far outliers (both declared salted-hash
    // functions of the row key, so both engines state the SAME corrupted
    // data). Eight hypothesis lines, each through the struct-min/max
    // points (by a per-hypothesis salted hash — the deterministic stand-in
    // for RANSAC's random pair draw) of a ~1% hash subset; the consensus
    // vote is the data × 8-row-broadcast pass with an EXACT integer
    // point-to-line test (|dy·(x−x1) − dx·(y−y1)| ≤ t·|dx| — cross-
    // multiplied, no division), and the winner is refit by exact-integer
    // least squares on its inliers (decimal(38) headroom for the moment
    // products). Shuffle shape: two broadcast passes over the data + an
    // 8-group aggregate — no data-sized exchange at all.
    QueryDef("q353_ransac", {
      def h(key: String, seed: String): String =
        s"(((((($key) % 100003 + 100003 + ($seed)) * 2654435761) " +
          s"% 1000000007) * (2 * ($seed) + 1)) % 1000000007)"
      val inl = "dx <> 0 AND abs(dy * (x - x1) - dx * (y - y1)) <= 25 * abs(dx)"
      s"""WITH p0 AS (
         |  SELECT l_orderkey * 8 + l_linenumber AS k,
         |         CAST(l_quantity AS BIGINT) AS x
         |  FROM lineitem),
         |pts AS MATERIALIZED (
         |  SELECT k, x,
         |         5 * x + 7 + ((${h("k", "301")}) % 21 - 10)
         |           + CASE WHEN (${h("k", "303")}) % 10 = 0
         |                  THEN 400 ELSE 0 END AS y
         |  FROM p0),
         |hs AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS h),
         |sub AS (
         |  SELECT h, k, x, y, ${h("k", "400 + h")} AS hk
         |  FROM pts, hs
         |  WHERE (${h("k", "310 + h")}) % 97 = 0),
         |hyp AS (
         |  SELECT h, min({'hk': hk, 'k': k, 'x': x, 'y': y}) AS p1,
         |            max({'hk': hk, 'k': k, 'x': x, 'y': y}) AS p2
         |  FROM sub GROUP BY h),
         |hy AS MATERIALIZED (
         |  SELECT h, p1.x AS x1, p1.y AS y1, p2.x AS x2, p2.y AS y2,
         |         p2.x - p1.x AS dx, p2.y - p1.y AS dy
         |  FROM hyp),
         |votes AS MATERIALIZED (
         |  SELECT hy.h,
         |         CAST(count(*) FILTER (WHERE $inl) AS BIGINT) AS inliers
         |  FROM pts, hy GROUP BY hy.h),
         |best AS MATERIALIZED (
         |  SELECT hy.h AS best_h, x1, y1, dx, dy
         |  FROM hy JOIN votes ON votes.h = hy.h
         |  ORDER BY votes.inliers DESC, hy.h LIMIT 1),
         |agg AS (
         |  SELECT max(best_h) AS best_h, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |         CAST(sum(x * y) AS BIGINT) AS sxy,
         |         CAST(sum(x * x) AS BIGINT) AS sxx
         |  FROM pts, best WHERE $inl),
         |res AS (
         |  SELECT best_h,
         |    CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
         |      * 1000000 // (CAST(n AS HUGEINT) * sxx
         |                    - CAST(sx AS HUGEINT) * sx) AS BIGINT)
         |      AS slope_e6
         |  FROM agg),
         |res2 AS (
         |  SELECT r.best_h, r.slope_e6,
         |    CAST((CAST(a.sy AS HUGEINT) * 1000000 - CAST(r.slope_e6
         |      AS HUGEINT) * a.sx) // a.n AS BIGINT) AS intercept_e6
         |  FROM res r, agg a)
         |SELECT v.h, v.inliers, hy.x1, hy.y1, hy.x2, hy.y2,
         |       res2.best_h, res2.slope_e6, res2.intercept_e6
         |FROM votes v JOIN hy ON hy.h = v.h, res2
         |ORDER BY v.h""".stripMargin
    }) { (s, d) =>
      import graft.functions.Hashes
      def hc(key: org.apache.spark.sql.Column,
             seed: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        (((key % Hashes.PreMod + Hashes.PreMod + seed) * Hashes.Mult)
          % Hashes.Prime) * (seed * 2 + 1) % Hashes.Prime
      def inlier(df: org.apache.spark.sql.DataFrame) = df.where(
        col("dx") =!= 0 && abs(col("dy") * (col("x") - col("x1"))
          - col("dx") * (col("y") - col("y1"))) <= lit(25) * abs(col("dx")))
      val pts = Tables.lineitem(s, d)
        .select((col("l_orderkey") * 8 + col("l_linenumber")).as("k"),
          col("l_quantity").cast("long").as("x"))
        .withColumn("y", lit(5) * col("x") + 7
          + (hc(col("k"), lit(301L)) % 21 - 10)
          + when(hc(col("k"), lit(303L)) % 10 === 0, 400).otherwise(0))
        .persist() // hypothesis sample + vote pass + refit pass
      val hsRows = s.range(0, 8).select(col("id").as("h"))
      val sub = pts.crossJoin(broadcast(hsRows))
        .where(hc(col("k"), lit(310L) + col("h")) % 97 === 0)
        .withColumn("hk", hc(col("k"), lit(400L) + col("h")))
      val hyp = sub.groupBy("h").agg(
        min(struct(col("hk"), col("k"), col("x"), col("y"))).as("p1"),
        max(struct(col("hk"), col("k"), col("x"), col("y"))).as("p2"))
      val hy = hyp.select(col("h"),
          col("p1.x").as("x1"), col("p1.y").as("y1"),
          col("p2.x").as("x2"), col("p2.y").as("y2"),
          (col("p2.x") - col("p1.x")).as("dx"),
          (col("p2.y") - col("p1.y")).as("dy"))
        .persist() // vote pass + best + final join
      val votes = inlier(pts.crossJoin(broadcast(hy)))
        .groupBy("h").agg(count(lit(1)).as("inliers"))
        .join(hy.select("h"), Seq("h"), "right")
        .select(col("h"), coalesce(col("inliers"), lit(0L)).as("inliers"))
        .persist() // best + final output
      val best = hy.join(votes, "h")
        .orderBy(col("inliers").desc, col("h")).limit(1)
        .select(col("h").as("best_h"), col("x1"), col("y1"),
          col("dx"), col("dy"))
      val agg = inlier(pts.crossJoin(broadcast(best)))
        .agg(max("best_h").as("best_h"), count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
      val res = agg.select(col("best_h"),
        expr("""cast((cast(n as decimal(38,0)) * sxy
                - cast(sx as decimal(38,0)) * sy) * 1000000
               div (cast(n as decimal(38,0)) * sxx
                - cast(sx as decimal(38,0)) * sx) as bigint)""")
          .as("slope_e6"), col("sx"), col("sy"), col("n"))
      val res2 = res.select(col("best_h"), col("slope_e6"),
        expr("""cast((cast(sy as decimal(38,0)) * 1000000
                - cast(slope_e6 as decimal(38,0)) * sx) div n as bigint)""")
          .as("intercept_e6"))
      votes.join(hy, "h").crossJoin(broadcast(res2))
        .select(col("h"), col("inliers"), col("x1"), col("y1"), col("x2"),
          col("y2"), col("best_h"), col("slope_e6"), col("intercept_e6"))
        .orderBy("h")
    },

    // Rank-1 ALS matrix factorization — the recommender-system kernel
    // (Koren et al. 2009) on the (customer, part, quantity) rating
    // relation: alternate u_c ← Σrv/Σv² and v_p ← Σru/Σu² for three
    // half-sweeps from v≡1, entirely in 1e-6 fixed point — every sweep is
    // the SAME stated integer formula f' = Σ(r·f)·1e6 div Σ(f² div 1e6),
    // so both engines land on identical factors with no float crossing a
    // row boundary. This is THE canonical ALS shuffle: each half-sweep
    // joins the ratings against the opposite side's factor relation
    // (key-partitioned equi-join — factors are DATA-sized, never assumed
    // broadcastable) and aggregates by its own key — two exchanges per
    // sweep, linear rows, no all-pairs anything. Fit quality lands as an
    // exact-integer MSE (decimal-128 headroom for the e24-unit squared
    // residuals). Output: the 10 strongest item factors + global MSE.
    QueryDef("q354_als_rank1",
      """WITH r AS MATERIALIZED (
        |  SELECT o_custkey AS u, l_partkey AS i,
        |         CAST(l_quantity AS BIGINT) AS r
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |u1 AS MATERIALIZED (
        |  SELECT u, CAST(sum(r * 1000000) * 1000000 // sum(1000000)
        |    AS BIGINT) AS uf
        |  FROM r GROUP BY u),
        |v1 AS MATERIALIZED (
        |  SELECT i, CAST(sum(r.r * u1.uf) * 1000000
        |      // sum(u1.uf * u1.uf // 1000000) AS BIGINT) AS vf,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM r JOIN u1 ON u1.u = r.u GROUP BY i),
        |u2 AS MATERIALIZED (
        |  SELECT r.u, CAST(sum(r.r * v1.vf) * 1000000
        |      // sum(v1.vf * v1.vf // 1000000) AS BIGINT) AS uf
        |  FROM r JOIN v1 ON v1.i = r.i GROUP BY r.u),
        |pred AS (
        |  SELECT r.r * 1000000000000 - u2.uf * v1.vf AS res
        |  FROM r JOIN u2 ON u2.u = r.u JOIN v1 ON v1.i = r.i),
        |fit AS (
        |  SELECT CAST(sum(CAST(res AS HUGEINT) * res)
        |      // (CAST(count(*) AS HUGEINT)
        |         * 1000000000000000000) AS BIGINT) AS mse_e6,
        |    CAST(count(*) AS BIGINT) AS n_total
        |  FROM pred)
        |SELECT v1.i AS item, v1.vf AS v_e6, v1.cnt, fit.mse_e6, fit.n_total
        |FROM v1, fit ORDER BY v1.vf DESC, v1.i LIMIT 10""".stripMargin) {
      (s, d) =>
      val dec = "decimal(38,0)"
      val r = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("u"), col("l_partkey").as("i"),
          col("l_quantity").cast("long").as("r"))
        .persist() // three half-sweeps + the residual pass share it
      val u1 = r.groupBy("u")
        .agg(sum(col("r") * 1000000L).as("num"), sum(lit(1000000L)).as("den"))
        .select(col("u"),
          expr(s"cast(cast(num as $dec) * 1000000 div den as bigint)")
            .as("uf"))
      val v1 = r.join(u1, "u")
        .groupBy("i")
        .agg(sum((col("r") * col("uf")).cast(dec)).as("num"),
          sum(expr("uf * uf div 1000000")).as("den"),
          count(lit(1)).as("cnt"))
        .select(col("i"), expr(s"cast(num * 1000000 div den as bigint)")
          .as("vf"), col("cnt"))
        .persist() // u2 sweep + residual pass + final top-10
      val u2 = r.join(v1, "i")
        .groupBy("u")
        .agg(sum((col("r") * col("vf")).cast(dec)).as("num"),
          sum(expr("vf * vf div 1000000")).as("den"))
        .select(col("u"), expr(s"cast(num * 1000000 div den as bigint)")
          .as("uf"))
      val pred = r.join(u2, "u").join(v1.select("i", "vf"), "i")
        .select((col("r") * 1000000000000L
          - col("uf") * col("vf")).as("res"))
      val fit = pred.agg(
        sum(expr(s"cast(res as $dec) * res")).as("sse"),
        count(lit(1)).as("n_total"))
        .select(expr(s"cast(sse div (cast(n_total as $dec)" +
          " * 1000000000000000000) as bigint)").as("mse_e6"),
          col("n_total"))
      v1.crossJoin(broadcast(fit))
        .select(col("i").as("item"), col("vf").as("v_e6"), col("cnt"),
          col("mse_e6"), col("n_total"))
        .orderBy(col("v_e6").desc, col("item"))
        .limit(10)
    },

    // Gradient-alignment data valuation — the TracIn-style attribution
    // (Pruthi et al. NeurIPS 2020) a curation pipeline runs before paying
    // for retraining sweeps: which SOURCE's gradient agrees with the
    // consensus direction? At w = 0 the logistic gradient is exactly
    // Σ(σ(0) − y)·x = ½·Σ(1 − 2y)·x — the ½ cancels in the projection
    // ratio, so the per-source gradients are EXACT integer censuses (one
    // group-aggregate over the corpus, k = sources rows of statistics),
    // and each source's value is its projection onto the total gradient,
    // proj_s = ⟨g_s, G⟩/⟨G, G⟩ in ppm (Σ_s proj_s = 1e6 up to flooring).
    // Negative projections (sources whose examples PULL AGAINST the
    // consensus) are the interesting output — candidates for downweighting
    // in the q105 mixture. One exchange, broadcast 1-row total, integer
    // end to end.
    QueryDef("q359_grad_valuation",
      """WITH b AS (
        |  SELECT source, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |         n_chars // 100 AS x1, doc_id % 7 AS x2
        |  FROM documents),
        |gs AS MATERIALIZED (
        |  SELECT source, CAST(sum(1 - 2 * y) AS BIGINT) AS g0,
        |         CAST(sum((1 - 2 * y) * x1) AS BIGINT) AS g1,
        |         CAST(sum((1 - 2 * y) * x2) AS BIGINT) AS g2
        |  FROM b GROUP BY source),
        |gt AS (SELECT CAST(sum(g0) AS BIGINT) AS t0,
        |              CAST(sum(g1) AS BIGINT) AS t1,
        |              CAST(sum(g2) AS BIGINT) AS t2 FROM gs)
        |SELECT gs.source, g0, g1, g2,
        |       CAST(g0 * t0 + g1 * t1 + g2 * t2 AS BIGINT) AS dot,
        |       CAST((g0 * t0 + g1 * t1 + g2 * t2) * 1000000
        |         // (t0 * t0 + t1 * t1 + t2 * t2) AS BIGINT) AS proj_ppm
        |FROM gs, gt ORDER BY gs.source""".stripMargin) { (s, d) =>
      val b = Tables.documents(s, d)
        .select(col("source"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"),
          expr("n_chars div 100").as("x1"), (col("doc_id") % 7).as("x2"))
      val gs = b.groupBy("source")
        .agg(sum(lit(1) - lit(2) * col("y")).as("g0"),
          sum((lit(1) - lit(2) * col("y")) * col("x1")).as("g1"),
          sum((lit(1) - lit(2) * col("y")) * col("x2")).as("g2"))
        .persist() // total census + per-source projection
      val gt = gs.agg(sum("g0").as("t0"), sum("g1").as("t1"),
        sum("g2").as("t2"))
      gs.crossJoin(broadcast(gt))
        .select(col("source"), col("g0"), col("g1"), col("g2"),
          (col("g0") * col("t0") + col("g1") * col("t1")
            + col("g2") * col("t2")).as("dot"),
          expr("""cast((g0 * t0 + g1 * t1 + g2 * t2) * 1000000
                 div (t0 * t0 + t1 * t1 + t2 * t2) as bigint)""")
            .as("proj_ppm"))
        .orderBy("source")
    },

    // Embedding whitening (Su et al. 2021, arXiv:2103.15316) — the
    // retrieval-quality transform that decorrelates the embedding space:
    // x' = L⁻¹(x − μ) with Σ = LLᵀ the Cholesky factor of the covariance.
    // Determinism follows the q276/PowerIteration statistics posture: the
    // head-4 covariance census is EXACT integers (per-row e3 quantization
    // before any cross-row sum), the 4×4 Cholesky + forward-substitution
    // inverse is a FIXED sequence of IEEE double ops with a 1e-9 snap
    // after every entry — identical on the driver and in the oracle's
    // unrolled CTE chain — and the whitened covariance WITNESS (≈1e6 on
    // the diagonal, ≈0 off it: the point of whitening) is again an exact
    // integer census of e3-quantized transformed values. Two corpus scans
    // total; everything between them is a 14-number census (driver math,
    // broadcast literals) — the scaler fit/apply shape at any scale.
    QueryDef("q361_whitening", {
      val pairsIdx = for (i <- 1 to 4; j <- 1 to i) yield (i, j)
      def xq(j: Int) =
        s"CAST(round(CAST(embedding[$j] AS DOUBLE) * 1000, 0) AS BIGINT)"
      val censusCols = (1 to 4).map(j => s"CAST(sum(x$j) AS BIGINT) AS s$j") ++
        pairsIdx.map { case (i, j) =>
          s"CAST(sum(x$i * x$j) AS BIGINT) AS p$i$j" }
      val covCols = pairsIdx.map { case (i, j) =>
        s"CAST(n * p$i$j - s$i * s$j AS DOUBLE)" +
          s" / (CAST(n AS DOUBLE) * n * 1000000.0) AS c$i$j" }
      val chol = Seq(
        "l11" -> "round(sqrt(c11), 9)",
        "l21" -> "round(c21 / l11, 9)",
        "l31" -> "round(c31 / l11, 9)",
        "l41" -> "round(c41 / l11, 9)",
        "l22" -> "round(sqrt(c22 - l21 * l21), 9)",
        "l32" -> "round((c32 - l31 * l21) / l22, 9)",
        "l42" -> "round((c42 - l41 * l21) / l22, 9)",
        "l33" -> "round(sqrt(c33 - l31 * l31 - l32 * l32), 9)",
        "l43" -> "round((c43 - l41 * l31 - l42 * l32) / l33, 9)",
        "l44" -> "round(sqrt(c44 - l41 * l41 - l42 * l42 - l43 * l43), 9)",
        "m11" -> "round(1.0 / l11, 9)",
        "m22" -> "round(1.0 / l22, 9)",
        "m33" -> "round(1.0 / l33, 9)",
        "m44" -> "round(1.0 / l44, 9)",
        "m21" -> "round(-(l21 * m11) / l22, 9)",
        "m31" -> "round(-(l31 * m11 + l32 * m21) / l33, 9)",
        "m32" -> "round(-(l32 * m22) / l33, 9)",
        "m41" -> "round(-(l41 * m11 + l42 * m21 + l43 * m31) / l44, 9)",
        "m42" -> "round(-(l42 * m22 + l43 * m32) / l44, 9)",
        "m43" -> "round(-(l43 * m33) / l44, 9)")
      val cholCtes = chol.zipWithIndex.map { case ((name, e), k) =>
        s"t${k + 1} AS (SELECT *, $e AS $name FROM t$k)" }.mkString(",\n")
      val tLast = s"t${chol.size}"
      def zc(j: Int) =
        s"(CAST(${xq(j)} AS DOUBLE) / 1000.0" +
          s" - (CAST(s$j AS DOUBLE) / (CAST(n AS DOUBLE) * 1000.0)))"
      def qExpr(i: Int) = {
        val terms = (1 to i).map(j => s"m$i$j * ${zc(j)}").mkString(" + ")
        s"CAST(round(($terms) * 1000, 0) AS BIGINT) AS q$i"
      }
      val wCols = (1 to 4).map(j => s"CAST(sum(q$j) AS BIGINT) AS ws$j") ++
        pairsIdx.map { case (i, j) =>
          s"CAST(sum(q$i * q$j) AS BIGINT) AS wp$i$j" }
      val outs = pairsIdx.map { case (i, j) =>
        s"""SELECT $i AS i, $j AS j,
           |  CAST((c.n * c.p$i$j - c.s$i * c.s$j) // (c.n * c.n) AS BIGINT)
           |    AS cov_e6,
           |  CAST((wc.n2 * wc.wp$i$j - wc.ws$i * wc.ws$j)
           |    // (wc.n2 * wc.n2) AS BIGINT) AS wcov_e6
           |FROM c, wc""".stripMargin }.mkString("\nUNION ALL\n")
      s"""WITH x AS (SELECT ${(1 to 4).map(j => s"${xq(j)} AS x$j").mkString(", ")}
         |  FROM embeddings),
         |c AS MATERIALIZED (
         |  SELECT CAST(count(*) AS BIGINT) AS n, ${censusCols.mkString(", ")}
         |  FROM x),
         |t0 AS (SELECT c.*, ${covCols.mkString(", ")} FROM c),
         |$cholCtes,
         |z AS (SELECT ${(1 to 4).map(qExpr).mkString(", ")}
         |      FROM embeddings, $tLast),
         |wc AS MATERIALIZED (
         |  SELECT CAST(count(*) AS BIGINT) AS n2, ${wCols.mkString(", ")}
         |  FROM z)
         |SELECT * FROM ($outs) out ORDER BY i, j""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      def r9(x: Double): Double =
        BigDecimal.valueOf(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      val pairsIdx = for (i <- 1 to 4; j <- 1 to i) yield (i, j)
      val xs = Tables.embeddings(s, d).select((1 to 4).map(j =>
        expr(s"cast(round(cast(element_at(embedding, $j) as double) * 1000," +
          s" 0) as bigint)").as(s"x$j")): _*)
        .persist() // census + whitened apply pass
      val aggs = Seq(count(lit(1)).as("n")) ++
        (1 to 4).map(j => sum(col(s"x$j")).as(s"s$j")) ++
        pairsIdx.map { case (i, j) =>
          sum(col(s"x$i") * col(s"x$j")).as(s"p$i$j") }
      val row = xs.agg(aggs.head, aggs.tail: _*).collect()(0)
      val n = row.getAs[Long]("n")
      val sv = (1 to 4).map(j => row.getAs[Long](s"s$j")).toArray
      val pv = Array.ofDim[Long](5, 5)
      pairsIdx.foreach { case (i, j) =>
        pv(i)(j) = row.getAs[Long](s"p$i$j"); pv(j)(i) = pv(i)(j) }
      def c(i: Int, j: Int): Double =
        (n * pv(i)(j) - sv(i - 1) * sv(j - 1)).toDouble /
          (n.toDouble * n * 1000000.0)
      // Cholesky entries in the EXACT op order the oracle states
      val l11 = r9(math.sqrt(c(1, 1)))
      val l21 = r9(c(2, 1) / l11)
      val l31 = r9(c(3, 1) / l11)
      val l41 = r9(c(4, 1) / l11)
      val l22 = r9(math.sqrt(c(2, 2) - l21 * l21))
      val l32 = r9((c(3, 2) - l31 * l21) / l22)
      val l42 = r9((c(4, 2) - l41 * l21) / l22)
      val l33 = r9(math.sqrt(c(3, 3) - l31 * l31 - l32 * l32))
      val l43 = r9((c(4, 3) - l41 * l31 - l42 * l32) / l33)
      val l44 = r9(math.sqrt(c(4, 4) - l41 * l41 - l42 * l42 - l43 * l43))
      val m11 = r9(1.0 / l11); val m22 = r9(1.0 / l22)
      val m33 = r9(1.0 / l33); val m44 = r9(1.0 / l44)
      val m21 = r9(-(l21 * m11) / l22)
      val m31 = r9(-(l31 * m11 + l32 * m21) / l33)
      val m32 = r9(-(l32 * m22) / l33)
      val m41 = r9(-(l41 * m11 + l42 * m21 + l43 * m31) / l44)
      val m42 = r9(-(l42 * m22 + l43 * m32) / l44)
      val m43 = r9(-(l43 * m33) / l44)
      val m = Array(
        Array(m11, 0.0, 0.0, 0.0), Array(m21, m22, 0.0, 0.0),
        Array(m31, m32, m33, 0.0), Array(m41, m42, m43, m44))
      val mu = (1 to 4).map(j => sv(j - 1).toDouble / (n * 1000.0)).toArray
      def zc(j: Int) = col(s"x$j").cast("double") / 1000.0 - lit(mu(j - 1))
      def q(i: Int) = {
        val w = (1 to i).map(j => lit(m(i - 1)(j - 1)) * zc(j))
          .reduce(_ + _)
        round(w * 1000, 0).cast("long").as(s"q$i")
      }
      val z = xs.select((1 to 4).map(q): _*)
      val wAggs = Seq(count(lit(1)).as("n2")) ++
        (1 to 4).map(j => sum(col(s"q$j")).as(s"ws$j")) ++
        pairsIdx.map { case (i, j) =>
          sum(col(s"q$i") * col(s"q$j")).as(s"wp$i$j") }
      val wrow = z.agg(wAggs.head, wAggs.tail: _*).collect()(0)
      val n2 = wrow.getAs[Long]("n2")
      val ws = (1 to 4).map(j => wrow.getAs[Long](s"ws$j")).toArray
      val out = pairsIdx.map { case (i, j) =>
        val wp = wrow.getAs[Long](s"wp$i$j")
        val cov = (n * pv(i)(j) - sv(i - 1) * sv(j - 1)) / (n * n)
        val wcov = (n2 * wp - ws(i - 1) * ws(j - 1)) / (n2 * n2)
        (i, j, cov, wcov)
      }
      out.toSeq.toDF("i", "j", "cov_e6", "wcov_e6").orderBy("i", "j")
    },

    // Oblivious isolation forest (Liu et al. ICDM 2008, with CatBoost-
    // style oblivious trees: every node at a depth shares its split, so a
    // tree is 5 half-space bits and a leaf is a 5-bit code) — the
    // model-based anomaly detector next to the robust-stats family
    // (q215/q282). With depth-truncated trees every path is depth + c(m)
    // for leaf size m, so the iForest path-length ranking reduces EXACTLY
    // to total leaf occupancy across trees — sparse cells are the
    // anomalies, and no ghost "isolation depth" needs simulating. Tree structure (feature + split fraction per (tree, depth))
    // is salted-hash CONSTANTS computed at query-build time; only the
    // per-feature min/max census is data — collected like scaler stats
    // and folded into literal thresholds (fit/apply posture). 0.5% of
    // rows carry planted corruption (+200 quantity, +50 discount), and
    // the witness is that they own the shallow-isolation top-20. Shuffle
    // shape: one 6-number census, one (tree, leaf)-keyed ≤128-row count
    // census, five BROADCAST prefix joins, one final per-key aggregate —
    // nothing pairwise, nothing deeper than the q18 scaler.
    QueryDef("q362_oblivious_iforest", {
      import graft.functions.Hashes
      val trees = 0 until 4
      val depths = 1 to 5
      def fidx(t: Int, d: Int) =
        (Hashes.mulHashLong(t * 31 + d, 601) % 3).toInt
      def frac(t: Int, d: Int) = Hashes.mulHashLong(t * 31 + d, 603) % 997
      def thrSql(t: Int, d: Int): String = {
        val f = fidx(t, d)
        s"(c.lo$f + ${frac(t, d)} * (c.hi$f - c.lo$f) // 997)"
      }
      def codeSql(t: Int): String = depths.map { d =>
        s"CASE WHEN f${fidx(t, d)} > ${thrSql(t, d)}" +
          s" THEN ${1 << (5 - d)} ELSE 0 END"
      }.mkString(" + ")
      val h = Hashes.mulHashSql("l_orderkey * 8 + l_linenumber", 701)
      s"""WITH p0 AS (
         |  SELECT l_orderkey * 8 + l_linenumber AS k,
         |         CAST(CASE WHEN ($h) % 200 = 0 THEN 1 ELSE 0 END
         |           AS BIGINT) AS planted,
         |         CAST(l_quantity AS BIGINT) AS q0,
         |         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS f1,
         |         CAST(round(l_discount * 100, 0) AS BIGINT) AS d0
         |  FROM lineitem),
         |pts AS MATERIALIZED (
         |  SELECT k, planted, q0 + planted * 200 AS f0, f1,
         |         d0 + planted * 50 AS f2
         |  FROM p0),
         |c AS MATERIALIZED (
         |  SELECT CAST(min(f0) AS BIGINT) AS lo0, CAST(max(f0) AS BIGINT)
         |      AS hi0,
         |    CAST(min(f1) AS BIGINT) AS lo1, CAST(max(f1) AS BIGINT) AS hi1,
         |    CAST(min(f2) AS BIGINT) AS lo2, CAST(max(f2) AS BIGINT) AS hi2
         |  FROM pts),
         |codes AS MATERIALIZED (
         |  SELECT k, planted, f0, f2,
         |         ${trees.map(t => s"${codeSql(t)} AS c$t").mkString(",\n         ")}
         |  FROM pts, c),
         |pt AS MATERIALIZED (
         |  ${trees.map(t =>
            s"SELECT k, planted, f0, f2, $t AS t, c$t AS code FROM codes")
            .mkString("\n  UNION ALL\n  ")}),
         |cen AS MATERIALIZED (
         |  SELECT t, code, CAST(count(*) AS BIGINT) AS cnt
         |  FROM pt GROUP BY t, code),
         |sc AS (
         |  SELECT k, planted, f0, f2, CAST(sum(cen.cnt) AS BIGINT) AS score
         |  FROM pt JOIN cen ON cen.t = pt.t AND cen.code = pt.code
         |  GROUP BY k, planted, f0, f2)
         |SELECT k, score, planted, f0 AS quantity, f2 AS discount_c
         |FROM sc ORDER BY score, k LIMIT 20""".stripMargin
    }) { (s, d) =>
      import graft.functions.Hashes
      val trees = 0 until 4
      val depths = 1 to 5
      def fidx(t: Int, dd: Int) =
        (Hashes.mulHashLong(t * 31 + dd, 601) % 3).toInt
      def frac(t: Int, dd: Int) = Hashes.mulHashLong(t * 31 + dd, 603) % 997
      val pts = Tables.lineitem(s, d)
        .select((col("l_orderkey") * 8 + col("l_linenumber")).as("k"),
          when(Hashes.mulHash(col("l_orderkey") * 8 + col("l_linenumber"),
            701) % 200 === 0, 1L).otherwise(0L).as("planted"),
          col("l_quantity").cast("long").as("q0"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("f1"),
          round(col("l_discount") * 100, 0).cast("long").as("d0"))
        .select(col("k"), col("planted"),
          (col("q0") + col("planted") * 200).as("f0"), col("f1"),
          (col("d0") + col("planted") * 50).as("f2"))
        .persist() // min/max census + the code pass
      val cRow = pts.agg(min("f0").as("lo0"), max("f0").as("hi0"),
        min("f1").as("lo1"), max("f1").as("hi1"),
        min("f2").as("lo2"), max("f2").as("hi2")).collect()(0)
      val lo = Array(cRow.getAs[Long]("lo0"), cRow.getAs[Long]("lo1"),
        cRow.getAs[Long]("lo2"))
      val hi = Array(cRow.getAs[Long]("hi0"), cRow.getAs[Long]("hi1"),
        cRow.getAs[Long]("hi2"))
      def thr(t: Int, dd: Int): Long = {
        val f = fidx(t, dd)
        lo(f) + frac(t, dd) * (hi(f) - lo(f)) / 997
      }
      def code(t: Int) = depths.map { dd =>
        when(col(s"f${fidx(t, dd)}") > thr(t, dd), 1L << (5 - dd))
          .otherwise(0L)
      }.reduce(_ + _).as(s"c$t")
      val codes = pts.select(
        Seq(col("k"), col("planted"), col("f0"), col("f2"))
          ++ trees.map(code): _*)
      val pt = trees.map(t => codes.select(col("k"), col("planted"),
          col("f0"), col("f2"), lit(t).as("t"), col(s"c$t").as("code")))
        .reduce(_ unionAll _)
        .persist() // leaf census + the prefix joins
      val cen = pt.groupBy("t", "code").agg(count(lit(1)).as("cnt"))
        .select(col("t").as("tt"), col("code").as("cc"), col("cnt"))
      pt.join(broadcast(cen),
          col("tt") === col("t") && col("cc") === col("code"))
        .groupBy("k", "planted", "f0", "f2")
        .agg(sum("cnt").as("score"))
        .select(col("k"), col("score"), col("planted"),
          col("f0").as("quantity"), col("f2").as("discount_c"))
        .orderBy("score", "k")
        .limit(20)
    },

    // Cluster-label alignment (the Hungarian assignment, exact over 4! =
    // 24 permutations) — the missing step between clustering (q65) and
    // supervised metrics (q08): cluster ids are arbitrary, so accuracy
    // against true labels is only defined AFTER the best one-to-one
    // cluster→label mapping. The confusion census is 16 integers; the 24
    // candidate mappings are build-time literals (96 (perm, cluster,
    // label) rows); the best permutation is an exact integer trace argmax
    // with a smallest-perm tie-break. ONE corpus pass (the confusion
    // census); everything after is statistics arithmetic. Output: the
    // dense confusion grid, each row carrying its cluster's assigned
    // label, the winning permutation's trace, and the aligned accuracy.
    QueryDef("q363_cluster_align", {
      val perms = (0 to 3).permutations.toSeq.sortBy(_.mkString)
      val permRows = perms.zipWithIndex.flatMap { case (pm, p) =>
        pm.zipWithIndex.map { case (tgt, c) => s"($p, $c, $tgt)" } }
      s"""WITH pts AS (
         |  SELECT CASE WHEN CAST(embedding[1] AS DOUBLE) > 0 THEN 2 ELSE 0
         |           END
         |         + CASE WHEN CAST(embedding[2] AS DOUBLE) > 0 THEN 1
         |           ELSE 0 END AS c,
         |         label % 4 AS l
         |  FROM embeddings),
         |grid AS (SELECT a.g AS c, b.g AS l
         |         FROM (SELECT unnest(range(0, 4)) AS g) a,
         |              (SELECT unnest(range(0, 4)) AS g) b),
         |conf AS MATERIALIZED (
         |  SELECT grid.c, grid.l, CAST(coalesce(n.n, 0) AS BIGINT) AS n
         |  FROM grid LEFT JOIN (
         |    SELECT c, l, count(*) AS n FROM pts GROUP BY c, l) n
         |    ON n.c = grid.c AND n.l = grid.l),
         |perm(p, c, tgt) AS (VALUES ${permRows.mkString(", ")}),
         |sc AS (SELECT perm.p, CAST(sum(conf.n) AS BIGINT) AS trace
         |       FROM perm JOIN conf ON conf.c = perm.c AND conf.l = perm.tgt
         |       GROUP BY perm.p),
         |best AS (SELECT p, trace FROM sc ORDER BY trace DESC, p LIMIT 1),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM conf)
         |SELECT conf.c, conf.l, conf.n,
         |       CAST(perm.tgt AS BIGINT) AS assigned_label,
         |       best.trace, CAST(best.trace * 1000000 // tot.tot AS BIGINT)
         |         AS acc_ppm
         |FROM conf JOIN best ON 1 = 1
         |  JOIN perm ON perm.p = best.p AND perm.c = conf.c, tot
         |ORDER BY conf.c, conf.l""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      val perms = (0 to 3).permutations.toSeq.sortBy(_.mkString)
      val permDf = perms.zipWithIndex.flatMap { case (pm, p) =>
        pm.zipWithIndex.map { case (tgt, c) => (p, c.toLong, tgt.toLong) } }
        .toDF("p", "c", "tgt")
      val pts = Tables.embeddings(s, d).select(
        (when(expr("cast(element_at(embedding, 1) as double)") > 0, 2L)
          .otherwise(0L)
          + when(expr("cast(element_at(embedding, 2) as double)") > 0, 1L)
            .otherwise(0L)).as("c"),
        (col("label") % 4).cast("long").as("l"))
      val grid = s.range(0, 4).select(col("id").as("c"))
        .crossJoin(s.range(0, 4).select(col("id").as("l")))
      val conf = grid.join(
          pts.groupBy("c", "l").agg(count(lit(1)).as("cnt")),
          Seq("c", "l"), "left")
        .select(col("c"), col("l"), coalesce(col("cnt"), lit(0L)).as("n"))
        .persist() // trace scoring + total + final grid
      val sc = broadcast(permDf).join(conf,
          permDf("c") === conf("c") && col("tgt") === col("l"))
        .groupBy("p").agg(sum("n").as("trace"))
      val best = sc.orderBy(col("trace").desc, col("p")).limit(1)
      val tot = conf.agg(sum("n").as("tot"))
      conf.crossJoin(broadcast(best))
        .join(broadcast(permDf.withColumnRenamed("p", "bp")
            .withColumnRenamed("c", "bc")),
          col("bp") === col("p") && col("bc") === conf("c"))
        .crossJoin(broadcast(tot))
        .select(conf("c"), col("l"), col("n"),
          col("tgt").as("assigned_label"), col("trace"),
          expr("cast(trace * 1000000 div tot as bigint)").as("acc_ppm"))
        .orderBy("c", "l")
    },

    // Closed-form multiple OLS via the NORMAL-EQUATIONS CENSUS — the
    // k-feature generalization of q203's per-group simple regression and
    // the exact pattern MLlib's summarizer + WeightedLeastSquares runs:
    // ONE pass collects the 3×3 Gram matrix and moment vector as ten
    // exact integer sums (cents / basis points), then β = A⁻¹b is
    // Cramer's rule stated as literal determinant arithmetic over the
    // census — both engines evaluate the identical 128-bit integer
    // determinants (DECIMAL(38) / HUGEINT: det(A) ~ n·s11·s22 ≈ 1e30 at
    // sf0.1) and divide as doubles only at the stated output boundary.
    // R² follows from the same census (SSE = Σy² − βᵀ(2b − Aβ) algebra
    // folded to census terms). Scale shape: one scan → one 1-row
    // aggregate; NOTHING else moves — the optimal 100 TB regression
    // plan. Model: price_cents ~ qty_cents + discount_bp.
    QueryDef("q370_ols_cramer",
      """WITH q AS (
        |  SELECT CAST(round(l_quantity * 100, 0) AS BIGINT) AS x1,
        |         CAST(round(l_discount * 10000, 0) AS BIGINT) AS x2,
        |         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |             CAST(sum(x1) AS HUGEINT) AS s1,
        |             CAST(sum(x2) AS HUGEINT) AS s2,
        |             CAST(sum(y) AS HUGEINT) AS sy,
        |             CAST(sum(x1 * x1) AS HUGEINT) AS s11,
        |             CAST(sum(x1 * x2) AS HUGEINT) AS s12,
        |             CAST(sum(x2 * x2) AS HUGEINT) AS s22,
        |             CAST(sum(x1 * y) AS HUGEINT) AS s1y,
        |             CAST(sum(x2 * y) AS HUGEINT) AS s2y,
        |             CAST(sum(y * y) AS HUGEINT) AS syy
        |      FROM q),
        |det AS (
        |  SELECT n, sy, s1y, s2y, syy, s1, s2,
        |         n * (s11 * s22 - s12 * s12)
        |           - s1 * (s1 * s22 - s12 * s2)
        |           + s2 * (s1 * s12 - s11 * s2) AS da,
        |         sy * (s11 * s22 - s12 * s12)
        |           - s1 * (s1y * s22 - s12 * s2y)
        |           + s2 * (s1y * s12 - s11 * s2y) AS d0,
        |         n * (s1y * s22 - s12 * s2y)
        |           - sy * (s1 * s22 - s12 * s2)
        |           + s2 * (s1 * s2y - s1y * s2) AS d1,
        |         n * (s11 * s2y - s1y * s2)
        |           - s1 * (s1 * s2y - s1y * s2)
        |           + sy * (s1 * s12 - s11 * s2) AS d2
        |  FROM m),
        |b AS (SELECT n,
        |             CAST(d0 AS DOUBLE) / CAST(da AS DOUBLE) AS b0,
        |             CAST(d1 AS DOUBLE) / CAST(da AS DOUBLE) AS b1,
        |             CAST(d2 AS DOUBLE) / CAST(da AS DOUBLE) AS b2,
        |             CAST(sy AS DOUBLE) AS syd, CAST(syy AS DOUBLE) AS syyd,
        |             CAST(s1y AS DOUBLE) AS s1yd, CAST(s2y AS DOUBLE) AS s2yd
        |      FROM det)
        |SELECT CAST(n AS BIGINT) AS n, round(b0, 6) AS b0, round(b1, 6) AS b1,
        |       round(b2, 6) AS b2,
        |       round(1 - (syyd - b0 * syd - b1 * s1yd - b2 * s2yd)
        |               / (syyd - syd * syd / CAST(n AS DOUBLE)), 6) AS r2
        |FROM b""".stripMargin) { (s, d) =>
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val q = Tables.lineitem(s, d).select(
        round(col("l_quantity") * 100, 0).cast("long").as("x1"),
        round(col("l_discount") * 10000, 0).cast("long").as("x2"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("y"))
      val m = q.agg(count(lit(1)).cast(dec).as("n"),
        sum("x1").cast(dec).as("s1"), sum("x2").cast(dec).as("s2"),
        sum("y").cast(dec).as("sy"),
        sum((col("x1") * col("x1")).cast(dec)).as("s11"),
        sum((col("x1") * col("x2")).cast(dec)).as("s12"),
        sum((col("x2") * col("x2")).cast(dec)).as("s22"),
        sum((col("x1") * col("y")).cast(dec)).as("s1y"),
        sum((col("x2") * col("y")).cast(dec)).as("s2y"),
        sum((col("y") * col("y")).cast(dec)).as("syy"))
      val det = m.select(col("*"),
        expr("""n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
               |+ s2 * (s1 * s12 - s11 * s2)""".stripMargin.replace("\n", " "))
          .as("da"),
        expr("""sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
               |+ s2 * (s1y * s12 - s11 * s2y)""".stripMargin
          .replace("\n", " ")).as("d0"),
        expr("""n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
               |+ s2 * (s1 * s2y - s1y * s2)""".stripMargin.replace("\n", " "))
          .as("d1"),
        expr("""n * (s11 * s2y - s1y * s2) - s1 * (s1 * s2y - s1y * s2)
               |+ sy * (s1 * s12 - s11 * s2)""".stripMargin.replace("\n", " "))
          .as("d2"))
      val b0 = col("d0").cast("double") / col("da").cast("double")
      val b1 = col("d1").cast("double") / col("da").cast("double")
      val b2 = col("d2").cast("double") / col("da").cast("double")
      det.select(col("n").cast("long").as("n"),
        round(b0, 6).as("b0"), round(b1, 6).as("b1"), round(b2, 6).as("b2"),
        round(lit(1d) - (col("syy").cast("double")
            - b0 * col("sy").cast("double")
            - b1 * col("s1y").cast("double")
            - b2 * col("s2y").cast("double"))
          / (col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double")
              / col("n").cast("double")), 6).as("r2"))
    },

    // Histogram-based greedy decision tree, depth 2 — the exact split-
    // finding core of LightGBM/XGBoost-hist (Ke et al. 2017) as a
    // relational plan: features pre-binned to small integer domains, ONE
    // exchange builds the (feature, bin) label histogram (in Spark a
    // single explode→groupBy pass, the map-side-combining histogram
    // every distributed GBDT runs), thresholds scanned as a cumulative
    // window over the ≤40-row census, and the Gini-optimal split chosen
    // by EXACT scaled-integer comparison ((posL²+negL²)·nR +
    // (posR²+negR²)·nL)·1e6 // (nL·nR) — no float argmax. Level 2
    // re-partitions rows by the root decision and repeats per side (the
    // per-level data pass of every histogram GBDT). Label: returnflag =
    // 'R'; the root split recovers the shipyear boundary that actually
    // determines return status in TPC-H data. Scale: two scans, two
    // histogram exchanges, all decisions from broadcast censuses.
    QueryDef("q371_histogram_tree",
      """WITH f AS (
        |  SELECT CAST(round(l_quantity, 0) AS BIGINT) // 4 AS f1,
        |         CAST(round(l_discount * 100, 0) AS BIGINT) AS f2,
        |         CAST(year(l_shipdate) - 1992 AS BIGINT) AS f3,
        |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |h AS (SELECT 'f1' AS feat, f1 AS bin, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(y) AS BIGINT) AS pos FROM f GROUP BY f1
        |      UNION ALL
        |      SELECT 'f2', f2, CAST(count(*) AS BIGINT),
        |             CAST(sum(y) AS BIGINT) FROM f GROUP BY f2
        |      UNION ALL
        |      SELECT 'f3', f3, CAST(count(*) AS BIGINT),
        |             CAST(sum(y) AS BIGINT) FROM f GROUP BY f3),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nt,
        |               CAST(sum(y) AS BIGINT) AS post FROM f),
        |cum AS (SELECT feat, bin,
        |          CAST(sum(n) OVER (PARTITION BY feat ORDER BY bin
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS nl,
        |          CAST(sum(pos) OVER (PARTITION BY feat ORDER BY bin
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS posl
        |        FROM h),
        |sc AS (SELECT feat, bin, nl, posl, nt - nl AS nr, post - posl AS posr,
        |         CAST((CAST(posl * posl + (nl - posl) * (nl - posl)
        |                 AS HUGEINT) * (nt - nl)
        |               + CAST((post - posl) * (post - posl)
        |                   + (nt - nl - post + posl) * (nt - nl - post + posl)
        |                 AS HUGEINT) * nl) * 1000000
        |              // (nl * (nt - nl)) AS BIGINT) AS score
        |       FROM cum, tot WHERE nl > 0 AND nt - nl > 0),
        |root AS (SELECT feat, bin, score, nl, posl, nr, posr FROM sc
        |         ORDER BY score DESC, feat, bin LIMIT 1),
        |fs AS (SELECT f.*, CASE WHEN (root.feat = 'f1' AND f.f1 <= root.bin)
        |                          OR (root.feat = 'f2' AND f.f2 <= root.bin)
        |                          OR (root.feat = 'f3' AND f.f3 <= root.bin)
        |                        THEN 'L' ELSE 'R' END AS side
        |       FROM f, root),
        |h2 AS (SELECT side, 'f1' AS feat, f1 AS bin,
        |              CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(y) AS BIGINT) AS pos FROM fs GROUP BY side, f1
        |       UNION ALL
        |       SELECT side, 'f2', f2, CAST(count(*) AS BIGINT),
        |              CAST(sum(y) AS BIGINT) FROM fs GROUP BY side, f2
        |       UNION ALL
        |       SELECT side, 'f3', f3, CAST(count(*) AS BIGINT),
        |              CAST(sum(y) AS BIGINT) FROM fs GROUP BY side, f3),
        |tot2 AS (SELECT side, CAST(count(*) AS BIGINT) AS nt,
        |                CAST(sum(y) AS BIGINT) AS post FROM fs GROUP BY side),
        |cum2 AS (SELECT side, feat, bin,
        |           CAST(sum(n) OVER (PARTITION BY side, feat ORDER BY bin
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |             AS BIGINT) AS nl,
        |           CAST(sum(pos) OVER (PARTITION BY side, feat ORDER BY bin
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |             AS BIGINT) AS posl
        |         FROM h2),
        |sc2 AS (SELECT cum2.side, feat, bin, nl, posl,
        |          tot2.nt - nl AS nr, tot2.post - posl AS posr,
        |          CAST((CAST(posl * posl + (nl - posl) * (nl - posl)
        |                  AS HUGEINT) * (tot2.nt - nl)
        |                + CAST((tot2.post - posl) * (tot2.post - posl)
        |                    + (tot2.nt - nl - tot2.post + posl)
        |                      * (tot2.nt - nl - tot2.post + posl)
        |                  AS HUGEINT) * nl) * 1000000
        |               // (nl * (tot2.nt - nl)) AS BIGINT) AS score
        |        FROM cum2 JOIN tot2 USING (side)
        |        WHERE nl > 0 AND tot2.nt - nl > 0),
        |best2 AS (SELECT side, feat, bin, score, nl, posl, nr, posr,
        |            row_number() OVER (PARTITION BY side
        |              ORDER BY score DESC, feat, bin) AS rk
        |          FROM sc2)
        |SELECT 'root' AS node, feat, CAST(bin AS BIGINT) AS split_bin, score,
        |       nl AS n_l, posl AS pos_l, nr AS n_r, posr AS pos_r FROM root
        |UNION ALL
        |SELECT side, feat, CAST(bin AS BIGINT), score, nl, posl, nr, posr
        |FROM best2 WHERE rk = 1
        |ORDER BY node""".stripMargin) { (s, d) =>
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy("feat").orderBy("bin")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val wCum2 = org.apache.spark.sql.expressions.Window
        .partitionBy("side", "feat").orderBy("bin")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val f = Tables.lineitem(s, d).select(
          expr("cast(round(l_quantity, 0) as bigint) div 4").as("f1"),
          round(col("l_discount") * 100, 0).cast("long").as("f2"),
          (year(col("l_shipdate")) - 1992).cast("long").as("f3"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .persist() // histogram pass + side re-partition pass
      // one exchange for all three feature histograms: explode the
      // (feat, bin) pairs, single groupBy — the map-side-combine shape
      val hist = f.select(col("y"), explode(array(
          struct(lit("f1").as("feat"), col("f1").as("bin")),
          struct(lit("f2").as("feat"), col("f2").as("bin")),
          struct(lit("f3").as("feat"), col("f3").as("bin")))).as("fb"))
        .groupBy(col("fb.feat").as("feat"), col("fb.bin").as("bin"))
        .agg(count(lit(1)).as("n"), sum("y").as("pos"))
      val tot = f.agg(count(lit(1)).as("nt"), sum("y").as("post"))
      def scoreExpr = expr(
        """cast((cast(posl * posl + (nl - posl) * (nl - posl)
          |as decimal(38,0)) * (nt - nl)
          |+ cast((post - posl) * (post - posl)
          |+ (nt - nl - post + posl) * (nt - nl - post + posl)
          |as decimal(38,0)) * nl) * 1000000
          |div (nl * (nt - nl)) as bigint)""".stripMargin.replace("\n", " "))
      val sc = hist
        .select(col("feat"), col("bin"), sum("n").over(wCum).as("nl"),
          sum("pos").over(wCum).as("posl"))
        .crossJoin(broadcast(tot))
        .where(col("nl") > 0 && col("nt") - col("nl") > 0)
        .select(col("feat"), col("bin"), col("nl"), col("posl"),
          (col("nt") - col("nl")).as("nr"),
          (col("post") - col("posl")).as("posr"), scoreExpr.as("score"))
      val root = sc.orderBy(col("score").desc, col("feat"), col("bin"))
        .limit(1)
        .select(col("feat").as("rfeat"), col("bin").as("rbin"), col("score"),
          col("nl"), col("posl"), col("nr"), col("posr"))
        .persist() // side assignment + output row
      val fs = f.crossJoin(broadcast(root.select("rfeat", "rbin")))
        .select(col("f1"), col("f2"), col("f3"), col("y"),
          when((col("rfeat") === "f1" && col("f1") <= col("rbin"))
            || (col("rfeat") === "f2" && col("f2") <= col("rbin"))
            || (col("rfeat") === "f3" && col("f3") <= col("rbin")), "L")
            .otherwise("R").as("side"))
      val hist2 = fs.select(col("side"), col("y"), explode(array(
          struct(lit("f1").as("feat"), col("f1").as("bin")),
          struct(lit("f2").as("feat"), col("f2").as("bin")),
          struct(lit("f3").as("feat"), col("f3").as("bin")))).as("fb"))
        .groupBy(col("side"), col("fb.feat").as("feat"),
          col("fb.bin").as("bin"))
        .agg(count(lit(1)).as("n"), sum("y").as("pos"))
      val tot2 = fs.groupBy("side").agg(count(lit(1)).as("nt"),
        sum("y").as("post"))
      val sc2 = hist2
        .select(col("side"), col("feat"), col("bin"),
          sum("n").over(wCum2).as("nl"), sum("pos").over(wCum2).as("posl"))
        .join(broadcast(tot2), Seq("side"))
        .where(col("nl") > 0 && col("nt") - col("nl") > 0)
        .select(col("side"), col("feat"), col("bin"), col("nl"), col("posl"),
          (col("nt") - col("nl")).as("nr"),
          (col("post") - col("posl")).as("posr"), scoreExpr.as("score"))
      val best2 = sc2
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("side")
            .orderBy(col("score").desc, col("feat"), col("bin"))))
        .where(col("rk") === 1)
      root.select(lit("root").as("node"), col("rfeat").as("feat"),
          col("rbin").cast("long").as("split_bin"), col("score"),
          col("nl").as("n_l"), col("posl").as("pos_l"), col("nr").as("n_r"),
          col("posr").as("pos_r"))
        .unionAll(best2.select(col("side").as("node"), col("feat"),
          col("bin").cast("long").as("split_bin"), col("score"),
          col("nl").as("n_l"), col("posl").as("pos_l"), col("nr").as("n_r"),
          col("posr").as("pos_r")))
        .orderBy("node")
    },

    // Gradient boosting, two rounds of histogram stumps (Friedman 2001
    // under squared loss; the additive-ensemble step q371's single tree
    // feeds into): residuals against the running prediction are
    // e6-quantized integers, each round builds the SAME one-exchange
    // (feature, bin) histogram — now of residual SUMS — and picks the
    // variance-maximal split by exact 128-bit comparison
    // (S_L²·n_R + S_R²·n_L) // (n_L·n_R); leaf values are truncated
    // integer means, and the train SSE after each round is an exact
    // integer census, so the boosting contract (SSE strictly falls every
    // round) is machine-checkable on both engines. Scale: per round one
    // scan + one ≤40-row histogram exchange — the map-side-combining
    // pass every distributed GBDT (LightGBM data-parallel mode) runs;
    // the model state crossing rounds is a 2-number broadcast.
    QueryDef("q372_gbdt_round", {
      // stump round t: histogram of residual r{t} over f, exact
      // variance-gain argmax, leaf means, updated residual r{t+1}
      def stump(t: Int): String = {
        val r = s"r$t"
        s"""h$t AS (SELECT 'f1' AS feat, f1 AS bin,
           |              CAST(count(*) AS BIGINT) AS n,
           |              CAST(sum($r) AS BIGINT) AS sr
           |       FROM d$t GROUP BY f1
           |       UNION ALL
           |       SELECT 'f2', f2, CAST(count(*) AS BIGINT),
           |              CAST(sum($r) AS BIGINT) FROM d$t GROUP BY f2
           |       UNION ALL
           |       SELECT 'f3', f3, CAST(count(*) AS BIGINT),
           |              CAST(sum($r) AS BIGINT) FROM d$t GROUP BY f3),
           |tt$t AS (SELECT CAST(count(*) AS BIGINT) AS nt,
           |                CAST(sum($r) AS BIGINT) AS st FROM d$t),
           |c$t AS (SELECT feat, bin,
           |          CAST(sum(n) OVER (PARTITION BY feat ORDER BY bin
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |            AS BIGINT) AS nl,
           |          CAST(sum(sr) OVER (PARTITION BY feat ORDER BY bin
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |            AS BIGINT) AS sl
           |        FROM h$t),
           |s$t AS (SELECT feat, bin, nl, sl, tt$t.nt - nl AS nr,
           |          tt$t.st - sl AS sr2,
           |          CAST((CAST(sl AS HUGEINT) * sl * (tt$t.nt - nl)
           |                + CAST(tt$t.st - sl AS HUGEINT) * (tt$t.st - sl)
           |                  * nl)
           |               // (nl * (tt$t.nt - nl)) AS BIGINT) AS score
           |        FROM c$t, tt$t WHERE nl > 0 AND tt$t.nt - nl > 0),
           |b$t AS (SELECT feat, bin, score, sl // nl AS vl, sr2 // nr AS vr
           |        FROM s$t ORDER BY score DESC, feat, bin LIMIT 1),
           |d${t + 1} AS (
           |  SELECT f1, f2, f3, $r
           |           - CASE WHEN (b$t.feat = 'f1' AND f1 <= b$t.bin)
           |                    OR (b$t.feat = 'f2' AND f2 <= b$t.bin)
           |                    OR (b$t.feat = 'f3' AND f3 <= b$t.bin)
           |                  THEN b$t.vl ELSE b$t.vr END AS r${t + 1}
           |  FROM d$t, b$t),
           |e${t + 1} AS (SELECT CAST(sum(r${t + 1} * r${t + 1}) AS HUGEINT)
           |                // 1000000 AS sse FROM d${t + 1})""".stripMargin
      }
      s"""WITH f AS (
         |  SELECT CAST(round(l_quantity, 0) AS BIGINT) // 4 AS f1,
         |         CAST(round(l_discount * 100, 0) AS BIGINT) AS f2,
         |         CAST(year(l_shipdate) - 1992 AS BIGINT) AS f3,
         |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
         |  FROM lineitem),
         |t0 AS (SELECT CAST(count(*) AS BIGINT) AS nt,
         |              CAST(sum(y) AS BIGINT) AS post FROM f),
         |d1 AS (SELECT f1, f2, f3,
         |              y * 1000000 - (post * 1000000 // nt) AS r1
         |       FROM f, t0),
         |e1 AS (SELECT CAST(sum(r1 * r1) AS HUGEINT) // 1000000 AS sse
         |       FROM d1),
         |${stump(1)},
         |${stump(2)}
         |SELECT CAST(1 AS BIGINT) AS round, b1.feat, CAST(b1.bin AS BIGINT)
         |         AS split_bin, b1.score, b1.vl AS leaf_l_e6,
         |       b1.vr AS leaf_r_e6, CAST(e1.sse AS BIGINT) AS sse_before_e6,
         |       CAST(e2.sse AS BIGINT) AS sse_after_e6
         |FROM b1, e1, e2
         |UNION ALL
         |SELECT 2, b2.feat, CAST(b2.bin AS BIGINT), b2.score, b2.vl, b2.vr,
         |       CAST(e2.sse AS BIGINT), CAST(e3.sse AS BIGINT)
         |FROM b2, e2, e3
         |ORDER BY round""".stripMargin
    }) { (s, d) =>
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.expressions.Window
      val wCum = Window.partitionBy("feat").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val f = Tables.lineitem(s, d).select(
        expr("cast(round(l_quantity, 0) as bigint) div 4").as("f1"),
        round(col("l_discount") * 100, 0).cast("long").as("f2"),
        (year(col("l_shipdate")) - 1992).cast("long").as("f3"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      val t0 = f.agg(count(lit(1)).as("nt"), sum("y").as("post"))
      val d1 = f.crossJoin(broadcast(t0))
        .select(col("f1"), col("f2"), col("f3"),
          (col("y") * 1000000L - expr("post * 1000000 div nt")).as("r1"))
        .persist() // histogram + sse + residual update
      def sse(dt: DataFrame, r: String): DataFrame =
        dt.agg(expr(s"cast(cast(sum($r * $r) as decimal(38,0)) div 1000000"
          + " as bigint)").as("sse"))
      // one stump round: histogram exchange → exact argmax → leaf means
      // → residual update (broadcast 1-row model state)
      def stump(dt: DataFrame, r: String, rNext: String): (DataFrame, DataFrame) = {
        val hist = dt.select(col(r), explode(array(
            struct(lit("f1").as("feat"), col("f1").as("bin")),
            struct(lit("f2").as("feat"), col("f2").as("bin")),
            struct(lit("f3").as("feat"), col("f3").as("bin")))).as("fb"))
          .groupBy(col("fb.feat").as("feat"), col("fb.bin").as("bin"))
          .agg(count(lit(1)).as("n"), sum(r).as("sr"))
        val tt = dt.agg(count(lit(1)).as("nt"), sum(r).as("st"))
        val best = hist
          .select(col("feat"), col("bin"), sum("n").over(wCum).as("nl"),
            sum("sr").over(wCum).as("sl"))
          .crossJoin(broadcast(tt))
          .where(col("nl") > 0 && col("nt") - col("nl") > 0)
          .select(col("feat"), col("bin"), col("nl"), col("sl"),
            (col("nt") - col("nl")).as("nr"),
            (col("st") - col("sl")).as("sr2"),
            expr("""cast((cast(sl as decimal(38,0)) * sl * (nt - nl)
                   |+ cast(st - sl as decimal(38,0)) * (st - sl) * nl)
                   |div (nl * (nt - nl)) as bigint)""".stripMargin
              .replace("\n", " ")).as("score"))
          .orderBy(col("score").desc, col("feat"), col("bin")).limit(1)
          .select(col("feat"), col("bin"), col("score"),
            expr("sl div nl").as("vl"), expr("sr2 div nr").as("vr"))
          .persist() // residual update + output row
        val dNext = dt.crossJoin(broadcast(
            best.select(col("feat").as("bf"), col("bin").as("bb"),
              col("vl"), col("vr"))))
          .select(col("f1"), col("f2"), col("f3"),
            (col(r) - when((col("bf") === "f1" && col("f1") <= col("bb"))
              || (col("bf") === "f2" && col("f2") <= col("bb"))
              || (col("bf") === "f3" && col("f3") <= col("bb")),
              col("vl")).otherwise(col("vr"))).as(rNext))
          .persist() // next histogram + sse
        (best, dNext)
      }
      val e1 = sse(d1, "r1")
      val (b1, d2) = stump(d1, "r1", "r2")
      val e2 = sse(d2, "r2")
      val (b2, d3) = stump(d2, "r2", "r3")
      val e3 = sse(d3, "r3")
      def outRow(t: Int, b: DataFrame, eb: DataFrame, ea: DataFrame) =
        b.crossJoin(broadcast(eb.select(col("sse").as("sse_before_e6"))))
          .crossJoin(broadcast(ea.select(col("sse").as("sse_after_e6"))))
          .select(lit(t.toLong).as("round"), col("feat"),
            col("bin").cast("long").as("split_bin"), col("score"),
            col("vl").as("leaf_l_e6"), col("vr").as("leaf_r_e6"),
            col("sse_before_e6"), col("sse_after_e6"))
      outRow(1, b1, e1, e2).unionAll(outRow(2, b2, e2, e3)).orderBy("round")
    },

    // Two-component 1-D Gaussian-mixture EM (Dempster et al. 1977), two
    // unrolled iterations over log order value, means-only with a shared
    // variance (the k-means-with-soft-assignments shape): the E-step
    // responsibility collapses to a SIGMOID of the exact integer
    // difference-of-squared-distances over 2σ² (the q20/q103
    // transcendental contract — per-row double, e6-quantized BEFORE any
    // cross-row reduction, so the M-step means are exact integer
    // ratios Σr·y // Σr and the engines agree bit-for-bit). The data is
    // a PLANTED mixture — half the orders (hash-chosen) shifted +3 in
    // log space — so the no-collapse contract is real, not assumed
    // (on the raw unimodal log-price EM honestly pulls the means
    // together; Round11Spec measured it; here the recovered separation
    // holds near the planted 3.0 across iterations — monotone GROWTH is
    // not an EM theorem, only likelihood ascent is, and with overlapping
    // components the means settle slightly inward). Init from the
    // min/max census
    // (quartile points of the range); σ² is the population variance
    // census, exact in 128-bit. Scale shape: per
    // iteration ONE scan + one 1-row aggregate with a broadcast 2-number
    // model state — the distributed-EM pattern (MLlib GaussianMixture
    // runs exactly this aggregate per step). Output: the two means and
    // soft counts after each iteration — the separation witness.
    QueryDef("q374_gmm_em",
      s"""WITH q AS (SELECT CAST(round((ln(1 + o_totalprice)
         |             + CASE WHEN ${graft.functions.Hashes
                                      .bucketSql("o_orderkey", 67, 2)} = 1
         |               THEN 3 ELSE 0 END) * 1000000, 0)
         |             AS BIGINT) AS y FROM orders),
        |m0 AS (SELECT CAST(min(y) AS BIGINT) AS mn,
        |              CAST(max(y) AS BIGINT) AS mx,
        |              CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(y) AS HUGEINT) AS sy,
        |              CAST(sum(y * y) AS HUGEINT) AS syy FROM q),
        |p0 AS (SELECT mn + (mx - mn) // 4 AS mu1,
        |              mn + ((mx - mn) * 3) // 4 AS mu2,
        |              CAST((n * syy - sy * sy) // (n * n) AS BIGINT) AS s2
        |       FROM m0),
        |e1 AS (SELECT y, CAST(round(1000000 / (1 + exp(
        |         CAST((y - mu1) * (y - mu1) - (y - mu2) * (y - mu2)
        |           AS DOUBLE) / CAST(2 * s2 AS DOUBLE))), 0) AS BIGINT) AS r
        |       FROM q, p0),
        |m1a AS (SELECT CAST(CAST(sum(r * y) AS HUGEINT)
        |                // CAST(sum(r) AS HUGEINT) AS BIGINT) AS mu1,
        |              CAST(CAST(sum((1000000 - r) * y) AS HUGEINT)
        |                // CAST(sum(1000000 - r) AS HUGEINT) AS BIGINT)
        |                AS mu2,
        |              CAST(sum(r) // 1000000 AS BIGINT) AS n1,
        |              CAST(sum(1000000 - r) // 1000000 AS BIGINT) AS n2
        |       FROM e1),
        |v1 AS (SELECT CAST((sum(CAST(r AS HUGEINT) * (y - m.mu1)
        |                        * (y - m.mu1))
        |                    + sum(CAST(1000000 - r AS HUGEINT) * (y - m.mu2)
        |                          * (y - m.mu2)))
        |              // (count(*) * 1000000) AS BIGINT) AS s2
        |       FROM e1, m1a m),
        |m1 AS (SELECT m1a.*, v1.s2 FROM m1a, v1),
        |e2 AS (SELECT y, CAST(round(1000000 / (1 + exp(
        |         CAST((y - mu1) * (y - mu1) - (y - mu2) * (y - mu2)
        |           AS DOUBLE) / CAST(2 * s2 AS DOUBLE))), 0) AS BIGINT) AS r
        |       FROM q, m1),
        |m2 AS (SELECT CAST(CAST(sum(r * y) AS HUGEINT)
        |                // CAST(sum(r) AS HUGEINT) AS BIGINT) AS mu1,
        |              CAST(CAST(sum((1000000 - r) * y) AS HUGEINT)
        |                // CAST(sum(1000000 - r) AS HUGEINT) AS BIGINT)
        |                AS mu2,
        |              CAST(sum(r) // 1000000 AS BIGINT) AS n1,
        |              CAST(sum(1000000 - r) // 1000000 AS BIGINT) AS n2
        |       FROM e2)
        |SELECT CAST(1 AS BIGINT) AS iter, mu1 AS mu1_e6, mu2 AS mu2_e6,
        |       n1 AS soft_n1, n2 AS soft_n2 FROM m1
        |UNION ALL
        |SELECT 2, mu1, mu2, n1, n2 FROM m2
        |ORDER BY iter""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.DataFrame
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val q = Tables.orders(s, d)
        .select(round((log(lit(1d) + col("o_totalprice"))
          + when(graft.functions.Hashes.bucket(col("o_orderkey"), 67, 2) === 1,
            3d).otherwise(0d)) * 1000000, 0)
          .cast("long").as("y"))
        .persist() // variance census + two E-step scans
      val m0 = q.agg(min("y").as("mn"), max("y").as("mx"),
        count(lit(1)).as("n"), sum("y").cast(dec).as("sy"),
        sum((col("y") * col("y")).cast(dec)).as("syy"))
      val p0 = m0.select(
        expr("mn + (mx - mn) div 4").as("mu1"),
        expr("mn + ((mx - mn) * 3) div 4").as("mu2"),
        expr("cast((n * syy - sy * sy) div (cast(n as decimal(38,0)) * n)"
          + " as bigint)").as("s2"))
      def eStep(model: DataFrame): DataFrame =
        q.crossJoin(broadcast(model.select("mu1", "mu2", "s2")))
          .select(col("y"), round(lit(1000000d) / (lit(1d) + exp(
            ((col("y") - col("mu1")) * (col("y") - col("mu1"))
              - (col("y") - col("mu2")) * (col("y") - col("mu2")))
              .cast("double") / (lit(2L) * col("s2")).cast("double"))), 0)
            .cast("long").as("r"))
      def mStep(e: DataFrame, reestimateS2: Boolean): DataFrame = {
        val base = e.agg(
          expr("""cast(cast(sum(r * cast(y as decimal(38,0))) as decimal(38,0))
                 |div cast(sum(cast(r as decimal(38,0))) as decimal(38,0))
                 |as bigint)""".stripMargin.replace("\n", " ")).as("mu1"),
          expr("""cast(cast(sum((1000000 - r) * cast(y as decimal(38,0)))
                 |as decimal(38,0))
                 |div cast(sum(cast(1000000 - r as decimal(38,0)))
                 |as decimal(38,0)) as bigint)""".stripMargin
            .replace("\n", " ")).as("mu2"),
          expr("cast(sum(r) div 1000000 as bigint)").as("n1"),
          expr("cast(sum(1000000 - r) div 1000000 as bigint)").as("n2"))
        if (!reestimateS2) base
        else {
          // full M-step: shared σ² from the NEW means (removes the
          // between-mode spread so the next E-step sharpens)
          val v = e.crossJoin(broadcast(base.select("mu1", "mu2")))
            .agg(expr(
              """cast((sum(cast(r as decimal(38,0)) * (y - mu1) * (y - mu1))
                |+ sum(cast(1000000 - r as decimal(38,0)) * (y - mu2)
                |* (y - mu2)))
                |div (count(1) * cast(1000000 as decimal(38,0)))
                |as bigint)""".stripMargin.replace("\n", " ")).as("s2"))
          base.crossJoin(broadcast(v))
        }
      }
      val m1 = mStep(eStep(p0), reestimateS2 = true)
        .persist() // e2 + output row
      val m2 = mStep(eStep(m1), reestimateS2 = false)
      m1.select(lit(1L).as("iter"), col("mu1").as("mu1_e6"),
          col("mu2").as("mu2_e6"), col("n1").as("soft_n1"),
          col("n2").as("soft_n2"))
        .unionAll(m2.select(lit(2L), col("mu1"), col("mu2"), col("n1"),
          col("n2")))
        .orderBy("iter")
    },

    // Stratified + inverse-propensity-weighted ATE — the confounding
    // corrector the causal family (q330 matching, q331 DiD, q333 uplift)
    // was missing, with the ground truth PLANTED so the correction is
    // measurable, not asserted: treatment probability rises with the
    // order-priority stratum (10%·s), the outcome carries a +40000·s
    // stratum effect, a +25000 treatment effect, and bounded hash noise —
    // so the naive treated-minus-control difference inhales the stratum
    // skew (≈+38000 bias) while (a) the stratified estimator
    // Σ (n_s/N)(ȳ₁ₛ−ȳ₀ₛ) and (b) Horvitz–Thompson IPW under the KNOWN
    // propensity e=s/10 both land near +25000. With EMPIRICAL per-stratum
    // propensities IPW collapses to (a) algebraically; using the design
    // propensity keeps the two estimators distinct (IPW pays variance for
    // not estimating e). Exact integers: per-stratum sums cross-divided
    // at e6, IPW row contributions quantized per row under the stated
    // truncating div on both engines. One groupBy census — nothing here
    // shuffles more than a 5-row stratum table at any corpus size.
    QueryDef("q384_ipw_ate", {
      import graft.functions.Hashes
      s"""WITH o AS (
         |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS s,
         |         CASE WHEN ${Hashes.bucketSql("o_orderkey", 103, 10)}
         |              < CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
         |           THEN 1 ELSE 0 END AS t,
         |         ${Hashes.mulHashSql("o_orderkey", 107)} % 10000 AS noise
         |  FROM orders),
         |y AS (SELECT s, t,
         |        40000 * s + noise
         |          + CASE WHEN t = 1 THEN 25000 ELSE 0 END AS y
         |      FROM o),
         |g AS (SELECT s, t, CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(y) AS BIGINT) AS sy
         |      FROM y GROUP BY s, t),
         |tc AS (SELECT CAST(sum(CASE WHEN t = 1 THEN n END) AS BIGINT) AS nt,
         |         CAST(sum(CASE WHEN t = 1 THEN sy END) AS BIGINT) AS syt,
         |         CAST(sum(CASE WHEN t = 0 THEN n END) AS BIGINT) AS nc,
         |         CAST(sum(CASE WHEN t = 0 THEN sy END) AS BIGINT) AS syc,
         |         CAST(sum(n) AS BIGINT) AS nn
         |       FROM g),
         |st AS (SELECT a.s, a.n + b.n AS ns,
         |         a.sy * 1000000 // a.n - b.sy * 1000000 // b.n AS d_e6
         |       FROM (SELECT * FROM g WHERE t = 1) a
         |       JOIN (SELECT * FROM g WHERE t = 0) b ON a.s = b.s),
         |sa AS (SELECT CAST(sum(d_e6 * ns) // sum(ns) AS BIGINT)
         |         AS strat_ate_e6 FROM st),
         |ip AS (SELECT CAST(sum(CASE WHEN t = 1
         |           THEN y * 10000000 // s
         |           ELSE -(y * 10000000 // (10 - s)) END)
         |           // (SELECT nn FROM tc) AS BIGINT) AS ipw_ate_e6
         |       FROM y)
         |SELECT tc.nn AS n_orders, tc.nt AS n_treated,
         |       CAST(tc.syt * 1000000 // tc.nt
         |            - tc.syc * 1000000 // tc.nc AS BIGINT) AS naive_e6,
         |       sa.strat_ate_e6, ip.ipw_ate_e6
         |FROM tc, sa, ip""".stripMargin
    }) { (s, d) =>
      import graft.functions.Hashes
      val o = Tables.orders(s, d).select(
        expr("cast(substr(o_orderpriority, 1, 1) as bigint)").as("s"),
        when(Hashes.bucket(col("o_orderkey"), 103, 10)
          < expr("cast(substr(o_orderpriority, 1, 1) as bigint)"), 1L)
          .otherwise(0L).as("t"),
        (Hashes.mulHash(col("o_orderkey"), 107) % 10000).as("noise"))
      val y = o.select(col("s"), col("t"),
        (lit(40000L) * col("s") + col("noise")
          + when(col("t") === 1, 25000L).otherwise(0L)).as("y"))
        .persist() // stratum census + the IPW row pass
      val g = y.groupBy("s", "t")
        .agg(count(lit(1)).as("n"), sum("y").as("sy"))
        .persist() // totals + per-stratum diffs
      val tc = g.agg(
        sum(when(col("t") === 1, col("n"))).as("nt"),
        sum(when(col("t") === 1, col("sy"))).as("syt"),
        sum(when(col("t") === 0, col("n"))).as("nc"),
        sum(when(col("t") === 0, col("sy"))).as("syc"),
        sum("n").as("nn"))
      val st = g.where(col("t") === 1).as("a")
        .join(g.where(col("t") === 0).as("b"), col("a.s") === col("b.s"))
        .select((col("a.n") + col("b.n")).as("ns"),
          (expr("a.sy * 1000000 div a.n")
            - expr("b.sy * 1000000 div b.n")).as("d_e6"))
      val sa = st.agg(
        expr("cast(sum(d_e6 * ns) div sum(ns) as bigint)")
          .as("strat_ate_e6"))
      val ip = y.crossJoin(broadcast(tc.select("nn")))
        .agg(expr("""cast(sum(CASE WHEN t = 1
                    |THEN y * 10000000 div s
                    |ELSE -(y * 10000000 div (10 - s)) END)
                    |div max(nn) as bigint)""".stripMargin
          .replace("\n", " ")).as("ipw_ate_e6"))
      tc.crossJoin(broadcast(sa)).crossJoin(broadcast(ip))
        .select(col("nn").as("n_orders"), col("nt").as("n_treated"),
          (expr("syt * 1000000 div nt") - expr("syc * 1000000 div nc"))
            .cast("long").as("naive_e6"),
          col("strat_ate_e6"), col("ipw_ate_e6"))
    },

    // Benjamini–Hochberg FDR — the multiple-testing control the A/B
    // family (q226 two-sample z, q338 power, q334 SPRT) needs once there
    // are MANY hypotheses: 25 per-nation calibration tests against a
    // KNOWN null (outcome is a hash-uniform on [0, 10000), so the null
    // mean 4999.5 and σ=10000/√12 are theoretical constants — testing
    // against the known reference sidesteps the global-mean pollution a
    // pooled estimate would inhale from the planted nations). ~5 nations
    // (hash-chosen) carry a +2000 shift. p-values via the Abramowitz-
    // Stegun 7.1.26 erfc polynomial (the transcendental contract: one
    // double chain per CENSUS row, e6-quantized before any comparison);
    // BH is the integer step-up p_(k)·20·m ≤ k·1e6 — reject ranks up to
    // the LARGEST passing k. Output per nation: z, p, naive α=0.05
    // verdict, BH verdict. The spec checks every planted nation is
    // caught and BH never rejects more than naive (FDR ⊆ FWER-naive).
    QueryDef("q387_bh_fdr", {
      import graft.functions.Hashes
      val z = "CAST(az AS DOUBLE) / 1000000"
      val tt = s"(1 / (1 + 0.3275911 * ($z / sqrt(2))))"
      val erfcChain =
        s"""round(($tt * 0.254829592
           | - $tt * $tt * 0.284496736
           | + $tt * $tt * $tt * 1.421413741
           | - $tt * $tt * $tt * $tt * 1.453152027
           | + $tt * $tt * $tt * $tt * $tt * 1.061405429)
           | * exp(-($z / sqrt(2)) * ($z / sqrt(2))) * 1000000, 0)"""
          .stripMargin.replace("\n", " ")
      s"""WITH o AS (
         |  SELECT c.c_nationkey AS nat,
         |         ${Hashes.mulHashSql("o.o_orderkey", 109)} % 10000
         |           + CASE WHEN ${Hashes.bucketSql("c.c_nationkey", 113, 5)}
         |                       = 0 THEN 2000 ELSE 0 END AS y
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
         |g AS (SELECT nat, CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(y) AS BIGINT) AS sy
         |      FROM o GROUP BY nat),
         |zc AS (SELECT nat, n,
         |         CAST(round((CAST(sy AS DOUBLE) / n - 4999.5)
         |           * sqrt(CAST(n AS DOUBLE))
         |           / (10000 / sqrt(12.0)) * 1000000, 0) AS BIGINT) AS z_e6
         |       FROM g),
         |p AS (SELECT nat, n, z_e6, abs(z_e6) AS az FROM zc),
         |pv AS (SELECT nat, n, z_e6,
         |         CAST($erfcChain AS BIGINT) AS p_e6
         |       FROM p),
         |rk AS (SELECT nat, n, z_e6, p_e6,
         |         row_number() OVER (ORDER BY p_e6, nat) AS k,
         |         CAST(count(*) OVER () AS BIGINT) AS m
         |       FROM pv),
         |km AS (SELECT coalesce(max(CASE WHEN p_e6 * 20 * m <= k * 1000000
         |                       THEN k END), 0) AS kmax
         |       FROM rk)
         |SELECT nat AS nation_id, n, z_e6, p_e6,
         |       p_e6 * 20 <= 1000000 AS naive_reject,
         |       k <= (SELECT kmax FROM km) AS bh_reject
         |FROM rk ORDER BY p_e6, nation_id""".stripMargin
    }) { (s, d) =>
      import graft.functions.Hashes
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").cast("long").as("nat"),
          (Hashes.mulHash(col("o_orderkey"), 109) % 10000
            + when(Hashes.bucket(col("c_nationkey"), 113, 5) === 0, 2000L)
              .otherwise(0L)).as("y"))
      val g = o.groupBy("nat").agg(count(lit(1)).as("n"), sum("y").as("sy"))
      val zc = g.select(col("nat"), col("n"),
        round((col("sy").cast("double") / col("n") - 4999.5)
          * sqrt(col("n").cast("double"))
          / (lit(10000d) / sqrt(lit(12.0))) * 1000000, 0)
          .cast("long").as("z_e6"))
      val t = expr("1 / (1 + 0.3275911 * (cast(abs(z_e6) as double)" +
        " / 1000000 / sqrt(2)))")
      val x = expr("cast(abs(z_e6) as double) / 1000000 / sqrt(2)")
      val pv = zc.select(col("nat"), col("n"), col("z_e6"),
        round((t * 0.254829592 - t * t * 0.284496736
          + t * t * t * 1.421413741 - t * t * t * t * 1.453152027
          + t * t * t * t * t * 1.061405429) * exp(-x * x) * 1000000, 0)
          .cast("long").as("p_e6"))
      val w = Window.orderBy("p_e6", "nat")
      val rk = pv.select(col("nat"), col("n"), col("z_e6"), col("p_e6"),
          row_number().over(w).as("k"),
          count(lit(1)).over(Window.partitionBy()).as("m"))
        .persist() // the kmax census + the verdict rows
      val km = rk.agg(coalesce(max(when(
        col("p_e6") * 20 * col("m") <= col("k") * 1000000L, col("k"))),
        lit(0)).as("kmax"))
      rk.crossJoin(broadcast(km))
        .select(col("nat").as("nation_id"), col("n"), col("z_e6"),
          col("p_e6"),
          (col("p_e6") * 20 <= 1000000L).as("naive_reject"),
          (col("k") <= col("kmax")).as("bh_reject"))
        .orderBy("p_e6", "nation_id")
    },

    // CUPED variance reduction (Deng et al., WSDM 2013) — the A/B
    // industry's standard power multiplier: adjust the experiment metric
    // by a PRE-EXPERIMENT covariate, Y' = Y − θ(X − X̄), θ = cov/var,
    // shrinking variance by ρ² while leaving the treatment contrast
    // unbiased (assignment is independent of X). The experiment is
    // planted end-to-end: a persistent per-user baseline (hash-derived)
    // enters BOTH periods — users' natural event revenue alone is
    // nearly uncorrelated across periods (ρ≈0.07, measured) AND heavy
    // enough to drown a realistic plant, so the natural component is
    // scaled down (÷50, stated on both engines) and the baseline is
    // what gives CUPED its ρ≈0.99 to harvest — treatment is
    // a 50% hash split worth +5000 post-period cents. Exact integers
    // throughout: θ as an e6 ratio of 128-bit co-moment sums, per-user
    // adjustments via the n-scaled deviation with stated truncating
    // division, variances as n²-scaled second moments. θ pools both
    // arms (standard practice; the treatment term perturbs cov by an
    // identical amount on both engines). One user-grain census — the
    // q384 scale shape.
    QueryDef("q397_cuped", {
      import graft.functions.Hashes
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         |         CAST(round(greatest(value, 0) * 100, 0) AS BIGINT) AS c
         |  FROM events),
         |mm AS (SELECT CAST(min(day) AS BIGINT) AS d0 FROM e),
         |u AS (
         |  SELECT user_id,
         |    CAST(sum(CASE WHEN day - (SELECT d0 FROM mm) < 15
         |             THEN c ELSE 0 END) AS BIGINT) // 50
         |      + ${Hashes.mulHashSql("user_id", 131)} % 50000 AS x,
         |    CAST(sum(CASE WHEN day - (SELECT d0 FROM mm) >= 15
         |             THEN c ELSE 0 END) AS BIGINT) // 50
         |      + ${Hashes.mulHashSql("user_id", 131)} % 50000
         |      + CASE WHEN ${Hashes.bucketSql("user_id", 127, 2)} = 0
         |        THEN 5000 ELSE 0 END AS y,
         |    CASE WHEN ${Hashes.bucketSql("user_id", 127, 2)} = 0
         |      THEN 1 ELSE 0 END AS t
         |  FROM e GROUP BY user_id),
         |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(x) AS BIGINT) AS sx,
         |         CAST(sum(y) AS BIGINT) AS sy,
         |         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         |         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
         |       FROM u),
         |th AS (SELECT n, sx,
         |         CAST((n * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
         |              // (n * sxx - CAST(sx AS HUGEINT) * sx) AS BIGINT)
         |           AS theta_e6
         |       FROM mo),
         |adj AS (SELECT u.t,
         |          u.y * 1000000
         |            - th.theta_e6 * (th.n * u.x - th.sx) // th.n AS ycv
         |        FROM u, th),
         |arms AS (SELECT
         |    CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
         |    CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         |    CAST(sum(CASE WHEN t = 1 THEN ycv END) AS BIGINT) AS st,
         |    CAST(sum(CASE WHEN t = 0 THEN ycv END) AS BIGINT) AS sc,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(ycv AS HUGEINT) * ycv) AS HUGEINT) AS scv2,
         |    CAST(sum(ycv) AS HUGEINT) AS scv
         |  FROM adj),
         |raw AS (SELECT
         |    CAST(sum(CASE WHEN t = 1 THEN y END) AS BIGINT) AS syt,
         |    CAST(sum(CASE WHEN t = 0 THEN y END) AS BIGINT) AS syc,
         |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS sy2,
         |    CAST(sum(y) AS HUGEINT) AS sys
         |  FROM u)
         |SELECT arms.n AS n_users, arms.nt AS n_treated,
         |       th.theta_e6,
         |       CAST(raw.syt * 1000000 // arms.nt
         |            - raw.syc * 1000000 // arms.nc AS BIGINT)
         |         AS naive_ate_e6,
         |       CAST(arms.st // arms.nt - arms.sc // arms.nc AS BIGINT)
         |         AS cuped_ate_e6,
         |       CAST(1000000
         |            - (arms.n * arms.scv2 - arms.scv * arms.scv) * 1000000
         |              // ((arms.n * raw.sy2 - raw.sys * raw.sys)
         |                 * CAST(1000000000000 AS HUGEINT))
         |         AS BIGINT) AS var_reduction_ppm
         |FROM arms, raw, th""".stripMargin
    }) { (s, d) =>
      import graft.functions.Hashes
      val dec = "decimal(38,0)"
      val e = Tables.events(s, d).select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("cast(round(greatest(value, 0) * 100, 0) as bigint)").as("c"))
      val mm = e.agg(min("day").as("d0"))
      val u = e.crossJoin(broadcast(mm))
        .groupBy("user_id")
        .agg(sum(when(col("day") - col("d0") < 15, col("c")).otherwise(0L))
          .as("x0"),
          sum(when(col("day") - col("d0") >= 15, col("c")).otherwise(0L))
            .as("y0"))
        .select(col("user_id"),
          (expr("x0 div 50")
            + Hashes.mulHash(col("user_id"), 131) % 50000).as("x"),
          (expr("y0 div 50") + Hashes.mulHash(col("user_id"), 131) % 50000
            + when(Hashes.bucket(col("user_id"), 127, 2) === 0, 5000L)
              .otherwise(0L)).as("y"),
          when(Hashes.bucket(col("user_id"), 127, 2) === 0, 1L)
            .otherwise(0L).as("t"))
        .persist() // moment census + the adjusted pass + raw arms
      val mo = u.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum("y").as("sy"),
        sum(expr(s"cast(x as $dec) * y")).as("sxy"),
        sum(expr(s"cast(x as $dec) * x")).as("sxx"))
      val th = mo.select(col("n"), col("sx"),
        expr(s"""cast((n * sxy - cast(sx as $dec) * sy) * 1000000
                |div (n * sxx - cast(sx as $dec) * sx) as bigint)"""
          .stripMargin.replace("\n", " ")).as("theta_e6"))
      val adj = u.crossJoin(broadcast(th))
        .select(col("t"),
          expr("y * 1000000 - theta_e6 * (n * x - sx) div n").as("ycv"))
      val arms = adj.agg(
        sum(when(col("t") === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col("t") === 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col("t") === 1, col("ycv"))).as("st"),
        sum(when(col("t") === 0, col("ycv"))).as("sc"),
        count(lit(1)).as("n"),
        sum(expr(s"cast(ycv as $dec) * ycv")).as("scv2"),
        sum(col("ycv").cast(dec)).as("scv"))
      val raw = u.agg(
        sum(when(col("t") === 1, col("y"))).as("syt"),
        sum(when(col("t") === 0, col("y"))).as("syc"),
        sum(expr(s"cast(y as $dec) * y")).as("sy2"),
        sum(col("y").cast(dec)).as("sys"))
      arms.crossJoin(broadcast(raw))
        .crossJoin(broadcast(th.select("theta_e6")))
        .select(col("n").as("n_users"), col("nt").as("n_treated"),
          col("theta_e6"),
          (expr("syt * 1000000 div nt") - expr("syc * 1000000 div nc"))
            .cast("long").as("naive_ate_e6"),
          (expr("st div nt") - expr("sc div nc")).cast("long")
            .as("cuped_ate_e6"),
          expr(s"""cast(1000000
                  |- (n * scv2 - scv * scv) * 1000000
                  |div ((n * sy2 - sys * sys)
                  |* cast(1000000000000 as $dec)) as bigint)"""
            .stripMargin.replace("\n", " ")).as("var_reduction_ppm"))
    },

    // F1-optimal decision threshold — the post-training step every binary
    // scorer ships with (a threshold tuned on F1, not an arbitrary 0.5):
    // the score census sorted descending turns every candidate cut into
    // (tp, fp, fn) via ONE cumulative window — no per-threshold rescan —
    // and the argmax F1 row is flagged. The signal is PLANTED (urgent-ish
    // orders get a +300000 score boost over hash noise) so recovery is
    // measurable: the best threshold must land inside the boost band and
    // beat the all-positive baseline F1. Ventile candidate grid keeps the
    // output bounded; integer F1 = 2·tp·10⁶ div (2·tp + fp + fn).
    QueryDef("q429_f1_threshold", {
      import graft.functions.Hashes
      s"""WITH o AS (
         |  SELECT o_orderkey AS k,
         |         CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
         |                   <= 2 THEN 1 ELSE 0 END AS label
         |  FROM orders),
         |sc AS (SELECT k, label,
         |              (${Hashes.mulHashSql("k", 33)}) % 1000000
         |                + label * 300000 AS score
         |       FROM o),
         |tot AS (SELECT CAST(sum(label) AS BIGINT) AS p,
         |               CAST(count(*) AS BIGINT) AS n FROM sc),
         |r AS (SELECT score, label,
         |             CAST(row_number() OVER (ORDER BY score DESC, k)
         |               AS BIGINT) AS rn,
         |             CAST(sum(label) OVER (ORDER BY score DESC, k)
         |               AS BIGINT) AS tp
         |      FROM sc),
         |cand AS (SELECT * FROM r
         |         WHERE rn * 20 % (SELECT n FROM tot) < 20),
         |f AS (SELECT score AS threshold, rn AS n_pos_pred, tp,
         |             rn - tp AS fp, (SELECT p FROM tot) - tp AS fn,
         |             2 * tp * 1000000
         |               // (2 * tp + (rn - tp) + (SELECT p FROM tot) - tp)
         |               AS f1_ppm
         |      FROM cand),
         |b AS (SELECT max(f1_ppm) AS best FROM f)
         |SELECT threshold, n_pos_pred, tp, fp, fn, f1_ppm,
         |       (f1_ppm = (SELECT best FROM b)) AS is_best
         |FROM f ORDER BY threshold DESC""".stripMargin
    }) { (s, d) =>
      import graft.functions.Hashes
      import org.apache.spark.sql.expressions.Window
      val sc = Tables.orders(s, d).select(
        col("o_orderkey").as("k"),
        (substring(col("o_orderpriority"), 1, 1).cast("long") <= 2)
          .cast("long").as("label"))
        .select(col("k"), col("label"),
          (Hashes.mulHash(col("k"), 33) % 1000000
            + col("label") * 300000).as("score"))
        .persist() // totals census + the rank window
      val p = sc.agg(sum("label")).head().getLong(0)
      val n = sc.count()
      val w = Window.orderBy(col("score").desc, col("k"))
      val r = sc
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("tp", sum("label").over(w))
        .where(expr(s"rn * 20 % ${n}L < 20")) // ventile candidate grid
      val f = r.select(col("score").as("threshold"),
        col("rn").as("n_pos_pred"), col("tp"),
        (col("rn") - col("tp")).as("fp"),
        (lit(p) - col("tp")).as("fn"),
        expr(s"2 * tp * 1000000 div (2 * tp + (rn - tp) + ${p}L - tp)")
          .as("f1_ppm"))
        .persist() // best census + output
      val best = f.agg(max("f1_ppm")).head().getLong(0)
      f.withColumn("is_best", col("f1_ppm") === best)
        .orderBy(col("threshold").desc)
    },

    // Leave-one-group-out influence — data valuation made O(k) instead of
    // O(k·n): because the OLS fit is a function of SUFFICIENT STATISTICS
    // (n, Σx, Σy, Σxx, Σxy), refitting WITHOUT a group is global moments
    // MINUS that group's moments — no retraining pass per group, which is
    // the only formulation that survives 25 retrains over 100 TB. Here:
    // the spend-on-balance slope per customer nation, the full-data slope
    // vs each nation's leave-out slope, influence = the shift its removal
    // causes (e6 units, DECIMAL(38) headroom for the moment algebra,
    // truncated division stated on both engines).
    QueryDef("q413_logo_influence",
      """WITH r AS (
        |  SELECT c.c_nationkey AS nation,
        |         CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS x,
        |         CAST(sum(round(o.o_totalprice * 100, 0)) AS BIGINT) AS y
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_nationkey, c.c_custkey, c.c_acctbal),
        |g AS (SELECT nation, CAST(count(*) AS HUGEINT) AS n,
        |             CAST(sum(x) AS HUGEINT) AS sx,
        |             CAST(sum(y) AS HUGEINT) AS sy,
        |             CAST(sum(x * x) AS HUGEINT) AS sxx,
        |             CAST(sum(x * y) AS HUGEINT) AS sxy
        |      FROM r GROUP BY nation),
        |tot AS (SELECT sum(n) AS tn, sum(sx) AS tsx, sum(sy) AS tsy,
        |               sum(sxx) AS tsxx, sum(sxy) AS tsxy
        |        FROM g),
        |s AS (SELECT g.nation, g.n, tot.*,
        |             tot.tn - g.n AS ln, tot.tsx - g.sx AS lsx,
        |             tot.tsy - g.sy AS lsy, tot.tsxx - g.sxx AS lsxx,
        |             tot.tsxy - g.sxy AS lsxy
        |      FROM g, tot)
        |SELECT nation, CAST(n AS BIGINT) AS n_group,
        |       CAST((tn * tsxy - tsx * tsy) * 1000000
        |            // (tn * tsxx - tsx * tsx) AS BIGINT) AS slope_full_e6,
        |       CAST((ln * lsxy - lsx * lsy) * 1000000
        |            // (ln * lsxx - lsx * lsx) AS BIGINT) AS slope_loo_e6,
        |       CAST((ln * lsxy - lsx * lsy) * 1000000
        |            // (ln * lsxx - lsx * lsx)
        |            - (tn * tsxy - tsx * tsy) * 1000000
        |            // (tn * tsxx - tsx * tsx) AS BIGINT) AS influence_e6
        |FROM s ORDER BY nation""".stripMargin) { (s, d) =>
      val dec = "decimal(38,0)"
      val r = Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nation"), col("c_custkey"),
          round(col("c_acctbal") * 100, 0).cast("long").as("x"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("y"))
      val g = r.groupBy("nation").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      val tot = g.agg(sum("n").as("tn"), sum("sx").as("tsx"),
        sum("sy").as("tsy"), sum("sxx").as("tsxx"), sum("sxy").as("tsxy"))
      def slopeE6(n: String, sx: String, sy: String, sxx: String,
                  sxy: String) =
        s"""(cast($n as $dec) * $sxy - cast($sx as $dec) * $sy) * 1000000
           |div (cast($n as $dec) * $sxx - cast($sx as $dec) * $sx)"""
          .stripMargin.replace("\n", " ")
      g.crossJoin(broadcast(tot))
        .withColumn("ln", col("tn") - col("n"))
        .withColumn("lsx", col("tsx") - col("sx"))
        .withColumn("lsy", col("tsy") - col("sy"))
        .withColumn("lsxx", col("tsxx") - col("sxx"))
        .withColumn("lsxy", col("tsxy") - col("sxy"))
        .select(col("nation"), col("n").as("n_group"),
          expr(s"cast(${slopeE6("tn", "tsx", "tsy", "tsxx", "tsxy")} as bigint)")
            .as("slope_full_e6"),
          expr(s"cast(${slopeE6("ln", "lsx", "lsy", "lsxx", "lsxy")} as bigint)")
            .as("slope_loo_e6"),
          expr(s"cast(${slopeE6("ln", "lsx", "lsy", "lsxx", "lsxy")}" +
            s" - (${slopeE6("tn", "tsx", "tsy", "tsxx", "tsxy")}) as bigint)")
            .as("influence_e6"))
        .orderBy("nation")
    },

    // Depth-2 CART decision tree — exact greedy induction over SPLIT
    // CENSUSES (the supervised-learning gap next to q103's logistic GD
    // and q65's k-means): per node, the (feature, value, label) census
    // is a tiny groupBy, cumulative windows turn it into every candidate
    // split's class counts, and the Gini objective Σ_child (Σ_k cnt_k²)
    // /n_child is maximized in exact integers (e6-scaled division stated
    // identically on both engines; ties → (feature, value) asc). The
    // LABEL carries a PLANTED depth-2 rule — high-value AND urgent-ish
    // (f_bucket ≥ 3 ∧ f_prio ≤ 2) — with 10 % hash-flip noise, so
    // recovery is measurable, not asserted: the induced 4-leaf tree must
    // predict 1 on exactly the planted cell and land ≈ 90 % accuracy
    // (Round13Spec). Scale: each node's candidate evaluation touches
    // only its census (≤ Σ distinct feature values rows); the data is
    // scanned once per LEVEL, and the chosen split is a 1-row collect —
    // the scaler/codebook posture. Oracle replays census, argmax, both
    // child argmaxes, and the leaf table.
    QueryDef("q405_cart_tree", CartSql.sql) { (s, d) =>
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.expressions.Window
      import graft.functions.Hashes
      val o = Tables.orders(s, d).select(
        col("o_orderkey").as("k"),
        month(col("o_orderdate")).cast("long").as("f_month"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("f_prio"),
        expr("least(cast(round(o_totalprice * 100, 0) as bigint)" +
          " div 5000000, 9L)").as("f_bucket"))
        .withColumn("base",
          (col("f_bucket") >= 3 && col("f_prio") <= 2).cast("long"))
        .withColumn("flip",
          (Hashes.mulHash(col("k"), 17) % 10 === 0).cast("long"))
        .withColumn("label", (col("base") + col("flip")) % 2)
        .select("k", "f_month", "f_prio", "f_bucket", "label")
        .persist() // root census + two child censuses + leaf table
      def fcol(fn: String) = col(s"f_$fn")
      def bestSplit(node: DataFrame): (String, Long) = {
        val cen = node.select(
          expr("stack(3, 'bucket', f_bucket, 'month', f_month, " +
            "'prio', f_prio) AS (fn, fv)"), col("label"))
          .groupBy("fn", "fv")
          .agg(count(lit(1)).as("n"), sum("label").as("p"))
        val w = Window.partitionBy("fn").orderBy("fv")
        val t = Window.partitionBy("fn")
        val r = cen
          .withColumn("lc", sum("n").over(w))
          .withColumn("lp", sum("p").over(w))
          .withColumn("nn", sum("n").over(t))
          .withColumn("pp", sum("p").over(t))
          .withColumn("mx", max("fv").over(t))
          .where(col("fv") < col("mx"))
          .withColumn("score", expr(
            "(lp * lp + (lc - lp) * (lc - lp)) * 1000000 div lc" +
              " + ((pp - lp) * (pp - lp)" +
              " + (nn - lc - pp + lp) * (nn - lc - pp + lp))" +
              " * 1000000 div (nn - lc)"))
          .orderBy(col("score").desc, col("fn"), col("fv"))
          .limit(1).collect()(0) // 1-row census pick
        (r.getAs[String]("fn"), r.getAs[Long]("fv"))
      }
      val (rf, rt) = bestSplit(o)
      val lside = o.where(fcol(rf) <= rt)
      val rside = o.where(fcol(rf) > rt)
      val (lf, lt) = bestSplit(lside)
      val (rf2, rt2) = bestSplit(rside)
      def leaves(side: DataFrame, tag: String, cf: String, ct: Long) =
        side
          .withColumn("leaf",
            concat(lit(tag), when(fcol(cf) <= ct, "L").otherwise("R")))
          .groupBy("leaf")
          .agg(count(lit(1)).as("n"), sum("label").as("pos"))
          .withColumn("pred", (col("pos") * 2 > col("n")).cast("long"))
          .withColumn("n_correct", when(col("pred") === 1, col("pos"))
            .otherwise(col("n") - col("pos")))
          .withColumn("sub_f", lit(cf)).withColumn("sub_t", lit(ct))
      leaves(lside, "L", lf, lt)
        .unionByName(leaves(rside, "R", rf2, rt2))
        .withColumn("root_f", lit(rf)).withColumn("root_t", lit(rt))
        .select("leaf", "root_f", "root_t", "sub_f", "sub_t",
          "n", "pos", "pred", "n_correct")
        .orderBy("leaf")
    },

    // Isotonic regression (pool-adjacent-violators) — the monotone
    // calibrator production scorers actually ship (Zadrozny & Elkan,
    // KDD 2002), completing the calibration pair with q277's ECE: the
    // purchase rate per value bin, forced monotone non-decreasing with
    // minimal squared error. Instead of the sequential PAV merge loop,
    // the fitted value uses the MINIMAX closed form iso_i =
    // max_{j ≤ i} min_{k ≥ i} mean(rate over bins j..k) — over a B-bin
    // census that is a B³ combo join of three broadcast prefix
    // relations, pure integer arithmetic (e9-scaled truncated division,
    // stated identically on both engines). Scale: the data is touched
    // once for the bin census; everything after is B³ = 1000 census
    // rows. Round13Spec asserts the output is actually monotone and
    // collapses to the raw rates wherever those were already monotone.
    QueryDef("q406_isotonic_pav",
      """WITH x AS (
        |  SELECT least(CAST(round(greatest(value, 0) * 100, 0) AS BIGINT)
        |           // 5000, 9) AS bin,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |cen AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(y) AS BIGINT) AS pos
        |        FROM x GROUP BY bin),
        |c AS (SELECT bin, n, pos,
        |             CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
        |             CAST(sum(pos) OVER (ORDER BY bin) AS BIGINT) AS cp
        |      FROM cen),
        |jb AS (SELECT bin AS jbin, cn AS jcn, cp AS jcp FROM c
        |       UNION ALL SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT),
        |                        CAST(0 AS BIGINT)),
        |kb AS (SELECT bin AS kbin, cn AS kcn, cp AS kcp FROM c),
        |seg AS (
        |  SELECT c.bin, jb.jbin,
        |         (kb.kcp - jb.jcp) * 1000000000 // (kb.kcn - jb.jcn)
        |           AS avg_e9
        |  FROM c JOIN jb ON jb.jbin <= c.bin - 1
        |  JOIN kb ON kb.kbin >= c.bin),
        |mn AS (SELECT bin, jbin, min(avg_e9) AS m FROM seg
        |       GROUP BY bin, jbin),
        |iso AS (SELECT bin, max(m) AS iso_e9 FROM mn GROUP BY bin)
        |SELECT c.bin, c.n, c.pos,
        |       c.pos * 1000000000 // c.n AS raw_e9,
        |       iso.iso_e9
        |FROM c JOIN iso USING (bin) ORDER BY c.bin""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val x = Tables.events(s, d).select(
        expr("least(cast(round(greatest(value, 0) * 100, 0) as bigint)" +
          " div 5000, 9L)").as("bin"),
        (col("event_type") === "purchase").cast("long").as("y"))
      val cen = x.groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("y").as("pos"))
      // ≤ 10-row census — the single-partition window is the bin axis
      val w = Window.orderBy("bin")
      val c = cen
        .withColumn("cn", sum("n").over(w))
        .withColumn("cp", sum("pos").over(w))
        .persist() // three combo-join probes + the output join
      val jb = c.select(col("bin").as("jbin"), col("cn").as("jcn"),
        col("cp").as("jcp"))
        .unionByName(c.sparkSession.range(1).select(
          lit(-1L).as("jbin"), lit(0L).as("jcn"), lit(0L).as("jcp")))
      val kb = c.select(col("bin").as("kbin"), col("cn").as("kcn"),
        col("cp").as("kcp"))
      val iso = c.select("bin")
        .join(broadcast(jb), col("jbin") <= col("bin") - 1)
        .join(broadcast(kb), col("kbin") >= col("bin"))
        .withColumn("avg_e9",
          expr("(kcp - jcp) * 1000000000 div (kcn - jcn)"))
        .groupBy("bin", "jbin").agg(min("avg_e9").as("m"))
        .groupBy("bin").agg(max("m").as("iso_e9"))
      c.join(iso, "bin")
        .select(col("bin"), col("n"), col("pos"),
          expr("pos * 1000000000 div n").as("raw_e9"), col("iso_e9"))
        .orderBy("bin")
    },

    // Reliability diagram + expected calibration error — the model-eval
    // primitive that asks whether a classifier's SCORES mean what they
    // say (a 0.7 bucket should convert at 70 %): q20's sigmoid scores
    // over lineitem, label = returnflag R, 10 equal score bins; per bin
    // the mean claimed probability vs the realized rate, and ECE = the
    // n-weighted mean |gap| as one constant column. ULP-HARDENED
    // (round 12, with q20): z quantized once to e12, sigmoid as IntExp's
    // integer step chain — no libm in the comparison path; every
    // downstream number is exact integer arithmetic. Scale: one scored
    // projection + a ≤10-row census.
    QueryDef("q445_reliability_diagram", {
      val zSql = "CAST(round((-2.0 + l_discount * 10 * 4.0" +
        " + l_quantity / 50.0 * 1.0) * 1000000000000) AS BIGINT)"
      val scInner = graft.functions.IntExp.duckSigmoidE6(
        s"""SELECT $zSql AS z,
           |       CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
           |FROM lineitem""".stripMargin, "z")
      s"""WITH sc AS (SELECT p_e6, y FROM ($scInner)),
        |b AS (SELECT p_e6 * 10 // 1000001 AS bin, p_e6, y FROM sc),
        |cen AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |               CAST(sum(p_e6) AS BIGINT) // count(*) AS mean_p_e6,
        |               CAST(sum(y) AS BIGINT) * 1000000
        |                 // count(*) AS rate_e6
        |        FROM b GROUP BY bin),
        |g AS (SELECT bin, n, mean_p_e6, rate_e6,
        |             abs(mean_p_e6 - rate_e6) AS gap_e6 FROM cen),
        |ece AS (SELECT CAST(sum(n * gap_e6) AS BIGINT)
        |          // CAST(sum(n) AS BIGINT) AS ece_e6 FROM g)
        |SELECT bin, n, mean_p_e6, rate_e6, gap_e6, ece.ece_e6
        |FROM g CROSS JOIN ece ORDER BY bin""".stripMargin
    }) { (s, d) =>
      val base = Tables.lineitem(s, d).select(
        round(expr("-2.0 + l_discount * 10 * 4.0 + l_quantity / 50.0 * 1.0")
          * 1000000000000L, 0).cast("long").as("z"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      val sc = base
        .withColumn("p_e6", graft.functions.IntExp.sigmoidE6Col(col("z")))
        .select(col("p_e6"), col("y"))
      val g = sc.withColumn("bin", expr("p_e6 * 10 div 1000001"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          expr("sum(p_e6) div count(1)").as("mean_p_e6"),
          expr("sum(y) * 1000000 div count(1)").as("rate_e6"))
        .withColumn("gap_e6", abs(col("mean_p_e6") - col("rate_e6")))
        .persist() // output rows + the ECE fold
      val ece = g.agg(
        expr("sum(n * gap_e6) div sum(n)").as("ece_e6"))
      g.crossJoin(broadcast(ece))
        .select("bin", "n", "mean_p_e6", "rate_e6", "gap_e6", "ece_e6")
        .orderBy("bin")
    },

    // pass@k — THE code/reasoning-eval estimator (Chen et al. 2021,
    // Codex): with n attempts per task and c successes, the unbiased
    // estimator is 1 − C(n−c, k)/C(n, k) = 1 − ∏_{j<k} (n−c−j)/(n−j).
    // The product form runs in exact int64 (n = 20, k ≤ 10 → ∏ ≤ 20¹⁰),
    // and a zero factor (c > n − k) lands pass = 1 with no clamp branch.
    // The attempt log is the salted-hash synthetic (task difficulty
    // 5–34 %), so both engines replay it; output = per-k mean pass@k
    // over the task census — the number an eval report leads with.
    QueryDef("q446_pass_at_k", {
      val h = graft.functions.Hashes.mulHashSql("t * 100 + i", 313)
      s"""WITH a AS (
         |  SELECT t.t, i.i,
         |         CASE WHEN ($h) % 100 < 5 + (t.t * 7) % 30
         |              THEN 1 ELSE 0 END AS ok
         |  FROM (SELECT unnest(range(0, 50)) AS t) t,
         |       (SELECT unnest(range(0, 20)) AS i) i),
         |c AS (SELECT t, CAST(sum(ok) AS BIGINT) AS c,
         |             CAST(count(*) AS BIGINT) AS n
         |      FROM a GROUP BY t),
         |pk AS (SELECT k.k, c.t,
         |         1000000 - list_reduce(list_prepend(CAST(1 AS BIGINT),
         |             list_transform(range(0, k.k),
         |               j -> c.n - c.c - j)),
         |           (acc, f) -> acc * f) * 1000000
         |           // list_reduce(list_prepend(CAST(1 AS BIGINT),
         |             list_transform(range(0, k.k), j -> c.n - j)),
         |           (acc, f) -> acc * f) AS pass_e6
         |       FROM c, (SELECT unnest([1, 5, 10]) AS k) k)
         |SELECT k, CAST(count(*) AS BIGINT) AS n_tasks,
         |       CAST(sum(pass_e6) AS BIGINT) AS sum_pass_e6,
         |       CAST(sum(pass_e6) AS BIGINT) // count(*) AS mean_pass_e6
         |FROM pk GROUP BY k ORDER BY k""".stripMargin
    }) { (s, d) =>
      import graft.functions.Hashes
      val a = s.range(50).select(col("id").as("t"))
        .crossJoin(s.range(20).select(col("id").as("i")))
        .select(col("t"), col("i"),
          when(Hashes.mulHash(col("t") * 100 + col("i"), 313) % 100
            < lit(5) + (col("t") * 7) % 30, 1L).otherwise(0L).as("ok"))
      val c = a.groupBy("t")
        .agg(sum("ok").as("c"), count(lit(1)).as("n"))
      c.crossJoin(
          s.range(1).select(explode(array(lit(1), lit(5), lit(10))).as("k")))
        .select(col("k"), col("t"),
          expr("1000000L - aggregate(sequence(0, k - 1), 1L," +
            " (acc, j) -> acc * (n - c - j)) * 1000000L" +
            " div aggregate(sequence(0, k - 1), 1L," +
            " (acc, j) -> acc * (n - j))").as("pass_e6"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_tasks"), sum("pass_e6").as("sum_pass_e6"),
          expr("sum(pass_e6) div count(1)").as("mean_pass_e6"))
        .select("k", "n_tasks", "sum_pass_e6", "mean_pass_e6")
        .orderBy("k")
    },

    // Cohen's κ inter-annotator agreement (Cohen 1960) — the label-QA
    // primitive preference/annotation pipelines gate on (raw percent
    // agreement flatters whenever the label distribution is skewed; κ
    // subtracts chance agreement from the marginals). Two deterministic
    // "annotators" label value > $50 with 10 % / 20 % salted-hash flip
    // noise; per event type the 2×2 confusion census yields
    // p_o = (n11 + n00)/n, p_e = (m1a·m1b + m0a·m0b)/n², and
    // κ = (p_o − p_e)/(1 − p_e) in e6 integers — the marginal products
    // run through decimal(38)/HUGEINT (the q413 pattern: n²·1e6 clears
    // int64 past ~4M rows per cell). Degenerate p_e = 1 guards to 0 on
    // both engines. Scale: one keyed census + O(1) scalar math.
    QueryDef("q452_cohens_kappa", {
      val h1 = graft.functions.Hashes.mulHashSql("event_id", 41)
      val h2 = graft.functions.Hashes.mulHashSql("event_id", 43)
      s"""WITH e AS (
         |  SELECT event_type,
         |         CASE WHEN CAST(round(value * 100, 0) AS BIGINT) > 5000
         |              THEN 1 ELSE 0 END AS y,
         |         CASE WHEN ($h1) % 10 = 0 THEN 1 ELSE 0 END AS f1,
         |         CASE WHEN ($h2) % 5 = 0 THEN 1 ELSE 0 END AS f2
         |  FROM events),
         |a AS (SELECT event_type,
         |             CASE WHEN f1 = 1 THEN 1 - y ELSE y END AS a1,
         |             CASE WHEN f2 = 1 THEN 1 - y ELSE y END AS a2
         |      FROM e),
         |c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(a1 * a2) AS BIGINT) AS n11,
         |             CAST(sum(a1 * (1 - a2)) AS BIGINT) AS n10,
         |             CAST(sum((1 - a1) * a2) AS BIGINT) AS n01,
         |             CAST(sum((1 - a1) * (1 - a2)) AS BIGINT) AS n00
         |      FROM a GROUP BY event_type),
         |k AS (SELECT event_type, n, n11, n10, n01, n00,
         |             (n11 + n00) * 1000000 // n AS po_ppm,
         |             CAST((CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
         |                   + CAST(n01 + n00 AS HUGEINT) * (n10 + n00))
         |                  * 1000000
         |                  // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_ppm
         |      FROM c)
         |SELECT event_type, n, n11, n10, n01, n00, po_ppm, pe_ppm,
         |       CASE WHEN pe_ppm = 1000000 THEN CAST(0 AS BIGINT)
         |            ELSE (po_ppm - pe_ppm) * 1000000
         |                 // (1000000 - pe_ppm) END AS kappa_e6
         |FROM k ORDER BY event_type""".stripMargin
    }) { (s, d) =>
      import graft.functions.Hashes
      val a = Tables.events(s, d).select(col("event_type"),
          when(round(col("value") * 100, 0).cast("long") > 5000, 1L)
            .otherwise(0L).as("y"),
          (Hashes.mulHash(col("event_id"), 41) % 10 === 0).as("f1"),
          (Hashes.mulHash(col("event_id"), 43) % 5 === 0).as("f2"))
        .select(col("event_type"),
          when(col("f1"), lit(1L) - col("y")).otherwise(col("y")).as("a1"),
          when(col("f2"), lit(1L) - col("y")).otherwise(col("y")).as("a2"))
      a.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("a1") * col("a2")).as("n11"),
          sum(col("a1") * (lit(1L) - col("a2"))).as("n10"),
          sum((lit(1L) - col("a1")) * col("a2")).as("n01"),
          sum((lit(1L) - col("a1")) * (lit(1L) - col("a2"))).as("n00"))
        .select(col("event_type"), col("n"), col("n11"), col("n10"),
          col("n01"), col("n00"),
          expr("(n11 + n00) * 1000000 div n").as("po_ppm"),
          expr("cast((cast(n11 + n10 as decimal(38,0)) * (n11 + n01)" +
            " + cast(n01 + n00 as decimal(38,0)) * (n10 + n00)) * 1000000" +
            " div (cast(n as decimal(38,0)) * n) as bigint)").as("pe_ppm"))
        .withColumn("kappa_e6", expr(
          "CASE WHEN pe_ppm = 1000000 THEN 0L" +
            " ELSE (po_ppm - pe_ppm) * 1000000 div (1000000 - pe_ppm) END"))
        .orderBy("event_type")
    },

    // ELO rating ladder (Elo 1978; the arena-style model-ranking op run
    // over pairwise preference outcomes): 8 players, 150 sequential
    // matches from the salted-hash log (stronger true-strength wins with
    // probability ∝ the gap), expected score e = 1/(1 + 10^((r_b−r_a)/400))
    // e6-quantized ONCE per match (the q327 transcendental discipline),
    // rating deltas in EXPLICIT integer rounding (K = 32:
    // Δwin = (32·(1e6−e)+5e5) div 1e6) so the 150-step recurrence never
    // accumulates float state. The match log is a range() relation with
    // the hash columns evaluated IN the engine (mirrors the oracle's log
    // CTE), and the fold is a flatMapSortedGroups recurrence over one
    // global sorted group — the q442 TTL machinery: O(ratings) executor
    // state streamed over the ordered log, no driver state. A global
    // ladder is inherently one sequential chain; per-ladder (tournament /
    // category) deployments key the same groupByKey and parallelize
    // across ladders. Oracle is the q417-style recursive CTE carrying
    // all 8 ratings as state; the full per-match trace is hash-checked,
    // not just the final ladder.
    QueryDef("q453_elo_ladder", MediaSql.EloSql.sql) { (s, _) =>
      import s.implicits._
      val log = arenaLog(s).as[(Long, Long, Long, Long)]
      log.groupByKey(_ => 0)
        .flatMapSortedGroups(col("m")) { (_, rows) =>
          val r = Array.fill(8)(1000L)
          rows.map { case (m, pa, pb, awin) =>
            // IntExp's integer expectation — bit-identical to the oracle's
            // rendered step chain (round 12; was libm pow)
            val e = graft.functions.IntExp.eloExpectE6(
              r(pb.toInt) - r(pa.toInt))
            val da =
              if (awin == 1L) (32L * (1000000L - e) + 500000L) / 1000000L
              else -((32L * e + 500000L) / 1000000L)
            r(pa.toInt) += da
            r(pb.toInt) -= da
            (m, pa, pb, awin, e, r(pa.toInt), r(pb.toInt))
          }
        }
        .toDF("m", "pa", "pb", "a_won", "e_e6", "r_pa_after",
          "r_pb_after")
        .orderBy("m")
    },

    // Bradley–Terry pairwise-preference fit (Hunter 2004's MM algorithm) —
    // the BATCH-NATIVE, order-independent arena ranking over the SAME
    // 150-match log as q453's ELO ladder: where ELO folds the log
    // sequentially (path-dependent, one sorted group), Bradley–Terry fits
    // the MLE strengths with one census pass over the log + 6 MM rounds on
    // the player-sized statistics relation (broadcast joins) — the model a
    // preference-data pipeline actually fits at arena scale, where the log
    // is millions of comparisons and match order is meaningless. Fixed-point
    // e6 arithmetic throughout (operators/BradleyTerry); oracle unrolls the
    // 6 rounds as CTEs with HUGEINT renormalization. Round15Spec carries the
    // ScalaCheck invariant: on a balanced schedule the fitted strengths
    // reproduce the win-count order (Ford 1957's classical result).
    QueryDef("q455_bradley_terry", MediaSql.BtSql.sql) { (s, _) =>
      BradleyTerry.fit(s, arenaLog(s),
          s.range(8).toDF("player"), nPlayers = 8, rounds = MediaSql.BtSql.Rounds)
        .orderBy("player")
    },

    // Transitivity audit of the majority-win tournament — BEFORE fitting a
    // scalar rating (q453 ELO / q455 Bradley–Terry) an arena pipeline
    // should check the data is even scalar-rankable: majority edges per
    // decided pair (ties skip), then the directed-3-cycle census (a beats
    // b beats c beats a), each cycle counted once at its min-id vertex.
    // Cycles/testable-triples is the intransitivity rate; a high rate
    // means no single rating can honestly summarize the matchups. All
    // census-sized after one pass over the log (pairs ≤ players²).
    QueryDef("q466_win_transitivity", {
      val logCte = MediaSql.EloSql.logCte
      s"""WITH $logCte,
         |pc AS (SELECT least(pa, pb) AS lo, greatest(pa, pb) AS hi,
         |              CAST(sum(CASE WHEN (awin = 1) = (pa < pb)
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS wlo,
         |              CAST(count(*) AS BIGINT) AS nm
         |       FROM log GROUP BY 1, 2),
         |e AS (SELECT CASE WHEN 2 * wlo > nm THEN lo ELSE hi END AS u,
         |             CASE WHEN 2 * wlo > nm THEN hi ELSE lo END AS v
         |      FROM pc WHERE 2 * wlo <> nm),
         |p AS (SELECT lo, hi FROM pc WHERE 2 * wlo <> nm),
         |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triples
         |        FROM p ab JOIN p bc ON bc.lo = ab.hi
         |             JOIN p ac ON ac.lo = ab.lo AND ac.hi = bc.hi),
         |cyc AS (SELECT CAST(count(*) AS BIGINT) AS n_cycles
         |        FROM e e1 JOIN e e2 ON e2.u = e1.v
         |             JOIN e e3 ON e3.u = e2.v AND e3.v = e1.u
         |        WHERE e1.u < e2.u AND e1.u < e3.u),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_decided,
         |               CAST(sum(CASE WHEN 2 * wlo = nm THEN 1 ELSE 0 END)
         |                 AS BIGINT) AS n_tied
         |        FROM pc)
         |SELECT a.n_decided - a.n_tied AS n_edges, a.n_tied AS n_ties,
         |       t.n_triples, c.n_cycles,
         |       CASE WHEN t.n_triples = 0 THEN CAST(0 AS BIGINT)
         |            ELSE c.n_cycles * 1000000 // t.n_triples
         |       END AS cycle_ppm
         |FROM agg a CROSS JOIN tri t CROSS JOIN cyc c""".stripMargin
    }) { (s, _) =>
      val pc = arenaLog(s)
        .groupBy(least(col("pa"), col("pb")).as("lo"),
          greatest(col("pa"), col("pb")).as("hi"))
        .agg(sum(when((col("awin") === 1) === (col("pa") < col("pb")), 1L)
          .otherwise(0L)).as("wlo"), count(lit(1)).as("nm"))
        .persist() // edges, undirected pairs, and the tie census
      val e = pc.where(col("wlo") * 2 =!= col("nm"))
        .select(when(col("wlo") * 2 > col("nm"), col("lo"))
          .otherwise(col("hi")).as("u"),
          when(col("wlo") * 2 > col("nm"), col("hi"))
            .otherwise(col("lo")).as("v"))
      val p = pc.where(col("wlo") * 2 =!= col("nm")).select("lo", "hi")
      val tri = p.as("ab")
        .join(p.as("bc"), col("bc.lo") === col("ab.hi"))
        .join(p.as("ac"),
          col("ac.lo") === col("ab.lo") && col("ac.hi") === col("bc.hi"))
        .agg(count(lit(1)).as("n_triples"))
      val cyc = e.as("e1")
        .join(e.as("e2"), col("e2.u") === col("e1.v"))
        .join(e.as("e3"),
          col("e3.u") === col("e2.v") && col("e3.v") === col("e1.u"))
        .where(col("e1.u") < col("e2.u") && col("e1.u") < col("e3.u"))
        .agg(count(lit(1)).as("n_cycles"))
      val agg = pc.agg(count(lit(1)).as("n_decided"),
        sum(when(col("wlo") * 2 === col("nm"), 1L).otherwise(0L))
          .as("n_tied"))
      agg.crossJoin(broadcast(tri)).crossJoin(broadcast(cyc))
        .select((col("n_decided") - col("n_tied")).as("n_edges"),
          col("n_tied").as("n_ties"), col("n_triples"), col("n_cycles"),
          expr("CASE WHEN n_triples = 0 THEN 0L" +
            " ELSE n_cycles * 1000000 div n_triples END").as("cycle_ppm"))
    },

    // Fleiss' κ — q452's Cohen κ generalized past two raters: the QA gate
    // for a REAL annotation pool (m = 4 raters per document, binary
    // accept/reject from the salted hash with a per-doc difficulty split,
    // so agreement is neither perfect nor chance). Per-item agreement
    // P_i = (Σ_j n_ij² − m)/(m(m−1)) needs only the per-item category sum
    // (binary ⇒ Σ n_ij² = s² + (m−s)²) — ONE census aggregate over the
    // corpus; chance agreement P_e = Σ_j p_j² from the same census's
    // grand totals through decimal(38)/HUGEINT (the q413 pattern). All
    // e6-integer; the degenerate P_e = 1 case pinned to κ = 0 on both
    // engines (q452's guard).
    QueryDef("q459_fleiss_kappa", {
      val h = graft.functions.Hashes.mulHashSql("(doc_id * 4 + r.r)", 23)
      s"""WITH l AS (
         |  SELECT doc_id,
         |         CASE WHEN ($h) % 100 < 20 + (doc_id % 2) * 60
         |              THEN 1 ELSE 0 END AS cat
         |  FROM documents, (SELECT unnest(range(0, 4)) AS r) r),
         |per AS (SELECT doc_id, CAST(sum(cat) AS BIGINT) AS sc
         |        FROM l GROUP BY doc_id),
         |pi AS (SELECT doc_id, sc,
         |              (sc * sc + (4 - sc) * (4 - sc) - 4) * 1000000 // 12
         |                AS pi_e6
         |       FROM per),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(pi_e6) AS BIGINT) AS spi,
         |             CAST(sum(sc) AS BIGINT) AS t1
         |      FROM pi),
         |k AS (SELECT n, spi // n AS pbar_e6,
         |             CAST((CAST(t1 AS HUGEINT) * t1
         |                   + CAST(4 * n - t1 AS HUGEINT) * (4 * n - t1))
         |                  * 1000000
         |                  // (CAST(4 * n AS HUGEINT) * (4 * n))
         |               AS BIGINT) AS pe_e6
         |      FROM g)
         |SELECT n AS n_items, pbar_e6, pe_e6,
         |       CASE WHEN pe_e6 = 1000000 THEN CAST(0 AS BIGINT)
         |            ELSE (pbar_e6 - pe_e6) * 1000000
         |                 // (1000000 - pe_e6) END AS kappa_e6
         |FROM k""".stripMargin
    }) { (s, d) =>
      import graft.functions.Hashes
      val labels = Tables.documents(s, d)
        .select(col("doc_id"), explode(sequence(lit(0), lit(3))).as("r"))
        .select(col("doc_id"),
          when(Hashes.mulHash(col("doc_id") * 4 + col("r"), 23) % 100
            < lit(20) + (col("doc_id") % 2) * 60, 1L).otherwise(0L)
            .as("cat"))
      val per = labels.groupBy("doc_id").agg(sum("cat").as("sc"))
        .select(col("sc"),
          expr("(sc * sc + (4 - sc) * (4 - sc) - 4) * 1000000 div 12")
            .as("pi_e6"))
      per.agg(count(lit(1)).as("n"), sum("pi_e6").as("spi"),
          sum("sc").as("t1"))
        .select(col("n").as("n_items"),
          expr("spi div n").as("pbar_e6"),
          expr("cast((cast(t1 as decimal(38,0)) * t1" +
            " + cast(4 * n - t1 as decimal(38,0)) * (4 * n - t1))" +
            " * 1000000 div (cast(4 * n as decimal(38,0)) * (4 * n))" +
            " as bigint)").as("pe_e6"))
        .withColumn("kappa_e6", expr(
          "CASE WHEN pe_e6 = 1000000 THEN 0L" +
            " ELSE (pbar_e6 - pe_e6) * 1000000 div (1000000 - pe_e6) END"))
    },

    // Position-bias audit of pairwise preference data — before fitting
    // q453/q455 rankings, an arena pipeline must check the presentation
    // order isn't leaking into outcomes (humans measurably favor the
    // first-shown response). Each match gets a presentation draw (which
    // player was SHOWN first — the salted-hash bit); the audit censuses
    // win rate by shown-position overall and per player (n/wins when
    // shown first vs second, the per-player bias gap in ppm). On this
    // synthetic log the outcome is position-independent BY CONSTRUCTION,
    // so the measured gaps are pure sampling noise around zero — which is
    // exactly what the audit should report on unbiased data; the census
    // shapes (one pass, two aggregates) are the operator.
    QueryDef("q460_position_bias", {
      import graft.functions.Hashes
      val logCte = MediaSql.EloSql.logCte
      s"""WITH $logCte,
         |p AS (SELECT m, pa, pb, awin,
         |             (${Hashes.mulHashSql("m", 11)}) % 2 AS pa_first
         |      FROM log),
         |sides AS (
         |  SELECT pa AS player, pa_first = 1 AS shown_first,
         |         awin AS won FROM p
         |  UNION ALL
         |  SELECT pb, pa_first = 0, 1 - awin FROM p),
         |per AS (SELECT player,
         |          CAST(sum(CASE WHEN shown_first THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_first,
         |          CAST(sum(CASE WHEN shown_first THEN won ELSE 0 END)
         |            AS BIGINT) AS w_first,
         |          CAST(sum(CASE WHEN shown_first THEN 0 ELSE 1 END)
         |            AS BIGINT) AS n_second,
         |          CAST(sum(CASE WHEN shown_first THEN 0 ELSE won END)
         |            AS BIGINT) AS w_second
         |        FROM sides GROUP BY player)
         |SELECT player, n_first, w_first, n_second, w_second,
         |       (CASE WHEN n_first = 0 THEN 0
         |             ELSE w_first * 1000000 // n_first END)
         |         - (CASE WHEN n_second = 0 THEN 0
         |                 ELSE w_second * 1000000 // n_second END) AS bias_ppm
         |FROM per ORDER BY player""".stripMargin
    }) { (s, _) =>
      import graft.functions.Hashes
      val p = arenaLog(s)
        .withColumn("pa_first", Hashes.mulHash(col("m"), 11) % 2)
      val sides = p.select(col("pa").as("player"),
          (col("pa_first") === 1).as("shown_first"), col("awin").as("won"))
        .unionByName(p.select(col("pb").as("player"),
          (col("pa_first") === 0).as("shown_first"),
          (lit(1L) - col("awin")).as("won")))
      sides.groupBy("player")
        .agg(sum(when(col("shown_first"), 1L).otherwise(0L)).as("n_first"),
          sum(when(col("shown_first"), col("won")).otherwise(0L))
            .as("w_first"),
          sum(when(col("shown_first"), 0L).otherwise(1L)).as("n_second"),
          sum(when(col("shown_first"), 0L).otherwise(col("won")))
            .as("w_second"))
        .select(col("player"), col("n_first"), col("w_first"),
          col("n_second"), col("w_second"),
          // Zero-guarded on BOTH engines: a player never shown first (or
          // second) on a skewed log would NULL here but ERROR in DuckDB.
          expr("(CASE WHEN n_first = 0 THEN 0L" +
            " ELSE w_first * 1000000 div n_first END)" +
            " - (CASE WHEN n_second = 0 THEN 0L" +
            " ELSE w_second * 1000000 div n_second END)").as("bias_ppm"))
        .orderBy("player")
    },

    // ViT-style PATCHIFY — image → grid of 4×4 tiles → one relation row
    // per tile (the vision-transformer ingest shape; the first 1:N media
    // decoder, proving decodeFeatures' batch contract covers flatMap
    // decoders). Partial edge tiles are DROPPED — the 6- and 10-pixel-high
    // fixtures exercise exactly that contract (1 and 2 full tile rows).
    // Oracle replays per-tile channel sums from the fixture arithmetic
    // restricted to the covered pixel grid.
    QueryDef("q449_patchify", MediaSql.patchifySql) { (s, _) =>
      Multimodal.decodeFeatures(
        Multimodal.readMedia(s, MediaSql.fixtureDir, "*.ppm"),
        new Multimodal.PatchifyDecoder(4))
        .orderBy("media_id", "py", "px")
    },

    // VAD-style activity segmentation — PCM frames of 32 samples, a frame
    // is ACTIVE iff Σ|s| > 32·1024 (half the max mean amplitude), maximal
    // active runs become segments: the voice-activity shape an audio
    // pipeline runs before transcription, emitted as one row per segment
    // (1:N decoder like q449's). Partial tail frames drop (the 80-sample
    // fixtures exercise it). Oracle replays frame energies from the WAV
    // fixture arithmetic and rebuilds the runs with the gaps-and-islands
    // row_number trick.
    QueryDef("q450_vad_segments", MediaSql.vadSql) { (s, _) =>
      Multimodal.decodeFeatures(
        Multimodal.readMedia(s, MediaSql.fixtureDir, "*.wav"),
        new Multimodal.VadDecoder(32, 32L * 1024))
        .orderBy("media_id", "seg_idx")
    }
  )

  /** The shared 150-match arena log (q453 ELO ladder, q455 Bradley–Terry),
    * built IN the engine from range() + the salted hash so it mirrors the
    * oracles' log CTE column for column: 8 players, stronger-id wins with
    * probability ∝ the id gap. Columns (m, pa, pb, awin), all long.
    */
  private def arenaLog(s: SparkSession): DataFrame = {
    import graft.functions.Hashes
    s.range(MediaSql.EloSql.Matches.toLong).toDF("m")
      .withColumn("pa", Hashes.mulHash(col("m"), 3) % 8)
      .withColumn("pb",
        (col("pa") + 1 + Hashes.mulHash(col("m"), 5) % 7) % 8)
      .withColumn("awin",
        when(Hashes.mulHash(col("m"), 7) % 16
          < lit(8) + (col("pa") - col("pb")), 1L).otherwise(0L))
      .select(col("m"), col("pa"), col("pb"), col("awin"))
  }
}

/** Unrolled-CTE oracle for q229: the SAME JL projection, integer moment
  * census, exact centered covariance, and 4 power-iteration rounds (ascending
  * folds, 1e-9 snap after each normalize) as the Spark side — DuckDB walks
  * the identical doubles because every cross-row reduction is integer and
  * every in-round float op is IEEE correctly-rounded.
  */
private[queries] object PcaSql {
  val K = 16
  val Seed = 7L
  val Iters = 4

  import graft.operators.RandomProjection

  private def fold(body: String, range: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform($range, $body)), (x, y) -> x + y)""".stripMargin

  /** One power-iteration round: w = C·v (ascending j), nrm, snap to 1e-9. */
  private def round9(prev: String, wName: String, vName: String): String =
    s"""$wName AS (
       |  SELECT list_transform(range(1, ${K + 1}), i ->
       |    ${fold(s"j -> m[i][j] * v[j]", s"range(1, ${K + 1})")}) AS w
       |  FROM cm, $prev),
       |$vName AS (
       |  SELECT list_transform(w, x -> round(x / sqrt(
       |    ${fold("y -> y * y", "w")}), 9)) AS v
       |  FROM $wName)""".stripMargin

  val sql: String = {
    val coord = RandomProjection.coordSql("embedding", "j", 64, K, Seed)
    s"""WITH e AS MATERIALIZED (
       |  SELECT CAST(label AS BIGINT) AS label,
       |         list_transform(range(0, $K),
       |           j -> CAST(round(($coord) * 1000, 0) AS BIGINT)) AS q
       |  FROM embeddings),
       |cells AS MATERIALIZED (
       |  SELECT i, j, CAST(sum(q[i + 1] * q[j + 1]) AS BIGINT) AS s
       |  FROM e, (SELECT unnest(range(0, $K)) AS i),
       |       (SELECT unnest(range(0, $K)) AS j)
       |  GROUP BY i, j),
       |si AS MATERIALIZED (
       |  SELECT i, CAST(sum(q[i + 1]) AS BIGINT) AS s
       |  FROM e, (SELECT unnest(range(0, $K)) AS i) GROUP BY i),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
       |cdef AS (
       |  SELECT c.i AS i, c.j AS j,
       |         CAST(nn.n * c.s - a.s * b.s AS DOUBLE) AS v
       |  FROM cells c JOIN si a ON a.i = c.i JOIN si b ON b.i = c.j
       |  CROSS JOIN nn),
       |cm AS MATERIALIZED (
       |  SELECT list(rowl ORDER BY i) AS m FROM (
       |    SELECT i, list(v ORDER BY j) AS rowl FROM cdef GROUP BY i) t),
       |v0 AS (SELECT list_transform(range(0, $K),
       |         i -> CASE WHEN i = 0 THEN CAST(1 AS DOUBLE)
       |              ELSE CAST(0 AS DOUBLE) END) AS v),
       |${round9("v0", "w1", "v1")},
       |${round9("v1", "w2", "v2")},
       |${round9("v2", "w3", "v3")},
       |${round9("v3", "w4", "v4")},
       |lam AS (
       |  SELECT CAST(round(${fold(
              s"i -> v[i] * (${fold(s"j -> m[i][j] * v[j]", s"range(1, ${K + 1})")})",
              s"range(1, ${K + 1})")}, 0) AS BIGINT) AS lambda
       |  FROM cm, v4),
       |proj AS (
       |  SELECT label, CAST(round(${fold("i -> CAST(q[i] AS DOUBLE) * v[i]",
              s"range(1, ${K + 1})")}, 0) AS BIGINT) AS p
       |  FROM e, v4)
       |SELECT label, CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(sum(p) AS BIGINT) AS proj_sum_e3, lam.lambda AS lambda
       |FROM proj, lam GROUP BY label, lam.lambda ORDER BY label""".stripMargin
  }
}

/** q284 oracle: PcaSql's census + 4 rounds → v₁, the UN-rounded Rayleigh
  * λ₁, the deflated matrix C₂ = C − λ₁·v₁v₁ᵀ rebuilt cell-by-cell from the
  * exact cdef doubles, 4 more rounds on C₂ → v₂, and the orthogonality /
  * variance-share arithmetic — every float op in the same stated shape as
  * the Spark side.
  */
private[queries] object DeflateSql {
  import graft.operators.RandomProjection
  private val K = PcaSql.K

  /** 8 rounds per chain (vs q229's 4): the deflation subtraction inherits
    * v1's residual error, and the v1·v2 orthogonality witness is the
    * visible casualty — 4 rounds left it at −0.031, 16 bring it to
    * −0.003 (the spectral gap is small: λ₁/λ₂ ≈ 1.25, so each round only
    * shaves ~20% of the residual) while staying a fixed, stated count.
    */
  val Iters = 16

  private def fold(body: String, range: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform($range, $body)), (x, y) -> x + y)""".stripMargin

  /** One power-iteration round over matrix CTE `mat` (column `m`). */
  private def round9(mat: String, prev: String, wName: String,
                     vName: String): String =
    s"""$wName AS (
       |  SELECT list_transform(range(1, ${K + 1}), i ->
       |    ${fold(s"j -> $mat.m[i][j] * $prev.v[j]", s"range(1, ${K + 1})")}) AS w
       |  FROM $mat, $prev),
       |$vName AS (
       |  SELECT list_transform(w, x -> round(x / sqrt(
       |    ${fold("y -> y * y", "w")}), 9)) AS v
       |  FROM $wName)""".stripMargin

  private def rayleigh(mat: String, vc: String, name: String): String =
    s"""$name AS (
       |  SELECT ${fold(
            s"i -> $vc.v[i] * (${fold(s"j -> $mat.m[i][j] * $vc.v[j]",
              s"range(1, ${K + 1})")})",
            s"range(1, ${K + 1})")} AS lr
       |  FROM $mat, $vc)""".stripMargin

  val sql: String = {
    val coord = RandomProjection.coordSql("embedding", "j", 64, K, PcaSql.Seed)
    s"""WITH e AS MATERIALIZED (
       |  SELECT list_transform(range(0, $K),
       |           j -> CAST(round(($coord) * 1000, 0) AS BIGINT)) AS q
       |  FROM embeddings),
       |cells AS MATERIALIZED (
       |  SELECT i, j, CAST(sum(q[i + 1] * q[j + 1]) AS BIGINT) AS s
       |  FROM e, (SELECT unnest(range(0, $K)) AS i),
       |       (SELECT unnest(range(0, $K)) AS j)
       |  GROUP BY i, j),
       |si AS MATERIALIZED (
       |  SELECT i, CAST(sum(q[i + 1]) AS BIGINT) AS s
       |  FROM e, (SELECT unnest(range(0, $K)) AS i) GROUP BY i),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
       |cdef AS MATERIALIZED (
       |  SELECT c.i AS i, c.j AS j,
       |         CAST(nn.n * c.s - a.s * b.s AS DOUBLE) AS v
       |  FROM cells c JOIN si a ON a.i = c.i JOIN si b ON b.i = c.j
       |  CROSS JOIN nn),
       |cm AS MATERIALIZED (
       |  SELECT list(rowl ORDER BY i) AS m FROM (
       |    SELECT i, list(v ORDER BY j) AS rowl FROM cdef GROUP BY i) t),
       |v0 AS (SELECT list_transform(range(0, $K),
       |         i -> CASE WHEN i = 0 THEN CAST(1 AS DOUBLE)
       |              ELSE CAST(0 AS DOUBLE) END) AS v),
       |${(1 to Iters).map(r => round9("cm", if (r == 1) "v0" else s"v${r - 1}x",
            s"w$r", s"v${r}x")).mkString(",\n")},
       |${rayleigh("cm", s"v${Iters}x", "lamr")},
       |c2def AS (
       |  SELECT cd.i, cd.j,
       |         cd.v - lamr.lr * (v${Iters}x.v)[cd.i + 1]
       |              * (v${Iters}x.v)[cd.j + 1] AS v
       |  FROM cdef cd, lamr, v${Iters}x),
       |cm2 AS MATERIALIZED (
       |  SELECT list(rowl ORDER BY i) AS m FROM (
       |    SELECT i, list(v ORDER BY j) AS rowl FROM c2def GROUP BY i) t),
       |${(1 to Iters).map(r => round9("cm2", if (r == 1) "v0" else s"p${r - 1}x",
            s"u$r", s"p${r}x")).mkString(",\n")},
       |${rayleigh("cm2", s"p${Iters}x", "lam2r")},
       |ortho AS (
       |  SELECT ${fold("i -> (a.v)[i] * (b.v)[i]", s"range(1, ${K + 1})")} AS o
       |  FROM v${Iters}x a, p${Iters}x b),
       |shr AS (SELECT CAST(round(l1.lr / (l1.lr + l2.lr) * 1000000, 0)
       |          AS BIGINT) AS share1_ppm
       |        FROM lamr l1, lam2r l2),
       |out1 AS (SELECT CAST(1 AS BIGINT) AS comp,
       |           CAST(ii.i + 1 AS BIGINT) AS ci,
       |           CAST(round((v${Iters}x.v)[ii.i + 1] * 1000000000, 0)
       |             AS BIGINT) AS v_e9,
       |           CAST(round(lamr.lr, 0) AS BIGINT) AS lambda
       |         FROM v${Iters}x, lamr,
       |              (SELECT unnest(range(0, $K)) AS i) ii),
       |out2 AS (SELECT CAST(2 AS BIGINT) AS comp,
       |           CAST(ii.i + 1 AS BIGINT) AS ci,
       |           CAST(round((p${Iters}x.v)[ii.i + 1] * 1000000000, 0)
       |             AS BIGINT) AS v_e9,
       |           CAST(round(lam2r.lr, 0) AS BIGINT) AS lambda
       |         FROM p${Iters}x, lam2r,
       |              (SELECT unnest(range(0, $K)) AS i) ii)
       |SELECT z.comp, z.ci, z.v_e9, z.lambda,
       |       CAST(round(ortho.o * 1000000000, 0) AS BIGINT) AS ortho_e9,
       |       shr.share1_ppm
       |FROM (SELECT * FROM out1 UNION ALL SELECT * FROM out2) z, ortho, shr
       |ORDER BY z.comp, z.ci""".stripMargin
  }
}

/** DuckDB oracles replaying the media fixtures' decoded content from pure
  * arithmetic (tools/gen_media_fixture.py):
  *   image i (0..23): w = 8+(i%3)·4, h = 6+(i%2)·4,
  *                    payload byte f (channel f%3): (f·K + 97·i) mod 256
  *   clip j (0..7):   n = 64+16·j samples, s(t) = ((t·K + 131·j) mod 4096) − 2048
  * Spark decodes the actual container bytes; equality proves the parse.
  */
private[queries] object MediaSql {
  import java.io.File

  /** Resolve the repo fixture dir whether the JVM runs from the repo root or
    * elsewhere (the driver launches sbt from the repo).
    */
  def fixtureDir: String =
    Seq("fixtures/media", "/root/repo/fixtures/media")
      .map(new File(_)).find(_.isDirectory)
      .getOrElse(throw new IllegalStateException(
        "fixtures/media not found — run tools/gen_media_fixture.py"))
      .getAbsolutePath

  private val K = graft.functions.Hashes.Mult

  /** Per-image pixel replay CTEs shared by q47 and q76. */
  private val pixelCtes =
    s"""dims AS (SELECT i, 8 + (i % 3) * 4 AS w, 6 + (i % 2) * 4 AS h
       |         FROM (SELECT unnest(range(0, 24)) AS i)),
       |px AS (SELECT i, w, h, unnest(range(0, w * h * 3)) AS f FROM dims),
       |v AS (SELECT i, w, h, f % 3 AS ch, (f * $K + 97 * i) % 256 AS p FROM px)""".stripMargin

  /** q407: replay the Y4M fixtures' plane bytes over the SAMPLED frame
    * grid (stride 2) — b(v,t,p,f) = (t·131 + p·17 + f·K + 97·v) % 256.
    */
  val y4mSql: String =
    s"""WITH vids AS (
       |  SELECT i, 8 + (i % 3) * 4 AS w, 6 + (i % 2) * 4 AS h,
       |         6 + i % 5 AS nf
       |  FROM (SELECT unnest(range(0, 8)) AS i)),
       |st AS (SELECT i, w, h, nf, unnest(range(0, nf, 2)) AS t FROM vids),
       |pl AS (SELECT i, w, h, nf, t, unnest(range(0, 3)) AS p FROM st),
       |b AS (SELECT i, w, h, nf, t, p, unnest(range(0, w * h)) AS f
       |      FROM pl),
       |v AS (SELECT i, w, h, nf, t, p,
       |             (t * 131 + p * 17 + f * $K + 97 * i) % 256 AS val
       |      FROM b)
       |SELECT i AS media_id, CAST(max(w) AS INTEGER) AS width,
       |       CAST(max(h) AS INTEGER) AS height,
       |       CAST(max(nf) AS BIGINT) AS n_frames,
       |       CAST(count(DISTINCT t) AS BIGINT) AS n_sampled,
       |       CAST(sum(CASE WHEN p = 0 THEN val END) AS BIGINT) AS sum_y,
       |       CAST(sum(CASE WHEN p = 1 THEN val END) AS BIGINT) AS sum_u,
       |       CAST(sum(CASE WHEN p = 2 THEN val END) AS BIGINT) AS sum_v,
       |       CAST(sum(CASE WHEN p = 0 THEN (t + 1) * val END) AS BIGINT)
       |         AS wsum
       |FROM v GROUP BY i ORDER BY media_id""".stripMargin

  /** q434: replay the C420 fixtures over the sampled frame grid. Y is the
    * full-resolution formula; chroma is the SUBSAMPLED formula times 4 —
    * each quarter-plane byte covers a 2×2 full-res block after the
    * decoder's nearest-neighbor upsample, so the 4× factor in this oracle
    * is what proves the upsample ran.
    */
  val y4m420Sql: String =
    s"""WITH vids AS (
       |  SELECT i, 8 + (i % 3) * 4 AS w, 6 + (i % 2) * 4 AS h,
       |         5 + i % 4 AS nf
       |  FROM (SELECT unnest(range(0, 6)) AS i)),
       |st AS (SELECT i, w, h, nf, unnest(range(0, nf, 2)) AS t FROM vids),
       |yv AS (SELECT i, w, h, nf, t,
       |              (t * 131 + f * $K + 59 * i) % 256 AS val
       |       FROM (SELECT i, w, h, nf, t, unnest(range(0, w * h)) AS f
       |             FROM st)),
       |ya AS (SELECT i, max(w) AS w, max(h) AS h, max(nf) AS nf,
       |              count(DISTINCT t) AS n_sampled,
       |              sum(val) AS sum_y, sum((t + 1) * val) AS wsum
       |       FROM yv GROUP BY i),
       |cv AS (SELECT i, t, p,
       |              (t * 131 + p * 17 + f * $K + 59 * i) % 256 AS val
       |       FROM (SELECT i, t, p,
       |                    unnest(range(0, (w // 2) * (h // 2))) AS f
       |             FROM (SELECT i, w, h, t, unnest(range(1, 3)) AS p
       |                   FROM st))),
       |ca AS (SELECT i,
       |              4 * sum(CASE WHEN p = 1 THEN val END) AS sum_u,
       |              4 * sum(CASE WHEN p = 2 THEN val END) AS sum_v
       |       FROM cv GROUP BY i)
       |SELECT ya.i AS media_id, CAST(w AS INTEGER) AS width,
       |       CAST(h AS INTEGER) AS height, CAST(nf AS BIGINT) AS n_frames,
       |       CAST(n_sampled AS BIGINT) AS n_sampled,
       |       CAST(sum_y AS BIGINT) AS sum_y,
       |       CAST(sum_u AS BIGINT) AS sum_u,
       |       CAST(sum_v AS BIGINT) AS sum_v,
       |       CAST(wsum AS BIGINT) AS wsum
       |FROM ya JOIN ca ON ya.i = ca.i ORDER BY media_id""".stripMargin

  /** q477: replay the C422 fixtures over the sampled frame grid. Y is the
    * full-resolution formula; chroma is the SUBSAMPLED (half-width,
    * full-height) formula times 2 — each half-width byte covers a 2×1 pair
    * after the decoder's nearest-neighbor upsample, so the 2× factor is
    * what proves the 4:2:2 upsample ran (q434's 4× discipline, new axis).
    */
  val y4m422Sql: String =
    s"""WITH vids AS (
       |  SELECT i, 8 + (i % 3) * 4 AS w, 5 + (i % 2) * 4 AS h,
       |         4 + i % 4 AS nf
       |  FROM (SELECT unnest(range(0, 6)) AS i)),
       |st AS (SELECT i, w, h, nf, unnest(range(0, nf, 2)) AS t FROM vids),
       |yv AS (SELECT i, w, h, nf, t,
       |              (t * 131 + f * $K + 71 * i) % 256 AS val
       |       FROM (SELECT i, w, h, nf, t, unnest(range(0, w * h)) AS f
       |             FROM st)),
       |ya AS (SELECT i, max(w) AS w, max(h) AS h, max(nf) AS nf,
       |              count(DISTINCT t) AS n_sampled,
       |              sum(val) AS sum_y, sum((t + 1) * val) AS wsum
       |       FROM yv GROUP BY i),
       |cv AS (SELECT i, t, p,
       |              (t * 131 + p * 17 + f * $K + 71 * i) % 256 AS val
       |       FROM (SELECT i, t, p,
       |                    unnest(range(0, (w // 2) * h)) AS f
       |             FROM (SELECT i, w, h, t, unnest(range(1, 3)) AS p
       |                   FROM st))),
       |ca AS (SELECT i,
       |              2 * sum(CASE WHEN p = 1 THEN val END) AS sum_u,
       |              2 * sum(CASE WHEN p = 2 THEN val END) AS sum_v
       |       FROM cv GROUP BY i)
       |SELECT ya.i AS media_id, CAST(w AS INTEGER) AS width,
       |       CAST(h AS INTEGER) AS height, CAST(nf AS BIGINT) AS n_frames,
       |       CAST(n_sampled AS BIGINT) AS n_sampled,
       |       CAST(sum_y AS BIGINT) AS sum_y,
       |       CAST(sum_u AS BIGINT) AS sum_u,
       |       CAST(sum_v AS BIGINT) AS sum_v,
       |       CAST(wsum AS BIGINT) AS wsum
       |FROM ya JOIN ca ON ya.i = ca.i ORDER BY media_id""".stripMargin

  val imageSql: String =
    s"""WITH $pixelCtes
       |SELECT i AS media_id, CAST(max(w) AS INTEGER) AS width,
       |       CAST(max(h) AS INTEGER) AS height,
       |       CAST(max(w) * max(h) AS BIGINT) AS n_pixels,
       |       CAST(sum(CASE WHEN ch = 0 THEN p END) AS BIGINT) AS sum_r,
       |       CAST(sum(CASE WHEN ch = 1 THEN p END) AS BIGINT) AS sum_g,
       |       CAST(sum(CASE WHEN ch = 2 THEN p END) AS BIGINT) AS sum_b
       |FROM v GROUP BY i ORDER BY media_id""".stripMargin

  val bmpSql: String =
    s"""WITH dims AS (SELECT i, 7 + (i % 3) * 4 AS w, 6 + (i % 2) * 4 AS h
       |              FROM (SELECT unnest(range(0, 12)) AS i)),
       |px AS (SELECT i, w, h, unnest(range(0, w * h * 3)) AS f FROM dims),
       |v AS (SELECT i, w, h, f, f % 3 AS ch, (f * $K + 211 * i) % 256 AS p
       |      FROM px)
       |SELECT i AS media_id, CAST(max(w) AS INTEGER) AS width,
       |       CAST(max(h) AS INTEGER) AS height,
       |       CAST(max(w) * max(h) AS BIGINT) AS n_pixels,
       |       CAST(sum(CASE WHEN ch = 0 THEN p END) AS BIGINT) AS sum_r,
       |       CAST(sum(CASE WHEN ch = 1 THEN p END) AS BIGINT) AS sum_g,
       |       CAST(sum(CASE WHEN ch = 2 THEN p END) AS BIGINT) AS sum_b,
       |       CAST(sum((f + 1) * p) AS BIGINT) AS wsum
       |FROM v GROUP BY i ORDER BY media_id""".stripMargin

  /** PNG fixtures: w = 5+(i%3)·4, h = 6+(i%2)·4, pixel (f·K + 229·i) mod 256
    * in image order — the compression/filtering is invisible to the replay,
    * which is the point: the contract proves Spark's inflate+defilter
    * reconstructs exactly the arithmetic the file was built from.
    */
  val pngSql: String =
    s"""WITH dims AS (SELECT i, 5 + (i % 3) * 4 AS w, 6 + (i % 2) * 4 AS h
       |              FROM (SELECT unnest(range(0, 12)) AS i)),
       |px AS (SELECT i, w, h, unnest(range(0, w * h * 3)) AS f FROM dims),
       |v AS (SELECT i, w, h, f, f % 3 AS ch, (f * $K + 229 * i) % 256 AS p
       |      FROM px)
       |SELECT i AS media_id, CAST(max(w) AS INTEGER) AS width,
       |       CAST(max(h) AS INTEGER) AS height,
       |       CAST(max(w) * max(h) AS BIGINT) AS n_pixels,
       |       CAST(sum(CASE WHEN ch = 0 THEN p END) AS BIGINT) AS sum_r,
       |       CAST(sum(CASE WHEN ch = 1 THEN p END) AS BIGINT) AS sum_g,
       |       CAST(sum(CASE WHEN ch = 2 THEN p END) AS BIGINT) AS sum_b,
       |       CAST(sum((f + 1) * p) AS BIGINT) AS wsum
       |FROM v GROUP BY i ORDER BY media_id""".stripMargin

  /** Shared SQL fragment: the decoder's fixed-point integer YCbCr→RGB
    * (MediaCodecs.ycc2rgb — libjpeg e16 constants with the 2^24 additive
    * bias so `//`'s toward-zero truncation equals the JVM's floor-shift;
    * fixture values never clamp, so no CASE needed).
    */
  private def ycc(yv: String, cb: String, cr: String): String =
    s"""$yv + (91881 * ($cr - 128) + 32768 + 16777216) // 65536 - 256 AS r,
       |$yv + (-22554 * ($cb - 128) - 46802 * ($cr - 128) + 32768
       |       + 16777216) // 65536 - 256 AS g,
       |$yv + (116130 * ($cb - 128) + 32768 + 16777216) // 65536 - 256
       |  AS b""".stripMargin

  private val jpegSelect: String =
    """SELECT i AS media_id, CAST(max(w) AS INTEGER) AS width,
      |       CAST(max(h) AS INTEGER) AS height,
      |       CAST(max(w) * max(h) AS BIGINT) AS n_pixels,
      |       CAST(sum(r) AS BIGINT) AS sum_r,
      |       CAST(sum(g) AS BIGINT) AS sum_g,
      |       CAST(sum(b) AS BIGINT) AS sum_b,
      |       CAST(sum((3 * q + 1) * r + (3 * q + 2) * g + (3 * q + 3) * b)
      |         AS BIGINT) AS wsum
      |FROM v GROUP BY i ORDER BY media_id""".stripMargin

  /** JPEG 4:4:4 fixtures (tools/gen_media_fixture.py): per-8×8-block
    * constant Y/Cb/Cr from the formulas below, DC-only bitstream with
    * qDC = 8 ⇒ the decode is EXACT, so the oracle replays pixels from the
    * block arithmetic + the integer color convert — the JPEG container
    * (Huffman coding, DC prediction, restarts, MCU crop) is invisible to
    * the replay, which is the point: equality proves the full baseline
    * decode path byte for byte.
    */
  val jpeg444Sql: String =
    s"""WITH dims AS (SELECT i, 8 * (2 + i % 3) - 3 * (i % 2) AS w,
       |                     8 * (1 + i % 2)
       |                       - (CASE WHEN i % 3 = 2 THEN 2 ELSE 0 END) AS h
       |              FROM (SELECT unnest(range(0, 12)) AS i)),
       |px AS (SELECT i, w, h, unnest(range(0, w * h)) AS q FROM dims),
       |blk AS (SELECT i, w, h, q, (q % w) // 8 AS bx, (q // w) // 8 AS by
       |        FROM px),
       |c AS (SELECT i, q, 48 + (97 * i + 17 * bx + 29 * by) % 160 AS yv,
       |             126 + (i + bx + 2 * by) % 5 AS cb,
       |             126 + (2 * i + 3 * bx + by) % 5 AS cr, w, h
       |      FROM blk),
       |v AS (SELECT i, w, h, q, ${ycc("yv", "cb", "cr")} FROM c)
       |$jpegSelect""".stripMargin

  /** JPEG 4:2:0 fixtures: Y constant per 8×8 block, chroma constant per
    * 16×16 MCU (one chroma block upsampled 2×2 by the decoder); replay as
    * in [[jpeg444Sql]]. The 5·(i%3)-column and 6·(i%2)-row crops prove the
    * decoder drops MCU padding; DRI=1 files reset the DC predictor every
    * MCU.
    */
  val jpeg420Sql: String =
    s"""WITH dims AS (SELECT i, 16 * (1 + i % 2) - 5 * (i % 3) AS w,
       |                     16 - 6 * (i % 2) AS h
       |              FROM (SELECT unnest(range(0, 12)) AS i)),
       |px AS (SELECT i, w, h, unnest(range(0, w * h)) AS q FROM dims),
       |blk AS (SELECT i, w, h, q, (q % w) // 8 AS bx, (q // w) // 8 AS by,
       |               (q % w) // 16 AS cx
       |        FROM px),
       |c AS (SELECT i, q, 48 + (89 * i + 13 * bx + 23 * by) % 160 AS yv,
       |             126 + (i + cx) % 5 AS cb,
       |             126 + (2 * i + cx) % 5 AS cr, w, h
       |      FROM blk),
       |v AS (SELECT i, w, h, q, ${ycc("yv", "cb", "cr")} FROM c)
       |$jpegSelect""".stripMargin

  /** PROGRESSIVE JPEG fixtures (SOF2, 4:4:4, same DC-only exact subspace as
    * [[jpeg444Sql]] — constant blocks, qDC = 8): the replay is identical in
    * shape, with the fixture's own block formulas; the T.81 annex-G
    * machinery the engine crosses (DC first/refine passes, per-component
    * EOBRUN AC band scans, varied scan order, inter-scan DHT redefinition,
    * per-scan restart resets) is invisible to the replay — which is the
    * point: equality proves the multi-scan coefficient reassembly exactly.
    */
  val jpegProgSql: String =
    s"""WITH dims AS (SELECT i, 8 * (2 + i % 3) - 3 * (i % 2) AS w,
       |                     8 * (1 + i % 2)
       |                       - (CASE WHEN i % 3 = 2 THEN 2 ELSE 0 END) AS h
       |              FROM (SELECT unnest(range(0, 10)) AS i)),
       |px AS (SELECT i, w, h, unnest(range(0, w * h)) AS q FROM dims),
       |blk AS (SELECT i, w, h, q, (q % w) // 8 AS bx, (q // w) // 8 AS by
       |        FROM px),
       |c AS (SELECT i, q, 48 + (101 * i + 19 * bx + 31 * by) % 160 AS yv,
       |             126 + (3 * i + bx + by) % 5 AS cb,
       |             126 + (i + 2 * bx + 3 * by) % 5 AS cr, w, h
       |      FROM blk),
       |v AS (SELECT i, w, h, q, ${ycc("yv", "cb", "cr")} FROM c)
       |$jpegSelect""".stripMargin

  /** GIF fixtures: w = 6+(i%3)·4, h = 6+(i%2)·4; pixel index at q = y·w+x is
    * (q·K + 241·i) mod 256, palette byte (k·3+c) is ((k·3+c)·K + 83·i) mod
    * 256 — so decoded RGB at flat f is a two-level arithmetic replay. LZW,
    * interlacing and table precedence are invisible to the replay, which is
    * the point: equality proves the full decompress + de-interlace +
    * palette-resolve path.
    */
  val gifSql: String =
    s"""WITH dims AS (SELECT i, 6 + (i % 3) * 4 AS w, 6 + (i % 2) * 4 AS h
       |              FROM (SELECT unnest(range(0, 12)) AS i)),
       |px AS (SELECT i, w, h, unnest(range(0, w * h * 3)) AS f FROM dims),
       |v AS (SELECT i, w, h, f, f % 3 AS ch,
       |             (((((f // 3) * $K + 241 * i) % 256) * 3 + (f % 3))
       |                * $K + 83 * i) % 256 AS p
       |      FROM px)
       |SELECT i AS media_id, CAST(max(w) AS INTEGER) AS width,
       |       CAST(max(h) AS INTEGER) AS height,
       |       CAST(max(w) * max(h) AS BIGINT) AS n_pixels,
       |       CAST(sum(CASE WHEN ch = 0 THEN p END) AS BIGINT) AS sum_r,
       |       CAST(sum(CASE WHEN ch = 1 THEN p END) AS BIGINT) AS sum_g,
       |       CAST(sum(CASE WHEN ch = 2 THEN p END) AS BIGINT) AS sum_b,
       |       CAST(sum((f + 1) * p) AS BIGINT) AS wsum
       |FROM v GROUP BY i ORDER BY media_id""".stripMargin

  /** QOI fixtures: w = 6+(i%3)·4, h = 6+(i%2)·4; pixels come in RUN GROUPS
    * of 4 (gg = q÷4) on a 4-value grid whose step depends on the zone
    * (gg mod 8 ≥ 4 → ×32, else ×2) and every gg mod 4 = 3 group repeats
    * group gg−2's color: p = (((src·12+c)·K + 151·i) mod 4)·mult + c.
    * Every fixture drives RUN, INDEX, LUMA and RGB ops through the decoder
    * (DIFF rides the smooth-gradient fuzz property); the compression ops
    * are invisible to the replay, proving the op-stream reconstruction.
    */
  val qoiSql: String =
    s"""WITH dims AS (SELECT i, 6 + (i % 3) * 4 AS w, 6 + (i % 2) * 4 AS h
       |              FROM (SELECT unnest(range(0, 12)) AS i)),
       |px AS (SELECT i, w, h, unnest(range(0, w * h * 3)) AS f FROM dims),
       |g AS (SELECT i, w, h, f, f % 3 AS ch, (f // 3) // 4 AS gg FROM px),
       |v AS (SELECT i, w, h, f, ch,
       |             (((gg - 2 * (CASE WHEN gg % 4 = 3 THEN 1 ELSE 0 END))
       |                 * 12 + ch) * $K + 151 * i) % 4
       |               * (CASE WHEN gg % 8 >= 4 THEN 32 ELSE 2 END) + ch AS p
       |      FROM g)
       |SELECT i AS media_id, CAST(max(w) AS INTEGER) AS width,
       |       CAST(max(h) AS INTEGER) AS height,
       |       CAST(max(w) * max(h) AS BIGINT) AS n_pixels,
       |       CAST(sum(CASE WHEN ch = 0 THEN p END) AS BIGINT) AS sum_r,
       |       CAST(sum(CASE WHEN ch = 1 THEN p END) AS BIGINT) AS sum_g,
       |       CAST(sum(CASE WHEN ch = 2 THEN p END) AS BIGINT) AS sum_b,
       |       CAST(sum((f + 1) * p) AS BIGINT) AS wsum
       |FROM v GROUP BY i ORDER BY media_id""".stripMargin

  /** q449: per-4×4-tile channel sums over the PPM fixtures, full tiles
    * only — the covered grid is x < (w//4)·4, y < (h//4)·4; pixel values
    * replay from the fixture arithmetic in IMAGE order.
    */
  val patchifySql: String =
    s"""WITH dims AS (SELECT i, 8 + (i % 3) * 4 AS w, 6 + (i % 2) * 4 AS h
       |              FROM (SELECT unnest(range(0, 24)) AS i)),
       |py AS (SELECT i, w, h, yy.y FROM dims,
       |       unnest(range(0, (h // 4) * 4)) AS yy(y)),
       |px AS (SELECT i, w, y, xx.x FROM py,
       |       unnest(range(0, (w // 4) * 4)) AS xx(x)),
       |ch AS (SELECT i, w, y, x, cc.c,
       |              (y * w + x) * 3 + cc.c AS f
       |       FROM px, unnest(range(0, 3)) AS cc(c)),
       |v AS (SELECT i, y // 4 AS py, x // 4 AS px, c,
       |             (f * $K + 97 * i) % 256 AS p
       |      FROM ch)
       |SELECT i AS media_id, CAST(py AS BIGINT) AS py,
       |       CAST(px AS BIGINT) AS px,
       |       CAST(count(*) // 3 AS BIGINT) AS n_px,
       |       CAST(sum(CASE WHEN c = 0 THEN p END) AS BIGINT) AS sum_r,
       |       CAST(sum(CASE WHEN c = 1 THEN p END) AS BIGINT) AS sum_g,
       |       CAST(sum(CASE WHEN c = 2 THEN p END) AS BIGINT) AS sum_b
       |FROM v GROUP BY i, py, px ORDER BY media_id, py, px""".stripMargin

  /** q450: frame energies from the WAV fixture arithmetic (frames of 32,
    * partial tails dropped), active iff energy > 32·1024, maximal runs via
    * the gaps-and-islands row_number trick.
    */
  val vadSql: String =
    s"""WITH clips AS (SELECT j, 64 + 16 * j AS n
       |               FROM (SELECT unnest(range(0, 8)) AS j)),
       |fr AS (SELECT j, ff.f FROM clips,
       |       unnest(range(0, n // 32)) AS ff(f)),
       |sm AS (SELECT j, f,
       |              abs(((tt.t * $K + 131 * j) % 4096) - 2048) AS a
       |       FROM fr, unnest(range(f * 32, (f + 1) * 32)) AS tt(t)),
       |en AS (SELECT j, f, CAST(sum(a) AS BIGINT) AS e
       |       FROM sm GROUP BY j, f),
       |act AS (SELECT j, f, e FROM en WHERE e > 32 * 1024),
       |isl AS (SELECT j, f, e,
       |               f - row_number() OVER (PARTITION BY j ORDER BY f)
       |                 AS g
       |        FROM act),
       |seg AS (SELECT j, g, CAST(min(f) AS BIGINT) AS start_frame,
       |               CAST(max(f) AS BIGINT) AS end_frame,
       |               CAST(count(*) AS BIGINT) AS n_frames,
       |               CAST(sum(e) AS BIGINT) AS energy
       |        FROM isl GROUP BY j, g)
       |SELECT j AS media_id,
       |       CAST(row_number() OVER (PARTITION BY j ORDER BY start_frame)
       |            - 1 AS BIGINT) AS seg_idx,
       |       start_frame, end_frame, n_frames, energy
       |FROM seg ORDER BY media_id, seg_idx""".stripMargin

  val audioSql: String =
    s"""WITH clips AS (SELECT j, 64 + 16 * j AS n
       |               FROM (SELECT unnest(range(0, 8)) AS j)),
       |t AS (SELECT j, n, unnest(range(0, n)) AS t FROM clips),
       |s AS (SELECT j, n, ((t * $K + 131 * j) % 4096) - 2048 AS v FROM t)
       |SELECT j AS media_id, CAST(8000 AS INTEGER) AS sample_rate,
       |       CAST(max(n) AS BIGINT) AS n_samples,
       |       CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
       |       CAST(max(abs(v)) AS BIGINT) AS max_abs
       |FROM s GROUP BY j ORDER BY media_id""".stripMargin

  private[queries] object EloSql {
    val Matches = 150
    import graft.functions.Hashes

    /** The arena match-log CTE (8 players, salted-hash outcomes, stronger
      * id wins with probability ∝ the gap) — shared by q453's recursive ELO
      * oracle and q455's Bradley–Terry oracle; mirrors MlQueries.arenaLog
      * column for column. NOT stripMargin'd — embedders strip at use.
      */
    val logCte: String =
      s"""log AS MATERIALIZED (
         |  SELECT mm.m,
         |         (${Hashes.mulHashSql("mm.m", 3)}) % 8 AS pa,
         |         ((${Hashes.mulHashSql("mm.m", 3)}) % 8 + 1
         |          + (${Hashes.mulHashSql("mm.m", 5)}) % 7) % 8 AS pb,
         |         CASE WHEN (${Hashes.mulHashSql("mm.m", 7)}) % 16
         |              < 8 + ((${Hashes.mulHashSql("mm.m", 3)}) % 8
         |                     - ((${Hashes.mulHashSql("mm.m", 3)}) % 8 + 1
         |                        + (${Hashes.mulHashSql("mm.m", 5)}) % 7)
         |                       % 8)
         |              THEN 1 ELSE 0 END AS awin
         |  FROM (SELECT unnest(range(0, $Matches)) AS m) mm)"""

    /** q453: the same match log + ELO recurrence as a recursive CTE
      * carrying all 8 ratings as state (the q417 arm-state pattern).
      * e is e6-quantized once per match; deltas are explicit integer
      * rounding, so no float state crosses recursion levels.
      */
    val sql: String = {
      val rCols = (0 until 8).map(i => s"r$i")
      def pick(src: String, p: String): String =
        s"CASE $p " + (0 until 8)
          .map(i => s"WHEN $i THEN $src.r$i").mkString(" ") + " END"
      val seed = "SELECT CAST(-1 AS BIGINT) AS m, " +
        rCols.map(c => s"CAST(1000 AS BIGINT) AS $c").mkString(", ") +
        ", CAST(0 AS BIGINT) AS pa, CAST(0 AS BIGINT) AS pb" +
        ", CAST(0 AS BIGINT) AS awin, CAST(0 AS BIGINT) AS e"
      // e comes from IntExp's integer step chain (round 12) — the same
      // truncating arithmetic the engine fold's IntExp.eloExpectE6 runs,
      // so no libm (pow) remains anywhere in the trace's comparison path
      val inner = "SELECT l.m, l.pa, l.pb, l.awin, " +
        rCols.map(c => s"rec.$c").mkString(", ") +
        s", ${pick("rec", "l.pa")} AS rpa, ${pick("rec", "l.pb")} AS rpb" +
        " FROM log l JOIN rec ON l.m = rec.m + 1"
      val withE = graft.functions.IntExp.duckEloE(inner, "rpb - rpa")
      val step = "SELECT s.m, " +
        (0 until 8).map(i =>
          s"s.r$i + (CASE WHEN s.pa = $i THEN s.da" +
            s" WHEN s.pb = $i THEN s.db ELSE 0 END)").mkString(", ") +
        ", s.pa, s.pb, s.awin, s.e FROM (" +
        "SELECT q.*, CASE WHEN q.awin = 1" +
        " THEN (32 * (1000000 - q.e) + 500000) // 1000000" +
        " ELSE -((32 * q.e + 500000) // 1000000) END AS da," +
        " CASE WHEN q.awin = 1" +
        " THEN -((32 * (1000000 - q.e) + 500000) // 1000000)" +
        " ELSE (32 * q.e + 500000) // 1000000 END AS db FROM (" +
        withE + ") q) s"
      s"""WITH RECURSIVE $logCte,
         |rec(m, ${rCols.mkString(", ")}, pa, pb, awin, e) AS (
         |  $seed
         |  UNION ALL
         |  $step)
         |SELECT m, pa, pb, awin AS a_won, e AS e_e6,
         |       ${pick("rec", "pa")} AS r_pa_after,
         |       ${pick("rec", "pb")} AS r_pb_after
         |FROM rec WHERE m >= 0 ORDER BY m""".stripMargin
    }
  }

  /** q455: Bradley–Terry MM fit over the same arena log, unrolled as CTEs.
    * Per round r: per-pair MM terms `nm·1e12 // (p_lo+p_hi)` fan to both
    * endpoints via unnest, per-player denominators sum them, the update is
    * `w·1e12 // d` floored at 1, and the renormalize to Σ=8e6 runs through
    * HUGEINT — each step the integer-exact mirror of
    * operators/BradleyTerry.fit.
    */
  private[queries] object BtSql {
    val Rounds = 6

    val sql: String = {
      // Every round CTE is multiply-referenced (p$prev twice by t$r, r$r
      // twice by p$r); DuckDB INLINES such CTEs (playbook #43) and the
      // 6-round chain expands ~4^6 — judge-measured 654 s vs 0.46 s with
      // AS MATERIALIZED. Same rows either way; materialize everything.
      val rounds = (1 to Rounds).map { r =>
        val prev = s"p${r - 1}"
        s"""t$r AS MATERIALIZED (SELECT unnest([c.lo, c.hi]) AS player,
           |            c.nm * 1000000000000 // (plo.p_e6 + phi.p_e6) AS t_e6
           |     FROM c JOIN $prev plo ON c.lo = plo.player
           |            JOIN $prev phi ON c.hi = phi.player),
           |d$r AS MATERIALIZED (SELECT player, CAST(sum(t_e6) AS BIGINT) AS d_e6
           |     FROM t$r GROUP BY player),
           |r$r AS MATERIALIZED (SELECT b.player,
           |            greatest(1, b.w * 1000000000000
           |              // coalesce(d.d_e6, 1)) AS p_e6
           |     FROM base b LEFT JOIN d$r d ON b.player = d.player),
           |p$r AS MATERIALIZED (SELECT player, CAST(CAST(p_e6 AS HUGEINT) * 8000000
           |            // (SELECT sum(p_e6) FROM r$r) AS BIGINT) AS p_e6
           |     FROM r$r)"""
      }.mkString(",\n")
      s"""WITH ${EloSql.logCte},
         |wins AS (SELECT CASE WHEN awin = 1 THEN pa ELSE pb END AS player,
         |                count(*) AS w FROM log GROUP BY 1),
         |players AS (SELECT unnest(range(0, 8)) AS player),
         |base AS MATERIALIZED (SELECT pl.player, CAST(coalesce(w.w, 0) AS BIGINT) AS w
         |         FROM players pl LEFT JOIN wins w ON pl.player = w.player),
         |c AS MATERIALIZED (SELECT least(pa, pb) AS lo, greatest(pa, pb) AS hi,
         |             count(*) AS nm FROM log GROUP BY 1, 2),
         |p0 AS MATERIALIZED (SELECT player, CAST(1000000 AS BIGINT) AS p_e6 FROM players),
         |$rounds
         |SELECT b.player, b.w AS wins, p.p_e6 AS strength_e6
         |FROM base b JOIN p$Rounds p ON b.player = p.player
         |ORDER BY b.player""".stripMargin
    }
  }

  /** FLAC fixtures: channels c = 1 + (j%2), per-channel samples m = 48+16j,
    * INTERLEAVED sample formula v(j,t) = ((t·K + 157j) mod 4096) − 2048 over
    * t < c·m — identical shape to [[audioSql]] because lossless decode
    * reproduces PCM bit-exactly whatever predictors/partitions/stereo modes
    * the container used.
    */
  val flacSql: String =
    s"""WITH clips AS (SELECT j, (1 + (j % 2)) * (48 + 16 * j) AS n
       |               FROM (SELECT unnest(range(0, 8)) AS j)),
       |t AS (SELECT j, n, unnest(range(0, n)) AS t FROM clips),
       |s AS (SELECT j, n, ((t * $K + 157 * j) % 4096) - 2048 AS v FROM t)
       |SELECT j AS media_id, CAST(8000 AS INTEGER) AS sample_rate,
       |       CAST(max(n) AS BIGINT) AS n_samples,
       |       CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
       |       CAST(max(abs(v)) AS BIGINT) AS max_abs
       |FROM s GROUP BY j ORDER BY media_id""".stripMargin

  val knnSql: String =
    s"""WITH $pixelCtes,
       |feat AS (SELECT i AS media_id, max(h) AS height,
       |                CAST(sum(CASE WHEN ch = 0 THEN p END) AS DOUBLE) AS sr,
       |                CAST(sum(CASE WHEN ch = 1 THEN p END) AS DOUBLE) AS sg,
       |                CAST(sum(CASE WHEN ch = 2 THEN p END) AS DOUBLE) AS sb
       |         FROM v GROUP BY i),
       |n AS (SELECT media_id, height, sr, sg, sb,
       |             sqrt(sr * sr + sg * sg + sb * sb) AS nrm FROM feat),
       |p AS (SELECT a.media_id AS query_id, b.media_id AS neighbor_id,
       |             round((a.sr * b.sr + a.sg * b.sg + a.sb * b.sb)
       |               / (a.nrm * b.nrm), 6) AS cos
       |      FROM n a JOIN n b
       |        ON a.height = b.height AND a.media_id <> b.media_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |             row_number() OVER (PARTITION BY query_id
       |               ORDER BY cos DESC, neighbor_id) AS rank
       |      FROM p)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos
       |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** dHash replay: 9×8 grid grays under three pixel variants (identity,
    * corner watermark, brightness), adjacent-comparison bits packed into
    * four 16-bit bands, band-bucket candidate join, Hamming ≤ 6 filter —
    * the identical algorithm the Spark decoder runs over real decoded
    * bytes, restated as range() arithmetic over the fixture formula.
    */
  val dhashSql: String =
    s"""WITH dims AS (SELECT i, 8 + (i % 3) * 4 AS w, 6 + (i % 2) * 4 AS h
       |              FROM (SELECT unnest(range(0, 24)) AS i)),
       |grid AS (SELECT i, w, h, x, y, (x * w) // 9 AS px, (y * h) // 8 AS py
       |         FROM dims,
       |              (SELECT unnest(range(0, 9)) AS x),
       |              (SELECT unnest(range(0, 8)) AS y)),
       |vpx AS (SELECT i, w, h, x, y, px, py,
       |               (((py * w + px) * 3 + ch) * $K + 97 * i) % 256 AS p
       |        FROM grid, (SELECT unnest(range(0, 3)) AS ch)),
       |gr AS (SELECT i, x, y,
       |         CAST(sum(p) AS BIGINT) AS g0,
       |         CAST(sum(CASE WHEN px < w // 3 AND py < h // 3
       |                       THEN least(p + 100, 255) ELSE p END) AS BIGINT) AS g1,
       |         CAST(sum(least(p + 40, 255)) AS BIGINT) AS g2
       |       FROM vpx GROUP BY i, x, y),
       |b AS (SELECT a.i, a.x, a.y,
       |        CASE WHEN n.g0 > a.g0 THEN 1 ELSE 0 END AS bit0,
       |        CASE WHEN n.g1 > a.g1 THEN 1 ELSE 0 END AS bit1,
       |        CASE WHEN n.g2 > a.g2 THEN 1 ELSE 0 END AS bit2
       |      FROM gr a JOIN gr n ON n.i = a.i AND n.y = a.y AND n.x = a.x + 1
       |      WHERE a.x < 8),
       |bd AS (SELECT i, (y * 8 + x) // 16 AS band,
       |         CAST(sum(bit0 * (1 << ((y * 8 + x) % 16))) AS BIGINT) AS v0,
       |         CAST(sum(bit1 * (1 << ((y * 8 + x) % 16))) AS BIGINT) AS v1,
       |         CAST(sum(bit2 * (1 << ((y * 8 + x) % 16))) AS BIGINT) AS v2
       |       FROM b GROUP BY i, band),
       |var AS (SELECT i AS id, band, v0 AS val FROM bd
       |        UNION ALL SELECT i + 1000, band, v1 FROM bd
       |        UNION ALL SELECT i + 2000, band, v2 FROM bd),
       |vec AS (SELECT id, list(val ORDER BY band) AS bv FROM var GROUP BY id),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |         FROM var a JOIN var b
       |           ON a.band = b.band AND a.val = b.val AND a.id < b.id),
       |hm AS (SELECT id_a, id_b,
       |         CAST(bit_count(xor(xa.bv[1], xb.bv[1]))
       |            + bit_count(xor(xa.bv[2], xb.bv[2]))
       |            + bit_count(xor(xa.bv[3], xb.bv[3]))
       |            + bit_count(xor(xa.bv[4], xb.bv[4])) AS BIGINT) AS hamming
       |       FROM cand
       |       JOIN vec xa ON xa.id = cand.id_a
       |       JOIN vec xb ON xb.id = cand.id_b)
       |SELECT id_a, id_b, hamming FROM hm WHERE hamming <= 6
       |ORDER BY id_a, id_b""".stripMargin

  /** Audio-fingerprint replay: 33 frame energies per WAV fixture under
    * three variants (identity, gain ×2, silenced first eighth), 32
    * comparison bits as two 16-bit bands, band join + Hamming ≤ 6 — the
    * q162 pipeline with samples for pixels.
    */
  val audioFpSql: String =
    s"""WITH dims AS (SELECT j, 64 + 16 * j AS n
       |              FROM (SELECT unnest(range(0, 8)) AS j)),
       |fr AS (SELECT j, n, unnest(range(0, 33)) AS f FROM dims),
       |ft AS (SELECT j, n, f,
       |              unnest(range((f * n) // 33, ((f + 1) * n) // 33)) AS t
       |       FROM fr),
       |sv AS (SELECT j, n, f, t,
       |              ((t * $K + 131 * j) % 4096) - 2048 AS s FROM ft),
       |e AS (SELECT j, f,
       |        CAST(sum(abs(s)) AS BIGINT) AS e0,
       |        CAST(sum(abs(s * 2)) AS BIGINT) AS e1,
       |        CAST(sum(CASE WHEN t < n // 8 THEN 0 ELSE abs(s) END)
       |          AS BIGINT) AS e2
       |      FROM sv GROUP BY j, f),
       |b AS (SELECT a.j, a.f,
       |        CASE WHEN x.e0 > a.e0 THEN 1 ELSE 0 END AS bit0,
       |        CASE WHEN x.e1 > a.e1 THEN 1 ELSE 0 END AS bit1,
       |        CASE WHEN x.e2 > a.e2 THEN 1 ELSE 0 END AS bit2
       |      FROM e a JOIN e x ON x.j = a.j AND x.f = a.f + 1
       |      WHERE a.f < 32),
       |bd AS (SELECT j, f // 16 AS band,
       |         CAST(sum(bit0 * (1 << (f % 16))) AS BIGINT) AS v0,
       |         CAST(sum(bit1 * (1 << (f % 16))) AS BIGINT) AS v1,
       |         CAST(sum(bit2 * (1 << (f % 16))) AS BIGINT) AS v2
       |       FROM b GROUP BY j, band),
       |var AS (SELECT j AS id, band, v0 AS val FROM bd
       |        UNION ALL SELECT j + 100, band, v1 FROM bd
       |        UNION ALL SELECT j + 200, band, v2 FROM bd),
       |vec AS (SELECT id, list(val ORDER BY band) AS bv FROM var GROUP BY id),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |         FROM var a JOIN var b
       |           ON a.band = b.band AND a.val = b.val AND a.id < b.id),
       |hm AS (SELECT id_a, id_b,
       |         CAST(bit_count(xor(xa.bv[1], xb.bv[1]))
       |            + bit_count(xor(xa.bv[2], xb.bv[2])) AS BIGINT) AS hamming
       |       FROM cand
       |       JOIN vec xa ON xa.id = cand.id_a
       |       JOIN vec xb ON xb.id = cand.id_b)
       |SELECT id_a, id_b, hamming FROM hm WHERE hamming <= 6
       |ORDER BY id_a, id_b""".stripMargin
}

/** Unrolled-CTE DuckDB oracle for the 3-round logistic GD: weight relation
  * w_k (columns b/c0/c1), gradient relation g_k with per-row terms quantized
  * to integer 1e-6 units, update `round(w − 0.5·(S/1e6/n), 9)` — the same
  * arithmetic, in the same double-op order, as
  * [[graft.operators.LogisticGD.fit]].
  */
private object LrGdSql {
  private def sig(w: String) = s"1/(1+exp(-($w.b + $w.c0*f0 + $w.c1*f1)))"

  private def gradCte(g: String, w: String) = {
    def term(mult: String) =
      s"CAST(sum(CAST(round((${sig(w)} - y)$mult * 1000000, 0) AS BIGINT)) AS BIGINT)"
    s"""$g AS (SELECT ${term("")} AS gb,
       |             ${term(" * f0")} AS g0,
       |             ${term(" * f1")} AS g1
       |      FROM d, $w)""".stripMargin
  }

  private def updCte(wN: String, w: String, g: String) = {
    def upd(old: String, s: String) =
      s"round($w.$old - 0.5 * (CAST($g.$s AS DOUBLE) / 1000000 / nn.n), 9)"
    s"""$wN AS (SELECT ${upd("b", "gb")} AS b, ${upd("c0", "g0")} AS c0,
       |              ${upd("c1", "g1")} AS c1
       |       FROM $w, $g, nn)""".stripMargin
  }

  /** The shared unrolled chain `d, nn, w_0 … w_3` — q103's trajectory with
    * EVERY intermediate weight vector visible (q251 scores examples under
    * w_1/w_2/w_3; q103 reads only the final w_3).
    */
  private[queries] val chain3: String =
    s"""d AS (SELECT l_discount * 10 AS f0, l_quantity / 50.0 AS f1,
       |                  CASE WHEN l_linestatus = 'O' THEN 1.0 ELSE 0.0 END AS y
       |           FROM lineitem),
       |nn AS (SELECT count(*) AS n FROM d),
       |w_0 AS (SELECT 0.0 AS b, 0.0 AS c0, 0.0 AS c1),
       |${gradCte("g_1", "w_0")},
       |${updCte("w_1", "w_0", "g_1")},
       |${gradCte("g_2", "w_1")},
       |${updCte("w_2", "w_1", "g_2")},
       |${gradCte("g_3", "w_2")},
       |${updCte("w_3", "w_2", "g_3")}""".stripMargin

  val sql: String =
    s"""WITH $chain3
       |SELECT param, value FROM (
       |  SELECT 'bias' AS param, b AS value FROM w_3
       |  UNION ALL SELECT 'w0', c0 FROM w_3
       |  UNION ALL SELECT 'w1', c1 FROM w_3)
       |ORDER BY param""".stripMargin

  /** q48's error-bound contract: LBFGS must land within BoundEps of the
    * 3-round deterministic-GD anchor on every parameter. Both optimize the
    * same logistic loss from the same data, whose optimum sits near the
    * origin (l_linestatus is ~independent of the two features), so both
    * land close together: measured max |Δ| ≈ 0.007 at sf0.01. Asserted at
    * 0.05 — ~7× the observed gap for run/data-size robustness, tight enough
    * to catch a diverging fit, a flipped sign, or a wrong feature column.
    */
  val BoundEps = 0.05

  /** The oracle replays the GD anchor exactly (same CTEs as q103) and
    * asserts the bound as literal TRUE — the q54/q96 pattern.
    */
  val boundSql: String =
    s"""SELECT param, round(value, 6) + 0.0 AS gd_value, TRUE AS within_bound
       |FROM ($sql) ORDER BY param""".stripMargin
}

/** Unrolled-CTE DuckDB oracle for the 2-round k-means: c0 (seeds) → a1 →
  * c1 → a2 → c2 → a3, reporting a3's cluster sizes with c2's centroid norms
  * (the assignment against the final centroids — same contract as
  * [[graft.operators.KMeans.fit]]).
  */
/** q251 oracle: the q103 trajectory chain with scoring under every
  * intermediate weight vector, true-class probability transform, exact
  * integer confidence/dispersion, and the region census.
  */
private object CartographySql {
  /** q251 trains its OWN problem — q103's label (linestatus) is
    * feature-independent, which collapses every example to conf ≈ 0.5 and
    * the whole map to one region. Here the label IS learnable (quantity >
    * 25 with quantity/50 a feature) and lr = 50 makes the 3-round
    * trajectory actually traverse the map: the early rounds overshoot, so
    * boundary examples oscillate (ambiguous), aligned examples saturate
    * (easy), and examples the early bias misclassifies stay low (hard) —
    * 2989 / 1339 / 1672 at sf0.001.
    */
  val Lr = 50.0

  private def sig(w: String) = s"1/(1+exp(-($w.b + $w.c0*f0 + $w.c1*f1)))"

  private def gradCte(g: String, w: String) = {
    def term(mult: String) =
      s"CAST(sum(CAST(round((${sig(w)} - y)$mult * 1000000, 0) AS BIGINT)) AS BIGINT)"
    s"""$g AS (SELECT ${term("")} AS gb,
       |             ${term(" * f0")} AS g0,
       |             ${term(" * f1")} AS g1
       |      FROM d, $w)""".stripMargin
  }

  private def updCte(wN: String, w: String, g: String) = {
    def upd(old: String, s: String) =
      s"round($w.$old - $Lr * (CAST($g.$s AS DOUBLE) / 1000000 / nn.n), 9)"
    s"""$wN AS (SELECT ${upd("b", "gb")} AS b, ${upd("c0", "g0")} AS c0,
       |              ${upd("c1", "g1")} AS c1
       |       FROM $w, $g, nn)""".stripMargin
  }

  private val chain: String =
    s"""d AS (SELECT l_discount * 10 AS f0, l_quantity / 50.0 AS f1,
       |                  CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END AS y
       |           FROM lineitem),
       |nn AS (SELECT count(*) AS n FROM d),
       |w_0 AS (SELECT 0.0 AS b, 0.0 AS c0, 0.0 AS c1),
       |${gradCte("g_1", "w_0")},
       |${updCte("w_1", "w_0", "g_1")},
       |${gradCte("g_2", "w_1")},
       |${updCte("w_2", "w_1", "g_2")},
       |${gradCte("g_3", "w_2")},
       |${updCte("w_3", "w_2", "g_3")}""".stripMargin

  private def pSig(w: String) =
    s"CAST(round((${sig(w)}) * 1000000, 0) AS BIGINT)"

  val sql: String =
    s"""WITH $chain,
       |sc AS (SELECT d.y, ${pSig("w_1")} AS p1, ${pSig("w_2")} AS p2,
       |              ${pSig("w_3")} AS p3
       |       FROM d, w_1, w_2, w_3),
       |tc AS (SELECT
       |         CASE WHEN y = 1.0 THEN p1 ELSE 1000000 - p1 END AS x1,
       |         CASE WHEN y = 1.0 THEN p2 ELSE 1000000 - p2 END AS x2,
       |         CASE WHEN y = 1.0 THEN p3 ELSE 1000000 - p3 END AS x3
       |       FROM sc),
       |r AS (SELECT (x1 + x2 + x3) // 3 AS conf_e6,
       |             3 * (x1*x1 + x2*x2 + x3*x3)
       |               - (x1 + x2 + x3) * (x1 + x2 + x3) AS varx
       |      FROM tc),
       |g AS (SELECT CASE WHEN conf_e6 >= 600000 THEN 'easy'
       |                  WHEN conf_e6 <= 400000 THEN 'hard'
       |                  ELSE 'ambiguous' END AS region, conf_e6, varx
       |      FROM r)
       |SELECT region, CAST(count(*) AS BIGINT) AS n_examples,
       |       CAST(sum(conf_e6) // count(*) AS BIGINT) AS mean_conf_e6,
       |       CAST(sum(varx) // count(*) AS BIGINT) AS mean_varx
       |FROM g GROUP BY region ORDER BY region""".stripMargin
}

private[queries] object KMeansSql {
  private val dim = SimilarityQueries.Dim

  private def d2(c: String) =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(range(1, ${dim + 1}),
       |    i -> (CAST(e.embedding[i] AS DOUBLE) - $c.centroid[i])
       |       * (CAST(e.embedding[i] AS DOUBLE) - $c.centroid[i]))),
       |  (x, y) -> x + y)""".stripMargin

  private def assignCte(a: String, c: String) =
    s"""$a AS MATERIALIZED (
       |  SELECT vec_id, embedding, cluster FROM (
       |    SELECT e.vec_id, e.embedding, c.cluster,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY round(${d2("c")}, 6), c.cluster) AS rn
       |    FROM embeddings e CROSS JOIN $c c) t
       |  WHERE rn = 1)""".stripMargin

  private def updateCte(cN: String, a: String, prev: String) =
    s"""$cN AS MATERIALIZED (
       |  SELECT p.cluster, coalesce(u.mean_c, p.centroid) AS centroid
       |  FROM $prev p LEFT JOIN (
       |    SELECT cluster, list(m ORDER BY dm) AS mean_c
       |    FROM (SELECT cluster, i AS dm,
       |                 round(avg(CAST(embedding[i + 1] AS DOUBLE)), 9) AS m
       |          FROM $a, (SELECT unnest(range(0, $dim)) AS i)
       |          GROUP BY cluster, i)
       |    GROUP BY cluster) u ON u.cluster = p.cluster)""".stripMargin

  /** The 2-round Lloyd chain (c0 seeds → a1/c1 → a2/c2 → a3 final
    * assignment) as CTE text, parameterized by cell count — shared by q65
    * and the q201 nprobe-IVF oracle. Ends after `a3`; callers append their
    * own final CTEs/SELECT. Stages are MATERIALIZED so a caller referencing
    * c2 and a3 more than once (q201 probes cells AND scans assignments)
    * computes each Lloyd stage exactly once.
    */
  private[queries] def chainCte(k: Int): String =
    s"""c0 AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
       |         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS centroid
       |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $k)),
       |${assignCte("a1", "c0")},
       |${updateCte("c1", "a1", "c0")},
       |${assignCte("a2", "c1")},
       |${updateCte("c2", "a2", "c1")},
       |${assignCte("a3", "c2")}""".stripMargin

  val sql: String =
    s"""WITH ${chainCte(4)}
       |SELECT s.cluster AS cluster_id, s.n,
       |       round(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |         list_transform(c.centroid, v -> v * v)), (x, y) -> x + y)), 6)
       |         AS centroid_norm
       |FROM (SELECT cluster, count(*) AS n FROM a3 GROUP BY cluster) s
       |JOIN c2 c USING (cluster) ORDER BY cluster_id""".stripMargin
}

/** q405's oracle: the identical depth-2 greedy induction unrolled as CTE
  * chains — census → cumulative-window candidate scores → argmax (LIMIT 1
  * under the same (score DESC, fn, fv) order) at the root and in each
  * child, then the 4-leaf table. The split predicate a child inherits is
  * applied through a CASE over the argmax'd feature name, so the oracle
  * follows whatever split the data chose, exactly like the engine.
  */
private[queries] object CartSql {
  import graft.functions.Hashes

  private def censusScore(src: String, p: String): String =
    s"""${p}cen AS (
       |  SELECT fn, fv, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(label) AS BIGINT) AS p
       |  FROM (SELECT 'bucket' AS fn, f_bucket AS fv, label FROM $src
       |        UNION ALL SELECT 'month', f_month, label FROM $src
       |        UNION ALL SELECT 'prio', f_prio, label FROM $src) u
       |  GROUP BY fn, fv),
       |${p}sc AS (
       |  SELECT fn, fv,
       |         CAST(sum(n) OVER (PARTITION BY fn ORDER BY fv) AS BIGINT)
       |           AS lc,
       |         CAST(sum(p) OVER (PARTITION BY fn ORDER BY fv) AS BIGINT)
       |           AS lp,
       |         CAST(sum(n) OVER (PARTITION BY fn) AS BIGINT) AS nn,
       |         CAST(sum(p) OVER (PARTITION BY fn) AS BIGINT) AS pp,
       |         max(fv) OVER (PARTITION BY fn) AS mx
       |  FROM ${p}cen),
       |${p}best AS MATERIALIZED (
       |  SELECT fn, fv FROM (
       |    SELECT fn, fv,
       |           (lp * lp + (lc - lp) * (lc - lp)) * 1000000 // lc
       |           + ((pp - lp) * (pp - lp)
       |              + (nn - lc - pp + lp) * (nn - lc - pp + lp))
       |             * 1000000 // (nn - lc) AS score
       |    FROM ${p}sc WHERE fv < mx) z
       |  ORDER BY score DESC, fn, fv LIMIT 1)""".stripMargin

  private def pick(p: String, col: String): String =
    s"""CASE (SELECT fn FROM ${p}best)
       |  WHEN 'bucket' THEN $col.f_bucket
       |  WHEN 'month' THEN $col.f_month
       |  ELSE $col.f_prio END""".stripMargin.replace("\n", " ")

  val sql: String =
    s"""WITH o AS MATERIALIZED (
       |  SELECT o_orderkey AS k,
       |         CAST(month(o_orderdate) AS BIGINT) AS f_month,
       |         CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS f_prio,
       |         least(CAST(round(o_totalprice * 100, 0) AS BIGINT)
       |               // 5000000, 9) AS f_bucket,
       |         (CASE WHEN least(CAST(round(o_totalprice * 100, 0) AS BIGINT)
       |                          // 5000000, 9) >= 3
       |                AND CAST(substr(o_orderpriority, 1, 1) AS BIGINT) <= 2
       |               THEN 1 ELSE 0 END
       |          + CASE WHEN (${Hashes.mulHashSql("o_orderkey", 17)}) % 10 = 0
       |                 THEN 1 ELSE 0 END) % 2 AS label
       |  FROM orders),
       |${censusScore("o", "r_")},
       |ol AS MATERIALIZED (SELECT o.* FROM o WHERE ${pick("r_", "o")}
       |         <= (SELECT fv FROM r_best)),
       |orr AS MATERIALIZED (SELECT o.* FROM o WHERE ${pick("r_", "o")}
       |          > (SELECT fv FROM r_best)),
       |${censusScore("ol", "l_")},
       |${censusScore("orr", "x_")},
       |lv AS (
       |  SELECT 'L' || CASE WHEN ${pick("l_", "ol")}
       |                       <= (SELECT fv FROM l_best)
       |                     THEN 'L' ELSE 'R' END AS leaf, label FROM ol
       |  UNION ALL
       |  SELECT 'R' || CASE WHEN ${pick("x_", "orr")}
       |                       <= (SELECT fv FROM x_best)
       |                     THEN 'L' ELSE 'R' END, label FROM orr),
       |la AS (SELECT leaf, CAST(count(*) AS BIGINT) AS n,
       |              CAST(sum(label) AS BIGINT) AS pos
       |       FROM lv GROUP BY leaf)
       |SELECT leaf,
       |       (SELECT fn FROM r_best) AS root_f,
       |       (SELECT fv FROM r_best) AS root_t,
       |       CASE WHEN leaf LIKE 'L%' THEN (SELECT fn FROM l_best)
       |            ELSE (SELECT fn FROM x_best) END AS sub_f,
       |       CASE WHEN leaf LIKE 'L%' THEN (SELECT fv FROM l_best)
       |            ELSE (SELECT fv FROM x_best) END AS sub_t,
       |       n, pos,
       |       CAST(CASE WHEN pos * 2 > n THEN 1 ELSE 0 END AS BIGINT)
       |         AS pred,
       |       CASE WHEN pos * 2 > n THEN pos ELSE n - pos END AS n_correct
       |FROM la ORDER BY leaf""".stripMargin
}
