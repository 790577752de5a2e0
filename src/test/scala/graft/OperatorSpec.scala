package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ChannelStats
import graft.operators._

/** Per-operator invariants over tiny literal frames + sf0.001 fixtures
  * (SURVEY §5.2-5.3).
  */
class OperatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hash split is a partition: disjoint, covering, roughly stratified") {
    val df = (1L to 10000L).toDF("id")
    val withSplit = df.select(col("id"), Split.assignSplit(col("id"), 21).as("split"))
    val counts = withSplit.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000)
    assert(math.abs(counts("train") - 6400.0) / 6400 < 0.1)
    assert(math.abs(counts("valid") - 1600.0) / 1600 < 0.15)
    assert(math.abs(counts("test") - 2000.0) / 2000 < 0.15)
    // deterministic: same seed twice → identical assignment
    val again = df.select(col("id"), Split.assignSplit(col("id"), 21).as("s2"))
    assert(withSplit.join(again, "id").where(col("split") =!= col("s2")).count() == 0)
  }

  test("histogram counts sum to input rows; dense bins complete") {
    val df = (0 until 1000).map(_ / 1000.0).toDF("p")
    val h = Histogram.conditionalHistogram(df, col("p"), 50, Seq("n" -> lit(true)))
    assert(h.count() == 50)
    assert(h.agg(sum("n")).head().getLong(0) == 1000)
  }

  test("survival curve is monotone non-decreasing and ends at 1") {
    val scored = Seq.tabulate(500)(i => (i / 500.0, i % 2 == 0)).toDF("p", "is0")
    val c = SurvivalCurve.curve(scored, col("p"), col("is0"), 100).collect()
    assert(c.length == 100)
    val f0 = c.map(_.getDouble(2))
    val f1 = c.map(_.getDouble(3))
    assert(f0.zip(f0.tail).forall { case (a, b) => a <= b })
    assert(f1.zip(f1.tail).forall { case (a, b) => a <= b })
    assert(math.abs(f0.last - 1.0) < 1e-9 && math.abs(f1.last - 1.0) < 1e-9)
  }

  test("channel stats matches explode-based stats") {
    val df = Seq(
      Tuple1(Seq(1.0f, 10.0f)), Tuple1(Seq(2.0f, 20.0f)),
      Tuple1(Seq(3.0f, 30.0f)), Tuple1(Seq(4.0f, 40.0f))).toDF("v")
    val got = df.agg(ChannelStats.channelStats(col("v"), 2).as("s"))
      .select(posexplode(col("s")).as(Seq("dim", "st")))
      .select(col("dim"), col("st.mean"), col("st.stddev"), col("st.min"), col("st.max"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val exp = df.select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("dim").agg(avg("x").as("m"), stddev_pop("x").as("s"),
        min("x").as("mn"), max("x").as("mx"))
      .orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getFloat(3).toDouble, r.getFloat(4).toDouble))
    got.sortBy(_._1).zip(exp).foreach { case (g, e) =>
      assert(g._1 == e._1)
      assert(math.abs(g._2 - e._2) < 1e-9, s"mean dim ${g._1}")
      assert(math.abs(g._3 - e._3) < 1e-9, s"std dim ${g._1}")
      assert(g._4 == e._4 && g._5 == e._5)
    }
  }

  test("channel stats survives partition merge (distributed Welford)") {
    val df = spark.range(0, 10000).repartition(7)
      .select(array(col("id").cast("double"), (col("id") * 2).cast("double")).as("v"))
    val row = df.agg(ChannelStats.channelStats(col("v"), 2).as("s"))
      .select(element_at(col("s"), 1).as("st")).select("st.mean", "st.stddev").head()
    assert(math.abs(row.getDouble(0) - 4999.5) < 1e-6)
    assert(math.abs(row.getDouble(1) - math.sqrt((10000.0 * 10000 - 1) / 12)) < 1e-4)
  }

  test("minhash: identical docs share signatures; jaccard 1.0 on self-pairs") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, "x y z w q r s"))
      .toDF("doc_id", "text")
    val sigs = MinHash.signatures(docs, col("doc_id"), split(col("text"), " "))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    val pairs = MinHash.nearDuplicates(docs, col("doc_id"), split(col("text"), " "), 0.5)
      .collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getDouble(2) == 1.0)
  }

  test("minhash capped: over-capped boilerplate bucket dropped, rare pair kept") {
    // six byte-identical "boilerplate" docs share every band bucket (size 6);
    // with cap=4 those buckets are dropped, so none of their 15 pairs emerge.
    // The rare identical pair (7,8) sits in buckets of size 2 and survives.
    val boiler = (1L to 6L).map(i => (i, "a b c d e f g h"))
    val rare = Seq((7L, "p q r s t u v w"), (8L, "p q r s t u v w"))
    val docs = (boiler ++ rare).toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val capped = MinHash.nearDuplicatesCapped(docs, col("doc_id"), toks, 0.5, cap = 4)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((7L, 8L)))
    val full = MinHash.nearDuplicates(docs, col("doc_id"), toks, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(full) && full.size == 16) // C(6,2) + 1
  }

  test("q198 equivalence bounds hold at the fixture: shingle sets ≪ 1e6, no hot shingle") {
    // the integer truth test 3·|A∩B| ≥ |A|+|B| equals round(J,6) ≥ 0.5 only
    // while |A∪B| < 1e6 (below that the nearest rational under ½ is
    // ½ − 1/(2u), outside the round-6 window) — and the truth join's f²
    // fan-out on a shingle shared by f docs stays benign only while the
    // 64-bit shingle space is sparse. Both bounds are asserted here against
    // the ACTUAL fixture so regenerated testdata can't silently void the
    // q198 contract (r14 ADVICE / r14 verdict #5).
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val toks = split(col("text"), " ", -1)
    val ss = docs.where(size(toks) >= 3)
      .select(array_distinct(MinHash.shingleHashes(toks)).as("sset"))
    val maxSet = ss.agg(max(size(col("sset")))).head().getInt(0)
    assert(maxSet.toLong * 2 < 1000000L,
      s"largest shingle set $maxSet — |A∪B| can approach 1e6, the round-6 " +
        "equivalence window no longer covers the integer truth test")
    val maxDf = ss.select(explode(col("sset")).as("sh"))
      .groupBy("sh").count().agg(max("count")).head().getLong(0)
    assert(maxDf <= 64L,
      s"hottest shingle shared by $maxDf docs — the truth join's f² " +
        "fan-out needs a declared df-cap (stated in both engines) past this")
  }

  test("semdedup: identical vectors collapse to the min id; orthogonal kept") {
    import graft.operators.SemDedup
    // vecs 1..3 identical (cos 1), vec 4 orthogonal (cos 0 < tau)
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (3L, Array(1.0f, 0.0f)),
      (4L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val marked = SemDedup.mark(emb, "vec_id", "embedding", dim = 2,
      k = 2, iters = 1, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(marked == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
  }

  test("semdedup cap: sub-cell split follows the declared hash; capping only shrinks dominance") {
    import graft.functions.Hashes
    import graft.operators.SemDedup
    // 40 identical vectors in one cluster (csize=40, cap=8 → nsub=5 hash
    // sub-cells) + 1 orthogonal vector that lands in its own cluster.
    val emb = ((1L to 40L).map(i => (i, Array(1.0f, 0.0f))) :+
      (41L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val keptFull = SemDedup.mark(emb, "vec_id", "embedding", dim = 2,
        k = 2, iters = 1, tau = 0.9)
      .where(col("keep")).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptFull == Set(1L, 41L)) // uncapped: one representative + orthogonal
    val keptCap = SemDedup.mark(emb, "vec_id", "embedding", dim = 2,
        k = 2, iters = 1, tau = 0.9, cap = 8)
      .where(col("keep")).select("vec_id").collect().map(_.getLong(0)).toSet
    // capping removes comparisons, never adds → keep-set can only grow
    assert(keptFull.subsetOf(keptCap))
    // the declared semantics exactly: min id per nonempty sub-cell survives
    val nsub = (40 + 7) / 8
    val expected = (1L to 40L).groupBy(i => Hashes.mulHashLong(i, SemDedup.SubSalt) % nsub)
      .values.map(_.min).toSet + 41L
    assert(keptCap == expected)
  }

  test("simhash: identical docs → hamming 0; disjoint docs → nonzero") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "v w x y z"))
      .toDF("doc_id", "text")
    val h = docs.select(col("doc_id"), SimHash.simhash(split(col("text"), " ")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(h(1L) != h(3L))
  }

  test("batch scorer matches the expression form") {
    val ds = Seq((1L, 1, Array(0.5, 0.2)), (2L, 1, Array(0.1, 0.9)))
      .toDS()
    val got = Scorer.scoreKeyed(ds, LinearSigmoidScorer(-2.0, Array(4.0, 1.0)))
      .orderBy("key1").collect().map(_.getDouble(2))
    val exp = Seq((0.5, 0.2), (0.1, 0.9)).map { case (a, b) =>
      1.0 / (1.0 + math.exp(-(-2.0 + 4.0 * a + 1.0 * b)))
    }
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-15) }
  }

  test("logistic GD: loss decreases, separable data fits, weights on 1e-9 grid") {
    // linearly separable in f0: y = 1 iff f0 > 0
    val data = Seq((-2.0, 0.0), (-1.0, 0.0), (-0.5, 0.0), (0.5, 1.0),
      (1.0, 1.0), (2.0, 1.0)).toDF("f0", "y")
    def loss(b: Double, w0: Double): Double =
      data.collect().map { r =>
        val p = 1.0 / (1.0 + math.exp(-(b + w0 * r.getDouble(0))))
        val y = r.getDouble(1)
        -(y * math.log(p) + (1 - y) * math.log(1 - p))
      }.sum
    val w1 = LogisticGD.fit(data, Seq(col("f0")), col("y"), lr = 0.5, iters = 1)
    val w10 = LogisticGD.fit(data, Seq(col("f0")), col("y"), lr = 0.5, iters = 10)
    assert(loss(w10.bias, w10.w.head) < loss(w1.bias, w1.w.head))
    assert(w10.w.head > 0.0) // separating direction recovered
    // every weight sits exactly on the 1e-9 snap grid (the oracle contract)
    (w10.bias +: w10.w).foreach { v =>
      assert(BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble == v)
    }
  }

  test("edge cases: empty band, short docs, empty arrays") {
    // survival curve over a band where one class is absent → NULL fraction, no error
    val oneClass = Seq((0.3, true), (0.7, true)).toDF("p", "is0")
    val c = SurvivalCurve.curve(oneClass, col("p"), col("is0"), 10).collect()
    assert(c.length == 10)
    assert(c.forall(_.isNullAt(3))) // class-1 fraction NULL throughout
    // docs shorter than the shingle width produce no signatures, no crash
    val short = Seq((1L, "a b"), (2L, "only one two three")).toDF("doc_id", "text")
    val sigs = MinHash.signatures(short, col("doc_id"), split(col("text"), " "))
    assert(sigs.collect().map(_.getLong(0)).toSeq == Seq(2L))
    // simhash of an empty token array is 0
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("toks")
    assert(empty.select(SimHash.simhash(col("toks"))).head().getLong(0) == 0L)
    // histogram of empty input: dense zero bins
    val h = Histogram.conditionalHistogram(
      Seq.empty[Tuple1[Double]].toDF("p"), col("p"), 5, Seq("n" -> lit(true)))
    assert(h.collect().map(_.getLong(1)).toSeq == Seq(0L, 0L, 0L, 0L, 0L))
  }

  test("dup-span coverage: monotone non-increasing in width; islands disjoint") {
    import graft.operators.DupSpans
    val docs = DupSpans.syntheticLongDocs(spark).cache()
    val covByWidth = Seq(3, 10, 50).map { w =>
      w -> DupSpans.coverage(docs, col("toks"), w)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    }.toMap
    // the fixture's engineered spans: 80-token common run + 30-token parity
    // run at w=3; only the common run survives at w=50
    assert(covByWidth(3).values.toSet == Set(110L))
    assert(covByWidth(50).values.toSet == Set(80L))
    // wider windows can only see FEWER duplicated spans → coverage is
    // monotone non-increasing in width, per doc
    for (d <- 0L until 6L; (w1, w2) <- Seq((3, 10), (10, 50)))
      assert(covByWidth(w1)(d) >= covByWidth(w2)(d),
        s"doc $d: cov(w=$w1) < cov(w=$w2)")
    // islands are strictly disjoint and non-touching within a doc
    for (w <- Seq(3, 10, 50)) {
      val byDoc = DupSpans.islands(docs, col("toks"), w)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
      byDoc.values.foreach { spans =>
        val sorted = spans.sortBy(_._2)
        sorted.foreach { case (_, s, e) => assert(s <= e) }
        sorted.sliding(2).foreach {
          case Array((_, _, e1), (_, s2, _)) => assert(s2 > e1 + 1,
            s"islands touch or overlap at width $w")
          case _ =>
        }
      }
    }
    docs.unpersist()
  }

  test("ppm codec: header comments skipped, pixels exact, downscale + round trip") {
    // 2x2 image with a comment line; pixels RGB-interleaved 0..11
    val bytes = ("P6\n# tiny\n2 2\n255\n").getBytes("US-ASCII") ++
      (0 until 12).map(_.toByte).toArray
    val img = MediaCodecs.decodePpm(bytes)
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == (0 until 12).map(_.toByte).toSeq)
    // round trip through encode
    val again = MediaCodecs.decodePpm(MediaCodecs.encodePpm(img))
    assert(again.pixels.toSeq == img.pixels.toSeq)
    // factor-2 downscale keeps only pixel (0,0)
    val small = MediaCodecs.downscale(img, 2)
    assert(small.width == 1 && small.height == 1)
    assert(small.pixels.toSeq == Seq[Byte](0, 1, 2))
    // truncated payload must fail loudly, not decode garbage
    intercept[IllegalArgumentException] {
      MediaCodecs.decodePpm(bytes.dropRight(1))
    }
  }

  test("dhash: monotone-shift invariance, watermark proximity, cross-image " +
    "separation over the real fixture files") {
    import graft.operators.Multimodal
    val dir = new java.io.File(
      Seq("fixtures/media", "/root/repo/fixtures/media")
        .find(p => new java.io.File(p).isDirectory).get)
    val files = dir.listFiles.filter(_.getName.endsWith(".ppm")).sortBy(_.getName)
      .map(f => (f.getName.drop(4).take(2).toLong,
        java.nio.file.Files.readAllBytes(f.toPath)))
    def bandsOf(dec: Multimodal.DhashDecoder) =
      dec.decodeBatch(files).map(b => b.id -> Seq(b.b0, b.b1, b.b2, b.b3)).toMap
    val id0 = bandsOf(Multimodal.DhashIdentity)
    val wm = bandsOf(Multimodal.DhashWatermark)
    val br = bandsOf(Multimodal.DhashBrighten)
    def hamming(a: Seq[Int], b: Seq[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    id0.keys.foreach { i =>
      // any monotone global shift preserves every strict gray comparison
      assert(hamming(id0(i), br(i)) == 0, s"brightness moved dhash of $i")
      // the corner watermark flips only bits whose grid cells it touches
      val d = hamming(id0(i), wm(i))
      assert(d <= 6, s"watermark pushed $i past the near-dup threshold ($d)")
    }
    // distinct images are far apart — the threshold separates with margin
    for (i <- id0.keys; j <- id0.keys if i < j)
      assert(hamming(id0(i), id0(j)) >= 12, s"images $i/$j too close")
  }

  test("bmp codec: bottom-up and top-down rows, BGR swap, pad bytes dropped") {
    import java.nio.{ByteBuffer, ByteOrder}
    // 2x2 RGB image in row-major top-down order: pixel (x,y) = base..base+2
    val rgb = (0 until 12).map(_.toByte).toArray
    def bmp(topDown: Boolean): Array[Byte] = {
      val rowSize = (2 * 3 + 3) / 4 * 4 // 8: two pad bytes per row
      val bb = ByteBuffer.allocate(54 + rowSize * 2).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * 2)
        .putShort(0).putShort(0).putInt(54)
      bb.putInt(40).putInt(2).putInt(if (topDown) -2 else 2)
        .putShort(1).putShort(24).putInt(0).putInt(rowSize * 2)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      val ys = if (topDown) Seq(0, 1) else Seq(1, 0) // file row order
      ys.foreach { y =>
        (0 until 2).foreach { x =>
          val base = (y * 2 + x) * 3
          bb.put(rgb(base + 2)).put(rgb(base + 1)).put(rgb(base)) // BGR
        }
        bb.put(0xAA.toByte).put(0xAA.toByte) // junk padding must be ignored
      }
      bb.array()
    }
    Seq(true, false).foreach { td =>
      val img = MediaCodecs.decodeBmp(bmp(td))
      assert(img.width == 2 && img.height == 2, s"topDown=$td")
      assert(img.pixels.toSeq == rgb.toSeq, s"topDown=$td")
    }
    intercept[IllegalArgumentException] { // truncated payload fails loudly
      MediaCodecs.decodeBmp(bmp(false).dropRight(9))
    }
  }

  test("png codec: fixtures decode through inflate + all five filters") {
    // every checked-in fixture replays from (f·K + 229·i) mod 256; row y of
    // file i was stored with filter (i+y)%5, odd i has split IDAT, i%3==0 a
    // tEXt chunk — one loop proves chunk walk, inflate, and every predictor
    val dir = Seq("fixtures/media", "/root/repo/fixtures/media")
      .map(new java.io.File(_)).find(_.isDirectory).get
    val K = graft.functions.Hashes.Mult
    (0 until 12).foreach { i =>
      val bytes = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, f"png_$i%02d.png").toPath)
      val img = MediaCodecs.decodePng(bytes)
      val (w, h) = (5 + (i % 3) * 4, 6 + (i % 2) * 4)
      assert(img.width == w && img.height == h, s"file $i")
      val want = (0 until w * h * 3).map(f => (((f * K + 229L * i) % 256) & 0xff).toByte)
      assert(img.pixels.toSeq == want, s"file $i pixels")
    }
    // a truncated stream must fail loudly, not return short pixels
    val whole = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "png_00.png").toPath)
    intercept[IllegalArgumentException] {
      MediaCodecs.decodePng(whole.dropRight(20))
    }
  }

  test("png/bmp codecs: hostile headers fail loudly, never hang or wrap") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-built CRC-valid PNG with an arbitrary IDAT payload: the vehicle
    // for zlib-level attacks that chunk CRCs cannot catch
    def png(w: Int, h: Int, idat: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      def chunk(tag: String, body: Array[Byte]): Unit = {
        val bb = ByteBuffer.allocate(12 + body.length).order(ByteOrder.BIG_ENDIAN)
        bb.putInt(body.length).put(tag.getBytes("US-ASCII")).put(body)
        val crc = new java.util.zip.CRC32()
        crc.update(bb.array(), 4, 4 + body.length)
        bb.putInt(crc.getValue.toInt)
        out.write(bb.array())
      }
      val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
        .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
      chunk("IHDR", ihdr)
      chunk("IDAT", idat)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }
    // zlib header 0x78 0x20: FDICT set, FCHECK valid ((30720+32) % 31 == 0).
    // PNG forbids preset dictionaries; Inflater reports it as inflate()==0
    // with needsInput()==false — the exact shape that used to spin forever
    val fdict = png(1, 1, Array(0x78, 0x20, 1, 2, 3, 4, 0, 0, 0, 0).map(_.toByte))
    val eFdict = intercept[IllegalArgumentException](MediaCodecs.decodePng(fdict))
    assert(eFdict.getMessage.contains("dictionary"))
    // corrupt DEFLATE body behind a VALID chunk CRC: DataFormatException
    // must surface as the require-style error contract, not escape raw
    val garbage = png(1, 1, Array(0x78, 0x9c, 0x77, 0x77, 0x77, 0x77).map(_.toByte))
    intercept[IllegalArgumentException](MediaCodecs.decodePng(garbage))
    // dims whose w*h*3 wraps Int: must be rejected by the Long bound, not
    // alloc a wrapped-size array (PNG never reaches inflate; BMP never
    // reaches the row copy)
    val ePng = intercept[IllegalArgumentException] {
      MediaCodecs.decodePng(png(0x20000000, 4, Array[Byte](0x78, 0x9c.toByte)))
    }
    assert(ePng.getMessage.contains("overflow"))
    val bmp = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte)
    bmp.putInt(10, 54).putInt(14, 40)
    bmp.putInt(18, 0x20000000).putInt(22, 4) // w*h*3 wraps negative
    bmp.putShort(26, 1).putShort(28, 24).putInt(30, 0)
    val eBmp = intercept[IllegalArgumentException](MediaCodecs.decodeBmp(bmp.array()))
    assert(eBmp.getMessage.contains("overflow"))
  }

  test("flac codec: fixtures decode bit-exact through every decorrelation mode") {
    // cross-implementation check: fixtures come from the PYTHON encoder
    // (tools/gen_media_fixture.py), decode here crosses rice residuals,
    // fixed predictors 0–4, escape partitions (j=3), all four stereo modes,
    // metadata-block skipping (odd j), and CRC-8/CRC-16 verification
    val dir = Seq("fixtures/media", "/root/repo/fixtures/media")
      .map(new java.io.File(_)).find(_.isDirectory).get
    val K = graft.functions.Hashes.Mult
    (0 until 8).foreach { j =>
      val bytes = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, s"flac_$j.flac").toPath)
      val clip = MediaCodecs.decodeFlac(bytes)
      val ch = 1 + (j % 2)
      val m = 48 + 16 * j
      assert(clip.sampleRate == 8000, s"file $j")
      assert(clip.samples.length == ch * m, s"file $j")
      val want = (0 until ch * m).map(t => (((t * K + 157L * j) % 4096) - 2048).toShort)
      assert(clip.samples.toSeq == want, s"file $j samples")
    }
    val whole = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "flac_0.flac").toPath)
    intercept[IllegalArgumentException] { // truncation fails loudly
      MediaCodecs.decodeFlac(whole.dropRight(8))
    }
    intercept[IllegalArgumentException] { // a flipped residual byte breaks CRC-16
      val b = whole.clone(); b(b.length - 10) = (b(b.length - 10) ^ 0x40).toByte
      MediaCodecs.decodeFlac(b)
    }
  }

  test("wav codec: chunk walking skips LIST, samples exact") {
    import java.nio.{ByteBuffer, ByteOrder}
    val samples = Array[Short](100, -200, 300, -400)
    val data = {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      samples.foreach(bb.putShort)
      bb.array()
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    val fmt = {
      val bb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      bb.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      bb.array()
    }
    val body = "WAVE".getBytes("US-ASCII") ++ chunk("fmt ", fmt) ++
      chunk("LIST", "INFOx".getBytes ++ Array[Byte](0)) ++ chunk("data", data)
    val riff = chunk("RIFF", body).patch(4, {
      val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(body.length); bb.array()
    }.toSeq, 4)
    val clip = MediaCodecs.decodeWav(riff.toArray)
    assert(clip.sampleRate == 8000)
    assert(clip.samples.toSeq == samples.toSeq)
  }

  test("multimodal decode plumbing batches real ppm payloads") {
    val px = (0 until 2 * 1 * 3).map(_.toByte).toArray
    val ppm = "P6\n2 1\n255\n".getBytes("US-ASCII") ++ px
    val media = Seq((9L, ppm)).toDF("media_id", "media")
    val row = Multimodal.decodeFeatures(media, Multimodal.PpmImageDecoder).head()
    assert(row.getLong(0) == 9L)
    assert(row.getInt(1) == 2 && row.getInt(2) == 1)
    assert(row.getLong(4) == 0L + 3L) // sum_r = px(0) + px(3)
    assert(row.getLong(5) == 1L + 4L)
    assert(row.getLong(6) == 2L + 5L)
  }

  test("multimodal resize decodes/downscales/re-encodes; frame sampling keeps every Nth frame") {
    val px = (0 until 4 * 2 * 3).map(_.toByte).toArray // 4x2 image
    val ppm = "P6\n4 2\n255\n".getBytes("US-ASCII") ++ px
    val media = Seq((1L, ppm)).toDF("media_id", "media")
      .withColumn("meta", struct(lit("image/x-ppm").as("format"),
        length(col("media")).as("n_bytes"), lit("test").as("origin")))
    val resized = Multimodal.resizePpm(media, 2).head()
    val out = MediaCodecs.decodePpm(resized.getAs[Array[Byte]]("media"))
    assert(out.width == 2 && out.height == 1)
    // kept pixels: (0,0) and (2,0) → flat offsets 0 and 6
    assert(out.pixels.toSeq == Seq[Byte](0, 1, 2, 6, 7, 8))
    val text = Seq((1L, "abcdefghijkl".getBytes("US-ASCII"))).toDF("media_id", "media")
    val frames = Multimodal.sampleFrames(text, frameBytes = 4, stride = 2)
      .collect().map(r => (r.getInt(1), new String(r.getAs[Array[Byte]]("frame"))))
    assert(frames.toSeq == Seq((0, "abcd"), (2, "ijkl")))
  }

  test("top_k_by: exact under any partitioning, ties break key-ascending") {
    import graft.functions.TopK
    // 3 groups × 200 rows; ord has deliberate ties (ord = key % 50)
    val rows = for (g <- 0 until 3; i <- 0 until 200)
      yield (g.toLong, g * 1000L + i, (i % 50).toLong)
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sortBy { case (k, o) => (-o, k) }.take(7)
    }
    for (parts <- Seq(1, 7, 32)) {
      val got = rows.toDF("g", "k", "o").repartition(parts)
        .groupBy("g").agg(TopK.topKBy(col("k"), col("o"), 7).as("top"))
        .collect().map { r =>
          r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
            .map(e => (e.getLong(0), e.getLong(1)))
        }.toMap
      assert(got == expected, s"parts=$parts")
    }
    // k larger than the group returns the whole group, still sorted
    val small = Seq((1L, 10L, 5L), (1L, 11L, 9L)).toDF("g", "k", "o")
      .groupBy("g").agg(TopK.topKBy(col("k"), col("o"), 100).as("top"))
      .head().getSeq[org.apache.spark.sql.Row](1).map(e => (e.getLong(0), e.getLong(1)))
    assert(small == Seq((11L, 9L), (10L, 5L)))
  }

  test("k-core peel: tail vertices drop round by round, the core is the fixpoint") {
    // triangle {1,2,3} with a tail 3-4-5: the 2-core is exactly the triangle,
    // reached after TWO peels (5 drops first, stranding 4 for the next round)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val states = KCore.peel(edges, k = 2, rounds = 3)
    val counts = states.map(_.count())
    assert(counts == Vector(5L, 4L, 3L, 3L)) // monotone shrink, then fixpoint
    val core = states.last.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core == Set((1L, 2L), (2L, 3L), (1L, 3L)))
    // every core vertex keeps degree >= k inside the core
    val degs = KCore.coreVertices(states.last).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(degs == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}
