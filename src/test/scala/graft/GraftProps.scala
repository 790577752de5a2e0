package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.functions.{Hashes, TextHashExprs}

/** ScalaCheck properties over the pure kernels (SURVEY §5.3): hash ranges,
  * shingle shapes, simhash bounds, split-bucket arithmetic, and the rot90
  * closed-form index maps.
  */
object GraftProps extends Properties("graft") {

  private val token: Gen[String] = Gen.choose(1, 12).flatMap(n =>
    Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val tokens: Gen[List[String]] = Gen.choose(0, 40).flatMap(n =>
    Gen.listOfN(n, token))

  private def arr(ts: List[String]): GenericArrayData =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t)).toArray[Any])

  property("tokenHash lands in [0, Prime)") = forAll(token) { t =>
    val h = TextHashExprs.tokenHash(UTF8String.fromString(t))
    h >= 0 && h < Hashes.Prime
  }

  property("shingleHashes emits max(0, n-2) values, all in range") =
    forAll(tokens) { ts =>
      val out = TextHashExprs.shingleHashesData(arr(ts))
      out.numElements() == math.max(0, ts.length - 2) &&
        (0 until out.numElements()).forall { i =>
          val v = out.getLong(i); v >= 0 && v < Hashes.Prime
        }
    }

  property("minhash signature: deterministic, k values, each ≤ Prime") =
    forAll(tokens) { ts =>
      val a = TextHashExprs.minhashSignatureData(arr(ts), 8)
      val b = TextHashExprs.minhashSignatureData(arr(ts), 8)
      a.numElements() == 8 &&
        (0 until 8).forall(i => a.getLong(i) == b.getLong(i) &&
          a.getLong(i) >= 0 && a.getLong(i) <= Hashes.Prime)
    }

  property("simhash is a 16-bit value and identical inputs agree") =
    forAll(tokens) { ts =>
      val h = TextHashExprs.simhashValue(arr(ts), 16)
      h >= 0 && h < (1L << 16) && h == TextHashExprs.simhashValue(arr(ts), 16)
    }

  private def bucketScala(key: Long, seed: Long, buckets: Int): Long =
    (((key % Hashes.PreMod + seed) * Hashes.Mult) % Hashes.Prime) *
      (2 * seed + 1) % Hashes.Prime % buckets

  property("split buckets stay in range and partition train/valid/test") =
    forAll(Gen.choose(0L, Long.MaxValue / 4), Gen.choose(0L, 50L)) { (key, seed) =>
      val b = bucketScala(key, seed, 100)
      b >= 0 && b < 100
    }

  private def rotIdx(n: Int, k: Int)(r: Int, c: Int): (Int, Int) =
    ((k % 4) + 4) % 4 match {
      case 0 => (r, c)
      case 1 => (c, n - 1 - r)
      case 2 => (n - 1 - r, n - 1 - c)
      case 3 => (n - 1 - c, r)
    }

  property("rot90 closed-form maps compose: k then 4-k is the identity") =
    forAll(Gen.choose(2, 8), Gen.choose(0, 3)) { (n, k) =>
      Prop.all((for { r <- 0 until n; c <- 0 until n } yield {
        val (r1, c1) = rotIdx(n, k)(r, c)
        val (r2, c2) = rotIdx(n, (4 - k) % 4)(r1, c1)
        Prop((r2, c2) == ((r, c)))
      }): _*)
    }

  property("closed-form k equals k compositions of the single rotation") =
    forAll(Gen.choose(2, 6), Gen.choose(0, 3)) { (n, k) =>
      Prop.all((for { r <- 0 until n; c <- 0 until n } yield {
        val direct = rotIdx(n, k)(r, c)
        val composed = (1 to k).foldLeft((r, c))((p, _) => rotIdx(n, 1)(p._1, p._2))
        Prop(direct == composed)
      }): _*)
    }

  // --- fused vector kernels (VectorExprs) ---

  private val floats: Gen[List[Float]] = Gen.choose(0, 32).flatMap(n =>
    Gen.listOfN(n, Gen.chooseNum(-100f, 100f)))
  private def fArr(xs: List[Float]) = new GenericArrayData(xs.toArray[Any])

  property("dotData equals the naive sequential fold") =
    forAll(floats, floats) { (a, b) =>
      val got = graft.functions.VectorExprs.dotData(fArr(a), fArr(b), true, true)
      val ref = a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
      java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(ref)
    }

  property("dotData is symmetric") = forAll(floats, floats) { (a, b) =>
    graft.functions.VectorExprs.dotData(fArr(a), fArr(b), true, true) ==
      graft.functions.VectorExprs.dotData(fArr(b), fArr(a), true, true)
  }

  property("distSqData is non-negative and zero on itself") = forAll(floats) { a =>
    val self = graft.functions.VectorExprs.distSqData(fArr(a), fArr(a), true, true)
    val vsZero = graft.functions.VectorExprs.distSqData(
      fArr(a), fArr(List.fill(a.length)(0f)), true, true)
    self == 0.0 && vsZero >= 0.0
  }

  // ---- npy codec: encode∘decode is the identity for any shape/payload ----

  private val npyShape: Gen[List[Int]] = Gen.choose(1, 3).flatMap(rank =>
    Gen.listOfN(rank, Gen.choose(1, 6)))
  private val npyCase: Gen[(String, List[Int], Array[Double])] = for {
    descr <- Gen.oneOf("<f8", "<i8", "<i4")
    shape <- npyShape
    n = shape.product
    data <- descr match {
      case "<f8" => Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6)).map(_.toArray)
      case "<i4" => Gen.listOfN(n, Gen.chooseNum(Int.MinValue, Int.MaxValue))
        .map(_.map(_.toDouble).toArray)
      case _ => Gen.listOfN(n, Gen.chooseNum(-1000000L, 1000000L))
        .map(_.map(_.toDouble).toArray)
    }
  } yield (descr, shape, data)

  property("npy roundtrip: parseNpy(toNpyBytes(x)) == x for f8/i8/i4") =
    forAll(npyCase) { case (descr, shape, data) =>
      val back = graft.sources.NpzIngest.parseNpy(
        graft.sources.NpzIngest.toNpyBytes(descr, shape, data))
      back.shape == shape && back.descr == descr &&
        back.data.toSeq == data.toSeq
    }

  property("npy f4 roundtrip is exact on float-representable payloads") =
    forAll(npyShape.flatMap(s => Gen.listOfN(s.product,
      Gen.chooseNum(-4096, 4095)).map(v => (s, v.map(_ / 16.0).toArray)))) {
      case (shape, data) =>
        graft.sources.NpzIngest.parseNpy(
          graft.sources.NpzIngest.toNpyBytes("<f4", shape, data))
          .data.toSeq == data.toSeq
    }

  // ---- rot90 flat index maps: group laws on the pure kernel ----

  private val gridCase: Gen[(Int, Int)] = for {
    n <- Gen.choose(1, 9); k <- Gen.choose(1, 3)
  } yield (n, k)

  private def rotPerm(n: Int, k: Int): Array[Int] = {
    val a = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate[Any](n * n)(_.toDouble))
    val out = graft.functions.VectorExprs.rot90Data(a, n, k, false)
    Array.tabulate(n * n)(i => out.getDouble(i).toInt)
  }

  property("rot90Data: k-fold single rotation equals rotation by k") =
    forAll(gridCase) { case (n, k) =>
      val single = rotPerm(n, 1)
      val byK = rotPerm(n, k)
      val composed = (1 until k).foldLeft(single)((acc, _) => acc.map(single))
      byK.sameElements(composed)
    }

  property("rot90Data: rotation by k then 4-k is the identity") =
    forAll(gridCase) { case (n, k) =>
      val fwd = rotPerm(n, k)
      val back = rotPerm(n, 4 - k)
      fwd.map(back).sameElements(Array.tabulate(n * n)(identity))
    }

  private val tokenList = Gen.listOf(token)

  property("FoldShinglesExpr equals the per-window reference fold") =
    forAll(tokenList, Gen.choose(1, 6)) { (ts, w) =>
      val arr = new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])
      val got = graft.functions.TextHashExprs.foldShinglesData(arr, w)
      val th = ts.map(t =>
        graft.functions.TextHashExprs.tokenHash(UTF8String.fromString(t)))
      val want =
        if (ts.length < w) Seq.empty[Long]
        else ts.indices.dropRight(w - 1).map(i =>
          th.slice(i, i + w).foldLeft(0L)((acc, x) =>
            (acc * 31L + x) % Hashes.Prime))
      (0 until got.numElements()).map(got.getLong).toSeq == want
    }

  // ---- media codec fuzz: decode must invert the container layout for ANY
  // size, row order, and payload — not just the fixtures' arithmetic ----
  import graft.operators.MediaCodecs

  private val image = for {
    w <- Gen.choose(1, 12)
    h <- Gen.choose(1, 10)
    px <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
  } yield MediaCodecs.Image(w, h, px.map(_.toByte).toArray)

  property("ppm roundtrip: decodePpm(encodePpm(img)) == img") =
    forAll(image) { img =>
      val out = MediaCodecs.decodePpm(MediaCodecs.encodePpm(img))
      out.width == img.width && out.height == img.height &&
        out.pixels.sameElements(img.pixels)
    }

  /** Build a 24-bit BMP container for row-major top-down RGB pixels —
    * bottom-up or top-down on disk, BGR, rows padded with junk to 4 bytes.
    */
  private def buildBmp(img: MediaCodecs.Image, topDown: Boolean): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val rowSize = (img.width * 3 + 3) / 4 * 4
    val bb = ByteBuffer.allocate(54 + rowSize * img.height)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(bb.capacity())
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(img.width)
      .putInt(if (topDown) -img.height else img.height)
      .putShort(1).putShort(24).putInt(0).putInt(rowSize * img.height)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    val ys = if (topDown) 0 until img.height else (img.height - 1) to 0 by -1
    ys.foreach { y =>
      (0 until img.width).foreach { x =>
        val base = (y * img.width + x) * 3
        bb.put(img.pixels(base + 2)).put(img.pixels(base + 1)).put(img.pixels(base))
      }
      (img.width * 3 until rowSize).foreach(_ => bb.put(0x5A.toByte))
    }
    bb.array()
  }

  property("bmp decode inverts the container for any size and row order") =
    forAll(image, Gen.oneOf(true, false)) { (img, topDown) =>
      val out = MediaCodecs.decodeBmp(buildBmp(img, topDown))
      out.width == img.width && out.height == img.height &&
        out.pixels.sameElements(img.pixels)
    }

  property("png roundtrip survives any pixels and any per-row filter choice") =
    forAll(image, Gen.listOfN(16, Gen.choose(0, 4))) { (img, filters) =>
      val bytes = MediaCodecs.encodePng(img, y => filters(y % filters.length))
      val out = MediaCodecs.decodePng(bytes)
      out.width == img.width && out.height == img.height &&
        out.pixels.sameElements(img.pixels)
    }

  property("png decode rejects a corrupted chunk CRC") =
    forAll(image) { img =>
      val bytes = MediaCodecs.encodePng(img)
      bytes(16) = (bytes(16) ^ 0x01).toByte // flip a bit inside IHDR's body
      scala.util.Try(MediaCodecs.decodePng(bytes)).isFailure
    }

  // ---- Aho–Corasick: one-pass counts must equal the naive every-offset
  // scan for ANY text and pattern set — a dense 2-letter alphabet maximizes
  // self-overlaps, borders, and nested patterns (the fail/dict-link paths)
  private val acCase = for {
    text <- Gen.listOfN(60, Gen.oneOf('a', 'b')).map(_.mkString)
    n <- Gen.choose(1, 6)
    pats <- Gen.listOfN(n,
      Gen.choose(1, 4).flatMap(l => Gen.listOfN(l, Gen.oneOf('a', 'b')).map(_.mkString)))
  } yield (text, pats.distinct)

  property("aho-corasick counts every overlapping occurrence of every pattern") =
    forAll(acCase) { case (text, pats) =>
      val ac = new graft.functions.MultiMatch.Automaton(pats.toArray)
      val got = ac.countsData(UTF8String.fromString(text))
      pats.indices.forall { i =>
        val p = pats(i)
        val naive = (0 to text.length - p.length)
          .count(o => text.regionMatches(o, p, 0, p.length))
        got.getLong(i) == naive
      }
    }

  private val palettedImage = for {
    w <- Gen.choose(1, 14)
    h <- Gen.choose(1, 12)
    bits <- Gen.choose(1, 8)
    palette <- Gen.listOfN((1 << bits) * 3, Gen.choose(0, 255))
    indices <- Gen.listOfN(w * h, Gen.choose(0, (1 << bits) - 1))
  } yield (w, h, palette.map(_.toByte).toArray, indices.map(_.toByte).toArray)

  property("gif roundtrip: LZW + palette + interlace + table precedence invert") =
    forAll(palettedImage, Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      case ((w, h, palette, indices), interlaced, localTable) =>
        val bytes = MediaCodecs.encodeGif(w, h, palette, indices, interlaced, localTable)
        val out = MediaCodecs.decodeGif(bytes)
        val want = indices.flatMap { idx =>
          val k = idx & 0xff
          Array(palette(k * 3), palette(k * 3 + 1), palette(k * 3 + 2))
        }
        out.width == w && out.height == h && out.pixels.sameElements(want)
    }

  property("gif decode rejects a truncated LZW stream") =
    forAll(palettedImage) { case (w, h, palette, indices) =>
      val bytes = MediaCodecs.encodeGif(w, h, palette, indices)
      // chop the trailer and the last data sub-block: the pixel count check
      // (or the sub-block walk) must fail, never return a short image
      val cut = bytes.length - math.min(bytes.length - 13, 6)
      scala.util.Try(MediaCodecs.decodeGif(java.util.Arrays.copyOf(bytes, cut))).isFailure
    }

  property("qoi roundtrip survives any pixels") =
    forAll(image) { img =>
      val out = MediaCodecs.decodeQoi(MediaCodecs.encodeQoi(img))
      out.width == img.width && out.height == img.height &&
        out.pixels.sameElements(img.pixels)
    }

  // smooth images walk the value space in small wrapping steps — consecutive
  // pixels land inside the DIFF/LUMA delta ranges (and repeat for runs), so
  // every op type including the wrap-around deltas is driven through decode
  private val smoothImage = for {
    w <- Gen.choose(1, 12)
    h <- Gen.choose(1, 10)
    start <- Gen.choose(0, 255)
    steps <- Gen.listOfN(w * h * 3, Gen.oneOf(-2, -1, 0, 0, 1, 30))
  } yield {
    var v = start
    val px = steps.map { s => v = (v + s) & 0xff; v.toByte }
    MediaCodecs.Image(w, h, px.toArray)
  }

  property("qoi roundtrip survives smooth gradients (delta/run/index ops)") =
    forAll(smoothImage) { img =>
      val out = MediaCodecs.decodeQoi(MediaCodecs.encodeQoi(img))
      out.pixels.sameElements(img.pixels)
    }

  property("qoi decode rejects a truncated op stream") =
    forAll(image) { img =>
      val bytes = MediaCodecs.encodeQoi(img)
      val cut = bytes.length - math.min(bytes.length - 14, 9)
      scala.util.Try(MediaCodecs.decodeQoi(java.util.Arrays.copyOf(bytes, cut))).isFailure
    }

  private val clip = for {
    rate <- Gen.choose(4000, 48000)
    samples <- Gen.nonEmptyListOf(Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
    extraChunk <- Gen.oneOf(true, false)
  } yield (rate, samples.map(_.toShort).toArray, extraChunk)

  property("wav decode recovers any PCM16 payload, skipping foreign chunks") =
    forAll(clip) { case (rate, samples, extraChunk) =>
      import java.nio.{ByteBuffer, ByteOrder}
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val padded = if (body.length % 2 == 1) body :+ 0.toByte else body
        val bb = ByteBuffer.allocate(8 + padded.length).order(ByteOrder.LITTLE_ENDIAN)
        bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(padded)
        bb.array()
      }
      val fmt = {
        val bb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
        bb.putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
          .putShort(2).putShort(16)
        bb.array()
      }
      val data = {
        val bb = ByteBuffer.allocate(samples.length * 2).order(ByteOrder.LITTLE_ENDIAN)
        samples.foreach(bb.putShort)
        bb.array()
      }
      val body = "WAVE".getBytes("US-ASCII") ++ chunk("fmt ", fmt) ++
        (if (extraChunk) chunk("LIST", "INFOjunk".getBytes("US-ASCII")) else Array.emptyByteArray) ++
        chunk("data", data)
      val riff = "RIFF".getBytes("US-ASCII") ++ {
        val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(body.length); bb.array()
      } ++ body
      val out = MediaCodecs.decodeWav(riff)
      out.sampleRate == rate && out.samples.sameElements(samples)
    }

  // ---- FLAC: lossless ⇒ decode(encode(x)) must be BIT-EXACT for any
  // samples, under every encoder posture: mono/stereo, every fixed
  // predictor order (cycled per frame/channel), all four stereo modes
  // (cycled per frame), partition orders 0–4, multiple block sizes, and a
  // trailing-zero shift that forces the wasted-bits path. Flat inputs
  // force CONSTANT subframes; wide-range inputs force escape partitions.
  private val flacCase = for {
    nPer <- Gen.choose(1, 260)
    ch <- Gen.oneOf(1, 2)
    raw <- Gen.listOfN(nPer * ch, Gen.oneOf(
      Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt), // full range
      Gen.choose(-40, 40),                                    // rice-friendly
      Gen.const(1234)))                                       // flat runs
    shift <- Gen.oneOf(0, 0, 0, 4) // sometimes force wasted bits
    order <- Gen.choose(0, 4)
    mode <- Gen.choose(0, 3)
    po <- Gen.choose(0, 4)
    bs <- Gen.oneOf(16, 64, 192)
  } yield (raw.map(v => ((v >> shift) << shift).toShort).toArray,
    ch, order, mode, po, bs)

  property("flac roundtrip is bit-exact over all subframe/stereo/rice paths") =
    forAll(flacCase) { case (samples, ch, order, mode, po, bs) =>
      val enc = MediaCodecs.encodeFlac(MediaCodecs.Audio(8000, samples), ch, bs,
        (f, c) => (order + f + c) % 5, f => (mode + f) % 4, _ => po)
      val out = MediaCodecs.decodeFlac(enc)
      out.sampleRate == 8000 && out.samples.sameElements(samples)
    }

  property("flac decode rejects truncation and any corrupted frame byte") =
    forAll(flacCase, Gen.choose(1, 20), Gen.choose(1, 255)) {
      case ((samples, ch, order, mode, po, bs), cut, flip) =>
        val enc = MediaCodecs.encodeFlac(MediaCodecs.Audio(8000, samples), ch, bs,
          (f, c) => (order + f + c) % 5, f => (mode + f) % 4, _ => po)
        val truncated = scala.util.Try(MediaCodecs.decodeFlac(
          java.util.Arrays.copyOf(enc, enc.length - math.min(cut, enc.length - 4)))).isFailure
        // flip one byte inside the LAST frame (past the 42-byte header +
        // STREAMINFO): the frame CRC-16 must catch it whatever it hit
        val corrupted = {
          val b = enc.clone()
          val at = b.length - 1 - (cut % math.min(cut + 1, 8))
          b(at) = (b(at) ^ flip).toByte
          scala.util.Try(MediaCodecs.decodeFlac(b)).isFailure
        }
        truncated && corrupted
    }
}
