package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Dependency-free binary media codecs — the real decode kernels behind the
  * multimodal operators (no codec libraries exist in this environment, so
  * everything here is pure JVM: binary PPM, 24-bit BMP, and zlib-compressed
  * truecolor PNG for images — the JDK's Inflater supplies the DEFLATE
  * codec — and RIFF/WAVE PCM16 for audio).
  *
  * Reference analog: the tensor ingest path that turns raw detector files
  * into typed arrays (create_train_valid_test_datasets.py:116) — here the
  * raw file is a media container and the typed array is pixels/samples.
  */
object MediaCodecs {

  /** RGB-interleaved 8-bit image: pixels(y*width*3 + x*3 + channel). */
  final case class Image(width: Int, height: Int, pixels: Array[Byte])

  /** Mono PCM16 clip. */
  final case class Audio(sampleRate: Int, samples: Array[Short])

  /** Decode a binary (P6) PPM: `P6 <w> <h> <maxval>` header tokens separated
    * by whitespace with `#`-to-end-of-line comments, a single whitespace
    * byte, then w·h·3 RGB bytes. Only maxval 255 (1 byte/sample) supported.
    */
  def decodePpm(bytes: Array[Byte]): Image = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a binary PPM (missing P6 magic)")
    var pos = 2
    def skipSeparators(): Unit = {
      var done = false
      while (!done && pos < bytes.length) {
        val b = bytes(pos)
        if (b == '#') while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else if (b == ' ' || b == '\n' || b == '\r' || b == '\t') pos += 1
        else done = true
      }
    }
    def readInt(): Int = {
      skipSeparators()
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        pos += 1
        any = true
      }
      require(any, s"PPM: expected an integer header token at byte $pos")
      v
    }
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    require(maxval == 255, s"PPM: only maxval 255 supported, got $maxval")
    pos += 1 // exactly one whitespace byte separates the header from pixels
    val need = w * h * 3
    require(bytes.length - pos >= need,
      s"PPM: truncated payload — need $need bytes, have ${bytes.length - pos}")
    Image(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + need))
  }

  /** Encode back to binary PPM (for resize round-trips). */
  def encodePpm(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Nearest-neighbor downscale by an integer factor: keep pixels whose
    * (x, y) are both multiples of `factor`. Output dims = ⌈w/f⌉ × ⌈h/f⌉.
    */
  def downscale(img: Image, factor: Int): Image = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val ow = (img.width + factor - 1) / factor
    val oh = (img.height + factor - 1) / factor
    val out = new Array[Byte](ow * oh * 3)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        val src = (oy * factor * img.width + ox * factor) * 3
        val dst = (oy * ow + ox) * 3
        out(dst) = img.pixels(src)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src + 2)
        ox += 1
      }
      oy += 1
    }
    Image(ow, oh, out)
  }

  /** Decode an uncompressed 24-bit BMP (BITMAPINFOHEADER): rows are stored
    * bottom-up when biHeight > 0 (top-down when negative), BGR-interleaved,
    * each row zero-padded to a 4-byte boundary — all three quirks are undone
    * so the returned [[Image]] is row-major top-down RGB like
    * [[decodePpm]]'s.
    */
  def decodeBmp(bytes: Array[Byte]): Image = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54, "BMP: truncated headers")
    require(bytes(0) == 'B' && bytes(1) == 'M', "BMP: missing BM magic")
    val dataOffset = bb.getInt(10)
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      s"BMP: pixel data offset $dataOffset outside the file")
    require(bb.getInt(14) >= 40, "BMP: pre-BITMAPINFOHEADER formats unsupported")
    val w = bb.getInt(18)
    val rawH = bb.getInt(22)
    val topDown = rawH < 0
    val h = math.abs(rawH)
    require(w > 0 && h > 0, s"BMP: bad dimensions ${w}x$rawH")
    require((bb.getShort(26) & 0xffff) == 1, "BMP: planes must be 1")
    val bpp = bb.getShort(28) & 0xffff
    require(bpp == 24, s"BMP: only 24-bit supported, got $bpp")
    require(bb.getInt(30) == 0, "BMP: only uncompressed (BI_RGB) supported")
    val rowSize = (w * 3 + 3) / 4 * 4
    require(dataOffset.toLong + rowSize.toLong * h <= bytes.length,
      s"BMP: truncated payload — need ${rowSize.toLong * h} bytes from $dataOffset")
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val src = dataOffset + (if (topDown) y else h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val dst = (y * w + x) * 3
        out(dst) = bytes(src + x * 3 + 2)     // R (file order is BGR)
        out(dst + 1) = bytes(src + x * 3 + 1) // G
        out(dst + 2) = bytes(src + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }

  /** Decode an 8-bit truecolor (color type 2, non-interlaced) PNG — the one
    * real COMPRESSED container in the codec family: chunk walk with CRC32
    * verification, multiple IDAT chunks concatenated before a single zlib
    * inflate (`java.util.zip.Inflater` — the JDK ships the codec), then
    * scanline defiltering for all five PNG filter types (None/Sub/Up/
    * Average/Paeth, RFC 2083 §6). Ancillary chunks (tEXt etc.) are skipped;
    * output is row-major top-down RGB like [[decodePpm]]'s.
    */
  def decodePng(bytes: Array[Byte]): Image = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    require(bytes.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(bytes, 8), sig), "PNG: missing signature")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var pos = 8
    var w = -1
    var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new java.util.zip.CRC32()
    var ended = false
    while (!ended && pos + 12 <= bytes.length) {
      val len = bb.getInt(pos)
      require(len >= 0 && pos + 12L + len <= bytes.length,
        s"PNG: chunk at $pos overruns the file")
      val tag = bb.getInt(pos + 4)
      crc.reset()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == bb.getInt(pos + 8 + len),
        s"PNG: CRC mismatch in chunk at $pos")
      tag match {
        case 0x49484452 => // IHDR
          require(len == 13, "PNG: IHDR must be 13 bytes")
          w = bb.getInt(pos + 8)
          h = bb.getInt(pos + 12)
          require(w > 0 && h > 0, s"PNG: bad dimensions ${w}x$h")
          require(bytes(pos + 16) == 8, "PNG: only bit depth 8 supported")
          require(bytes(pos + 17) == 2, "PNG: only truecolor (type 2) supported")
          require(bytes(pos + 18) == 0 && bytes(pos + 19) == 0,
            "PNG: nonstandard compression/filter method")
          require(bytes(pos + 20) == 0, "PNG: interlaced images unsupported")
        case 0x49444154 => // IDAT — may be split; payload is ONE zlib stream
          require(w > 0, "PNG: IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case 0x49454e44 => ended = true // IEND
        case _ => () // ancillary (tEXt, pHYs, ...) — skip
      }
      pos += 12 + len
    }
    require(ended, "PNG: no IEND chunk")
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, off, raw.length - off)
      require(n > 0 || !inf.needsInput, "PNG: truncated IDAT stream")
      off += n
    }
    require(off == raw.length,
      s"PNG: inflated ${off} bytes, expected ${raw.length}")
    inf.end()
    // defilter: each scanline leads with its filter type; predictors see the
    // RECONSTRUCTED left/up/upper-left bytes (bpp = 3 for RGB8)
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      require(ft <= 4, s"PNG: unknown filter type $ft on row $y")
      val src = y * (1 + stride) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val f = raw(src + x) & 0xff
        val left = if (x >= 3) out(dst + x - 3) & 0xff else 0
        val up = if (y > 0) out(dst - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= 3) out(dst - stride + x - 3) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            f + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        out(dst + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }

  /** Encode row-major top-down RGB pixels as an 8-bit truecolor PNG, with a
    * caller-chosen filter type per row (deflate via the JDK's
    * `java.util.zip.Deflater`). The fuzz property drives every filter type
    * through [[decodePng]] with this.
    */
  def encodePng(img: Image, filterOf: Int => Int = _ % 5): Array[Byte] = {
    val stride = img.width * 3
    val raw = new Array[Byte](img.height * (1 + stride))
    var y = 0
    while (y < img.height) {
      val ft = filterOf(y)
      require(ft >= 0 && ft <= 4, s"bad filter type $ft")
      raw(y * (1 + stride)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = img.pixels(y * stride + x) & 0xff
        val left = if (x >= 3) img.pixels(y * stride + x - 3) & 0xff else 0
        val up = if (y > 0) img.pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= 3) img.pixels((y - 1) * stride + x - 3) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            cur - (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        raw(y * (1 + stride) + 1 + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val outStream = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      outStream.write(buf, 0, n)
    }
    deflater.end()
    val idat = outStream.toByteArray
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val t = tag.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t)
      crc.update(body)
      val bb = ByteBuffer.allocate(12 + body.length).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(body.length).put(t).put(body).putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(img.width).putInt(img.height)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++ chunk("IEND", Array.emptyByteArray)
  }

  /** Decode a RIFF/WAVE container holding mono 16-bit PCM: walk the chunk
    * list (ids are 4 ASCII bytes, sizes little-endian, chunks padded to even
    * offsets), require a PCM fmt chunk, return the data chunk's samples.
    */
  def decodeWav(bytes: Array[Byte]): Audio = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12, "WAV: truncated RIFF header")
    require(bb.getInt(0) == 0x46464952, "WAV: missing RIFF magic") // "RIFF"
    require(bb.getInt(8) == 0x45564157, "WAV: missing WAVE form")  // "WAVE"
    var pos = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = bb.getInt(pos)
      val size = bb.getInt(pos + 4)
      val body = pos + 8
      require(size >= 0 && body + size <= bytes.length,
        s"WAV: chunk at $pos overruns the file")
      if (id == 0x20746d66) { // "fmt "
        require(size >= 16, "WAV: fmt chunk too small")
        val audioFormat = bb.getShort(body) & 0xffff
        val channels = bb.getShort(body + 2) & 0xffff
        val bits = bb.getShort(body + 14) & 0xffff
        require(audioFormat == 1, s"WAV: only PCM supported, got format $audioFormat")
        require(channels == 1, s"WAV: only mono supported, got $channels channels")
        require(bits == 16, s"WAV: only 16-bit supported, got $bits")
        sampleRate = bb.getInt(body + 4)
      } else if (id == 0x61746164) { // "data"
        require(sampleRate > 0, "WAV: data chunk before fmt chunk")
        val n = size / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = bb.getShort(body + 2 * i); i += 1 }
        samples = out
      }
      pos = body + size + (size & 1) // chunks are word-aligned
    }
    require(samples != null, "WAV: no data chunk")
    Audio(sampleRate, samples)
  }
}
