package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Dependency-free binary media codecs — the real decode kernels behind the
  * multimodal operators (no codec libraries exist in this environment, so
  * the containers are the simple, fully-specified ones: binary PPM for
  * images, RIFF/WAVE PCM16 for audio).
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
