package graft.llm

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM media codecs for header-simple formats — the REAL decode
  * behind [[Multimodal.BatchDecoder]] (no codec libraries needed: PPM
  * and WAV-PCM are fixed headers + raw samples). This replaces the
  * deterministic stub for the formats it recognizes; the lifecycle,
  * batching and schema plumbing are unchanged.
  *
  *  - PPM (P6): ASCII header `P6 <w> <h> <maxval>` with `#` comments,
  *    then w×h×3 raw bytes (maxval ≤ 255 supported — the common case).
  *  - WAV: RIFF container, PCM 16-bit `fmt ` chunk, `data` chunk.
  *
  * Encoders are provided for fixture/preview writing; decode(encode(x))
  * is byte-exact, which the specs pin.
  */
object MediaCodecs {

  // ------------------------------------------------------------- PPM

  final case class PpmImage(width: Int, height: Int, pixels: Array[Byte]) {
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val o = (y * width + x) * 3
      (pixels(o) & 0xff, pixels(o + 1) & 0xff, pixels(o + 2) & 0xff)
    }
    /** Per-channel means over all pixels (exact integer accumulation). */
    def channelMeans: (Double, Double, Double) = {
      var r = 0L; var g = 0L; var b = 0L
      var i = 0
      while (i < pixels.length) {
        r += pixels(i) & 0xff; g += pixels(i + 1) & 0xff; b += pixels(i + 2) & 0xff
        i += 3
      }
      val n = (width.toLong * height).toDouble
      (r / n, g / n, b / n)
    }
  }

  /** Binary (P6) PPM encode, maxval 255. `pix(x, y)` returns (r, g, b). */
  def encodePpm(width: Int, height: Int,
      pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val header = s"P6\n$width $height\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var o = header.length
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pix(x, y)
        out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = b.toByte
        o += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a P6 PPM. Throws IllegalArgumentException on malformed input
    * (wrong magic, truncated pixel data, maxval > 255). */
  def decodePpm(bytes: Array[Byte]): PpmImage = {
    require(bytes != null && bytes.length > 2 &&
      bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
    var pos = 2
    // read the next ASCII integer token, skipping whitespace + # comments
    def nextInt(): Int = {
      while (pos < bytes.length &&
        (bytes(pos) == ' ' || bytes(pos) == '\n' || bytes(pos) == '\r' ||
          bytes(pos) == '\t' || bytes(pos) == '#')) {
        if (bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else pos += 1
      }
      require(pos < bytes.length, "truncated PPM header")
      var v = 0
      var saw = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); saw = true; pos += 1
      }
      require(saw, s"expected integer at offset $pos")
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(maxval > 0 && maxval <= 255, s"unsupported maxval $maxval")
    pos += 1 // single whitespace after maxval per spec
    val need = w * h * 3
    require(bytes.length - pos >= need,
      s"truncated PPM pixel data: need $need, have ${bytes.length - pos}")
    val px = java.util.Arrays.copyOfRange(bytes, pos, pos + need)
    PpmImage(w, h, px)
  }

  // ------------------------------------------------------------- WAV

  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def nFrames: Int = samples.length / math.max(channels, 1)
    def durationMs: Long = nFrames.toLong * 1000L / math.max(sampleRate, 1)
    /** RMS amplitude (exact integer square accumulation before the root). */
    def rms: Double =
      if (samples.isEmpty) 0.0
      else {
        var acc = 0L
        var i = 0
        while (i < samples.length) { acc += samples(i).toLong * samples(i); i += 1 }
        math.sqrt(acc.toDouble / samples.length)
      }
    def peak: Int = {
      var p = 0
      var i = 0
      while (i < samples.length) {
        val a = math.abs(samples(i).toInt); if (a > p) p = a; i += 1
      }
      p
    }
  }

  /** PCM 16-bit little-endian WAV encode (interleaved when channels>1). */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "bad WAV parameters")
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataSize)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
      .put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a PCM-16 WAV: walks the RIFF chunk list (tolerating extra
    * chunks like LIST/fact), requires a 16-bit PCM fmt chunk. */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    require(bytes != null && bytes.length >= 44, "not a WAV (too short)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, StandardCharsets.US_ASCII)
    }
    require(fourcc() == "RIFF", "missing RIFF magic")
    buf.getInt // riff size (unreliable in the wild; chunk walk below bounds reads)
    require(fourcc() == "WAVE", "missing WAVE form type")
    var sampleRate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8) {
      val id = fourcc()
      val size = buf.getInt
      require(size >= 0 && size <= buf.remaining(), s"bad chunk size $size for '$id'")
      val next = buf.position() + size + (size & 1) // chunks are word-aligned
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too small")
          val fmt = buf.getShort
          require(fmt == 1, s"only PCM supported, got format $fmt")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          bits = buf.getShort.toInt
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
        case _ => // skip LIST/fact/etc
      }
      buf.position(math.min(next, buf.limit()))
    }
    require(samples != null, "missing data chunk")
    WavAudio(sampleRate, channels, samples)
  }

  // ------------------------------------- the real batch decoder

  /** Feature layout emitted by [[CodecBatchDecoder]], by sniffed format:
    *  - PPM:  [width, height, meanR, meanG, meanB, meanR+meanG+meanB]
    *  - WAV:  [sampleRate, channels, nFrames, rms, peak, durationMs]
    * Means/RMS accumulate in exact integer space before one double
    * division/root, so results are engine-portable. */
  final class CodecBatchDecoder(strict: Boolean = false)
      extends Multimodal.BatchDecoder {
    override def decode(contents: Array[Array[Byte]]): Array[Multimodal.Decoded] =
      contents.map { bytes =>
        val n = if (bytes == null) 0 else bytes.length
        var checksum = 1469598103934665603L // FNV-1a, same as the stub path
        var i = 0
        while (i < n) {
          checksum = (checksum ^ (bytes(i) & 0xffL)) * 1099511628211L
          i += 1
        }
        val features: Array[Float] =
          if (n > 2 && bytes(0) == 'P' && bytes(1) == '6') {
            val img = decodePpm(bytes)
            val (r, g, b) = img.channelMeans
            Array(img.width.toFloat, img.height.toFloat,
              r.toFloat, g.toFloat, b.toFloat, (r + g + b).toFloat)
          } else if (n > 4 && bytes(0) == 'R' && bytes(1) == 'I' &&
              bytes(2) == 'F' && bytes(3) == 'F') {
            val wav = decodeWav(bytes)
            Array(wav.sampleRate.toFloat, wav.channels.toFloat,
              wav.nFrames.toFloat, wav.rms.toFloat, wav.peak.toFloat,
              wav.durationMs.toFloat)
          } else if (strict) {
            throw new IllegalArgumentException(
              s"unrecognized media payload ($n bytes)")
          } else Array.empty[Float] // pass through unrecognized payloads
        Multimodal.Decoded(n, checksum, features)
      }
  }
}
