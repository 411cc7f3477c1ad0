package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Lossless PNG codec over microscopy frames — the real twin of the
  * reference's image (de)serialization
  * (imaging_db/utils/image_utils.py:5-30: `im_bytes = cv2.imencode
  * (".png", im)` / `cv2.imdecode(..., cv2.IMREAD_ANYCOLOR |
  * cv2.IMREAD_ANYDEPTH)`). Both reference depths are supported —
  * uint8 and the microscope's native uint16 (PNG carries 16-bit
  * grayscale losslessly, which is why the reference picked PNG over
  * JPEG) — and both reference color shapes: grayscale (color type 0)
  * and the `im_colors=3` RGB the reference threads through
  * file_splitter.py:158 / tif_id_splitter.py:45 (color type 2, 8- and
  * 16-bit).
  *
  * This is a from-scratch implementation of the PNG spec (RFC 2083:
  * signature, IHDR/IDAT/IEND chunks, zlib streams, all five scanline
  * filters on decode), NOT a javax.imageio wrapper — measured reason:
  * every ImageIO encode/decode constructs a fresh Deflater/Inflater,
  * and each construction registers a PhantomCleanable on the JDK's
  * GLOBAL cleaner-list lock. On a 32-thread executor that lock convoys
  * the whole codec stage (measured 190 µs/frame at 32 threads vs
  * 10 µs/frame at 8 — worse than single-threaded). Here each thread
  * holds ONE reused Deflater/Inflater (`reset()` between frames), so
  * the per-frame path allocates no native resources and takes no
  * shared lock. StreamingSpec cross-validates both directions against
  * javax.imageio for standard compliance.
  *
  * Everything here is executor-side per-row work: no Spark imports, no
  * shared state, safe inside a UDF or a mapPartitions decode loop.
  */
object ImageCodec {

  private val PngSig: Array[Byte] =
    Array(0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  // one zlib codec pair per thread, reset per frame — never
  // constructed on the per-row path (see class doc)
  private val deflater: ThreadLocal[Deflater] =
    ThreadLocal.withInitial(() => new Deflater(Deflater.BEST_SPEED))
  private val inflater: ThreadLocal[Inflater] =
    ThreadLocal.withInitial(() => new Inflater())

  /** Encode row-major uint8 grayscale pixels as PNG. */
  def encodeGray8(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h,
      s"pixel buffer ${pixels.length} != ${w}x$h")
    // filter byte 0 (None) per scanline + raw bytes
    val raw = new Array[Byte](h * (1 + w))
    var y = 0
    while (y < h) {
      System.arraycopy(pixels, y * w, raw, y * (1 + w) + 1, w)
      y += 1
    }
    assemble(w, h, bitDepth = 8, colorType = 0, raw)
  }

  /** Encode row-major uint16 grayscale pixels (0..65535 ints) as PNG
    * (big-endian sample bytes per the spec).
    */
  def encodeGray16(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h,
      s"pixel buffer ${pixels.length} != ${w}x$h")
    val raw = new Array[Byte](h * (1 + 2 * w))
    var y = 0
    while (y < h) {
      val base = y * (1 + 2 * w) + 1
      var x = 0
      while (x < w) {
        val v = pixels(y * w + x) & 0xffff
        raw(base + 2 * x) = (v >>> 8).toByte
        raw(base + 2 * x + 1) = v.toByte
        x += 1
      }
      y += 1
    }
    assemble(w, h, bitDepth = 16, colorType = 0, raw)
  }

  /** Encode row-major INTERLEAVED uint8 RGB samples (r,g,b,r,g,b,…)
    * as PNG color type 2 — the `im_colors=3` shape the reference
    * decodes with IMREAD_ANYCOLOR (image_utils.py:30).
    */
  def encodeRgb8(samples: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(samples.length == 3 * w * h,
      s"sample buffer ${samples.length} != 3x${w}x$h")
    val raw = new Array[Byte](h * (1 + 3 * w))
    var y = 0
    while (y < h) {
      System.arraycopy(samples, y * 3 * w, raw, y * (1 + 3 * w) + 1, 3 * w)
      y += 1
    }
    assemble(w, h, bitDepth = 8, colorType = 2, raw)
  }

  /** Encode row-major interleaved uint16 RGB samples (0..65535 ints)
    * as 16-bit PNG color type 2.
    */
  def encodeRgb16(samples: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(samples.length == 3 * w * h,
      s"sample buffer ${samples.length} != 3x${w}x$h")
    val stride = 6 * w
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val base = y * (1 + stride) + 1
      var s = 0
      while (s < 3 * w) {
        val v = samples(y * 3 * w + s) & 0xffff
        raw(base + 2 * s) = (v >>> 8).toByte
        raw(base + 2 * s + 1) = v.toByte
        s += 1
      }
      y += 1
    }
    assemble(w, h, bitDepth = 16, colorType = 2, raw)
  }

  /** A decoded PNG: `channels` is 1 (grayscale) or 3 (RGB);
    * `samples` is row-major, channel-interleaved, one Int per sample
    * (0..255 at depth 8, 0..65535 at depth 16).
    */
  final case class Decoded(width: Int, height: Int, channels: Int,
    bitDepth: Int, samples: Array[Int])

  /** Decode a grayscale PNG to (width, height, row-major pixels) —
    * depth-agnostic like the reference's IMREAD_ANYDEPTH: uint8 comes
    * back as 0..255, uint16 as 0..65535. Handles all five scanline
    * filters, so PNGs from other encoders (javax.imageio uses adaptive
    * filtering) decode too.
    */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val d = decodeImage(bytes)
    require(d.channels == 1, "not grayscale (color type 2)")
    (d.width, d.height, d.samples)
  }

  /** Decode an RGB PNG to (width, height, interleaved r,g,b samples),
    * either depth.
    */
  def decodeRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val d = decodeImage(bytes)
    require(d.channels == 3, "not RGB (color type 0)")
    (d.width, d.height, d.samples)
  }

  /** Decode any supported PNG (gray/RGB × 8/16-bit) — the
    * IMREAD_ANYCOLOR | IMREAD_ANYDEPTH twin. Handles all five
    * scanline filters.
    */
  def decodeImage(bytes: Array[Byte]): Decoded = {
    require(bytes.length > 8 && (0 until 8).forall(i => bytes(i) == PngSig(i)),
      "payload is not a decodable image (bad PNG signature)")
    var w = 0
    var h = 0
    var bitDepth = 0
    var channels = 0
    val idat = new ByteArrayOutputStream()
    var pos = 8
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      val len = be32(bytes, pos)
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      val data = pos + 8
      // a corrupt length must fail the documented way — unvalidated it
      // either spins this loop forever (negative len) or escapes as an
      // IndexOutOfBounds from the IDAT copy (len past the buffer)
      require(len >= 0 && data + len + 4 <= bytes.length,
        s"payload is not a decodable image (chunk $ctype length $len)")
      ctype match {
        case "IHDR" =>
          w = be32(bytes, data)
          h = be32(bytes, data + 4)
          bitDepth = bytes(data + 8) & 0xff
          val colorType = bytes(data + 9) & 0xff
          require(colorType == 0 || colorType == 2,
            s"unsupported color type $colorType")
          channels = if (colorType == 2) 3 else 1
          require(bitDepth == 8 || bitDepth == 16,
            s"unsupported bit depth $bitDepth")
          require((bytes(data + 12) & 0xff) == 0, "interlace unsupported")
        case "IDAT" => idat.write(bytes, data, len)
        case "IEND" => done = true
        case _ => // ancillary chunk — skip
      }
      pos = data + len + 4 // skip CRC
    }
    require(w > 0 && h > 0 && idat.size() > 0, "truncated PNG")
    val bpp = channels * (bitDepth / 8) // filter unit: bytes per pixel
    val stride = w * bpp
    val raw = inflate(idat.toByteArray, h * (1 + stride))
    // undo per-scanline filters in place (spec §6: None/Sub/Up/Avg/Paeth)
    val out = new Array[Int](w * h * channels)
    // `prev` holds the RECONSTRUCTED previous scanline throughout the
    // current row's filter pass (zeros above row 0, per spec), so
    // b = prev(i) and Paeth's c = prev(i - bpp) read directly from it
    val prev = new Array[Int](stride)
    var y = 0
    while (y < h) {
      val base = y * (1 + stride)
      val filter = raw(base) & 0xff
      var i = 0
      while (i < stride) {
        val x = raw(base + 1 + i) & 0xff
        val a = if (i >= bpp) raw(base + 1 + i - bpp) & 0xff else 0
        val b = prev(i)
        val c = if (i >= bpp) prev(i - bpp) else 0
        val rec = filter match {
          case 0 => x
          case 1 => (x + a) & 0xff
          case 2 => (x + b) & 0xff
          case 3 => (x + ((a + b) >> 1)) & 0xff
          case 4 => (x + paeth(a, b, c)) & 0xff
          case f => throw new IllegalArgumentException(s"bad PNG filter $f")
        }
        raw(base + 1 + i) = rec.toByte
        i += 1
      }
      i = 0
      while (i < stride) {
        prev(i) = raw(base + 1 + i) & 0xff
        i += 1
      }
      var s = 0
      while (s < w * channels) {
        out(y * w * channels + s) =
          if (bitDepth == 8) raw(base + 1 + s) & 0xff
          else ((raw(base + 1 + 2 * s) & 0xff) << 8) |
            (raw(base + 1 + 2 * s + 1) & 0xff)
        s += 1
      }
      y += 1
    }
    Decoded(w, h, channels, bitDepth, out)
  }

  /** Paeth predictor (PNG spec §6.6). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Real image resize (nearest-neighbor, the cheap deterministic
    * resample a thumbnail pass wants): decode → sample → re-encode,
    * depth- and color-preserving (gray and RGB, 8- and 16-bit).
    */
  def resizeGray(bytes: Array[Byte], factor: Int): Array[Byte] =
    resizeImage(bytes, factor)

  /** Nearest-neighbor resize of any supported PNG; each sampled pixel
    * carries all its channels, so RGB never mixes samples across
    * channels.
    */
  def resizeImage(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val d = decodeImage(bytes)
    val ch = d.channels
    val nw = math.max(1, d.width / factor)
    val nh = math.max(1, d.height / factor)
    val out = new Array[Int](nw * nh * ch)
    var i = 0
    while (i < nw * nh) {
      val x = (i % nw) * factor
      val y = (i / nw) * factor
      var c = 0
      while (c < ch) {
        out(i * ch + c) = d.samples((y * d.width + x) * ch + c)
        c += 1
      }
      i += 1
    }
    (d.channels, d.bitDepth) match {
      case (1, 8) => encodeGray8(out.map(_.toByte), nw, nh)
      case (1, 16) => encodeGray16(out, nw, nh)
      case (3, 8) => encodeRgb8(out.map(_.toByte), nw, nh)
      case (3, 16) => encodeRgb16(out, nw, nh)
    }
  }

  /** Lowercase-hex → bytes (the sha256 column → planted pixel values). */
  def hexBytes(hex: String): Array[Byte] = {
    val out = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  // ---- PNG plumbing --------------------------------------------------

  private def assemble(w: Int, h: Int, bitDepth: Int, colorType: Int,
      raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    out.write(PngSig, 0, 8)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w)
    putBe32(ihdr, 4, h)
    ihdr(8) = bitDepth.toByte
    ihdr(9) = colorType.toByte // 0 = grayscale, 2 = RGB
    // 10..12: compression 0, filter 0, interlace 0
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", deflate(raw))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def chunk(out: ByteArrayOutputStream, ctype: String,
      data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    putBe32(len, 0, data.length)
    out.write(len, 0, 4)
    val t = ctype.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(t)
    crc.update(data)
    val c = new Array[Byte](4)
    putBe32(c, 0, crc.getValue.toInt)
    out.write(c, 0, 4)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = deflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val out = new ByteArrayOutputStream(raw.length / 2 + 32)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    out.toByteArray
  }

  private def inflate(z: Array[Byte], expected: Int): Array[Byte] = {
    val inf = inflater.get()
    inf.reset()
    inf.setInput(z)
    val out = new Array[Byte](expected)
    var off = 0
    try {
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        // any zero-progress iteration is terminal: needsInput = truncated
        // stream, needsDictionary = preset-dictionary stream (which this
        // loop can never satisfy — unhandled it spins forever)
        if (n == 0) throw new IllegalArgumentException(
          "payload is not a decodable image (" +
            (if (inf.needsDictionary()) "zlib preset dictionary"
             else "truncated zlib stream") + ")")
        off += n
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(
          s"payload is not a decodable image: ${e.getMessage}")
    }
    require(off == expected,
      s"payload is not a decodable image (raw $off != $expected)")
    out
  }

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte
    b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte
    b(off + 3) = v.toByte
  }
}
