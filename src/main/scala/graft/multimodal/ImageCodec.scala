package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Lossless PNG codec over grayscale frames — the real twin of the
  * reference's image (de)serialization
  * (imaging_db/utils/image_utils.py:5-30: `im_bytes = cv2.imencode
  * (".png", im)` / `cv2.imdecode(..., cv2.IMREAD_ANYDEPTH)`), built on
  * javax.imageio so it needs no native dependency. Both reference
  * depths are supported: uint8 (TYPE_BYTE_GRAY) and the microscope's
  * native uint16 (TYPE_USHORT_GRAY — PNG carries 16-bit gray
  * losslessly, which is why the reference picked PNG over JPEG).
  *
  * Everything here is executor-side per-row work: no Spark imports, no
  * shared state, safe inside a UDF or a mapPartitions decode loop.
  */
object ImageCodec {

  /** Encode row-major uint8 grayscale pixels as PNG. */
  def encodeGray8(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h,
      s"pixel buffer ${pixels.length} != ${w}x$h")
    val im = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < pixels.length) {
      im.getRaster.setSample(i % w, i / w, 0, pixels(i) & 0xff)
      i += 1
    }
    toPng(im)
  }

  /** Encode row-major uint16 grayscale pixels (0..65535 ints) as PNG. */
  def encodeGray16(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h,
      s"pixel buffer ${pixels.length} != ${w}x$h")
    val im = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
    var i = 0
    while (i < pixels.length) {
      im.getRaster.setSample(i % w, i / w, 0, pixels(i) & 0xffff)
      i += 1
    }
    toPng(im)
  }

  /** Decode any grayscale PNG to (width, height, row-major pixels) —
    * depth-agnostic like the reference's IMREAD_ANYDEPTH: uint8 pixels
    * come back as 0..255, uint16 as 0..65535.
    */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val im = ImageIO.read(new ByteArrayInputStream(bytes))
    require(im != null, "payload is not a decodable image")
    val (w, h) = (im.getWidth, im.getHeight)
    val out = new Array[Int](w * h)
    var i = 0
    while (i < out.length) {
      out(i) = im.getRaster.getSample(i % w, i / w, 0)
      i += 1
    }
    (w, h, out)
  }

  /** Real image resize (nearest-neighbor, the cheap deterministic
    * resample a thumbnail pass wants): decode → sample → re-encode.
    * Grayscale-depth-preserving.
    */
  def resizeGray(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val src = ImageIO.read(new ByteArrayInputStream(bytes))
    require(src != null, "payload is not a decodable image")
    val w = math.max(1, src.getWidth / factor)
    val h = math.max(1, src.getHeight / factor)
    val dst = new BufferedImage(w, h, src.getType)
    var i = 0
    while (i < w * h) {
      val x = i % w
      val y = i / w
      dst.getRaster.setSample(x, y, 0,
        src.getRaster.getSample(x * factor, y * factor, 0))
      i += 1
    }
    toPng(dst)
  }

  private def toPng(im: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(im, "png", bos)
    bos.toByteArray
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
}
