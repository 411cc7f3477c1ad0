package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** From-scratch baseline-TIFF codec — the real twin of the byte-level
  * reads every reference splitter performs through `tifffile.TiffFile`
  * (imaging_db/images/tif_id_splitter.py:111 `frames.pages[i]
  * .asarray()`, ometif_splitter.py:68, tiffolder_splitter.py): a
  * multi-page IFD walk exposing exactly the tags the splitters consume
  * (ImageWidth/ImageLength, BitsPerSample, SamplesPerPixel,
  * ImageDescription) plus the decoded pixels per page.
  *
  * Scope is the TIFF subset microscopes actually emit and the
  * splitters actually read: gray (PhotometricInterpretation 0/1) and
  * RGB, 8- and 16-bit, both byte orders, strip AND tile layouts
  * (TIFF6 §15 — real OME-TIFF instrument exports are frequently
  * tiled), chunky and planar sample order (PlanarConfiguration 1/2),
  * Compression 1 (none) and 5 (LZW, with the spec's early-change code
  * widths and horizontal-differencing Predictor 2, whose runs restart
  * at every segment row because segments decompress independently).
  * (r8) Plus the two instrument-export shapes that used to fail
  * loudly: 32-bit IEEE-float gray (SampleFormat 3 — the
  * ometif_splitter.py:68 quantitative-phase export) decoded as raw
  * float bits with a typed [[TiffPage.floats]] view, and 8-bit
  * palette-color (PhotometricInterpretation 3 + ColorMap) expanded
  * through its 16-bit colormap to an RGB page. Signed-int samples
  * and the floating-point predictor (3) stay out of scope and fail
  * loudly.
  *
  * Like [[ImageCodec]], everything is executor-side per-row work — no
  * Spark imports, safe inside mapPartitions. The writer exists for
  * ingest specs and tooling (planted multi-page stacks); the JDK's
  * javax.imageio TIFF plugin cross-validates both directions in
  * StreamingSpec.
  */
object TiffCodec {

  /** One decoded TIFF page: `samples` is row-major,
    * channel-interleaved (length = width × height × samplesPerPixel),
    * one Int per sample. `sampleFormat` follows tag 339: 1 = unsigned
    * int (the samples ARE the pixel values), 3 = IEEE float (each Int
    * holds the raw float bits — read through [[floats]]).
    */
  final case class TiffPage(width: Int, height: Int, bitsPerSample: Int,
    samplesPerPixel: Int, imageDescription: Option[String],
    samples: Array[Int], sampleFormat: Int = 1) {
    /** Typed view of a float page's samples. */
    def floats: Array[Float] = {
      require(sampleFormat == 3, s"not a float page (format $sampleFormat)")
      samples.map(java.lang.Float.intBitsToFloat)
    }
  }

  /** Decode every page of a TIFF byte array, in IFD-chain order. */
  def readPages(bytes: Array[Byte]): Vector[TiffPage] = {
    require(bytes.length >= 8, "not a TIFF (truncated header)")
    val little = ((bytes(0) & 0xff), (bytes(1) & 0xff)) match {
      case (0x49, 0x49) => true // "II"
      case (0x4d, 0x4d) => false // "MM"
      case _ => throw new IllegalArgumentException(
        "not a TIFF (bad byte-order mark)")
    }
    def u16(off: Int): Int =
      if (little) (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      else ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    def u32(off: Int): Long =
      if (little)
        (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
          ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
      else
        ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
          ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    require(u16(2) == 42, "not a TIFF (bad magic)")

    // one IFD entry's value list (BYTE/SHORT/LONG widths; inline when
    // the payload fits the 4-byte value slot, external otherwise)
    def values(entryOff: Int): Array[Long] = {
      val typ = u16(entryOff + 2)
      val count = u32(entryOff + 4)
      require(count >= 0 && count <= Int.MaxValue, s"bad tag count $count")
      val size = typ match {
        case 1 | 2 | 6 | 7 => 1
        case 3 | 8 => 2
        case 4 | 9 => 4
        case other => throw new IllegalArgumentException(
          s"unsupported TIFF tag type $other")
      }
      val total = size * count
      val base =
        if (total <= 4) entryOff + 8 else u32(entryOff + 8).toInt
      require(base >= 0 && base + total <= bytes.length,
        "TIFF tag values out of bounds")
      Array.tabulate(count.toInt) { i =>
        size match {
          case 1 => (bytes(base + i) & 0xff).toLong
          case 2 => u16(base + 2 * i).toLong
          case 4 => u32(base + 4 * i)
        }
      }
    }
    def ascii(entryOff: Int): String = {
      val count = u32(entryOff + 4).toInt
      val base = if (count <= 4) entryOff + 8 else u32(entryOff + 8).toInt
      require(base >= 0 && base + count <= bytes.length,
        "TIFF tag values out of bounds")
      // NUL-terminated per spec
      val end = math.max(base, base + count - 1)
      new String(bytes, base, end - base, "US-ASCII")
    }

    val pages = Vector.newBuilder[TiffPage]
    var ifd = u32(4).toInt
    var nPages = 0
    while (ifd != 0) {
      require(nPages < (1 << 16), "runaway TIFF IFD chain")
      require(ifd >= 0 && ifd + 2 <= bytes.length, "IFD out of bounds")
      val n = u16(ifd)
      require(ifd + 2 + 12 * n + 4 <= bytes.length, "IFD out of bounds")
      var width = 0L; var height = 0L
      var bps = Array(1L); var spp = 1L
      var compression = 1L; var predictor = 1L
      var planar = 1L
      var photometric = 1L
      var sampleFmt = Array(1L)
      var colorMap = Array.empty[Long]
      var rowsPerStrip = 0xffffffffL
      var stripOffsets = Array.empty[Long]
      var stripCounts = Array.empty[Long]
      var tileW = 0L; var tileL = 0L
      var tileOffsets = Array.empty[Long]
      var tileCounts = Array.empty[Long]
      var description: Option[String] = None
      var e = 0
      while (e < n) {
        val off = ifd + 2 + 12 * e
        u16(off) match {
          case 256 => width = values(off)(0)
          case 257 => height = values(off)(0)
          case 258 => bps = values(off)
          case 259 => compression = values(off)(0)
          case 262 => photometric = values(off)(0)
          case 270 => description = Some(ascii(off))
          case 273 => stripOffsets = values(off)
          case 277 => spp = values(off)(0)
          case 278 => rowsPerStrip = values(off)(0)
          case 279 => stripCounts = values(off)
          case 284 => planar = values(off)(0)
          case 317 => predictor = values(off)(0)
          case 320 => colorMap = values(off)
          case 339 => sampleFmt = values(off)
          case 322 => tileW = values(off)(0)
          case 323 => tileL = values(off)(0)
          case 324 => tileOffsets = values(off)
          case 325 => tileCounts = values(off)
          case _ => // tag the splitters don't read — skip
        }
        e += 1
      }
      require(width > 0 && height > 0, "TIFF page missing dimensions")
      require(bps.forall(_ == bps(0)),
        "mixed per-channel bit depths unsupported")
      require(sampleFmt.forall(_ == sampleFmt(0)),
        "mixed per-channel sample formats unsupported")
      val sfmt = sampleFmt(0).toInt
      require(sfmt == 1 || sfmt == 3,
        s"unsupported SampleFormat $sfmt (unsigned int + IEEE float only)")
      val bits = bps(0).toInt
      val channels = spp.toInt
      if (sfmt == 3) {
        require(bits == 32, s"float TIFF must be 32-bit, got $bits")
        require(channels == 1, "float TIFF supported as single-channel")
        require(predictor == 1,
          s"unsupported predictor $predictor for float samples " +
            "(fp predictor 3 out of scope)")
      } else
        require(bits == 8 || bits == 16, s"unsupported bit depth $bits")
      require(channels == 1 || channels == 3,
        s"unsupported SamplesPerPixel $channels")
      require(compression == 1 || compression == 5,
        s"unsupported compression $compression (baseline + LZW only)")
      require(predictor == 1 || predictor == 2,
        s"unsupported predictor $predictor")
      require(planar == 1 || planar == 2,
        s"unsupported PlanarConfiguration $planar")
      val isPalette = photometric == 3
      if (isPalette) {
        require(colorMap.nonEmpty, "palette TIFF missing ColorMap")
        require(channels == 1 && bits == 8 && sfmt == 1,
          "palette TIFF supported as 8-bit single-channel indices")
        require(colorMap.length == 3 * 256,
          s"ColorMap length ${colorMap.length} != 768")
      }

      val w = width.toInt; val h = height.toInt
      val tiled = tileOffsets.nonEmpty
      val bytesPerSample = bits / 8
      // separate planes: one sample stream per channel (planar config 2
      // is chunky when there is only one channel anyway)
      val planes = if (planar == 2) channels else 1
      val chSeg = if (planar == 2) 1 else channels

      // decompress one segment (strip or tile) to exactly `expected`
      // raw bytes
      def segBytes(idx: Int, offs: Array[Long], cnts: Array[Long],
          expected: Int): Array[Byte] = {
        val so = offs(idx).toInt; val sc = cnts(idx).toInt
        require(so >= 0 && sc >= 0 && so + sc <= bytes.length,
          "TIFF segment out of bounds")
        if (compression == 1) {
          require(sc == expected,
            s"uncompressed segment size $sc != $expected")
          java.util.Arrays.copyOfRange(bytes, so, so + sc)
        } else lzwDecode(bytes, so, sc, expected)
      }
      // raw segment bytes → samples (endianness follows the file's),
      // horizontal differencing undone per SEGMENT row — segments
      // decompress independently and every row restarts the predictor
      // run (TIFF6 §14), so a tile row of tw samples is its own run
      def segSamples(raw: Array[Byte], rowSamples: Int): Array[Int] = {
        val nS = raw.length / bytesPerSample
        val s = new Array[Int](nS)
        if (bits == 8) {
          var i = 0
          while (i < nS) { s(i) = raw(i) & 0xff; i += 1 }
        } else if (bits == 16) {
          var i = 0
          while (i < nS) {
            s(i) =
              if (little) (raw(2 * i) & 0xff) | ((raw(2 * i + 1) & 0xff) << 8)
              else ((raw(2 * i) & 0xff) << 8) | (raw(2 * i + 1) & 0xff)
            i += 1
          }
        } else { // 32-bit float: the raw IEEE bits, endianness applied
          var i = 0
          while (i < nS) {
            s(i) =
              if (little)
                (raw(4 * i) & 0xff) | ((raw(4 * i + 1) & 0xff) << 8) |
                  ((raw(4 * i + 2) & 0xff) << 16) |
                  ((raw(4 * i + 3) & 0xff) << 24)
              else
                ((raw(4 * i) & 0xff) << 24) | ((raw(4 * i + 1) & 0xff) << 16) |
                  ((raw(4 * i + 2) & 0xff) << 8) | (raw(4 * i + 3) & 0xff)
            i += 1
          }
        }
        if (predictor == 2) {
          val mask = if (bits == 8) 0xff else 0xffff
          var rowBase = 0
          while (rowBase < nS) {
            var i = chSeg
            while (i < rowSamples) {
              s(rowBase + i) = (s(rowBase + i) + s(rowBase + i - chSeg)) & mask
              i += 1
            }
            rowBase += rowSamples
          }
        }
        s
      }

      val out = new Array[Int](w * h * channels)
      if (!tiled) {
        require(stripOffsets.nonEmpty &&
          stripCounts.length == stripOffsets.length,
          "TIFF page missing strip layout")
        val rps = math.min(rowsPerStrip, height).toInt
        require(rps > 0, s"bad RowsPerStrip $rps")
        val stripsPerPlane = (h + rps - 1) / rps
        require(stripOffsets.length == stripsPerPlane * planes,
          s"strip count ${stripOffsets.length} != " +
            s"$stripsPerPlane strips x $planes planes")
        var p = 0
        while (p < planes) {
          var s = 0
          while (s < stripsPerPlane) {
            val row0 = s * rps
            val rowsHere = math.min(rps, h - row0)
            val rowSamples = w * chSeg
            val seg = segSamples(
              segBytes(p * stripsPerPlane + s, stripOffsets, stripCounts,
                rowsHere * rowSamples * bytesPerSample), rowSamples)
            if (planes == 1)
              System.arraycopy(seg, 0, out, row0 * rowSamples, seg.length)
            else {
              var i = 0
              while (i < seg.length) {
                out((row0 * w + i) * channels + p) = seg(i)
                i += 1
              }
            }
            s += 1
          }
          p += 1
        }
      } else {
        val tw = tileW.toInt; val tl = tileL.toInt
        require(tw > 0 && tl > 0, s"bad tile size ${tw}x$tl")
        require(tileCounts.length == tileOffsets.length,
          "TIFF page missing tile layout")
        val across = (w + tw - 1) / tw
        val down = (h + tl - 1) / tl
        require(tileOffsets.length == across * down * planes,
          s"tile count ${tileOffsets.length} != " +
            s"$across x $down x $planes planes")
        val rowSamples = tw * chSeg
        var p = 0
        while (p < planes) {
          var ty = 0
          while (ty < down) {
            var tx = 0
            while (tx < across) {
              val seg = segSamples(
                segBytes((p * down + ty) * across + tx, tileOffsets,
                  tileCounts, tl * rowSamples * bytesPerSample), rowSamples)
              // copy the unpadded region (edge tiles carry full tw x tl
              // data; the right/bottom padding is discarded)
              val cols = math.min(tw, w - tx * tw)
              val rows = math.min(tl, h - ty * tl)
              var yy = 0
              while (yy < rows) {
                val y = ty * tl + yy
                if (planes == 1)
                  System.arraycopy(seg, yy * rowSamples,
                    out, (y * w + tx * tw) * channels, cols * channels)
                else {
                  var xx = 0
                  while (xx < cols) {
                    out((y * w + tx * tw + xx) * channels + p) =
                      seg(yy * tw + xx)
                    xx += 1
                  }
                }
                yy += 1
              }
              tx += 1
            }
            ty += 1
          }
          p += 1
        }
      }
      pages += (if (isPalette) {
        // expand indices through the 16-bit colormap (TIFF6: all
        // reds, then greens, then blues) to a chunky RGB page — what
        // tifffile hands a consumer after palette application
        val rgb = new Array[Int](w * h * 3)
        var i = 0
        while (i < w * h) {
          val idx = out(i)
          rgb(3 * i) = colorMap(idx).toInt
          rgb(3 * i + 1) = colorMap(256 + idx).toInt
          rgb(3 * i + 2) = colorMap(512 + idx).toInt
          i += 1
        }
        TiffPage(w, h, 16, 3, description, rgb)
      } else TiffPage(w, h, bits, channels, description, out, sfmt))
      ifd = u32(ifd + 2 + 12 * n).toInt
      nPages += 1
    }
    val result = pages.result()
    require(result.nonEmpty, "TIFF has no pages")
    result
  }

  /** Encode pages as a little-endian multi-page TIFF. Default layout
    * is one strip per page; `tileSize` switches to the tiled layout
    * (TIFF6 §15, dims must be multiples of 16) and `planar` to
    * PlanarConfiguration 2 (one segment stream per channel). `lzw`
    * selects Compression 5 with the given predictor (1 = none, 2 =
    * horizontal differencing); description lands in the FIRST page's
    * ImageDescription — where tif_id_splitter._get_params_from_str
    * reads it.
    */
  def write(pages: Seq[TiffPage], lzw: Boolean = false,
      predictor: Int = 1, description: Option[String] = None,
      tileSize: Option[(Int, Int)] = None,
      planar: Boolean = false,
      colorMap: Option[Array[Int]] = None): Array[Byte] = {
    require(pages.nonEmpty, "no pages to write")
    require(predictor == 1 || predictor == 2, s"bad predictor $predictor")
    require(lzw || predictor == 1, "predictor needs LZW here")
    for (cm <- colorMap) {
      require(cm.length == 3 * 256, s"ColorMap length ${cm.length} != 768")
      require(pages.forall(p =>
        p.samplesPerPixel == 1 && p.bitsPerSample == 8),
        "palette pages must be 8-bit single-channel indices")
    }
    for ((tw, tl) <- tileSize)
      require(tw > 0 && tl > 0 && tw % 16 == 0 && tl % 16 == 0,
        s"tile dims must be positive multiples of 16, got ${tw}x$tl")
    val buf = new ArrayBuffer[Byte](1 << 16)
    def put8(v: Int): Unit = buf += v.toByte
    def put16(v: Int): Unit = { put8(v & 0xff); put8((v >>> 8) & 0xff) }
    def put32(v: Long): Unit = {
      put8((v & 0xff).toInt); put8(((v >>> 8) & 0xff).toInt)
      put8(((v >>> 16) & 0xff).toInt); put8(((v >>> 24) & 0xff).toInt)
    }
    def patch32(pos: Int, v: Long): Unit = {
      buf(pos) = (v & 0xff).toByte; buf(pos + 1) = ((v >>> 8) & 0xff).toByte
      buf(pos + 2) = ((v >>> 16) & 0xff).toByte
      buf(pos + 3) = ((v >>> 24) & 0xff).toByte
    }
    put8(0x49); put8(0x49); put16(42); put32(0) // header, IFD0 patched
    var prevNextPtr = 4
    for ((p, pageIdx) <- pages.zipWithIndex) {
      val w = p.width; val h = p.height
      val ch = p.samplesPerPixel; val bits = p.bitsPerSample
      require(p.samples.length == w * h * ch, "bad sample buffer")
      require(p.sampleFormat == 1 || p.sampleFormat == 3,
        s"bad sample format ${p.sampleFormat}")
      if (p.sampleFormat == 3) {
        require(bits == 32 && ch == 1,
          "float pages must be 32-bit single-channel")
        require(predictor == 1, "predictor 2 unsupported for float pages")
      } else
        require(bits == 8 || bits == 16, s"bad bit depth $bits")
      require(ch == 1 || ch == 3, s"bad channels $ch")
      val planes = if (planar && ch > 1) ch else 1
      val chSeg = if (planes > 1) 1 else ch

      // per-segment sample arrays in reader order (plane-major, then
      // row-major tiles); edge tiles zero-padded to full tw x tl
      val segSamples: IndexedSeq[Array[Int]] = tileSize match {
        case Some((tw, tl)) =>
          val across = (w + tw - 1) / tw
          val down = (h + tl - 1) / tl
          for (pl <- 0 until planes; ty <- 0 until down; tx <- 0 until across)
            yield {
              val seg = new Array[Int](tw * tl * chSeg)
              val cols = math.min(tw, w - tx * tw)
              val rows = math.min(tl, h - ty * tl)
              var yy = 0
              while (yy < rows) {
                val y = ty * tl + yy
                if (planes == 1)
                  System.arraycopy(p.samples, (y * w + tx * tw) * ch,
                    seg, yy * tw * ch, cols * ch)
                else {
                  var xx = 0
                  while (xx < cols) {
                    seg(yy * tw + xx) =
                      p.samples((y * w + tx * tw + xx) * ch + pl)
                    xx += 1
                  }
                }
                yy += 1
              }
              seg
            }
        case None =>
          if (planes == 1) IndexedSeq(p.samples)
          else (0 until planes).map { pl =>
            val seg = new Array[Int](w * h)
            var i = 0
            while (i < seg.length) { seg(i) = p.samples(i * ch + pl); i += 1 }
            seg
          }
      }
      val rowSamplesSeg = tileSize match {
        case Some((tw, _)) => tw * chSeg
        case None => w * chSeg
      }

      // samples -> (optionally differenced per segment row) ->
      // little-endian bytes -> (optionally LZW); every segment row is
      // its own predictor run, matching the reader and TIFF6 (segments
      // decompress independently)
      def encodeSeg(samples: Array[Int]): Array[Byte] = {
        val src =
          if (predictor == 2) {
            val mask = if (bits == 8) 0xff else 0xffff
            val d = samples.clone()
            var rowBase = 0
            while (rowBase < d.length) {
              var i = rowSamplesSeg - 1
              while (i >= chSeg) {
                d(rowBase + i) =
                  (samples(rowBase + i) - samples(rowBase + i - chSeg)) & mask
                i -= 1
              }
              rowBase += rowSamplesSeg
            }
            d
          } else samples
        val rawBytes = new Array[Byte](src.length * (bits / 8))
        var i = 0
        if (bits == 8)
          while (i < src.length) { rawBytes(i) = src(i).toByte; i += 1 }
        else if (bits == 16) while (i < src.length) {
          rawBytes(2 * i) = (src(i) & 0xff).toByte
          rawBytes(2 * i + 1) = ((src(i) >>> 8) & 0xff).toByte
          i += 1
        }
        else while (i < src.length) { // 32-bit float bits, LE
          rawBytes(4 * i) = (src(i) & 0xff).toByte
          rawBytes(4 * i + 1) = ((src(i) >>> 8) & 0xff).toByte
          rawBytes(4 * i + 2) = ((src(i) >>> 16) & 0xff).toByte
          rawBytes(4 * i + 3) = ((src(i) >>> 24) & 0xff).toByte
          i += 1
        }
        if (lzw) lzwEncode(rawBytes) else rawBytes
      }
      val segOffsets = new Array[Long](segSamples.length)
      val segCounts = new Array[Long](segSamples.length)
      for ((seg, si) <- segSamples.zipWithIndex) {
        val enc = encodeSeg(seg)
        segOffsets(si) = buf.length
        segCounts(si) = enc.length
        buf ++= enc
        if (buf.length % 2 == 1) put8(0) // word-align
      }
      // external value areas
      val desc = if (pageIdx == 0) description else None
      val descBytes = desc.map(s => (s + " ").getBytes("US-ASCII"))
      var descOff = 0
      for (db <- descBytes if db.length > 4) {
        descOff = buf.length; buf ++= db
        if (buf.length % 2 == 1) put8(0)
      }
      var bpsOff = 0
      if (ch == 3) { // count 3 SHORTs = 6 bytes, can't inline
        bpsOff = buf.length
        (0 until 3).foreach(_ => put16(bits))
      }
      var cmOff = 0
      for (cm <- colorMap) { // 768 SHORTs, external
        cmOff = buf.length
        cm.foreach(put16)
      }
      // segment offset/count arrays when they can't inline (LONG x n)
      var segOffsOff = 0; var segCntsOff = 0
      if (segSamples.length > 1) {
        segOffsOff = buf.length; segOffsets.foreach(put32)
        segCntsOff = buf.length; segCounts.foreach(put32)
      }
      val ifdOff = buf.length
      patch32(prevNextPtr, ifdOff)
      case class Entry(tag: Int, typ: Int, count: Int, value: Long,
        inlineBytes: Option[Array[Byte]] = None)
      val entries = ArrayBuffer(
        Entry(256, 4, 1, w), Entry(257, 4, 1, h),
        if (ch == 3) Entry(258, 3, 3, bpsOff)
        else Entry(258, 3, 1, bits),
        Entry(259, 3, 1, if (lzw) 5 else 1),
        Entry(262, 3, 1, // photometric: palette|RGB|gray
          if (colorMap.isDefined) 3 else if (ch == 3) 2 else 1))
      for (db <- descBytes)
        entries += (if (db.length > 4) Entry(270, 2, db.length, descOff)
          else Entry(270, 2, db.length, 0, Some(db)))
      entries += Entry(277, 3, 1, ch)
      if (planes > 1) entries += Entry(284, 3, 1, 2)
      def segEntries(offTag: Int, cntTag: Int): Unit =
        if (segSamples.length == 1) {
          entries += Entry(offTag, 4, 1, segOffsets(0))
          entries += Entry(cntTag, 4, 1, segCounts(0))
        } else {
          entries += Entry(offTag, 4, segSamples.length, segOffsOff)
          entries += Entry(cntTag, 4, segSamples.length, segCntsOff)
        }
      tileSize match {
        case Some((tw, tl)) =>
          entries += Entry(322, 3, 1, tw)
          entries += Entry(323, 3, 1, tl)
          segEntries(324, 325)
        case None =>
          entries += Entry(278, 4, 1, h) // one strip (per plane)
          segEntries(273, 279)
      }
      if (lzw && predictor == 2) entries += Entry(317, 3, 1, 2)
      for (cm <- colorMap) entries += Entry(320, 3, cm.length, cmOff)
      if (p.sampleFormat != 1)
        entries += Entry(339, 3, 1, p.sampleFormat)
      val sorted = entries.sortBy(_.tag)
      put16(sorted.length)
      for (en <- sorted) {
        put16(en.tag); put16(en.typ); put32(en.count)
        en.inlineBytes match {
          case Some(db) =>
            var j = 0
            while (j < 4) { put8(if (j < db.length) db(j) & 0xff else 0); j += 1 }
          case None =>
            if (en.typ == 3 && en.count == 1) { put16(en.value.toInt); put16(0) }
            else put32(en.value)
        }
      }
      prevNextPtr = buf.length
      put32(0) // next-IFD, patched by the following page
    }
    buf.toArray
  }

  // ---- TIFF-variant LZW (TIFF6 §13: MSB-first codes, Clear=256,
  // EOI=257, EARLY code-width change at 511/1023/2047) ---------------

  private def lzwDecode(in: Array[Byte], start: Int, len: Int,
      expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var outPos = 0
    // chain-coded dictionary: entry = (prefix entry, appended byte)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val length = new Array[Int](4096)
    var j = 0
    while (j < 256) { prefix(j) = -1; suffix(j) = j.toByte; length(j) = 1; j += 1 }
    var next = 258
    var width = 9
    var bitPos = start.toLong * 8
    val bitEnd = (start + len).toLong * 8
    def readCode(): Int = {
      if (bitPos + width > bitEnd) return 257 // truncated → treat as EOI
      var v = 0
      var k = 0
      while (k < width) {
        val byte = in((bitPos >>> 3).toInt) & 0xff
        val bit = (byte >>> (7 - (bitPos & 7)).toInt) & 1
        v = (v << 1) | bit
        bitPos += 1
        k += 1
      }
      v
    }
    def emit(code: Int): Unit = {
      val l = length(code)
      require(outPos + l <= expected,
        "LZW output exceeds expected strip size")
      var pos = outPos + l - 1
      var c = code
      while (c >= 0) { out(pos) = suffix(c); pos -= 1; c = prefix(c) }
      outPos += l
    }
    var prev = -1
    var done = false
    while (!done && outPos < expected) {
      val code = readCode()
      if (code == 257) done = true
      else if (code == 256) { next = 258; width = 9; prev = -1 }
      else if (prev < 0) {
        require(code < 256, s"LZW: non-literal first code $code")
        emit(code)
        prev = code
      } else {
        require(code <= next, s"LZW code $code beyond table $next")
        // new entry: prev-string + first byte of current string; in
        // the KwKwK case (code == next) the current string IS the new
        // entry, whose first byte equals prev-string's first byte.
        // A full table (slots 258..4094 used; the early-change quirk
        // makes 4095 unusable) just stops inserting until a Clear,
        // like every conforming encoder — width is already capped at
        // 12, so the two sides cannot desynchronize meanwhile
        if (next < 4095) {
          var c = if (code == next) prev else code
          while (prefix(c) >= 0) c = prefix(c)
          prefix(next) = prev; suffix(next) = suffix(c)
          length(next) = length(prev) + 1
          next += 1
        }
        emit(code)
        // early-change width growth at table sizes 511/1023/2047 —
        // the decoder's table trails the encoder's by exactly one
        // entry, so these fire one code after the encoder's
        // entry-code-511/1023/2047 bumps and both sides read/write
        // code k at the same width (pairing verified against the
        // JDK's TIFFLZWDecompressor/LZWCompressor tiffFudge logic)
        if (next == 511 && width == 9) width = 10
        else if (next == 1023 && width == 10) width = 11
        else if (next == 2047 && width == 11) width = 12
        prev = code
      }
    }
    require(outPos == expected,
      s"LZW strip decoded $outPos of $expected bytes")
    out
  }

  private def lzwEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    var acc = 0L
    var accBits = 0
    var width = 9
    def putCode(code: Int): Unit = {
      acc = (acc << width) | code
      accBits += width
      while (accBits >= 8) {
        out.write(((acc >>> (accBits - 8)) & 0xff).toInt)
        accBits -= 8
      }
    }
    // dictionary: (prefix code, byte) → code
    val dict = new java.util.HashMap[Long, Integer](4096)
    var next = 258
    def key(p: Int, b: Byte) = (p.toLong << 8) | (b & 0xffL)
    putCode(256) // leading Clear, per spec
    var prev = -1
    var i = 0
    while (i < raw.length) {
      val b = raw(i)
      if (prev < 0) prev = b & 0xff
      else {
        val k = key(prev, b)
        val hit = dict.get(k)
        if (hit != null) prev = hit.intValue()
        else {
          putCode(prev)
          dict.put(k, Integer.valueOf(next))
          next += 1
          // width grows when the just-added ENTRY's code hits
          // 511/1023/2047 (TIFF's early change, as the JDK's
          // tiffFudge limit implements it) — one insert later than
          // the post-increment counter reaching those values
          if (next == 512 && width == 9) width = 10
          else if (next == 1024 && width == 10) width = 11
          else if (next == 2048 && width == 11) width = 12
          else if (next == 4096) { // added entry 4095: table full
            putCode(256)
            dict.clear(); next = 258; width = 9
          }
          prev = b & 0xff
        }
      }
      i += 1
    }
    if (prev >= 0) putCode(prev)
    putCode(257) // EOI
    if (accBits > 0) out.write(((acc << (8 - accBits)) & 0xff).toInt)
    out.toByteArray
  }
}
