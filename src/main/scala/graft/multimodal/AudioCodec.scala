package graft.multimodal

/** From-scratch WAV (RIFF) codec for mono 16-bit PCM — the audio twin
  * of [[ImageCodec]]: the multimodal plumbing carries REAL bytes of
  * the interchange format a recording pipeline ships (44-byte RIFF
  * header + little-endian PCM frames), not a simulation. PCM is
  * lossless, so decoded samples equal the planted pre-encode values —
  * the same property that lets the imaging decode stay oracle-checked.
  *
  * Scope: mono, 16-bit, uncompressed PCM (format tag 1). Anything
  * else — compressed formats, multi-channel, other depths — fails
  * loudly, the [[TiffCodec]] discipline: silent misreads of audio
  * payloads must never reach a statistic.
  */
object AudioCodec {

  private def le16(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  /** Encode mono PCM16 samples as a WAV byte payload. */
  def encodePcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate: $sampleRate")
    val dataLen = samples.length * 2
    val bos = new java.io.ByteArrayOutputStream(44 + dataLen)
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(le32(36 + dataLen))
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII"))
    bos.write(le32(16))          // PCM fmt chunk size
    bos.write(le16(1))           // format tag: PCM
    bos.write(le16(1))           // channels: mono
    bos.write(le32(sampleRate))
    bos.write(le32(sampleRate * 2)) // byte rate
    bos.write(le16(2))           // block align
    bos.write(le16(16))          // bits per sample
    bos.write("data".getBytes("US-ASCII"))
    bos.write(le32(dataLen))
    val data = new Array[Byte](dataLen)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = samples(i).toByte
      data(2 * i + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    bos.write(data)
    bos.toByteArray
  }

  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Decode a mono PCM16 WAV payload to (sampleRate, samples). Walks
    * the chunk list (an encoder may insert LIST/fact chunks before
    * data), validates the fmt contract, fails loudly otherwise.
    */
  def decodePcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      "payload is not a decodable WAV (bad RIFF header)")
    var off = 12
    var rate = -1
    var data: Array[Short] = null
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val len = rd32(bytes, off + 4)
      // Long arithmetic: a forged ~2 GB chunk length must not wrap the
      // bound check negative and sail past the corrupt-payload guard
      require(len >= 0 && off + 8L + len <= bytes.length,
        s"corrupt WAV chunk '$id' (declared $len bytes past the payload)")
      id match {
        case "fmt " =>
          require(len >= 16, "truncated fmt chunk")
          require(rd16(bytes, off + 8) == 1,
            s"unsupported WAV format tag ${rd16(bytes, off + 8)} " +
              "(only uncompressed PCM)")
          require(rd16(bytes, off + 10) == 1,
            s"unsupported channel count ${rd16(bytes, off + 10)} (mono only)")
          require(rd16(bytes, off + 22) == 16,
            s"unsupported bit depth ${rd16(bytes, off + 22)} (16-bit only)")
          rate = rd32(bytes, off + 12)
          // validate here so a corrupt fmt rate gets its own message
          // instead of failing later as a bogus "data before fmt"
          require(rate > 0, s"invalid WAV sample rate $rate")
        case "data" =>
          require(rate > 0, "WAV data chunk before fmt")
          require(len % 2 == 0, "odd PCM16 data length")
          val out = new Array[Short](len / 2)
          var i = 0
          while (i < out.length) {
            out(i) = rd16(bytes, off + 8 + 2 * i).toShort
            i += 1
          }
          data = out
        case _ => // skip LIST/fact/etc.
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(data != null, "WAV has no data chunk")
    (rate, data)
  }
}
