package graft.llm

/** Dependency-free GIF87a codec — a REAL compressed container with REAL
  * entropy coding (variable-width LZW), closing the "compressed media"
  * gap the uncompressed PPM/WAV codecs leave: the decode path must
  * genuinely inflate LZW sub-blocks to recover pixels, so a graded
  * round trip proves working compression, not header arithmetic.
  *
  * Scope (the deterministic-corpus subset, like PpmCodec): single frame,
  * non-interlaced, 8-bit grayscale global palette (index i → i,i,i), no
  * extensions. Encoder emits standard variable-width LZW with Clear-code
  * resets at dictionary overflow; the decoder handles any conformant
  * stream of this profile, including the deferred-clear case.
  */
object GifCodec {

  private val ClearCode = 256
  private val EndCode = 257

  /** Encode `w`×`h` 8-bit pixel indices as a GIF87a byte stream. */
  def encode(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(w >= 1 && h >= 1 && px.length == w * h,
      s"bad geometry: $w x $h with ${px.length} pixels")
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF87a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xF7) // global palette, 8 bits/px, 256 entries
    out.write(0)    // background
    out.write(0)    // aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2C) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(0)    // no local palette, not interlaced
    out.write(8)    // LZW minimum code size
    out.write(lzwCompress(px))
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Decode a single-frame GIF of the supported profile →
    * (w, h, pixel indices). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val frames = decodeFrames(bytes)
    require(frames.nonEmpty, "GIF stream contains no image block")
    frames.head
  }

  /** ANIMATED container: multiple image blocks in one stream (each frame
    * LZW-compressed independently — the GIF flavor of a video file). The
    * shared header/palette are written once; frames stack as consecutive
    * image descriptors. */
  def encodeFrames(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xF7); out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    frames.foreach { px =>
      require(px.length == w * h, s"frame size ${px.length} != $w x $h")
      out.write(0x2C)
      le16(0); le16(0); le16(w); le16(h)
      out.write(0)
      out.write(8)
      out.write(lzwCompress(px))
      out.write(0)
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** Walk the container and inflate EVERY image block → (w, h, pixels)
    * per frame. Extension blocks (0x21) are skipped per spec, so streams
    * from encoders that emit graphic-control extensions also demux. */
  def decodeFrames(bytes: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
    require(bytes.length > 13 &&
      new String(bytes, 0, 6, "US-ASCII").startsWith("GIF"), "not a GIF stream")
    // truncation fails loudly (same contract as the WARC/QOI codecs):
    // every positional read goes through at(), so a stream cut mid-block
    // throws IllegalArgumentException with the offset, never AIOOBE
    def at(o: Int): Int = {
      if (o >= bytes.length)
        throw new IllegalArgumentException(
          s"truncated GIF stream: need byte at $o, have ${bytes.length}")
      bytes(o) & 0xFF
    }
    def le16(o: Int): Int = at(o) | (at(o + 1) << 8)
    val flags = bytes(10) & 0xFF
    var pos = 13
    if ((flags & 0x80) != 0) pos += 3 * (2 << (flags & 7)) // skip global palette
    val frames = Seq.newBuilder[(Int, Int, Array[Byte])]
    def skipSubBlocks(): Unit = {
      var len = at(pos)
      while (len != 0) { pos += 1 + len; len = at(pos) }
      pos += 1
    }
    var done = false
    while (!done && pos < bytes.length) {
      at(pos) match {
        case 0x3B => done = true
        case 0x21 => // extension: label byte then sub-blocks
          pos += 2
          skipSubBlocks()
        case 0x2C =>
          val w = le16(pos + 5); val h = le16(pos + 7)
          val localFlags = at(pos + 9)
          pos += 10
          if ((localFlags & 0x80) != 0) pos += 3 * (2 << (localFlags & 7))
          val minCode = at(pos)
          require(minCode == 8, s"unsupported LZW minimum code size $minCode")
          pos += 1
          val data = new java.io.ByteArrayOutputStream()
          var len = at(pos)
          while (len != 0) {
            if (pos + 1 + len > bytes.length)
              throw new IllegalArgumentException(
                s"truncated GIF sub-block at $pos: need ${len} bytes, have ${bytes.length - pos - 1}")
            data.write(bytes, pos + 1, len)
            pos += 1 + len
            len = at(pos)
          }
          pos += 1
          frames += ((w, h, lzwDecompress(data.toByteArray, w * h)))
        case other =>
          throw new IllegalArgumentException(f"unexpected GIF block 0x$other%02X at $pos")
      }
    }
    frames.result()
  }

  /** Exact integer pixel sum (the content proof the oracles recompute). */
  def pixelSum(px: Array[Byte]): Long = {
    var s = 0L; var i = 0
    while (i < px.length) { s += px(i) & 0xFF; i += 1 }
    s
  }

  /** Variable-width LZW (GIF flavor): 9-bit codes after the initial
    * Clear, growing to 12, Clear-reset at dictionary overflow; output
    * packed little-endian and framed into ≤255-byte sub-blocks. */
  private def lzwCompress(px: Array[Byte]): Array[Byte] = {
    val packed = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var codeWidth = 9
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeWidth
      while (bitCnt >= 8) {
        packed.write((bitBuf & 0xFF).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    // dictionary: (prefix code, appended byte) → code
    var dict = new java.util.HashMap[Long, Integer]()
    var nextCode = EndCode + 1
    def key(prefix: Int, b: Int): Long = (prefix.toLong << 8) | b
    emit(ClearCode)
    var prefix = -1
    var i = 0
    while (i < px.length) {
      val b = px(i) & 0xFF
      if (prefix < 0) prefix = b
      else {
        val k = key(prefix, b)
        val hit = dict.get(k)
        if (hit != null) prefix = hit.intValue()
        else {
          emit(prefix)
          dict.put(k, Integer.valueOf(nextCode))
          nextCode += 1
          // GIF width grows when nextCode EXCEEDS the current width's range
          if (nextCode > (1 << codeWidth) && codeWidth < 12) codeWidth += 1
          else if (nextCode == 4096) {
            emit(ClearCode)
            dict = new java.util.HashMap[Long, Integer]()
            nextCode = EndCode + 1
            codeWidth = 9
          }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix >= 0) emit(prefix)
    emit(EndCode)
    if (bitCnt > 0) packed.write((bitBuf & 0xFF).toInt)
    // frame into sub-blocks
    val raw = packed.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < raw.length) {
      val n = math.min(255, raw.length - off)
      out.write(n)
      out.write(raw, off, n)
      off += n
    }
    out.toByteArray
  }

  private def lzwDecompress(data: Array[Byte], expected: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(expected)
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    var codeWidth = 9
    // dictionary as (prefix code, byte); roots are implicit
    val prefixOf = new Array[Int](4096)
    val byteOf = new Array[Byte](4096)
    var nextCode = EndCode + 1
    def reset(): Unit = { nextCode = EndCode + 1; codeWidth = 9 }
    def readCode(): Int = {
      while (bitCnt < codeWidth && pos < data.length) {
        bitBuf |= (data(pos) & 0xFFL) << bitCnt; bitCnt += 8; pos += 1
      }
      if (bitCnt < codeWidth) return EndCode
      val c = (bitBuf & ((1L << codeWidth) - 1)).toInt
      bitBuf >>>= codeWidth; bitCnt -= codeWidth
      c
    }
    def expand(code0: Int): Array[Byte] = {
      var code = code0
      val sb = new scala.collection.mutable.ArrayBuffer[Byte](16)
      while (code >= EndCode + 1) { sb += byteOf(code); code = prefixOf(code) }
      sb += code.toByte
      sb.reverseIterator.toArray
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = readCode()
      if (code == EndCode) done = true
      else if (code == ClearCode) { reset(); prev = -1 }
      else {
        val seq: Array[Byte] =
          if (code < nextCode) expand(code)
          else { // the KwKwK case: code not yet in the dictionary
            require(prev >= 0 && code == nextCode, s"corrupt LZW code $code")
            val p = expand(prev)
            p :+ p(0)
          }
        out.write(seq, 0, seq.length)
        if (prev >= 0 && nextCode < 4096) {
          prefixOf(nextCode) = prev
          byteOf(nextCode) = seq(0)
          nextCode += 1
          // the decoder's dictionary LAGS the encoder's by one in-flight
          // entry, so it widens at >= where the encoder widens at > —
          // the classic LZW off-by-one
          if (nextCode >= (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        prev = code
      }
    }
    out.toByteArray
  }
}
