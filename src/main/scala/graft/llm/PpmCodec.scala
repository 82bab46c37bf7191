package graft.llm

/** A real image codec with zero dependencies: binary PPM (P6), the
  * simplest widely-supported raster format (header `P6\n<w> <h>\n255\n`
  * followed by w·h RGB byte triples). This replaces the decode stub for
  * one concrete format — parse, pixel statistics and nearest-neighbor
  * resize are genuine image operations, not byte games — while heavier
  * formats (JPEG/audio/video) stay behind the documented stubs until a
  * native codec is available.
  */
object PpmCodec {

  /** Serialize RGB pixels as a P6 image. */
  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes, got ${rgb.length}")
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
  }

  /** Parse a P6 image: (width, height, rgb). Handles arbitrary whitespace
    * and `#` comments between header tokens, per the netpbm spec. */
  def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(payload.length >= 2 && payload(0) == 'P' && payload(1) == '6',
      "not a P6 ppm")
    var i = 2
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
    val rgb = java.util.Arrays.copyOfRange(payload, i, i + w * h * 3)
    (w, h, rgb)
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
