package graft.llm

/** Dependency-free IMA ADPCM codec (the DVI/IMA 4-bit standard used by
  * WAV format tag 0x11 and countless telephony payloads) — REAL
  * compressed AUDIO next to the uncompressed PCM path in [[WavCodec]]:
  * each 16-bit sample becomes one 4-bit delta code against an adaptive
  * step-size predictor (public step/index tables), a fixed 4:1 ratio.
  * All-integer arithmetic, fully deterministic: the encoder mirrors the
  * decoder's reconstruction exactly, so decode∘encode is a pure function
  * of the input (lossy but reproducible bit-for-bit).
  *
  * Container: a minimal mono block — magic `IMA1`, sample count (u32 LE),
  * initial predictor (s16 LE), initial step index (u8), pad byte, then
  * packed nibbles (low nibble first, IMA convention). The first sample
  * ships verbatim in the header (standard IMA block layout); codes cover
  * the rest. Malformed streams fail loudly.
  */
object AdpcmCodec {

  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clampSample(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v
  private def clampIndex(v: Int): Int =
    if (v < 0) 0 else if (v > 88) 88 else v

  /** One code step shared verbatim by encode and decode: reconstruct the
    * predictor/index transition for a 4-bit code. Returns the new
    * (predictor, index). */
  private def reconstruct(code: Int, predictor: Int, index: Int): (Int, Int) = {
    val step = StepTable(index)
    var vpdiff = step >> 3
    if ((code & 4) != 0) vpdiff += step
    if ((code & 2) != 0) vpdiff += step >> 1
    if ((code & 1) != 0) vpdiff += step >> 2
    val p =
      if ((code & 8) != 0) clampSample(predictor - vpdiff)
      else clampSample(predictor + vpdiff)
    (p, clampIndex(index + IndexTable(code & 7)))
  }

  def encode(samples: Array[Short]): Array[Byte] = {
    val n = samples.length
    val nCodes = math.max(0, n - 1)
    val out = new Array[Byte](12 + (nCodes + 1) / 2)
    out(0) = 'I'; out(1) = 'M'; out(2) = 'A'; out(3) = '1'
    out(4) = (n & 0xFF).toByte; out(5) = ((n >>> 8) & 0xFF).toByte
    out(6) = ((n >>> 16) & 0xFF).toByte; out(7) = ((n >>> 24) & 0xFF).toByte
    var predictor = if (n > 0) samples(0).toInt else 0
    var index = 0
    out(8) = (predictor & 0xFF).toByte; out(9) = ((predictor >>> 8) & 0xFF).toByte
    out(10) = index.toByte; out(11) = 0
    var i = 1
    while (i < n) {
      val step = StepTable(index)
      var diff = samples(i) - predictor
      var code = 0
      if (diff < 0) { code = 8; diff = -diff }
      if (diff >= step) { code |= 4; diff -= step }
      if (diff >= (step >> 1)) { code |= 2; diff -= step >> 1 }
      if (diff >= (step >> 2)) code |= 1
      // track the DECODER's state, not the ideal signal — the predictor
      // must drift identically on both sides or the codes diverge
      val (p2, i2) = reconstruct(code, predictor, index)
      predictor = p2; index = i2
      val at = 12 + (i - 1) / 2
      if ((i - 1) % 2 == 0) out(at) = (code & 0x0F).toByte
      else out(at) = (out(at) | (code << 4)).toByte
      i += 1
    }
    out
  }

  def decode(bytes: Array[Byte]): Array[Short] = {
    require(bytes.length >= 12, s"truncated ADPCM block (${bytes.length} bytes)")
    require(bytes(0) == 'I' && bytes(1) == 'M' && bytes(2) == 'A' && bytes(3) == '1',
      "missing IMA1 magic")
    val n = (bytes(4) & 0xFF) | ((bytes(5) & 0xFF) << 8) |
      ((bytes(6) & 0xFF) << 16) | ((bytes(7) & 0xFF) << 24)
    require(n >= 0, s"negative sample count $n")
    val nCodes = math.max(0, n - 1)
    require(bytes.length >= 12 + (nCodes + 1) / 2,
      s"ADPCM block holds ${bytes.length - 12} code bytes, need ${(nCodes + 1) / 2}")
    val out = new Array[Short](n)
    if (n == 0) return out
    var predictor = ((bytes(8) & 0xFF) | ((bytes(9) & 0xFF) << 8)).toShort.toInt
    var index = clampIndex(bytes(10) & 0xFF)
    out(0) = predictor.toShort
    var i = 1
    while (i < n) {
      val b = bytes(12 + (i - 1) / 2) & 0xFF
      val code = if ((i - 1) % 2 == 0) b & 0x0F else (b >>> 4) & 0x0F
      val (p2, i2) = reconstruct(code, predictor, index)
      predictor = p2; index = i2
      out(i) = predictor.toShort
      i += 1
    }
    out
  }

  /** Exact integer sum of squares — the RMS numerator both sides of the
    * quality contract share. */
  def sumSquares(samples: Array[Short]): Long = {
    var s = 0L; var i = 0
    while (i < samples.length) { s += samples(i).toLong * samples(i); i += 1 }
    s
  }
}
