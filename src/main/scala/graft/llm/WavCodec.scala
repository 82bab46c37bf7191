package graft.llm

import java.nio.{ByteBuffer, ByteOrder}

/** A real audio codec with zero dependencies: RIFF/WAVE with 16-bit PCM.
  * Parse (fmt chunk walk), signal statistics (RMS as exact integer sums)
  * and decimation (keep every k-th frame, emitting a valid WAV at the
  * reduced rate) are genuine audio operations — the audio analog of
  * [[PpmCodec]]. Compressed formats stay behind the documented stubs.
  */
object WavCodec {

  /** Serialize 16-bit mono/stereo PCM samples as a RIFF/WAVE file. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(samples.length % channels == 0, "partial frame")
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a 16-bit PCM WAV: (sampleRate, channels, samples). Walks the
    * chunk list, so extra chunks (LIST/INFO/fact) before `data` are fine. */
  def decode(payload: Array[Byte]): (Int, Int, Array[Short]) = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII") }
    require(tag() == "RIFF", "not RIFF"); bb.getInt()
    require(tag() == "WAVE", "not WAVE")
    var rate = -1; var channels = -1
    var samples: Array[Short] = null
    while (samples == null && bb.remaining() >= 8) {
      val id = tag(); val len = bb.getInt()
      id match {
        case "fmt " =>
          val start = bb.position()
          val fmt = bb.getShort(); channels = bb.getShort().toInt
          rate = bb.getInt(); bb.getInt(); bb.getShort()
          val bits = bb.getShort()
          require(fmt == 1 && bits == 16, s"only 16-bit PCM supported (fmt=$fmt bits=$bits)")
          bb.position(start + len)
        case "data" =>
          require(rate > 0, "data chunk before fmt")
          samples = new Array[Short](len / 2)
          var j = 0
          while (j < samples.length) { samples(j) = bb.getShort(); j += 1 }
        case _ =>
          bb.position(bb.position() + len + (len & 1)) // chunks are word-aligned
      }
    }
    require(samples != null, "no data chunk")
    (rate, channels, samples)
  }

  /** Root-mean-square amplitude over all channels — integer sum of
    * squares, one division + sqrt at the edge. */
  def rms(payload: Array[Byte]): Double = {
    val (_, _, s) = decode(payload)
    if (s.isEmpty) 0.0
    else {
      var acc = 0L
      var j = 0
      while (j < s.length) { acc += s(j).toLong * s(j); j += 1 }
      math.sqrt(acc.toDouble / s.length)
    }
  }

  /** Keep every k-th frame (all channels of it); the result is a valid
    * WAV at sampleRate/k — real decimation (no filter, as documented). */
  def decimate(payload: Array[Byte], k: Int): Array[Byte] = {
    val (rate, ch, s) = decode(payload)
    val nFrames = s.length / ch
    val kept = (0 until nFrames by k).toArray
    val out = new Array[Short](kept.length * ch)
    var j = 0
    while (j < kept.length) {
      var c = 0
      while (c < ch) { out(j * ch + c) = s(kept(j) * ch + c); c += 1 }
      j += 1
    }
    encode(math.max(rate / k, 1), ch, out)
  }
}
