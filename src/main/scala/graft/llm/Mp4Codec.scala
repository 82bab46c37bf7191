package graft.llm

import java.nio.{ByteBuffer, ByteOrder}

/** A real ISO-BMFF (MP4/MOV family) container codec with zero
  * dependencies: big-endian size+type box framing, nested container
  * boxes, full-box version/flags headers — the video-container analog
  * of [[WarcCodec]] (archive) and [[GifCodec]] (compressed image).
  * Encode builds a structurally valid `ftyp / moov(mvhd, trak(tkhd,
  * mdia(mdhd))…) / mdat` file; decode walks the box TREE generically
  * (any box layout, unknown boxes skipped by their declared size) and
  * parses the movie header. Sample-table demux and codec payloads
  * (avc1/mp4a) stay behind the engine's documented decode stubs — the
  * container walk is the Spark-side plumbing a 100-TB video corpus
  * needs first: locating tracks, durations and the media payload
  * without touching a codec library.
  */
object Mp4Codec {

  /** Container boxes whose payload is a sequence of child boxes. */
  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl", "edts")

  private def box(tag: String, payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(8 + payload.length).put(tag.getBytes("US-ASCII")).put(payload)
    bb.array()
  }

  private def fullBox(tag: String, body: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + body.length).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0) // version 0, flags 0
    bb.put(body)
    box(tag, bb.array())
  }

  /** Serialize a minimal, structurally valid ISO-BMFF file: `ftyp`,
    * `moov` with an mvhd (given timescale/duration) and `nTracks`
    * skeleton tracks, and the media payload in `mdat`. */
  def encode(timescale: Int, duration: Long, nTracks: Int,
      mdat: Array[Byte]): Array[Byte] = {
    require(nTracks >= 1, "an ISO-BMFF movie needs at least one track")
    require(duration >= 0 && duration <= 0xFFFFFFFFL,
      s"version-0 boxes carry 32-bit durations (got $duration)")
    val ftyp = box("ftyp", {
      val bb = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
      bb.put("isom".getBytes("US-ASCII")).putInt(0)
        .put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII"))
      bb.array()
    })
    val mvhd = fullBox("mvhd", {
      val bb = ByteBuffer.allocate(96).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(0).putInt(0)                       // creation, modification
      bb.putInt(timescale).putInt(duration.toInt)  // timescale, duration
      bb.putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
      bb.put(new Array[Byte](10))                  // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(bb.putInt)                        // unity matrix
      bb.put(new Array[Byte](24))                  // pre_defined
      bb.putInt(nTracks + 1)                       // next_track_ID
      bb.array()
    })
    val traks = (1 to nTracks).map { tid =>
      val tkhd = fullBox("tkhd", {
        val bb = ByteBuffer.allocate(80).order(ByteOrder.BIG_ENDIAN)
        bb.putInt(0).putInt(0)      // creation, modification
        bb.putInt(tid).putInt(0)    // track_ID, reserved
        bb.putInt(duration.toInt)
        bb.put(new Array[Byte](60)) // reserved/layer/matrix/width/height
        bb.array()
      })
      val mdhd = fullBox("mdhd", {
        val bb = ByteBuffer.allocate(20).order(ByteOrder.BIG_ENDIAN)
        bb.putInt(0).putInt(0)                      // creation, modification
        bb.putInt(timescale).putInt(duration.toInt) // timescale, duration
        bb.putShort(0x55C4.toShort).putShort(0)     // language "und"
        bb.array()
      })
      box("trak", tkhd ++ box("mdia", mdhd))
    }
    val moov = box("moov", mvhd ++ traks.flatten)
    ftyp ++ moov ++ box("mdat", mdat)
  }

  /** Walk the box tree: every box as (path, offset, totalSize,
    * headerLen), in file order, parents before children. Unknown boxes
    * are skipped by their declared size — the walk never needs to
    * understand a payload to traverse past it. The two ISO-BMFF special
    * sizes are honored: size==1 reads the 8-byte largesize that follows
    * the tag (16-byte header — required for >4 GiB mdat), size==0
    * extends the box to the end of its enclosing scope (legal only for
    * a final box, which the extends-to-end semantics enforce by
    * construction). A declared size that overruns its parent fails
    * loudly (truncated or corrupt file), as does any other size < 8. */
  def walk(payload: Array[Byte]): Seq[(String, Long, Long, Int)] = {
    val out = Seq.newBuilder[(String, Long, Long, Int)]
    def go(from: Int, until: Int, path: String): Unit = {
      var p = from
      while (p < until) {
        require(until - p >= 8, s"truncated box header at $p")
        val bb = ByteBuffer.wrap(payload, p, 8).order(ByteOrder.BIG_ENDIAN)
        val size32 = bb.getInt()
        val tag = {
          val b = new Array[Byte](4)
          System.arraycopy(payload, p + 4, b, 0, 4)
          new String(b, "US-ASCII")
        }
        val (size, hdr) = size32 match {
          case 0 => ((until - p).toLong, 8)
          case 1 =>
            require(until - p >= 16, s"truncated largesize header at $p")
            val ls = ByteBuffer.wrap(payload, p + 8, 8)
              .order(ByteOrder.BIG_ENDIAN).getLong()
            require(ls >= 16, s"bad largesize $ls at $p")
            (ls, 16)
          case s =>
            require(s >= 8, s"bad box size $s at $p")
            (s.toLong, 8)
        }
        require(p + size <= until, s"box $tag overruns its parent at $p")
        val full = if (path.isEmpty) tag else s"$path/$tag"
        out += ((full, p.toLong, size, hdr))
        if (Containers(tag)) go(p + hdr, (p + size).toInt, full)
        p += size.toInt
      }
    }
    go(0, payload.length, "")
    out.result()
  }

  /** Movie-header fields: (timescale, duration). */
  def mvhd(payload: Array[Byte]): (Int, Long) =
    mvhdFrom(payload, walk(payload))

  /** [[mvhd]] over an already-computed box list (one walk per file on
    * the hot demux path, not one per field). The declared box size must
    * cover the fields read — a corrupt short mvhd refuses loudly
    * instead of reading the next sibling's bytes as header fields. */
  def mvhdFrom(payload: Array[Byte],
      boxes: Seq[(String, Long, Long, Int)]): (Int, Long) = {
    val (at, size, hdr) = boxes.collectFirst {
      case ("moov/mvhd", off, sz, h) => (off, sz, h) }
      .getOrElse(throw new IllegalArgumentException("no moov/mvhd box"))
    require(size >= hdr + 4 + 16,
      s"mvhd box too short for its version-0 fields (size $size)")
    val bb = ByteBuffer.wrap(payload, at.toInt + hdr, 20).order(ByteOrder.BIG_ENDIAN)
    val versionFlags = bb.getInt()
    require((versionFlags >>> 24) == 0, "only mvhd version 0 supported")
    bb.getInt(); bb.getInt() // creation, modification
    // duration is a 32-bit UNSIGNED field in version 0 — mask, don't
    // sign-extend
    (bb.getInt(), bb.getInt().toLong & 0xFFFFFFFFL)
  }

  /** The `mdat` media payload (first mdat box). */
  def mdat(payload: Array[Byte]): Array[Byte] = {
    val (off, len) = mdatRange(walk(payload))
    java.util.Arrays.copyOfRange(payload, off.toInt, (off + len).toInt)
  }

  /** PAYLOAD offset + length of the first `mdat` (header excluded —
    * callers hash/slice the media range in place without caring whether
    * the box used an 8- or 16-byte header). */
  def mdatRange(boxes: Seq[(String, Long, Long, Int)]): (Long, Long) =
    boxes.collectFirst { case ("mdat", o, s, h) => (o + h, s - h) }
      .getOrElse(throw new IllegalArgumentException("no mdat box"))
}
