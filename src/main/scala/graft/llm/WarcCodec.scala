package graft.llm

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Dependency-free WARC (Web ARChive, ISO 28500) codec — the container
  * format web-scale LLM corpora actually ship in (Common Crawl's
  * WARC/WET shards). A WARC shard is a sequence of records:
  *
  * {{{
  *   WARC/1.0\r\n
  *   WARC-Type: <type>\r\n
  *   WARC-Target-URI: <uri>\r\n
  *   Content-Length: <n>\r\n
  *   \r\n
  *   <n payload bytes>\r\n\r\n
  * }}}
  *
  * Crawl archives gzip EACH RECORD as its own gzip member and concatenate
  * the members (so a reader can seek to a record without inflating the
  * whole shard). `java.util.zip.GZIPInputStream` reads concatenated
  * members transparently, and the record framing needs no member
  * boundaries — so decode is: sniff the gzip magic, inflate the whole
  * shard, walk the framing by Content-Length. Header parsing is
  * ASCII-line-based; payloads are opaque bytes. Malformed framing fails
  * loudly rather than resynchronizing silently.
  */
object WarcCodec {

  final case class WarcRecord(warcType: String, targetUri: String,
      payload: Array[Byte])

  private val Crlf = "\r\n".getBytes(StandardCharsets.US_ASCII)

  /** Serialize records into one shard; `gzipPerRecord` writes the Common
    * Crawl layout (one gzip member per record, members concatenated). */
  def encode(records: Seq[WarcRecord], gzipPerRecord: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val head = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append("WARC-Type: ").append(r.warcType).append("\r\n")
        .append("WARC-Target-URI: ").append(r.targetUri).append("\r\n")
        .append("Content-Length: ").append(r.payload.length).append("\r\n")
        .append("\r\n")
        .toString.getBytes(StandardCharsets.US_ASCII)
      val body = new ByteArrayOutputStream(head.length + r.payload.length + 4)
      body.write(head)
      body.write(r.payload)
      body.write(Crlf); body.write(Crlf)
      if (gzipPerRecord) {
        val gz = new GZIPOutputStream(out)
        gz.write(body.toByteArray)
        // close() completes the member AND releases the Deflater; the
        // underlying ByteArrayOutputStream's close is a no-op, so the
        // next record's member appends to the same buffer
        gz.close()
      } else out.write(body.toByteArray)
    }
    out.toByteArray
  }

  /** Parse a shard (gzipped-members or plain) back into its records. */
  def decode(shard: Array[Byte]): Seq[WarcRecord] = {
    val bytes =
      if (shard.length >= 2 && (shard(0) & 0xFF) == 0x1f && (shard(1) & 0xFF) == 0x8b) {
        val in = new GZIPInputStream(new ByteArrayInputStream(shard))
        val buf = new ByteArrayOutputStream(shard.length * 4)
        val tmp = new Array[Byte](8192)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toByteArray
      } else shard
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    def readLine(): String = {
      val start = pos
      while (pos + 1 < bytes.length && !(bytes(pos) == '\r' && bytes(pos + 1) == '\n'))
        pos += 1
      require(pos + 1 < bytes.length, s"unterminated WARC header line at byte $start")
      val line = new String(bytes, start, pos - start, StandardCharsets.US_ASCII)
      pos += 2
      line
    }
    while (pos < bytes.length) {
      val version = readLine()
      require(version.startsWith("WARC/"), s"expected WARC version line, got '$version'")
      var warcType = ""; var uri = ""; var len = -1L
      var line = readLine()
      while (line.nonEmpty) {
        val i = line.indexOf(':')
        require(i > 0, s"malformed WARC header '$line'")
        val (k, v) = (line.substring(0, i).trim, line.substring(i + 1).trim)
        k.toLowerCase match {
          case "warc-type" => warcType = v
          case "warc-target-uri" => uri = v
          case "content-length" => len = v.toLong
          case _ => () // tolerate extra headers (real shards carry many)
        }
        line = readLine()
      }
      require(len >= 0, "WARC record without Content-Length")
      require(len <= Int.MaxValue - 8, s"WARC payload too large to buffer: $len")
      require(pos + len + 4 <= bytes.length,
        s"truncated WARC payload: need ${len + 4} bytes at $pos of ${bytes.length}")
      val payload = java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt)
      pos += len.toInt
      require(bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
        bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n',
        s"missing record terminator at byte $pos")
      pos += 4
      out += WarcRecord(warcType, uri, payload)
    }
    out.result()
  }
}
