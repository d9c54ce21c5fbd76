package graft.sources

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

/** Deterministic WARC fixture generation for the source round-trip
  * query (q325) and `WarcSpec` — the archive-side analog of
  * [[SyntheticFixtures]]. Produces spec-correct WARC 1.0 bytes in all
  * three Common Crawl layouts: per-record gzip members (the real CC
  * shard shape), whole-file single-member gzip, and uncompressed.
  */
object WarcWriter {

  /** One record's bytes: version line, headers (Content-Length
    * computed), blank line, payload, record terminator.
    */
  def record(warcType: String, headers: Seq[(String, String)],
             payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    headers.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val out = new ByteArrayOutputStream()
    out.write(sb.toString.getBytes(UTF_8))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  /** An `application/http; msgtype=response` payload: status line +
    * headers + blank + body. With `chunked=true` the body is
    * chunk-framed (512-byte chunks) and `Transfer-Encoding: chunked`
    * replaces `Content-Length`.
    */
  def httpResponse(status: Int, reason: String, contentType: String,
                   body: Array[Byte], chunked: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val head = new StringBuilder(s"HTTP/1.1 $status $reason\r\n")
    head.append("Content-Type: ").append(contentType).append("\r\n")
    if (chunked) head.append("Transfer-Encoding: chunked\r\n")
    else head.append("Content-Length: ").append(body.length).append("\r\n")
    head.append("Server: graft-fixture\r\n\r\n")
    out.write(head.toString.getBytes(UTF_8))
    if (chunked) {
      var i = 0
      while (i < body.length) {
        val n = math.min(512, body.length - i)
        out.write((Integer.toHexString(n) + "\r\n").getBytes(UTF_8))
        out.write(body, i, n)
        out.write("\r\n".getBytes(UTF_8))
        i += n
      }
      out.write("0\r\n\r\n".getBytes(UTF_8))
    } else out.write(body)
    out.toByteArray
  }

  def httpRequest(path: String, host: String): Array[Byte] =
    (s"GET $path HTTP/1.1\r\nHost: $host\r\n" +
      "User-Agent: graft-fixture/1.0\r\n\r\n").getBytes(UTF_8)

  def warcinfo(date: String): Array[Byte] =
    record("warcinfo",
      Seq("WARC-Date" -> date,
        "Content-Type" -> "application/warc-fields"),
      "software: graft\r\nformat: WARC File Format 1.0\r\n".getBytes(UTF_8))

  /** `mode`: "plain" (no compression), "gzip" (one member for the
    * whole file), "members" (one gzip member per record — the Common
    * Crawl layout).
    */
  def write(f: File, records: Seq[Array[Byte]], mode: String): File = {
    val out = new FileOutputStream(f)
    try mode match {
      case "plain" => records.foreach(out.write)
      case "gzip" =>
        val gz = new GZIPOutputStream(out)
        records.foreach(gz.write)
        gz.finish()
      case "members" =>
        records.foreach { r =>
          val buf = new ByteArrayOutputStream()
          val gz = new GZIPOutputStream(buf)
          gz.write(r)
          gz.close()
          out.write(buf.toByteArray)
        }
      case other => throw new IllegalArgumentException(s"mode: $other")
    } finally out.close()
    f
  }
}
