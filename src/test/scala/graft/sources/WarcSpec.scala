package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.WarcSource.WarcRecord

/** Pins [[WarcSource]]'s record framing, the three compression
  * layouts, HTTP payload interpretation (status, charset, chunked
  * transfer decoding), and every tolerance rule — each a hand-built
  * byte sequence, not a round-trip of the writer alone.
  */
class WarcSpec extends SparkSpec {

  private def tmp(name: String): File = {
    val d = new File(System.getProperty("java.io.tmpdir"), "graft_warc_spec")
    d.mkdirs()
    new File(d, name)
  }

  private val ConvHeaders = Seq(
    "WARC-Target-URI" -> "https://a.example.org/docs/1",
    "WARC-Date" -> "2026-01-02T00:00:00Z",
    "Content-Type" -> "text/plain")

  test("conversion record: framing, headers, UTF-8 body") {
    val bytes = WarcWriter.record("conversion", ConvHeaders,
      "héllo wörld — 中文".getBytes(UTF_8))
    val rs = WarcSource.parseAll(bytes)
    assert(rs.size === 1)
    val r = rs.head
    assert(r.warc_type === "conversion")
    assert(r.target_uri === "https://a.example.org/docs/1")
    assert(r.warc_date === "2026-01-02T00:00:00Z")
    assert(r.http_status === None)
    assert(r.charset === "utf-8")
    assert(r.body === "héllo wörld — 中文")
  }

  test("http response: status line, header map, content-length body") {
    val bytes = WarcWriter.record("response",
      ConvHeaders.init :+ ("Content-Type" ->
        "application/http; msgtype=response"),
      WarcWriter.httpResponse(404, "Not Found",
        "text/html; charset=utf-8", "<p>gone</p>".getBytes(UTF_8)))
    val r = WarcSource.parseAll(bytes).head
    assert(r.http_status === Some(404))
    assert(r.http_content_type === "text/html; charset=utf-8")
    assert(r.body === "<p>gone</p>")
  }

  test("chunked transfer encoding is undone; quoted UTF-16BE charset honored") {
    val text = "chunk boundary test " * 60 + "中文 tail" // > one 512B chunk
    val bytes = WarcWriter.record("response",
      Seq("Content-Type" -> "application/http; msgtype=response"),
      WarcWriter.httpResponse(200, "OK", "text/plain; charset=\"UTF-16BE\"",
        text.getBytes("UTF-16BE"), chunked = true))
    val r = WarcSource.parseAll(bytes).head
    assert(r.charset === "utf-16be")
    assert(r.body === text)
  }

  test("chunk extensions are stripped; malformed size ends decode fail-soft") {
    val good = "5;ext=1\r\nhello\r\n0\r\n\r\n".getBytes(UTF_8)
    assert(new String(WarcSource.dechunk(good), UTF_8) === "hello")
    val bad = "5\r\nhello\r\nZZ\r\nmore\r\n".getBytes(UTF_8)
    assert(new String(WarcSource.dechunk(bad), UTF_8) === "hello")
  }

  test("unknown charset falls back to utf-8 instead of throwing") {
    val bytes = WarcWriter.record("response",
      Seq("Content-Type" -> "application/http; msgtype=response"),
      WarcWriter.httpResponse(200, "OK", "text/plain; charset=bogus-9",
        "plain".getBytes(UTF_8)))
    val r = WarcSource.parseAll(bytes).head
    assert(r.charset === "utf-8")
    assert(r.body === "plain")
  }

  test("multi-member gzip (the Common Crawl layout) and plain both parse") {
    val recs = (1 to 3).map(i => WarcWriter.record("conversion", ConvHeaders,
      s"doc $i".getBytes(UTF_8)))
    val members = tmp("mm.warc.gz")
    WarcWriter.write(members, recs, "members")
    val plain = tmp("plain.warc")
    WarcWriter.write(plain, recs, "plain")
    for (f <- Seq(members, plain)) {
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      assert(WarcSource.parseAll(bytes).map(_.body) ===
        Vector("doc 1", "doc 2", "doc 3"))
    }
  }

  test("truncated final payload yields the bytes present (fail-soft)") {
    val full = WarcWriter.record("conversion", ConvHeaders,
      "abcdefghij".getBytes(UTF_8))
    val cut = java.util.Arrays.copyOf(full, full.length - 9) // mid-payload
    val rs = WarcSource.parseAll(cut)
    assert(rs.size === 1)
    assert(rs.head.body === "abcde")
  }

  test("missing Content-Length ends the scan fail-soft; earlier records kept") {
    val ok = WarcWriter.record("conversion", ConvHeaders, "one".getBytes(UTF_8))
    val broken = ("WARC/1.0\r\nWARC-Type: conversion\r\n\r\n" +
      "unframeable tail").getBytes(UTF_8)
    val rs = WarcSource.parseAll(ok ++ broken)
    assert(rs.map(_.body) === Vector("one"))
  }

  test("headers: colon-less lines skipped, first occurrence wins, " +
    "case-insensitive names") {
    val payload = "x".getBytes(UTF_8)
    val manual = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "garbage line without colon\r\n" +
      "warc-target-uri: https://first.example/\r\n" +
      "WARC-Target-URI: https://second.example/\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8) ++
      payload ++ "\r\n\r\n".getBytes(UTF_8)
    val r = WarcSource.parseAll(manual).head
    assert(r.target_uri === "https://first.example/")
  }

  test("spark read face: glob over mixed layouts, one row per record") {
    val recs = (1 to 4).map(i => WarcWriter.record("conversion",
      Seq("WARC-Target-URI" -> s"https://g.example/$i",
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "Content-Type" -> "text/plain"),
      s"body $i".getBytes(UTF_8)))
    val d = new File(System.getProperty("java.io.tmpdir"), "graft_warc_glob")
    d.mkdirs()
    WarcWriter.write(new File(d, "s_a.warc.gz"), recs.take(2), "members")
    WarcWriter.write(new File(d, "s_b.warc"), recs.drop(2), "plain")
    val df = WarcSource.read(spark, new File(d, "s_*").getPath)
    val rows = df.select(col("target_uri"), col("body"))
      .orderBy(col("target_uri")).collect()
    assert(rows.map(_.getString(1)).toSeq ===
      Seq("body 1", "body 2", "body 3", "body 4"))
  }
}
