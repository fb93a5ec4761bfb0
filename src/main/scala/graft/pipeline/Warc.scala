package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.Dataset

/**
 * WARC ingestion — the true front door of a crawl pipeline. Web archives
 * ship as WARC files (ISO 28500, the public Common Crawl container
 * format): a sequence of records, each a `WARC/1.0` header block framed
 * by `Content-Length`, usually compressed as one gzip member per record
 * so readers can split at member boundaries. This operator turns those
 * bytes into the `(uri, html)` rows that [[graft.expressions.HtmlToText]]
 * and the rest of the curation stack consume — closing the loop from
 * crawl bytes to clean text entirely in-engine.
 *
 * Parsing semantics (the subset of ISO 28500 the extraction path needs):
 *
 *  - a record is `WARC/<v>CRLF`, header lines `Name: value` (names
 *    case-insensitive), a blank line, then exactly `Content-Length`
 *    payload bytes, then record-separator CRLFs;
 *  - `response` records whose `Content-Type` is `application/http`
 *    carry an HTTP response: status line, headers, blank line, body —
 *    the body is the document, `Content-Type` of the HTTP block is its
 *    media type. `resource` records carry the document directly;
 *  - CORRUPT INPUT IS DATA, NOT A TASK FAILURE: a payload truncated by
 *    the end of input is emitted with `truncated = true` and clipped
 *    body; garbage where a record header should be (or an unparsable
 *    `Content-Length`, without which no further record can be framed)
 *    ends that FILE's parse, yielding the records read so far — at
 *    corpus scale a bad shard must never kill the job;
 *  - a `.warc.gz` (leading gzip magic) is inflated first;
 *    member-per-record layouts are standard gzip member concatenation,
 *    which the inflater walks end to end. A corrupt compressed tail
 *    keeps the members already inflated. Record offsets are therefore
 *    UNCOMPRESSED offsets.
 *
 * Scale shape: [[warcDocuments]] is a pure `flatMap` — no shuffle, no
 * state, parallelism = input file partitions, payloads never touch the
 * driver; the same contract as the [[Multimodal]] decoders. One WARC
 * file is one row, so `spark.sql.files.maxPartitionBytes` is the batch
 * knob; at Common Crawl's ~1 GiB-per-file convention a 100 TB crawl is
 * ~100k rows spread across however many executors the cluster has.
 * Parsing is a single linear pass per file; nothing here is quadratic
 * in records or bytes.
 */
object Warc {

  /** A WARC file at rest: opaque bytes + a routing id. */
  case class WarcFile(file_id: Long, payload: Array[Byte])

  /** One parsed WARC record (any type), HTTP sub-parse included when the
    * record carries `application/http`. `http_status` is 0 when there is
    * no (parsable) HTTP block. */
  case class WarcRecord(
      offset: Long,
      warc_type: String,
      target_uri: String,
      content_type: String,
      content_length: Long,
      truncated: Boolean,
      http_status: Long,
      http_content_type: String,
      body: Array[Byte])

  /** An extracted HTML document: `response` (via its HTTP block) or
    * `resource` record whose media type is `text/html`. */
  case class WarcDoc(
      file_id: Long,
      rec_offset: Long,
      target_uri: String,
      http_status: Long,
      truncated: Boolean,
      html: String)

  private val GzipMagic0: Byte = 0x1f.toByte
  private val GzipMagic1: Byte = 0x8b.toByte

  /** Inflate a (possibly multi-member) gzip stream; a corrupt tail keeps
    * whatever inflated cleanly. Non-gzip input passes through. */
  private[pipeline] def maybeGunzip(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || bytes(0) != GzipMagic0 || bytes(1) != GzipMagic1) return bytes
    // Clamp the pre-size: `length * 4` overflows Int past ~512 MiB and a
    // negative capacity would throw OUTSIDE the try below, killing the task on
    // a large shard. The stream grows as needed; inflated size is still bound
    // by the JVM's 2 GiB array ceiling (Common Crawl shards are ~1 GiB).
    val preSize = math.min(bytes.length.toLong * 4, 1L << 26).toInt
    val out = new ByteArrayOutputStream(preSize)
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
    } catch { case _: java.io.IOException => /* keep the clean prefix */ }
    out.toByteArray
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private val Crlf2 = "\r\n\r\n".getBytes(UTF_8)

  /** Parse `Name: value` header lines into lower-cased-name pairs. */
  private def parseHeaders(block: String): Map[String, String] =
    block.split("\r\n").iterator.flatMap { line =>
      val c = line.indexOf(':')
      if (c <= 0) None
      else Some(line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        -> line.substring(c + 1).trim)
    }.toMap

  /** Parse every record of one WARC file (gunzipping if needed). Linear,
    * allocation-bounded by the file itself; never throws on bad input. */
  def parseRecords(raw: Array[Byte]): Seq[WarcRecord] = {
    val bytes = maybeGunzip(raw)
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var halted = false
    while (!halted && pos < bytes.length) {
      // skip inter-record CRLFs
      while (pos < bytes.length && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= bytes.length) halted = true
      else if (!startsWithAscii(bytes, pos, "WARC/")) halted = true // framing lost
      else {
        val hdrEnd = indexOf(bytes, Crlf2, pos)
        if (hdrEnd < 0) halted = true
        else {
          val headers = parseHeaders(new String(bytes, pos, hdrEnd - pos, UTF_8))
          val lenOpt = headers.get("content-length").flatMap(v => v.toLongOption)
          lenOpt match {
            case None => halted = true // cannot frame the next record
            case Some(len) if len < 0 => halted = true
            case Some(len) =>
              val bodyStart = hdrEnd + 4
              val avail = bytes.length - bodyStart
              val truncated = avail < len
              val take = math.min(len, avail.toLong).toInt
              val payload = java.util.Arrays.copyOfRange(bytes, bodyStart, bodyStart + take)
              val warcType = headers.getOrElse("warc-type", "")
              val contentType = headers.getOrElse("content-type", "")
              val uri = headers.getOrElse("warc-target-uri", "")
              val rec =
                if (warcType == "response" && contentType.startsWith("application/http")) {
                  val (status, httpCt, body) = parseHttp(payload)
                  WarcRecord(pos.toLong, warcType, uri, contentType, len,
                    truncated, status, httpCt, body)
                } else {
                  WarcRecord(pos.toLong, warcType, uri, contentType, len,
                    truncated, 0L, "", payload)
                }
              out += rec
              pos = bodyStart + take
              if (truncated) halted = true
          }
        }
      }
    }
    out.result()
  }

  private def startsWithAscii(bytes: Array[Byte], pos: Int, s: String): Boolean = {
    if (pos + s.length > bytes.length) return false
    var i = 0
    while (i < s.length) {
      if (bytes(pos + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  /** Split an `application/http` payload into (status, content-type,
    * body). A payload with no HTTP shape yields (0, "", payload) — the
    * bytes are preserved, just unclassified. */
  private[pipeline] def parseHttp(payload: Array[Byte]): (Long, String, Array[Byte]) = {
    val hdrEnd = indexOf(payload, Crlf2, 0)
    if (hdrEnd < 0 || !startsWithAscii(payload, 0, "HTTP/"))
      return (0L, "", payload)
    val head = new String(payload, 0, hdrEnd, UTF_8)
    val lines = head.split("\r\n")
    val status = lines.head.split(" ", 3) match {
      case parts if parts.length >= 2 => parts(1).toLongOption.getOrElse(0L)
      case _ => 0L
    }
    val headers = parseHeaders(lines.drop(1).mkString("\r\n"))
    val body = java.util.Arrays.copyOfRange(payload, hdrEnd + 4, payload.length)
    (status, headers.getOrElse("content-type", ""), body)
  }

  /**
   * The extraction view: one row per HTML document — `response` records
   * whose HTTP block is `text/html`, plus `resource` records stored as
   * `text/html` directly. Pure flatMap over files; everything else
   * (requests, warcinfo, metadata, images) is dropped here and left to
   * [[parseRecords]] callers that want it.
   */
  def warcDocuments(files: Dataset[WarcFile]): Dataset[WarcDoc] = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      parseRecords(f.payload).iterator.flatMap { r =>
        if (r.warc_type == "response" && r.http_content_type.startsWith("text/html"))
          Some(WarcDoc(f.file_id, r.offset, r.target_uri, r.http_status,
            r.truncated, new String(r.body, UTF_8)))
        else if (r.warc_type == "resource" && r.content_type.startsWith("text/html"))
          Some(WarcDoc(f.file_id, r.offset, r.target_uri, 0L,
            r.truncated, new String(r.body, UTF_8)))
        else None
      }.toSeq
    }
  }

  // ------------------------------------------------------------------
  // Synthetic encoder — the test/fixture twin of parseRecords, the same
  // role syntheticPng/syntheticWav/syntheticAvi play for the media tiers.
  // ------------------------------------------------------------------

  /** One framed WARC record with the given headers and payload. */
  def record(warcType: String, uri: String, contentType: String,
      payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    if (uri.nonEmpty) sb.append("WARC-Target-URI: ").append(uri).append("\r\n")
    sb.append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
    sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(payload.length).append("\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out = new ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head)
    out.write(payload)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  /** An `application/http` response record wrapping an HTML body. */
  def responseRecord(uri: String, html: String, status: Int = 200): Array[Byte] = {
    val body = html.getBytes(UTF_8)
    val http = new ByteArrayOutputStream(body.length + 128)
    http.write((s"HTTP/1.1 $status OK\r\n" +
      "Content-Type: text/html; charset=UTF-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8))
    http.write(body)
    record("response", uri, "application/http; msgtype=response", http.toByteArray)
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(out)
    gz.write(bytes)
    gz.close()
    out.toByteArray
  }

  /**
   * A deterministic synthetic WARC file: a `warcinfo` record, then per
   * document a `request` record (extraction must skip it) and a proper
   * HTTP `response` record. With `gzipped = true`, each record is its own
   * gzip member — the standard `.warc.gz` layout.
   */
  def syntheticWarc(docs: Seq[(String, String)], gzipped: Boolean): Array[Byte] = {
    val info = record("warcinfo", "",
      "application/warc-fields",
      "software: graft-synthetic/1.0\r\n".getBytes(UTF_8))
    val recs = info +: docs.flatMap { case (uri, html) =>
      Seq(
        record("request", uri, "application/http; msgtype=request",
          s"GET $uri HTTP/1.1\r\nHost: x\r\n\r\n".getBytes(UTF_8)),
        responseRecord(uri, html))
    }
    val out = new ByteArrayOutputStream()
    recs.foreach(r => out.write(if (gzipped) gzipMember(r) else r))
    out.toByteArray
  }
}
