package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.pipeline.Warc
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val docs = Seq(
    "https://a.test/1" -> "<html><body><p>Hello &amp; welcome</p></body></html>",
    "https://a.test/2" -> "<html><body><h1>Zwei</h1><p>Umlauté bytes — ok</p></body></html>",
    "https://a.test/3" -> "<html><body>three</body></html>")

  test("plain WARC round trip: grammar, framing, HTTP sub-parse") {
    val recs = Warc.parseRecords(Warc.syntheticWarc(docs, gzipped = false))
    assert(recs.map(_.warc_type) ===
      Seq("warcinfo") ++ docs.flatMap(_ => Seq("request", "response")))
    val responses = recs.filter(_.warc_type == "response")
    assert(responses.map(_.target_uri) === docs.map(_._1))
    assert(responses.forall(_.http_status === 200L))
    assert(responses.forall(_.http_content_type.startsWith("text/html")))
    assert(responses.map(r => new String(r.body, UTF_8)) === docs.map(_._2))
    assert(recs.forall(!_.truncated))
    // offsets are strictly increasing and the first record starts at 0
    assert(recs.map(_.offset) === recs.map(_.offset).sorted)
    assert(recs.head.offset === 0L)
  }

  test("gzipped member-per-record file parses identically to the plain file") {
    val plain = Warc.parseRecords(Warc.syntheticWarc(docs, gzipped = false))
    val gz = Warc.parseRecords(Warc.syntheticWarc(docs, gzipped = true))
    assert(gz.map(r => (r.warc_type, r.target_uri, r.http_status,
      new String(r.body, UTF_8))) ===
      plain.map(r => (r.warc_type, r.target_uri, r.http_status,
        new String(r.body, UTF_8))))
  }

  test("multibyte bodies frame by BYTE length, not char count") {
    val multibyte = Seq("https://b.test/u" -> "café ☃ 😀 end")
    val recs = Warc.parseRecords(Warc.syntheticWarc(multibyte, gzipped = false))
    val resp = recs.find(_.warc_type == "response").get
    assert(new String(resp.body, UTF_8) === multibyte.head._2)
    assert(!resp.truncated)
  }

  test("corrupt input is data: garbage, truncation, bad Content-Length") {
    // garbage bytes: no records, no throw
    assert(Warc.parseRecords("not a warc at all".getBytes(UTF_8)) === Seq.empty)
    assert(Warc.parseRecords(Array.empty[Byte]) === Seq.empty)
    // truncated final record: clipped body, flag set, parse ends there
    val whole = Warc.syntheticWarc(docs, gzipped = false)
    val cut = java.util.Arrays.copyOfRange(whole, 0, whole.length - 12)
    val recs = Warc.parseRecords(cut)
    assert(recs.nonEmpty)
    assert(recs.last.truncated, "clipped final payload must carry the flag")
    assert(recs.init.forall(!_.truncated))
    // framing junk mid-file: records BEFORE the junk survive
    val junk = whole ++ "XXXX not a record header".getBytes(UTF_8)
    assert(Warc.parseRecords(junk).size === Warc.parseRecords(whole).size)
    // unparsable Content-Length halts the file without throwing
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Type: application/http\r\nContent-Length: NaN\r\n\r\nbody").getBytes(UTF_8)
    assert(Warc.parseRecords(bad) === Seq.empty)
    // corrupt gzip tail keeps the cleanly inflated prefix
    val gz = Warc.syntheticWarc(docs, gzipped = true)
    val gzCut = java.util.Arrays.copyOfRange(gz, 0, gz.length - 8)
    val prefix = Warc.parseRecords(gzCut)
    assert(prefix.nonEmpty && prefix.size <= Warc.parseRecords(gz).size)
  }

  test("warcDocuments keeps text/html responses and resources, skips the rest") {
    import spark.implicits._
    val resource = Warc.record("resource", "https://a.test/res",
      "text/html; charset=UTF-8", "<p>stored directly</p>".getBytes(UTF_8))
    val png = Warc.record("resource", "https://a.test/img",
      "image/png", Array[Byte](1, 2, 3))
    val f0 = Warc.WarcFile(0L, Warc.syntheticWarc(docs, gzipped = false))
    val f1 = Warc.WarcFile(1L, Warc.syntheticWarc(docs.take(1), gzipped = true))
    val f2 = Warc.WarcFile(2L, resource ++ png)
    val out = Warc.warcDocuments(Seq(f0, f1, f2).toDS()).collect()
      .sortBy(d => (d.file_id, d.rec_offset))
    assert(out.count(_.file_id == 0L) === docs.size)
    assert(out.count(_.file_id == 1L) === 1)
    val res = out.filter(_.file_id == 2L)
    assert(res.map(_.target_uri).toSeq === Seq("https://a.test/res"))
    assert(res.head.html === "<p>stored directly</p>")
    assert(res.head.http_status === 0L)
    assert(out.filter(_.file_id == 0L).map(_.html).toSeq === docs.map(_._2))
  }

  test("composes with html_to_text: crawl bytes to clean text") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val files = Seq(Warc.WarcFile(7L, Warc.syntheticWarc(docs, gzipped = true))).toDS()
    val text = Warc.warcDocuments(files)
      .select($"target_uri",
        graft.pipeline.TextAnalysis.htmlToText($"html").as("text"))
      .orderBy($"target_uri").as[(String, String)].collect()
    assert(text(0)._2 === "Hello & welcome")
    assert(text(1)._2 === "Zwei\nUmlauté bytes — ok")
    assert(text(2)._2 === "three")
  }
}
