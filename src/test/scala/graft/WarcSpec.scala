package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** ISO-28500 WARC/WET container splitting: byte-exact framing,
  * multi-record iteration, gzip members, torn tails.
  */
class WarcSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def rec(rtype: String, url: String, body: Array[Byte],
                  extra: String = ""): Array[Byte] = {
    val head = s"WARC/1.0\r\nWARC-Type: $rtype\r\n" +
      s"WARC-Target-URI: $url\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n" +
      extra + s"Content-Length: ${body.length}\r\n\r\n"
    head.getBytes(UTF_8) ++ body ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def gz(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(bytes); g.close()
    bos.toByteArray
  }

  test("multi-record container: every record recovered byte-exact") {
    // CJK body: Content-Length counts OCTETS (9 here for 3 chars) —
    // a char-counting reader would tear the following record
    val cjk = "中文字".getBytes(UTF_8)
    assert(cjk.length === 9)
    val bytes = rec("conversion", "http://a/1", "hello".getBytes(UTF_8)) ++
      rec("conversion", "http://a/2", cjk) ++
      rec("conversion", "http://a/3", Array.empty[Byte])
    val rs = Warc.records(bytes)
    assert(rs.map(_.url) === Seq("http://a/1", "http://a/2", "http://a/3"))
    assert(new String(rs(1).payload, UTF_8) === "中文字")
    assert(rs(2).payload.isEmpty)
    assert(rs.forall(_.date === "2024-01-01T00:00:00Z"))
  }

  test("payload containing a WARC/1.0 line does not split the record") {
    val trap = "body with\r\n\r\nWARC/1.0\r\nfake: header\r\n\r\ninside"
      .getBytes(UTF_8)
    val rs = Warc.records(
      rec("conversion", "http://a/trap", trap) ++
        rec("conversion", "http://a/after", "ok".getBytes(UTF_8)))
    assert(rs.map(_.url) === Seq("http://a/trap", "http://a/after"))
    assert(rs(0).payload === trap)
  }

  test("gzip multi-member container (one member per record)") {
    val bytes = gz(rec("conversion", "http://g/1", "m1".getBytes(UTF_8))) ++
      gz(rec("conversion", "http://g/2", "m2".getBytes(UTF_8)))
    val rs = Warc.records(bytes)
    assert(rs.map(_.url) === Seq("http://g/1", "http://g/2"))
    assert(rs.map(r => new String(r.payload, UTF_8)) === Seq("m1", "m2"))
  }

  test("truncated final record is dropped, prior records survive") {
    val whole = rec("conversion", "http://t/1", "full".getBytes(UTF_8))
    val torn = rec("conversion", "http://t/2",
      "this body is long".getBytes(UTF_8)).dropRight(12) // cut payload
    val rs = Warc.records(whole ++ torn)
    assert(rs.map(_.url) === Seq("http://t/1"))
    // torn mid-headers: same outcome
    val tornHead = whole ++ "WARC/1.0\r\nWARC-Type: conv".getBytes(UTF_8)
    assert(Warc.records(tornHead).map(_.url) === Seq("http://t/1"))
  }

  test("header folding, case-insensitivity, unlengthed record skipped") {
    val folded = ("WARC/1.0\r\ncontent-length: 2\r\n" +
      "WARC-TARGET-URI: http://f/1\r\nX-Long: first\r\n  second part\r\n" +
      "\r\nhi\r\n\r\n").getBytes(UTF_8)
    val noLen = ("WARC/1.0\r\nWARC-Target-URI: http://f/2\r\n\r\n")
      .getBytes(UTF_8)
    val after = rec("conversion", "http://f/3", "ok".getBytes(UTF_8))
    val rs = Warc.records(folded ++ noLen ++ after)
    // the unlengthed record cannot be framed -> iteration stops there
    // (its "body" would swallow the rest); the folded one parses fully
    assert(rs.head.url === "http://f/1")
    assert(rs.head.headers("x-long") === "first second part")
    assert(rs.head.headers.contains("content-length"))
  }

  test("httpBody strips response framing; WET payloads pass through") {
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html>x</html>").getBytes(UTF_8)
    assert(new String(Warc.httpBody(http), UTF_8) === "<html>x</html>")
    val wet = "plain text, no framing".getBytes(UTF_8)
    assert(Warc.httpBody(wet) === wet)
  }

  test("warcSplit column form: explode + HTTP strip, composes with docs") {
    graft.expressions.GraftFunctions.register(spark)
    val body = "HTTP/1.1 404 Not Found\r\nServer: x\r\n\r\npage gone"
      .getBytes(UTF_8)
    val container = rec("response", "http://c/r", body) ++
      rec("conversion", "http://c/w", "wet text".getBytes(UTF_8))
    val rows = Seq(Tuple1(container)).toDF("bytes")
      .select(explode(Warc.warcSplit($"bytes")).as("r"))
      .select($"r.url", $"r.rtype", $"r.n_headers",
        decode($"r.body", "UTF-8").as("body"))
      .as[(String, String, Int, String)].collect()
    assert(rows === Array(
      ("http://c/r", "response", 4, "page gone"),
      ("http://c/w", "conversion", 4, "wet text")))
  }
}
