package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException,
  InputStream}
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import graft.expressions.UnaryKernelCodegen
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType,
  IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** ISO 28500 (WARC) / WET record ingestion — the step BEFORE
  * `documents` exists: a CommonCrawl-style run starts from ~1 GB WARC
  * container files, each a concatenation of records
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n
  * WARC-Target-URI: http://example.com/\r\n
  * WARC-Date: 2024-01-01T00:00:00Z\r\n
  * Content-Length: 123\r\n
  * \r\n
  * <exactly Content-Length payload bytes>
  * \r\n\r\n
  * }}}
  *
  * and usually stored gzip-per-record (each record its own gzip
  * member, members concatenated). Reference behavioral model: the
  * reference app ingests provider feeds by parsing fetched bytes into
  * rows (`ingest/alpha_vantage.py:15-48`, `ingest/yahoo.py:7-47`);
  * this source applies the same bytes→rows contract to the crawl
  * container format a training-data pipeline starts from.
  *
  * Scale design: one WARC file = one input row (`spark.read.format
  * ("binaryFile")`, 2 GB/file format ceiling — standard CC shards are
  * 1 GB) = one task; [[recordIterator]] STREAMS records off an
  * `InputStream` (`GZIPInputStream` natively walks concatenated
  * members), so peak memory per task is one record, never one file.
  * Record rows then explode into the normal scan→filter→dedup
  * pipeline; nothing touches the driver.
  *
  * Correctness boundary: payload slicing is BYTE-exact
  * (`Content-Length` counts octets, not characters — multi-byte UTF-8
  * payloads are the norm); header names are case-insensitive (§5.1);
  * folded continuation lines (leading SP/HT) append to the previous
  * header; a record whose payload is cut short (truncated container)
  * is DROPPED rather than emitted corrupt, matching how a resumable
  * crawl treats a torn tail.
  */
object Warc {

  /** One parsed record: `url`/`date`/`recordType` are the WARC-header
    * fields a pipeline filters on; `headers` keeps every header
    * lower-cased for the long tail; `payload` is the raw content block
    * (HTTP headers still attached for `response` records — see
    * [[httpBody]]).
    */
  final case class Record(url: String, date: String, recordType: String,
                          headers: Map[String, String],
                          payload: Array[Byte])

  private val GzipMagic0 = 0x1f.toByte
  private val GzipMagic1 = 0x8b.toByte

  /** Wrap `in` for record iteration: gzip containers (multi-member or
    * single-stream) are detected by magic and decompressed lazily.
    */
  private def maybeGunzip(in: InputStream): InputStream = {
    val buf = new BufferedInputStream(in, 1 << 16)
    buf.mark(2)
    val b0 = buf.read(); val b1 = buf.read()
    buf.reset()
    if (b0 == (GzipMagic0 & 0xff) && b1 == (GzipMagic1 & 0xff))
      new BufferedInputStream(new GZIPInputStream(buf, 1 << 16), 1 << 16)
    else buf
  }

  /** Read one `\r\n`-terminated header line as ISO-8859-1 (header
    * bytes are ASCII per spec; 8859-1 is the lossless fallback).
    * Returns null at clean EOF before any byte.
    */
  private def readLine(in: InputStream): String = {
    val sb = new java.lang.StringBuilder(64)
    var c = in.read()
    if (c == -1) return null
    while (c != -1 && c != '\n') {
      sb.append(c.toChar)
      c = in.read()
    }
    // tolerate bare-\n files; spec says \r\n
    val len = sb.length()
    if (len > 0 && sb.charAt(len - 1) == '\r') sb.setLength(len - 1)
    sb.toString
  }

  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    require(n <= Int.MaxValue, s"record payload too large: $n")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val got = in.read(out, off, n.toInt - off)
      if (got == -1) throw new EOFException(
        s"payload truncated at $off of $n bytes")
      off += got
    }
    out
  }

  /** Lazily iterate the records of one (possibly gzipped) WARC/WET
    * container stream. Malformed leading bytes are skipped by scanning
    * to the next `WARC/` version line; a truncated final record ends
    * iteration silently (torn tail).
    */
  def recordIterator(raw: InputStream): Iterator[Record] = {
    val in = maybeGunzip(raw)
    new Iterator[Record] {
      private var nextRec: Record = _
      private var done = false

      private def parseOne(): Record = {
        // scan to the next version line (skips inter-record CRLFs and
        // garbage after a recovered tear)
        var line = readLine(in)
        while (line != null && !line.startsWith("WARC/")) line =
          readLine(in)
        if (line == null) return null
        // headers until the empty separator line, with §5.1 folding
        val hs = scala.collection.mutable.LinkedHashMap[String, String]()
        var lastKey: String = null
        line = readLine(in)
        while (line != null && line.nonEmpty) {
          if ((line.charAt(0) == ' ' || line.charAt(0) == '\t')
              && lastKey != null) {
            hs(lastKey) = hs(lastKey) + " " + line.trim
          } else {
            val i = line.indexOf(':')
            if (i > 0) {
              lastKey = line.substring(0, i).trim.toLowerCase
              hs(lastKey) = line.substring(i + 1).trim
            }
          }
          line = readLine(in)
        }
        if (line == null) return null // headers torn — drop
        val len = hs.get("content-length").flatMap(s =>
          scala.util.Try(s.toLong).toOption).getOrElse(-1L)
        if (len < 0) return null // unlengthed record — cannot frame
        val payload =
          try readFully(in, len)
          catch { case _: EOFException => return null } // torn tail
        Record(
          url = hs.getOrElse("warc-target-uri", ""),
          date = hs.getOrElse("warc-date", ""),
          recordType = hs.getOrElse("warc-type", ""),
          headers = hs.toMap,
          payload = payload)
      }

      override def hasNext: Boolean = {
        if (done) return false
        if (nextRec == null) {
          nextRec = parseOne()
          if (nextRec == null) { done = true; raw.close() }
        }
        nextRec != null
      }
      override def next(): Record = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** All records of an in-memory container (tests, small fixtures). */
  def records(bytes: Array[Byte]): Seq[Record] =
    recordIterator(new ByteArrayInputStream(bytes)).toVector

  /** The HTTP body of a `response` record's payload: bytes after the
    * first `\r\n\r\n` (status line + HTTP headers). Conversion (WET)
    * and other non-HTTP payloads come back unchanged — WET records
    * carry the extracted text directly.
    */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n'
          && payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
      i += 1
    }
    payload
  }

  /** Whether a payload LOOKS like an HTTP message (starts `HTTP/`) —
    * the discriminator [[WarcSplit]] uses to strip response framing
    * only where it exists.
    */
  private[sources] def isHttp(payload: Array[Byte]): Boolean =
    payload.length >= 5 && payload(0) == 'H' && payload(1) == 'T' &&
      payload(2) == 'T' && payload(3) == 'P' && payload(4) == '/'

  /** `graft_warc_split(container: binary)` →
    * `array<struct<url, date, rtype, n_headers, body: binary>>` — the
    * column form of the reader for explode-style plans; `body` has
    * HTTP framing already stripped for HTTP payloads. One compiled
    * pass per container; the iterator keeps memory at one record.
    */
  case class WarcSplit(child: Expression)
      extends UnaryExpression with UnaryKernelCodegen {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("url", StringType),
      StructField("date", StringType),
      StructField("rtype", StringType),
      StructField("n_headers", IntegerType),
      StructField("body", BinaryType))), containsNull = false)

    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[Array[Byte]]
      val out = new ArrayBuffer[InternalRow]()
      val it = recordIterator(new ByteArrayInputStream(bytes))
      while (it.hasNext) {
        val r = it.next()
        val body = if (isHttp(r.payload)) httpBody(r.payload) else r.payload
        out += InternalRow(
          UTF8String.fromString(r.url),
          UTF8String.fromString(r.date),
          UTF8String.fromString(r.recordType),
          r.headers.size,
          body)
      }
      new GenericArrayData(out.toArray[Any])
    }

    override protected def withNewChildInternal(
        newChild: Expression): WarcSplit = copy(child = newChild)
    override def prettyName: String = "graft_warc_split"
  }

  /** Column wrapper (requires
    * [[graft.expressions.GraftFunctions.register]] on the session).
    */
  def warcSplit(container: Column): Column =
    call_function("graft_warc_split", container)
}
