package graft.io

import java.io.{BufferedInputStream, ByteArrayOutputStream, InputStream}
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

/** Length-framed WARC (ISO 28500) record scanning — the EXACT framing the
  * spec prescribes: each record is delimited by its own `Content-Length`
  * header, not by searching for the next version line. This is what makes
  * parsing robust on adversarial real corpora where a payload *contains*
  * the literal record marker (a page about WARC, an archived `.warc`
  * served over HTTP) — a marker-split reader breaks there, a
  * length-framed one does not.
  *
  * Everything is incremental: records stream off a bounded
  * `BufferedInputStream` one at a time, so a multi-GB archive (gzipped
  * Common Crawl segments routinely exceed 2 GB decompressed) never
  * materializes in memory — the per-record working set is one record.
  *
  * Framing per record:
  *  1. skip blank separator lines, read the `WARC/<version>` line
  *     (1.0 and 1.1 both accepted);
  *  2. read header lines to the empty line; parse `Content-Length`;
  *  3. read exactly that many payload bytes, then require the spec's
  *     `\r\n\r\n` record trailer (or EOF);
  *  4. if the trailer is missing — the declared length was wrong — or
  *     `Content-Length` is absent/corrupt, RESYNC: scan forward to the
  *     next `\r\nWARC/1.` boundary, keep the scanned bytes as payload,
  *     and surface the recovery as `frameOk = false` so downstream
  *     filters can quarantine the record instead of silently trusting it.
  *
  * Charset: HTTP payloads decode their body per the `Content-Type`
  * charset parameter of the HTTP envelope (fallback UTF-8 with
  * replacement); envelope and WARC headers decode as ISO-8859-1 (the
  * HTTP wire default, byte-preserving). Real crawls are full of
  * legacy-charset pages — decoding everything as UTF-8 silently garbles
  * them and degrades every downstream gate (stopword density, lang-id,
  * quality scoring).
  */
object WarcFraming {

  /** One framed record: `minor` is the version text after "WARC/1."
    * ("0"/"1"), `value` is the record re-serialized exactly like the
    * marker-split text source emits it (headers + CRLF CRLF + decoded
    * payload) so [[WarcReader]]'s codegen'd parsing consumes both paths
    * identically; `frameOk = false` marks a record recovered by resync. */
  final case class Framed(value: String, frameOk: Boolean)

  private val Iso = StandardCharsets.ISO_8859_1
  private val BoundaryPat = "\r\nWARC/1.".getBytes(Iso)

  private val ClRe = "(?mi)^Content-Length:\\s*(\\d+)\\s*$".r
  private val CharsetRe = "(?i)charset=\"?'?([A-Za-z0-9_][A-Za-z0-9_\\-.:]*)".r

  /** HTML5 in-document encoding declarations, for pages whose HTTP
    * header names no charset: `<meta charset="…">` and the legacy
    * `<meta http-equiv="Content-Type" content="…; charset=…">`. The
    * sniff scans only the first [[MetaSniffLimit]] bytes decoded as
    * ISO-8859-1 (byte-transparent for the ASCII-compatible encodings
    * such declarations are legal in — the same prescan window browsers
    * use). */
  private val MetaCharsetRe =
    "(?is)<meta\\s[^>]*charset\\s*=\\s*[\"']?([A-Za-z0-9_][A-Za-z0-9_\\-.:]*)".r
  private val MetaSniffLimit = 1024

  /** Decode bytes with a named charset, replacing malformed input; falls
    * back to UTF-8 when the name is unknown to the JVM. */
  private def decode(bytes: Array[Byte], off: Int, len: Int, cs: String): String = {
    val charset =
      try Charset.forName(cs)
      catch { case _: Exception => StandardCharsets.UTF_8 }
    val dec = charset.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, off, len)).toString
  }

  /** Decode a record payload: for `application/http` records the body
    * decodes per the HTTP envelope's Content-Type charset, falling back
    * to an HTML `<meta charset>` prescan of the body's first KB (real
    * pages routinely omit the header parameter and declare in-document),
    * then UTF-8; everything else (and envelope-less payloads) decodes
    * UTF-8 with replacement. */
  private[io] def decodePayload(payload: Array[Byte], warcHeaders: String): String = {
    val isHttp = warcHeaders.toLowerCase.contains("application/http")
    val envEnd = if (isHttp) indexOfSeq(payload, "\r\n\r\n".getBytes(Iso), 0) else -1
    if (envEnd < 0) decode(payload, 0, payload.length, "UTF-8")
    else {
      val env = new String(payload, 0, envEnd + 4, Iso)
      val cs = CharsetRe.findFirstMatchIn(env).map(_.group(1)).orElse {
        val n = math.min(MetaSniffLimit, payload.length - envEnd - 4)
        val head = new String(payload, envEnd + 4, math.max(n, 0), Iso)
        MetaCharsetRe.findFirstMatchIn(head).map(_.group(1))
      }.getOrElse("UTF-8")
      env + decode(payload, envEnd + 4, payload.length - envEnd - 4, cs)
    }
  }

  private def indexOfSeq(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Incremental record iterator over a raw WARC byte stream (wrap the
    * stream in `GZIPInputStream` for `.warc.gz` — Java's reader walks
    * concatenated gzip members natively). */
  def frames(in: InputStream): Iterator[Framed] = new Iterator[Framed] {
    private val bin = new BufferedInputStream(in, 1 << 16)
    private var nextRec: Framed = _
    private var done = false

    /** Shared pushback: boundary scans replay partially-matched bytes
      * (up to one boundary pattern's worth) for subsequent reads. */
    private val pushback = new java.util.ArrayDeque[Integer]()
    private def read1(): Int =
      if (!pushback.isEmpty) pushback.pollFirst().intValue else bin.read()
    private def unread(b: Int): Unit = if (b >= 0) pushback.addFirst(b)

    /** Bytes to the next \n (exclusive, trailing \r stripped); null at EOF. */
    private def readLine(): String = {
      val out = new ByteArrayOutputStream(128)
      var b = read1()
      if (b < 0) return null
      while (b >= 0 && b != '\n') { out.write(b); b = read1() }
      val arr = out.toByteArray
      val n = if (arr.nonEmpty && arr(arr.length - 1) == '\r') arr.length - 1 else arr.length
      new String(arr, 0, n, Iso)
    }

    private def readN(n: Long): Array[Byte] = {
      val out = new ByteArrayOutputStream(math.min(n, 1L << 20).toInt)
      var left = n
      val buf = new Array[Byte](64 << 10)
      while (left > 0) {
        if (!pushback.isEmpty) { out.write(pushback.pollFirst().intValue); left -= 1 }
        else {
          val got = bin.read(buf, 0, math.min(left, buf.length.toLong).toInt)
          if (got < 0) left = 0 // truncated: caller compares length
          else { out.write(buf, 0, got); left -= got }
        }
      }
      out.toByteArray
    }

    /** Consume bytes until the `\r\nWARC/1.` boundary (exclusive) or EOF;
      * returns the scanned bytes. The boundary's CRLF is consumed, the
      * `WARC/1.` lookahead is NOT — matched bytes before a failed prefix
      * replay through a small carry buffer. */
    private def scanToBoundary(): Array[Byte] = {
      val out = new ByteArrayOutputStream(1024)
      var b = read1()
      while (b >= 0) {
        if (b == '\r') {
          // try to match the full boundary
          val m = new Array[Int](BoundaryPat.length)
          m(0) = b
          var k = 1
          var ok = true
          while (ok && k < BoundaryPat.length) {
            val c = read1()
            m(k) = c
            if (c < 0 || c.toByte != BoundaryPat(k)) ok = false else k += 1
          }
          if (ok) {
            // boundary found: the CRLF is consumed, the "WARC/1."
            // lookahead replays for the next frame's version-line read
            var i = BoundaryPat.length - 1
            while (i >= 2) { unread(m(i)); i -= 1 }
            return out.toByteArray
          } else {
            out.write(b)
            // replay everything consumed after the leading \r
            var i = k
            while (i >= 1) { unread(m(i)); i -= 1 }
          }
        } else out.write(b)
        b = read1()
      }
      out.toByteArray
    }

    private def advance(): Unit = {
      nextRec = null
      var version: String = null
      var line = readLine()
      while (line != null && version == null) {
        if (line.startsWith("WARC/")) version = line.substring(5)
        else line = readLine() // blank separators / pre-record garbage
      }
      if (version == null) { done = true; return }

      val hb = new StringBuilder
      var h = readLine()
      var eofInHeaders = h == null
      while (h != null && h.nonEmpty) {
        hb.append(h).append("\r\n")
        h = readLine()
        if (h == null) eofInHeaders = true
      }
      val headers = hb.toString.stripSuffix("\r\n")
      val cl = ClRe.findFirstMatchIn(headers).map(_.group(1).toLong)

      var ok = !eofInHeaders
      val payload: Array[Byte] = cl match {
        case Some(n) if ok =>
          val body = readN(n)
          if (body.length < n) { ok = false; body }
          else {
            // the spec's record trailer: two CRLFs, then the next version
            // line (or EOF). Anything else ⇒ the declared length was
            // wrong ⇒ resync to the next boundary and keep the extra.
            val t = readN(4)
            val trailerOk = t.length < 4 ||
              (t(0) == '\r' && t(1) == '\n' && t(2) == '\r' && t(3) == '\n')
            if (trailerOk) body
            else {
              ok = false
              val extra = scanToBoundary()
              val out = new ByteArrayOutputStream(body.length + t.length + extra.length)
              out.write(body); out.write(t); out.write(extra)
              out.toByteArray
            }
          }
        case _ =>
          ok = false
          scanToBoundary()
      }
      val minor = if (version.startsWith("1.")) version.substring(2) else version
      val value = minor + "\r\n" + headers + "\r\n\r\n" + decodePayload(payload, headers)
      nextRec = Framed(value, ok)
    }

    override def hasNext: Boolean = {
      if (nextRec == null && !done) advance()
      nextRec != null
    }
    override def next(): Framed = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec; nextRec = null; r
    }
  }

  // ───────────────────────── fixture/export writer ─────────────────────────

  /** Serialize one response record to spec-exact bytes: `Content-Length`
    * counts BYTES of the HTTP envelope + the body encoded with
    * `bodyCharset` — the detail a string-level writer gets wrong for any
    * non-ASCII page. */
  def responseRecordBytes(uri: String, body: String, version: String,
                          contentTypeHeader: String, bodyCharset: String): Array[Byte] = {
    val cs = Charset.forName(bodyCharset)
    val bodyBytes = body.getBytes(cs)
    val http = s"HTTP/1.1 200 OK\r\nContent-Type: $contentTypeHeader\r\n\r\n".getBytes(Iso)
    val payloadLen = http.length + bodyBytes.length
    val head =
      (s"WARC/$version\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"WARC-Record-ID: <urn:graft:$uri>\r\n" +
        "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: $payloadLen\r\n\r\n").getBytes(Iso)
    val out = new ByteArrayOutputStream(head.length + payloadLen + 4)
    out.write(head); out.write(http); out.write(bodyBytes)
    out.write("\r\n\r\n".getBytes(Iso))
    out.toByteArray
  }
}
