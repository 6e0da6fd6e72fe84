package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingestion — the wire format every real
  * web corpus (Common Crawl and friends) arrives in, and the natural
  * front door of the HTML→text extraction plane
  * ([[graft.operators.Extract]]).
  *
  * Spark-first shape: the file splits into records AT THE SOURCE with
  * the text reader's custom `lineSep` set to the record marker
  * (`WARC/1.0\r\n`) — Hadoop's line reader handles multi-byte custom
  * delimiters, so record splitting is distributed and streams at scan
  * speed; no driver parsing, no whole-file reads. Header fields and the
  * HTTP payload then parse per record with codegen'd string builtins
  * (`substring_index`, `regexp_extract`, `substr`) — per-row, no UDFs,
  * scales linearly with the corpus.
  *
  * Scope (documented): uncompressed WARC 1.0/1.1. Real archives ship
  * as per-record gzip members (`.warc.gz`), whose decompression needs a
  * binary record reader — the Spark-side record model and parsing here
  * are format-complete, and a gzip member splitter would slot in as an
  * alternative `records` source. */
object WarcReader {

  private val RecordMarker = "WARC/1.0\r\n"
  private val HeaderEnd = "\r\n\r\n"

  /** One WARC header field; `(?m)` anchors each header line. Absent →
    * null. */
  private def header(headers: Column, name: String): Column = {
    val v = regexp_extract(headers, "(?m)^" + name + ":\\s*(.*?)\\r?$", 1)
    when(length(v) === 0, lit(null).cast("string")).otherwise(v)
  }

  /** Text after the first `\r\n\r\n` terminator of `c` (the WARC block /
    * the HTTP body), trailing record whitespace trimmed. */
  private def afterHeaders(c: Column): Column =
    // NOT rtrim — Spark's rtrim strips spaces only, and the inter-record
    // separators being shed here are \r\n blank lines
    regexp_replace(
      c.substr(length(substring_index(c, HeaderEnd, 1)) + lit(5), length(c)),
      "[\\r\\n]+$", "")

  /** Raw records of one or more WARC files: one row per record with the
    * parsed WARC headers, the record payload, and — for records carrying
    * HTTP — the status code and the body with the HTTP envelope
    * stripped. */
  def records(spark: SparkSession, path: String): DataFrame =
    parseRecords(spark.read.option("lineSep", RecordMarker).text(path))

  /** GZIPPED archives (`.warc.gz`) — how real corpora ship: each record
    * (or run of records) is its own gzip member, members concatenate
    * into one file. Members are NOT splittable, so the real-world unit
    * of parallelism is the ARCHIVE FILE (exactly how Common Crawl
    * processing fans out) — `binaryFile` hands each executor whole
    * archives, `GZIPInputStream` walks the concatenated members, and
    * the same record-marker split + codegen'd parsing follows. Driver
    * holds nothing. */
  def recordsGz(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val values = spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 << 10)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        in.close()
        out.toString("UTF-8").split(java.util.regex.Pattern.quote(RecordMarker))
          .toSeq
      }.toDF("value")
    parseRecords(values)
  }

  /** STREAMING records: tail a directory of arriving archives — the
    * continuous-ingestion shape (a crawler drops `.warc` files, the
    * pipeline consumes them). Same source-level record splitting, same
    * stateless codegen'd parsing, so every downstream extraction
    * operator composes unchanged inside the stream. */
  def recordsStream(spark: SparkSession, path: String): DataFrame =
    parseRecords(spark.readStream.option("lineSep", RecordMarker)
      .text(path))

  /** Marker-split raw text → parsed records (shared by the batch and
    * streaming sources; every step is a stateless projection, so the
    * plan is streaming-legal). */
  private def parseRecords(rawIn: DataFrame): DataFrame = {
    val raw = rawIn
      .where(length(trim(col("value"))) > 0) // preamble before 1st marker
    val headers = substring_index(col("value"), HeaderEnd, 1)
    val withCols = raw
      .withColumn("record_type", header(headers, "WARC-Type"))
      .withColumn("target_uri", header(headers, "WARC-Target-URI"))
      .withColumn("record_id", header(headers, "WARC-Record-ID"))
      .withColumn("warc_date", header(headers, "WARC-Date"))
      .withColumn("content_type", header(headers, "Content-Type"))
      .withColumn("content_length",
        header(headers, "Content-Length").cast("long"))
      .withColumn("__block", afterHeaders(col("value")))
    // only HTTP RESPONSES carry an envelope worth stripping (requests
    // have no body — their block IS the request)
    val isHttpResp = col("content_type").contains("application/http") &&
      col("content_type").contains("msgtype=response")
    val httpStatus =
      regexp_extract(col("__block"), "^HTTP/1\\.[01]\\s+(\\d{3})", 1)
    withCols
      .withColumn("http_status",
        when(isHttpResp && length(httpStatus) > 0, httpStatus.cast("int"))
          .otherwise(lit(null).cast("int")))
      .withColumn("payload",
        when(isHttpResp, afterHeaders(col("__block"))).otherwise(col("__block")))
      .drop("value", "__block")
  }

  /** The extraction feed: `response` records with a 200 HTTP payload,
    * keyed by target URI — what the HTML plane consumes. */
  def responses(spark: SparkSession, path: String): DataFrame =
    responsesOf(records(spark, path))

  private[graft] def responsesOf(recs: DataFrame): DataFrame =
    recs
      .where(col("record_type") === "response" && col("http_status") === 200)
      .select(col("target_uri"), col("warc_date"), col("payload").as("html"))

  /** Serialize (uri, html) rows into WARC request/response record pairs —
    * the fixture/export side, also the layout a crawler sink would write.
    * One `value` column out; write with `.text(path)` (records are
    * marker-delimited, so the text writer's row separator is inert). */
  def toWarcRecords(df: DataFrame, uriCol: String, htmlCol: String): DataFrame = {
    val http = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), col(htmlCol))
    val response = concat(
      lit(RecordMarker),
      lit("WARC-Type: response\r\n"),
      lit("WARC-Target-URI: "), col(uriCol), lit("\r\n"),
      lit("WARC-Record-ID: <urn:graft:"), col(uriCol), lit(">\r\n"),
      lit("WARC-Date: 2026-01-01T00:00:00Z\r\n"),
      lit("Content-Type: application/http; msgtype=response\r\n"),
      lit("Content-Length: "), length(http).cast("string"),
      lit(HeaderEnd), http)
    val request = concat(
      lit(RecordMarker),
      lit("WARC-Type: request\r\n"),
      lit("WARC-Target-URI: "), col(uriCol), lit("\r\n"),
      lit("Content-Type: application/http; msgtype=request"),
      lit(HeaderEnd), lit("GET / HTTP/1.1\r\nHost: graft\r\n"))
    df.select(explode(array(request, response)).as("value"))
  }
}
