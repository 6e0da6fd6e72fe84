package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) ingestion — the wire format every real
  * web corpus (Common Crawl and friends) arrives in, and the natural
  * front door of the HTML→text extraction plane
  * ([[graft.operators.Extract]]).
  *
  * Two complementary read paths:
  *
  *  - '''Marker-split''' ([[records]]/[[recordsGz]]/[[recordsStream]]):
  *    the file splits into records AT THE SOURCE with the text reader's
  *    custom `lineSep` set to the version-line prefix (`WARC/1.` — 1.0
  *    and 1.1 archives both split) — Hadoop's line reader handles
  *    multi-byte custom delimiters AND transparent gzip decompression
  *    (concatenated `.warc.gz` members included), so record splitting is
  *    distributed and streams at scan speed; no driver parsing, no
  *    whole-file reads. Header fields and the HTTP payload then parse
  *    per record with codegen'd string builtins (`substring_index`,
  *    `regexp_extract`, `substr`) — per-row, no UDFs, linear in the
  *    corpus. Documented caveat: a payload that CONTAINS the literal
  *    version-line bytes mis-splits (marker scanning cannot know
  *    better), and payload decode is UTF-8 — use the framed path for
  *    adversarial/legacy corpora.
  *
  *  - '''Length-framed''' ([[recordsFramed]]/[[recordsFramedStream]]):
  *    exact `Content-Length` framing per the spec via
  *    [[WarcFraming]] — immune to marker-in-payload, validates the
  *    record trailer and surfaces corrupt lengths as `frame_ok = false`
  *    (with resync), and decodes HTTP payloads per their Content-Type
  *    charset. Framing is inherently sequential within an archive, so
  *    the unit of parallelism is the archive FILE — the same shape gzip
  *    (non-splittable members) forces on everyone, and exactly how
  *    Common Crawl jobs fan out: thousands of ~1 GB archives, one task
  *    each, bytes streaming through a bounded buffer (a multi-GB
  *    archive never materializes).
  */
object WarcReader {

  private val RecordMarker = "WARC/1."
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
    * stripped. Reads `.warc` and `.warc.gz` alike (Hadoop's codec layer
    * decompresses concatenated gzip members transparently; gz archives
    * are non-splittable, so their natural unit of parallelism is the
    * file). */
  def records(spark: SparkSession, path: String): DataFrame =
    parseRecords(spark.read.option("lineSep", RecordMarker).text(path))

  /** GZIPPED archives (`.warc.gz`) — how real corpora ship. Identical to
    * [[records]]: the text source's Hadoop codec layer streams each
    * archive's concatenated gzip members through a bounded decompression
    * buffer (never materializing the archive), and the non-splittable
    * members make the ARCHIVE FILE the unit of parallelism — exactly how
    * Common Crawl processing fans out. Kept as a named entry point for
    * call-site clarity. */
  def recordsGz(spark: SparkSession, path: String): DataFrame =
    records(spark, path)

  /** STREAMING records: tail a directory of arriving archives — the
    * continuous-ingestion shape (a crawler drops `.warc`/`.warc.gz`
    * files, the pipeline consumes them). Same source-level record
    * splitting and transparent gzip decompression, same stateless
    * codegen'd parsing, so every downstream extraction operator composes
    * unchanged inside the stream. */
  def recordsStream(spark: SparkSession, path: String): DataFrame =
    parseRecords(spark.readStream.option("lineSep", RecordMarker)
      .text(path))

  // ─────────────────────── length-framed path ───────────────────────

  /** Expand an input path (file, directory, or glob) to archive files.
    * Driver-side metadata listing — the same O(files) work every Spark
    * file source's FileIndex performs. */
  private def listArchivePaths(path: String): Seq[String] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
    matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).filter(_.isFile).map(_.getPath.toString).toSeq
      else Seq(st.getPath.toString)
    }.sorted
  }

  /** Open an archive for framing: raw bytes, gzip-decoded when the name
    * says so (Java's GZIPInputStream walks concatenated members). Runs on
    * executors; the iterator closes the stream at exhaustion. */
  private def framesOf(p: String): Iterator[WarcFraming.Framed] = {
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val raw: java.io.InputStream = fs.open(hp)
    val in =
      if (p.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw, 64 << 10)
      else raw
    val it = WarcFraming.frames(in)
    new Iterator[WarcFraming.Framed] {
      private var closed = false
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h && !closed) { closed = true; in.close() }
        h
      }
      override def next(): WarcFraming.Framed = it.next()
    }
  }

  /** Length-framed batch records: spec-exact `Content-Length` framing —
    * survives payloads containing the record marker, reads WARC/1.0 and
    * 1.1, decodes HTTP payloads per their Content-Type charset, and
    * carries `frame_ok = false` on records recovered from a corrupt
    * length (resync to the next record boundary). One task per archive
    * file; bytes stream, nothing materializes. */
  def recordsFramed(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val paths = listArchivePaths(path)
    val ds = spark.createDataset(paths)
      .repartition(math.max(1, paths.size))
      .flatMap(p => framesOf(p))
    parseRecords(ds.toDF("value", "frame_ok"))
  }

  /** The binaryFile source's fixed schema (streaming requires it stated
    * explicitly). Only `path` is selected, so the source prunes `content`
    * and never loads archive bytes into rows. */
  private val BinaryFileSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** STREAMING length-framed records: tail a directory of arriving
    * `.warc`/`.warc.gz` archives with exact framing. The file stream
    * source tracks arrivals (checkpointable, exactly-once per archive);
    * each micro-batch walks its new archives' members on executors —
    * framing is stateless per archive, so the streaming plan carries no
    * state store. */
  def recordsFramedStream(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema).load(path)
      .select(col("path")).as[String]
    parseRecords(files.flatMap(p => framesOf(p)).toDF("value", "frame_ok"))
  }

  /** Marker-split raw text → parsed records (shared by the batch,
    * framed, and streaming sources; every step is a stateless
    * projection, so the plan is streaming-legal). Input rows begin with
    * the version minor (`0\r\n`/`1\r\n` — what follows the `WARC/1.`
    * marker); anything else (file preamble, blank separators) drops. */
  private def parseRecords(rawIn: DataFrame): DataFrame = {
    val raw = rawIn.where(col("value").rlike("^[01]\\r\\n"))
    val headers = substring_index(col("value"), HeaderEnd, 1)
    val withCols = raw
      .withColumn("warc_version",
        concat(lit("1."), col("value").substr(1, 1)))
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

  /** Serialize (uri, text) rows into WET-style `conversion` records —
    * the Common Crawl companion format for EXTRACTED plain text: each
    * record refers back to the response it was derived from
    * (`WARC-Refers-To`), carries `Content-Type: text/plain`, and its
    * `Content-Length` counts the text's UTF-8 octets. One `value`
    * column out; write with `.text(path)` like [[toWarcRecords]]. */
  def toWetRecords(df: DataFrame, uriCol: String, textCol: String): DataFrame =
    df.select(concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: conversion\r\n"),
      lit("WARC-Target-URI: "), col(uriCol), lit("\r\n"),
      lit("WARC-Refers-To: <urn:graft:"), col(uriCol), lit(">\r\n"),
      lit("WARC-Date: 2026-01-01T00:00:00Z\r\n"),
      lit("Content-Type: text/plain\r\n"),
      lit("Content-Length: "), octet_length(col(textCol)).cast("string"),
      lit(HeaderEnd), col(textCol)).as("value"))

  /** Serialize (uri, html) rows into WARC request/response record pairs —
    * the fixture/export side, also the layout a crawler sink would write.
    * One `value` column out; write with `.text(path)` (records are
    * marker-delimited, so the text writer's row separator is inert). */
  def toWarcRecords(df: DataFrame, uriCol: String, htmlCol: String): DataFrame = {
    val marker = "WARC/1.0\r\n"
    val http = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), col(htmlCol))
    val response = concat(
      lit(marker),
      lit("WARC-Type: response\r\n"),
      lit("WARC-Target-URI: "), col(uriCol), lit("\r\n"),
      lit("WARC-Record-ID: <urn:graft:"), col(uriCol), lit(">\r\n"),
      lit("WARC-Date: 2026-01-01T00:00:00Z\r\n"),
      lit("Content-Type: application/http; msgtype=response\r\n"),
      lit("Content-Length: "), length(http).cast("string"),
      lit(HeaderEnd), http)
    val request = concat(
      lit(marker),
      lit("WARC-Type: request\r\n"),
      lit("WARC-Target-URI: "), col(uriCol), lit("\r\n"),
      lit("Content-Type: application/http; msgtype=request"),
      lit(HeaderEnd), lit("GET / HTTP/1.1\r\nHost: graft\r\n"))
    df.select(explode(array(request, response)).as("value"))
  }
}
