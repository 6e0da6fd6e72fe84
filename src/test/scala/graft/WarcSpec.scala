package graft

import java.nio.file.Files
import graft.io.WarcReader
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC ingestion ([[graft.io.WarcReader]]): distributed record
  * splitting via the text reader's custom record-marker lineSep, header
  * parsing, HTTP envelope stripping, and the serialize→write→read
  * roundtrip that feeds the extraction plane. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("hand-written archive: warcinfo + request/response parse field-exactly") {
    val dir = Files.createTempDirectory("graft-warc").toString
    val warc =
      "WARC/1.0\r\n" +
        "WARC-Type: warcinfo\r\n" +
        "Content-Type: application/warc-fields\r\n" +
        "Content-Length: 18\r\n" +
        "\r\n" +
        "software: graft/17\r\n\r\n" +
      "WARC/1.0\r\n" +
        "WARC-Type: request\r\n" +
        "WARC-Target-URI: https://example.com/a\r\n" +
        "Content-Type: application/http; msgtype=request\r\n" +
        "\r\n" +
        "GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n" +
      "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        "WARC-Target-URI: https://example.com/a\r\n" +
        "WARC-Record-ID: <urn:uuid:42>\r\n" +
        "WARC-Date: 2026-02-03T04:05:06Z\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        "\r\n" +
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        "<html><body><p>hello warc world</p>\n\n<p>second block</p></body></html>\r\n\r\n"
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.warc"), warc)
    val recs = WarcReader.records(spark, s"$dir/a.warc")
      .orderBy("record_type").collect()
    assert(recs.map(_.getAs[String]("record_type")).toSeq ==
      Seq("request", "response", "warcinfo"))
    val resp = recs(1)
    assert(resp.getAs[String]("target_uri") == "https://example.com/a")
    assert(resp.getAs[String]("record_id") == "<urn:uuid:42>")
    assert(resp.getAs[String]("warc_date") == "2026-02-03T04:05:06Z")
    assert(resp.getAs[Int]("http_status") == 200)
    // HTTP envelope stripped; interior blank line SURVIVES (only the
    // first header terminator splits)
    assert(resp.getAs[String]("payload") ==
      "<html><body><p>hello warc world</p>\n\n<p>second block</p></body></html>")
    // non-HTTP record: payload = raw block, no status
    val info = recs(2)
    assert(info.getAs[String]("payload") == "software: graft/17")
    assert(info.isNullAt(info.fieldIndex("http_status")))
    assert(info.isNullAt(info.fieldIndex("target_uri")))
    assert(info.getAs[Long]("content_length") == 18L)
    // request: envelope stripped too (msgtype=request is still HTTP)
    assert(recs(0).getAs[String]("payload").startsWith("GET /a HTTP/1.1"))
  }

  test("serialize → text write → read roundtrip, feeding the extractor") {
    val dir = Files.createTempDirectory("graft-warc-rt").toString
    val pages = Seq(
      ("https://g.test/1",
        "<html><head><title>One</title></head><body><p>the first page has enough words in it</p></body></html>"),
      ("https://g.test/2",
        "<html><head><title>Two</title></head><body><p>the second page also has plenty of words</p></body></html>"))
      .toDF("uri", "html")
    WarcReader.toWarcRecords(pages, "uri", "html")
      .coalesce(1).write.text(s"$dir/out.warc")
    val recs = WarcReader.records(spark, s"$dir/out.warc")
    assert(recs.count() == 4) // request + response per page
    val resp = WarcReader.responses(spark, s"$dir/out.warc")
    assert(resp.count() == 2)
    val got = resp.orderBy("target_uri")
      .select("target_uri", "html").as[(String, String)].collect()
    assert(got(0)._1 == "https://g.test/1" &&
      got(0)._2.startsWith("<html><head><title>One</title>"))
    // end-to-end: WARC → Extract — title + clean text arrive intact
    val ext = graft.operators.Extract
      .extractText(resp, "html", "target_uri")
      .orderBy("target_uri").collect()
    assert(ext(0).getAs[String]("title") == "One")
    assert(ext(0).getAs[String]("clean_text") ==
      "the first page has enough words in it")
  }

  test("streaming source: arriving archives parse batch-identically, exactly once") {
    val dir = Files.createTempDirectory("graft-warc-stream").toString
    val in = s"$dir/in"
    def wave(rows: Seq[(String, String)]): Unit =
      WarcReader.toWarcRecords(rows.toDF("uri", "html"), "uri", "html")
        .coalesce(1).write.mode("append").text(in)
    wave(Seq(("u1", "<html><body><p>first wave page body</p></body></html>")))
    val buf = scala.collection.mutable.ListBuffer.empty[(String, String)]
    val q = WarcReader.recordsStream(spark, in)
      .where(col("record_type") === "response")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.select("target_uri", "payload").as[(String, String)].collect()
        buf.synchronized { buf ++= rows }; ()
      }.start()
    try {
      q.processAllAvailable()
      wave(Seq(("u2", "<html><body><p>second wave page body</p></body></html>")))
      q.processAllAvailable()
    } finally q.stop()
    val got = buf.synchronized(buf.sortBy(_._1).toList)
    assert(got.map(_._1) == List("u1", "u2"))
    assert(got.forall(_._2.startsWith("<html><body><p>")))
  }

  test(".warc.gz: concatenated gzip members parse identically to the plain archive") {
    val dir = Files.createTempDirectory("graft-warc-gz").toString
    val pages = Seq(
      ("https://g.test/1", "<html><head><title>One</title></head><body><p>first page body words</p></body></html>"),
      ("https://g.test/2", "<html><head><title>Two</title></head><body><p>second page body words</p></body></html>"))
    // plain archive
    WarcReader.toWarcRecords(pages.toDF("uri", "html"), "uri", "html")
      .coalesce(1).write.text(s"$dir/plain.warc")
    // gz archive: each page's request+response pair is its own MEMBER,
    // members concatenated into one .warc.gz — the wire layout
    val recs = WarcReader.toWarcRecords(pages.toDF("uri", "html"), "uri", "html")
      .select("value").as[String].collect()
    val gz = new java.io.FileOutputStream(s"$dir/arch.warc.gz")
    recs.grouped(2).foreach { member =>
      val g = new java.util.zip.GZIPOutputStream(gz)
      g.write(member.mkString("", "\n", "\n").getBytes("UTF-8"))
      g.finish() // close the MEMBER, keep the stream
    }
    gz.close()
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(String, String, String)] =
      df.select("record_type", "target_uri", "payload")
        .as[(String, String, String)].collect()
        .sortBy(t => (t._1, String.valueOf(t._2))).toSeq
    val plain = canon(WarcReader.records(spark, s"$dir/plain.warc"))
    val gzed = canon(WarcReader.recordsGz(spark, s"$dir/arch.warc.gz"))
    assert(gzed == plain, "member-gzipped and plain archives parse identically")
    assert(gzed.count(_._1 == "response") == 2)
  }

  test("crash-replayed micro-batch lands exactly once (batchId-keyed overwrite)") {
    val dir = Files.createTempDirectory("graft-warc-crash").toString
    val (in, out) = (s"$dir/in", s"$dir/out")
    WarcReader.toWarcRecords(
      Seq(("u1", "<html><body><p>page one body text</p></body></html>"))
        .toDF("uri", "html"), "uri", "html")
      .coalesce(1).write.mode("append").text(in)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    def run(crashOnce: Boolean) = WarcReader.recordsStream(spark, in)
      .where(col("record_type") === "response")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        b.select("target_uri").write.mode("overwrite")
          .parquet(s"$out/batch=$batchId")
        if (crashOnce && !fired.getAndSet(true))
          throw new RuntimeException("injected crash after batch write")
        ()
      }.start()
    val q1 = run(crashOnce = true)
    val crashed =
      try { q1.processAllAvailable(); false } catch { case _: Exception => true }
    try q1.stop() catch { case _: Exception => () }
    assert(crashed, "injected crash did not fire")
    // restart: batch 0 replays (its offset never committed) onto the
    // SAME directory; then new data flows
    WarcReader.toWarcRecords(
      Seq(("u2", "<html><body><p>page two body text</p></body></html>"))
        .toDF("uri", "html"), "uri", "html")
      .coalesce(1).write.mode("append").text(in)
    val q2 = run(crashOnce = false)
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).select("target_uri").as[String]
      .collect().sorted.toSeq
    assert(rows == Seq("u1", "u2"), s"exactly once across the replay: $rows")
  }

  // ─────────────────────── length-framed path ───────────────────────

  import graft.io.WarcFraming

  private def writeArchive(path: String, recs: Seq[Array[Byte]], gzip: Boolean): Unit = {
    val fos = new java.io.FileOutputStream(path)
    if (gzip) recs.foreach { r => // one gzip MEMBER per record (wire layout)
      val g = new java.util.zip.GZIPOutputStream(fos)
      g.write(r); g.finish()
    }
    else recs.foreach(fos.write)
    fos.close()
  }

  test("framed: a payload containing the record marker does NOT missplit") {
    val dir = Files.createTempDirectory("graft-warc-framed").toString
    // a page ABOUT warc: its body embeds the literal version line bytes
    val body = "<html><body><p>the marker is\r\nWARC/1.0\r\nand WARC/1.1\r\nmid page</p></body></html>"
    val recs = Seq(
      WarcFraming.responseRecordBytes("https://g.test/about-warc", body,
        "1.0", "text/html", "UTF-8"),
      WarcFraming.responseRecordBytes("https://g.test/plain", "<p>plain page</p>",
        "1.1", "text/html", "UTF-8"))
    writeArchive(s"$dir/a.warc", recs, gzip = false)
    val framed = WarcReader.recordsFramed(spark, s"$dir/a.warc")
    val rows = framed.orderBy("target_uri")
      .select("target_uri", "warc_version", "payload", "frame_ok")
      .as[(String, String, String, Boolean)].collect().toSeq
    assert(rows.size == 2, "exactly two records despite 3 embedded markers")
    assert(rows(0) == (("https://g.test/about-warc", "1.0", body, true)))
    assert(rows(1) == (("https://g.test/plain", "1.1", "<p>plain page</p>", true)))
    // the marker-split fast path DOES missplit here — the documented
    // caveat the framed path exists for
    assert(WarcReader.records(spark, s"$dir/a.warc").count() > 2)
  }

  test("framed: HTTP payloads decode per their Content-Type charset") {
    val dir = Files.createTempDirectory("graft-warc-cs").toString
    val latin = "<html><body><p>café naïve résumé</p></body></html>"
    val utf = "<html><body><p>你好 world</p></body></html>"
    val recs = Seq(
      WarcFraming.responseRecordBytes("https://g.test/latin", latin,
        "1.0", "text/html; charset=iso-8859-1", "ISO-8859-1"),
      WarcFraming.responseRecordBytes("https://g.test/utf", utf,
        "1.0", "text/html; charset=utf-8", "UTF-8"))
    writeArchive(s"$dir/a.warc.gz", recs, gzip = true)
    val got = WarcReader.recordsFramed(spark, s"$dir/a.warc.gz")
      .orderBy("target_uri").select("payload").as[String].collect().toSeq
    assert(got == Seq(latin, utf),
      "latin-1 bytes decode via the declared charset, not garbled UTF-8")
  }

  test("framed: <meta charset> prescan decides when the HTTP header is silent") {
    val dir = Files.createTempDirectory("graft-warc-meta").toString
    val latin = "<html><head><meta charset=\"iso-8859-1\"></head>" +
      "<body><p>fenêtre déjà très tôt</p></body></html>"
    val legacy = "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=ISO-8859-1\"></head>" +
      "<body><p>straße größer</p></body></html>"
    val plainUtf = "<html><body><p>日本語 page with no declaration</p></body></html>"
    val recs = Seq(
      // NO charset parameter in the HTTP header — only the meta tag knows
      WarcFraming.responseRecordBytes("https://g.test/meta", latin,
        "1.0", "text/html", "ISO-8859-1"),
      WarcFraming.responseRecordBytes("https://g.test/legacy", legacy,
        "1.0", "text/html", "ISO-8859-1"),
      // nothing declared anywhere → UTF-8 fallback
      WarcFraming.responseRecordBytes("https://g.test/utf", plainUtf,
        "1.0", "text/html", "UTF-8"))
    writeArchive(s"$dir/a.warc", recs, gzip = false)
    val got = WarcReader.recordsFramed(spark, s"$dir/a.warc")
      .orderBy("target_uri").select("payload").as[String].collect().toSeq
    assert(got == Seq(legacy, latin, plainUtf),
      "meta/http-equiv declarations decode latin-1 bytes; fallback stays UTF-8")
  }

  test("framed: corrupt Content-Length resyncs and surfaces frame_ok=false") {
    val dir = Files.createTempDirectory("graft-warc-bad").toString
    val good = WarcFraming.responseRecordBytes("https://g.test/good",
      "<p>good page</p>", "1.0", "text/html", "UTF-8")
    // hand-build a record whose declared length is SHORT by 10 bytes
    val body = "HTTP/1.1 200 OK\r\n\r\n<p>liar liar page</p>"
    val bad = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: https://g.test/bad\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length - 10}\r\n\r\n" +
      body + "\r\n\r\n").getBytes("UTF-8")
    writeArchive(s"$dir/a.warc", Seq(bad, good), gzip = false)
    val rows = WarcReader.recordsFramed(spark, s"$dir/a.warc")
      .orderBy("target_uri").select("target_uri", "payload", "frame_ok")
      .as[(String, String, Boolean)].collect().toSeq
    assert(rows.map(_._1) ==
      Seq("https://g.test/bad", "https://g.test/good"),
      "resync recovers the stream: the record AFTER the liar still parses")
    assert(!rows(0)._3 && rows(1)._3,
      "the mis-declared record is flagged, the clean one is not")
    assert(rows(0)._2.contains("liar liar page"),
      "resync keeps the over-length payload bytes")
  }

  test("WarcWriter: distributed archive sink round-trips through the framed reader") {
    val dir = Files.createTempDirectory("graft-warc-writer").toString
    val pages = spark.range(0, 20).select(
      concat(lit("https://g.test/p/"), col("id")).as("uri"),
      concat(lit("<p>page body number "), col("id"), lit(" é</p>")).as("body"),
      when(col("id") % 2 === 0, "1.0").otherwise("1.1").as("warc_version"),
      lit("text/html; charset=iso-8859-1").as("content_type"),
      lit("ISO-8859-1").as("charset"))
      .repartition(4) // several tasks → several archives
    graft.io.WarcWriter.writeArchives(pages, "uri", "body", s"$dir/gz")
    graft.io.WarcWriter.writeArchives(pages, "uri", "body", s"$dir/raw", gzip = false)
    def canon(path: String) = WarcReader.recordsFramed(spark, path)
      .select("target_uri", "warc_version", "payload", "frame_ok")
      .as[(String, String, String, Boolean)].collect().sortBy(_._1).toSeq
    val gz = canon(s"$dir/gz")
    assert(gz.size == 20 && gz.forall(_._4), "all framed clean")
    assert(gz == canon(s"$dir/raw"), "gzip members ≡ raw archive")
    val p7 = gz.find(_._1 == "https://g.test/p/7").get
    assert(p7._2 == "1.1" && p7._3 == "<p>page body number 7 é</p>",
      "per-row version + latin-1 byte-exact Content-Length round-trip")
    assert(new java.io.File(s"$dir/gz").listFiles().count(_.getName.endsWith(".warc.gz")) > 1,
      "one archive per non-empty partition")
  }

  test("framed streaming: arriving gz archives parse identically to batch") {
    val dir = Files.createTempDirectory("graft-warc-fstream").toString
    val in = s"$dir/in"; new java.io.File(in).mkdirs()
    def rec(i: Int) = WarcFraming.responseRecordBytes(s"https://g.test/$i",
      s"<p>streamed page $i</p>", "1.0", "text/html", "UTF-8")
    writeArchive(s"$in/w1.warc.gz", Seq(rec(1), rec(2)), gzip = true)
    val buf = scala.collection.mutable.ListBuffer.empty[(String, String, Boolean)]
    val q = WarcReader.recordsFramedStream(spark, in)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.select("target_uri", "payload", "frame_ok")
          .as[(String, String, Boolean)].collect()
        buf.synchronized { buf ++= rows }; ()
      }.start()
    try {
      q.processAllAvailable()
      writeArchive(s"$in/w2.warc.gz", Seq(rec(3)), gzip = true)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = buf.synchronized(buf.sortBy(_._1).toList)
    val batch = WarcReader.recordsFramed(spark, in)
      .select("target_uri", "payload", "frame_ok")
      .as[(String, String, Boolean)].collect().sortBy(_._1).toList
    assert(streamed == batch && streamed.size == 3,
      "micro-batch boundaries invisible; framing stateless per archive")
  }

  test("marker-split streaming reads .warc.gz archives too (codec layer)") {
    val dir = Files.createTempDirectory("graft-warc-gzstream").toString
    val in = s"$dir/in"; new java.io.File(in).mkdirs()
    val pages = Seq(
      ("https://g.test/1", "<html><body><p>first gz page</p></body></html>"),
      ("https://g.test/2", "<html><body><p>second gz page</p></body></html>"))
    val recs = WarcReader.toWarcRecords(pages.toDF("uri", "html"), "uri", "html")
      .select("value").as[String].collect()
    val fos = new java.io.FileOutputStream(s"$in/a.warc.gz")
    recs.grouped(2).foreach { member =>
      val g = new java.util.zip.GZIPOutputStream(fos)
      g.write(member.mkString("", "\n", "\n").getBytes("UTF-8")); g.finish()
    }
    fos.close()
    val buf = scala.collection.mutable.ListBuffer.empty[String]
    val q = WarcReader.recordsStream(spark, in)
      .where(col("record_type") === "response")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.select("target_uri").as[String].collect()
        buf.synchronized { buf ++= rows }; ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(buf.synchronized(buf.sorted.toList) ==
      List("https://g.test/1", "https://g.test/2"))
  }

  test("WET conversion records: multi-line extracted text round-trips") {
    val dir = Files.createTempDirectory("graft-wet").toString
    val texts = Seq(
      ("https://g.test/1", "first paragraph\nsecond paragraph\nthird"),
      ("https://g.test/2", "single block"))
      .toDF("uri", "txt")
    WarcReader.toWetRecords(texts, "uri", "txt")
      .coalesce(1).write.text(s"$dir/c.wet")
    val recs = WarcReader.records(spark, s"$dir/c.wet").orderBy("target_uri")
    val rows = recs.select("record_type", "content_type", "target_uri",
      "payload", "content_length").collect()
    assert(rows.forall(_.getString(0) == "conversion"))
    assert(rows.forall(_.getString(1) == "text/plain"))
    assert(rows(0).getString(3) == "first paragraph\nsecond paragraph\nthird",
      "interior newlines survive (only the record marker splits)")
    assert(rows(0).getLong(4) == "first paragraph\nsecond paragraph\nthird".length)
    // the back-link to the source response record
    val hdr = WarcReader.toWetRecords(texts, "uri", "txt")
      .select("value").as[String].head()
    assert(hdr.contains("WARC-Refers-To: <urn:graft:https://g.test/"))
  }

  test("plan shape: record splitting is a distributed text scan, parsing is codegen") {
    val dir = Files.createTempDirectory("graft-warc-plan").toString
    Seq(("u", "<html><body><p>x</p></body></html>")).toDF("uri", "html")
      .pipe(df => WarcReader.toWarcRecords(df, "uri", "html"))
      .coalesce(1).write.text(s"$dir/w.warc")
    val plan = WarcReader.records(spark, s"$dir/w.warc")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
    assert(plan.contains("FileScan text"))
  }

  private implicit class Piped[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
