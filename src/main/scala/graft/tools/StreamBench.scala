package graft.tools

import graft.GraftSession
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Streaming ingest throughput: replicate the sf0.1 events into a multi-
  * file directory, then drive the REAL file-source streaming plans
  * (micro-batched via maxFilesPerTrigger) to completion and report
  * rows/sec for (a) watermarked windowed aggregation and (b) stateful
  * sessionization. Run manually:
  *   sbt "runMain graft.tools.StreamBench"
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("stream-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val copies = 5
    val files = 20
    val src = graft.io.Readers
      .parquetNanos(spark, "/root/testdata/sf0.1/events.parquet", Seq("ts"))
    val dir = graft.io.TempDirs.scratch("graft-streambench")
    src.crossJoin(spark.range(copies).withColumnRenamed("id", "__c"))
      .withColumn("event_id", col("event_id") + col("__c") * 100000000L)
      .withColumn("user_id", col("user_id") + col("__c") * 10000000L)
      .drop("__c")
      .repartition(files)
      .write.mode("overwrite").parquet(dir)
    val total = spark.read.parquet(dir).count()
    System.err.println(s"[stream-bench] $total rows in $files files, " +
      s"${files / 4} micro-batches of 4 files")

    def run(label: String)(mk: => (org.apache.spark.sql.DataFrame, String)): Unit = {
      val (streamed, mode) = mk
      val listener = new EventStream.LatenessListener(s"sb_$label")
      spark.streams.addListener(listener)
      val t0 = System.nanoTime()
      try {
        EventStream.runBounded(spark, streamed, s"sb_$label", mode)
        val sec = (System.nanoTime() - t0) / 1e9
        listener.awaitBatches(1)
        System.err.println(f"[stream-bench] $label: $sec%.1fs, ${total / sec}%.0f rows/s" +
          s" | observed ${listener.totalRows} rows in ${listener.batches.size} batches," +
          s" dropped-by-watermark ${listener.totalDropped}")
      } finally spark.streams.removeListener(listener)
    }

    // the replicated files are unordered in event time, so per-batch
    // watermark advance makes late arrivals REAL here — the lateness
    // counters report how many rows the append-mode agg discarded
    run("windowed_agg") {
      (EventStream.hourlyByType(EventStream.observeInput(
        EventStream.readEvents(spark, dir, maxFilesPerTrigger = 4))),
        "complete")
    }
    run("windowed_agg_append") {
      (EventStream.hourlyByType(EventStream.observeInput(
        EventStream.readEvents(spark, dir, maxFilesPerTrigger = 4))),
        "append")
    }
    run("sessionize") {
      (EventStream.sessionize(spark,
        EventStream.observeInput(EventStream.readEvents(spark, dir, maxFilesPerTrigger = 4)),
        gapMs = 30L * 60 * 1000).toDF(), "append")
    }
    run("sessionize_tws") {
      (EventStream.sessionizeTws(spark,
        EventStream.observeInput(EventStream.readEvents(spark, dir, maxFilesPerTrigger = 4)),
        gapMs = 30L * 60 * 1000).toDF(), "append")
    }
    spark.stop()
  }
}
