package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming surface.
  *
  * The reference is batch-only (SURVEY.md §1.1); streaming here is the
  * engine extension for continuous ingest at scale: file-source streams
  * over the same parquet layout, watermarked windowed aggregation,
  * stream dedup, and stateful sessionization via
  * `flatMapGroupsWithState`. Each transform is defined against a plain
  * DataFrame so the identical code path serves batch ("replay") and
  * streaming — the Structured Streaming contract.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** File-source stream over a parquet directory (one file = one micro-batch
    * unit; maxFilesPerTrigger bounds batch size for steady-state latency). */
  def readEvents(spark: SparkSession, path: String, maxFilesPerTrigger: Int = 8): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Streaming read of the test events in whatever timestamp encoding
    * the producer chose — probed with one batch schema read, then the
    * matching conversion (the streaming twin of
    * graft.io.Readers.parquetNanos):
    * TIMESTAMP(NANOS) → nanos-as-long + exact `div` conversion;
    * TIMESTAMP(MICROS, ntz) → cast to TIMESTAMP (session tz is UTC);
    * TIMESTAMP → pass through. */
  def readEventsNanos(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val probed = spark.read.parquet(path).schema("ts").dataType
    def schemaWithTs(dt: org.apache.spark.sql.types.DataType) =
      StructType(eventSchema.fields.map {
        case StructField("ts", _, n, m) => StructField("ts", dt, n, m)
        case f                          => f
      })
    // FileStreamSource insists on a directory unless the path globs; wrap a
    // plain file path in a brace-glob so single-file test tables stream too.
    val globbed =
      if (path.exists("*?[{".contains(_))) path
      else path.lastIndexOf('/') match {
        case -1 => s"{$path}" // bare relative filename
        case i  => s"${path.substring(0, i)}/{${path.substring(i + 1)}}"
      }
    probed match {
      case LongType =>
        spark.readStream.schema(schemaWithTs(LongType)).parquet(globbed)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        spark.readStream.schema(schemaWithTs(
            org.apache.spark.sql.types.TimestampNTZType)).parquet(globbed)
          .withColumn("ts", col("ts").cast(TimestampType))
      case _ =>
        spark.readStream.schema(eventSchema).parquet(globbed)
    }
  }

  /** Run a streaming transform over a bounded file source to completion and
    * return the materialized result (memory sink). The streaming plan is
    * the same one a live deployment runs; on bounded input it must agree
    * with the batch twin — which the oracle gate checks. */
  def runBounded(spark: SparkSession, streamed: DataFrame, sinkName: String,
                 outputMode: String = "complete"): DataFrame = {
    val q = streamed.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(sinkName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(sinkName)
  }

  /** Run a streaming transform with `Trigger.AvailableNow`: process
    * everything available in rate-limited micro-batches, then stop — the
    * production pattern for periodic drain jobs (cron-scheduled catch-up
    * with streaming-exactly-once semantics, without a resident cluster).
    * Unlike [[runBounded]]'s processAllAvailable (a test-driver wait), the
    * trigger itself terminates the query. */
  def runAvailableNow(spark: SparkSession, streamed: DataFrame, sinkName: String,
                      outputMode: String = "complete"): DataFrame = {
    val q = streamed.writeStream
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory")
      .queryName(sinkName)
      .start()
    q.awaitTermination()
    spark.table(sinkName)
  }

  /** Per-micro-batch input observability, computed inline with the batch by
    * `Dataset.observe` (no second pass over the data): row count and the
    * batch's event-time bounds. Pair with a [[LatenessListener]] — the
    * observed metrics arrive on the same progress event that carries the
    * watermark the batch ran against and the stateful operators'
    * `numRowsDroppedByWatermark`, the authoritative count of late rows the
    * engine actually discarded. */
  def observeInput(events: DataFrame, name: String = "graft_input"): DataFrame =
    events.observe(name,
      count(lit(1)).as("n_rows"),
      min(col("ts")).as("min_ts"),
      max(col("ts")).as("max_ts"))

  /** One micro-batch's lateness picture: what came in (observed), the
    * watermark it was judged against, and how many rows the stateful
    * operators dropped as too late. */
  final case class BatchLateness(
      batchId: Long, nRows: Long, minTs: String, maxTs: String,
      watermark: String, droppedByWatermark: Long)

  /** Collects [[BatchLateness]] per progress event for queries named
    * `queryName` (listeners are session-global; the name filter keeps
    * concurrent queries out). Register via `spark.streams.addListener`,
    * remove when done. Progress events are asynchronous — use
    * [[awaitBatches]] after draining a bounded query. */
  final class LatenessListener(queryName: String,
      observationName: String = "graft_input")
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val buf = scala.collection.mutable.ArrayBuffer.empty[BatchLateness]

    def batches: Seq[BatchLateness] = buf.synchronized(buf.toVector)
    def totalDropped: Long = batches.map(_.droppedByWatermark).sum
    def totalRows: Long = batches.map(_.nRows).sum

    /** Wait (bounded) until at least `n` batches with rows have reported. */
    def awaitBatches(n: Int, timeoutMs: Long = 30000): Boolean = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (batches.count(_.nRows > 0) < n && System.nanoTime() < deadline)
        Thread.sleep(50)
      batches.count(_.nRows > 0) >= n
    }

    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      if (p.name == queryName) {
        val obs = Option(p.observedMetrics.get(observationName))
        val entry = BatchLateness(
          p.batchId,
          obs.map(_.getAs[Long]("n_rows")).getOrElse(0L),
          obs.map(r => String.valueOf(r.getAs[Any]("min_ts"))).orNull,
          obs.map(r => String.valueOf(r.getAs[Any]("max_ts"))).orNull,
          p.eventTime.get("watermark"),
          p.stateOperators.map(_.numRowsDroppedByWatermark).sum)
        buf.synchronized { buf += entry }
      }
    }
  }

  /** Watermarked tumbling-window counts per event type. Works identically on
    * batch and streaming inputs. */
  def hourlyByType(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Stream dedup on event_id within the watermark horizon. */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id", "ts")

  /** Stream-stream time-interval join: each click joins the same user's
    * views no older than `horizonMin` minutes. Both sides carry watermarks
    * and the join condition bounds event-time distance, so Spark can expire
    * join state — the state store holds only `watermark + horizon` worth of
    * rows per side, which is what makes this viable on an unbounded stream.
    * Inputs must expose (view_user, view_id, view_ts) / (click_user,
    * click_id, click_ts). */
  def viewClickJoin(views: DataFrame, clicks: DataFrame, horizonMin: Int,
                    watermark: String = "1 hour"): DataFrame =
    views.withWatermark("view_ts", watermark).join(
      clicks.withWatermark("click_ts", watermark),
      expr(s"""view_user = click_user
              | AND click_ts >= view_ts
              | AND click_ts <= view_ts + interval $horizonMin minutes""".stripMargin))

  final case class SessionUpdate(user_id: Long, session_start: java.sql.Timestamp,
                                 session_end: java.sql.Timestamp, n_events: Int)
  // not `private`: the state encoder's generated code needs public accessors
  final case class SessionState(start: Long, last: Long, n: Int)

  /** Gap-based sessionization: a session closes after `gapMs` of user
    * inactivity. Custom state via flatMapGroupsWithState — the canonical
    * "operator Spark lacks as a builtin" example. */
  def sessionize(spark: SparkSession, events: DataFrame, gapMs: Long): Dataset[SessionUpdate] = {
    import spark.implicits._
    val typed = events.select(col("user_id"), col("ts")).as[(Long, java.sql.Timestamp)]
    typed.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (user: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[SessionState]) =>
        val sorted = rows.map(_._2.getTime).toSeq.sorted
        var sessions = Vector.empty[SessionUpdate]
        var cur = state.getOption
        sorted.foreach { t =>
          cur match {
            case Some(s) if t - s.last <= gapMs =>
              cur = Some(s.copy(last = t, n = s.n + 1))
            case Some(s) =>
              sessions :+= SessionUpdate(user, new java.sql.Timestamp(s.start),
                new java.sql.Timestamp(s.last), s.n)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach(state.update)
        sessions.iterator
    }
  }

  /** Gap-based sessionization on Spark 4's arbitrary-state API
    * (`transformWithState` + `StatefulProcessor`): same semantics as
    * [[sessionize]] — the two run against the same oracle, which pins
    * their equivalence. The new API's value at scale: typed composable
    * state (value/list/map + TTL + timers) on the RocksDB store, so
    * per-key state spills off-heap instead of living in executor heap. */
  final class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp), SessionUpdate] {
    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        timers: TimerValues): Iterator[SessionUpdate] = {
      val sorted = rows.map(_._2.getTime).toSeq.sorted
      var out = Vector.empty[SessionUpdate]
      var cur = if (session.exists()) Option(session.get()) else None
      sorted.foreach { t =>
        cur match {
          case Some(s) if t - s.last <= gapMs =>
            cur = Some(s.copy(last = t, n = s.n + 1))
          case Some(s) =>
            out :+= SessionUpdate(user, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach(session.update)
      out.iterator
    }
  }

  /** [[sessionize]] expressed through `transformWithState`. The operator
    * only runs on the RocksDB state store provider — set before the query
    * starts. */
  def sessionizeTws(spark: SparkSession, events: DataFrame, gapMs: Long): Dataset[SessionUpdate] = {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val typed = events.select(col("user_id"), col("ts")).as[(Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .transformWithState(new SessionProcessor(gapMs), TimeMode.None(), OutputMode.Append())
  }
}
