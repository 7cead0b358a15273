package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (SURVEY.md §7.5, §2.10): the glider/events
  * time-series is naturally an append-only stream. The same transformations
  * run identically over a batch DataFrame and a readStream DataFrame —
  * Spark's unified API — so the batch driver oracle checks the exact code
  * the streaming path executes.
  */
object StreamingOps {

  /** events.ts arrives as BIGINT nanoseconds (parquet TIMESTAMP(NANOS)
    * behind the legacy conf); expose a microsecond TimestampType for
    * watermarks/windows.
    */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Tumbling-window counts + sums per event type, 10-minute watermark.
    * Works on both batch and streaming inputs unchanged.
    */
  def tumblingStats(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100)).cast("long").as("sum_cents"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("sum_cents"))

  final case class SessionInput(user_id: Long, ts_us: Long, value: Double)
  final case class SessionSummary(user_id: Long, n_events: Long, total: Double, closed: Boolean)
  private final case class SessionState(n: Long, total: Double)

  /** Stateful sessionization per user via mapGroupsWithState: accumulates
    * per-user event counts/totals with a processing-time timeout — the
    * KeyValueGroupedDataset custom-state surface (SURVEY.md §2.10).
    */
  def sessionize(events: Dataset[SessionInput]): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, rows: Iterator[SessionInput], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionSummary(user, s.n, s.total, closed = true)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0))
            var n = prev.n; var total = prev.total
            rows.foreach { r => n += 1; total += r.value }
            state.update(SessionState(n, total))
            state.setTimeoutDuration("30 seconds")
            SessionSummary(user, n, total, closed = false)
          }
      }
  }

  // event_time must ride along in the typed row: the watermark attaches to
  // that attribute, and projecting it away before the stateful operator
  // would strip the watermark the event-time timeout needs
  final case class GliderPing(profile_number: Double, time_us: Long,
      pressure: Double, event_time: java.sql.Timestamp)
  final case class ProfileSummary(profile_number: Double, n_pings: Long,
      max_pressure: Double, t_start_us: Long, t_end_us: Long)
  /** Open-profile accumulator (public: the state encoder's generated code
    * constructs and reads it from outside this object).
    */
  final case class ProfileState(nPings: Long, maxPressure: Double,
      tMin: Long, tMax: Long)

  /** Streaming per-profile summaries for live glider telemetry — the
    * streaming analog of the batch pipeline's per-profile aggregations
    * (max depth, ping count, time span). A profile is an open session
    * keyed by profile_number; it closes and emits exactly once when the
    * event-time watermark passes the last ping plus `gap` — i.e. when the
    * glider has demonstrably moved on. flatMapGroupsWithState +
    * EventTimeTimeout keeps state bounded: one small struct per OPEN
    * profile, closed profiles leave state immediately.
    *
    * Input must already carry a watermark on `eventTimeCol` (the caller
    * sets `withWatermark` so the delay is chosen where the source skew is
    * known).
    */
  def profileSummaries(pings: Dataset[GliderPing], gapSeconds: Long = 300):
      Dataset[ProfileSummary] = {
    import pings.sparkSession.implicits._
    pings
      .groupByKey(_.profile_number)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (profile: Double, rows: Iterator[GliderPing],
            state: GroupState[ProfileState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ProfileSummary(profile, s.nPings, s.maxPressure,
              s.tMin, s.tMax))
          } else {
            val prev = state.getOption.getOrElse(
              ProfileState(0L, Double.MinValue, Long.MaxValue, Long.MinValue))
            var (n, maxP, lo, hi) =
              (prev.nPings, prev.maxPressure, prev.tMin, prev.tMax)
            rows.foreach { p =>
              n += 1; maxP = math.max(maxP, p.pressure)
              lo = math.min(lo, p.time_us); hi = math.max(hi, p.time_us)
            }
            state.update(ProfileState(n, maxP, lo, hi))
            // close once the watermark passes the profile's last ping + gap
            state.setTimeoutTimestamp(hi / 1000L + gapSeconds * 1000L)
            Iterator.empty
          }
      }
  }

  /** Streaming exact dedup for a continuously-ingested document stream:
    * content-hash each row, then `dropDuplicatesWithinWatermark` keeps the
    * first arrival of each hash and expires dedup state once the watermark
    * passes — bounded state, unlike a plain `dropDuplicates` whose state
    * grows with the whole corpus. The batch twin of this operator is
    * [[graft.operators.Dedup.exact]]; the hash arithmetic
    * ([[graft.functions.Text.hash48Builtin]]) is identical, so a streaming
    * ingest and a batch backfill dedupe against the same keys.
    */
  def dedupStream(docs: DataFrame, textCol: String, eventTimeCol: String,
      watermark: String = "10 minutes"): DataFrame =
    docs.withColumn("__key_hash", graft.functions.Text.hash48Builtin(col(textCol)))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("__key_hash")
      .drop("__key_hash")

  /** Run a streaming query over a parquet directory to a memory sink and
    * block until all available input is processed (local smoke harness).
    */
  def runToMemory(spark: SparkSession, inputDir: String, queryName: String,
      transform: DataFrame => DataFrame, outputMode: OutputMode): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(inputDir).schema
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val q = transform(stream).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
