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
