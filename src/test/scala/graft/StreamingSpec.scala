package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps

class StreamingSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("streaming tumbling stats equal the batch run of the same transform") {
    // file-stream sources need a directory; stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val streamed = StreamingOps.runToMemory(spark, dir, "tumbling_test",
      df => StreamingOps.tumblingStats(df), OutputMode.Append())
    val batch = StreamingOps.tumblingStats(
      graft.queries.Common.events(spark, "/root/testdata/sf0.001").drop("ts_us"))
    // append mode emits only watermark-closed windows; every emitted row
    // must match the batch result exactly
    val b = batch.collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val s = streamed.collect()
    assert(s.length > 100, s"expected many closed windows, got ${s.length}")
    s.foreach { r =>
      val key = (r.getLong(0), r.getString(1))
      assert(b.contains(key), s"streamed window $key missing from batch")
      assert(b(key) == ((r.getLong(2), r.getLong(3))), s"mismatch at $key")
    }
  }

  test("watermarkDelayMs surfaces the gap-equivalence precondition") {
    // the gapSessionsStream misconfiguration warning keys off this helper:
    // it must read the configured delay off a streaming plan and stay None
    // when no watermark is attached
    val dir = java.nio.file.Files.createTempDirectory("graft-wmdelay-")
      .toString + "/events"
    spark.range(3).select(col("id").as("user_id"),
        (col("id") * 1000000L).as("ts_us"), lit(1.0).as("value"),
        timestamp_micros(col("id")).as("event_time"))
      .write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    assert(StreamingOps.watermarkDelayMs(stream).isEmpty)
    val wm = stream.withWatermark("event_time", "10 minutes")
    assert(StreamingOps.watermarkDelayMs(wm) == Some(600000L))
  }

  test("streaming q38 in complete mode equals the batch driver query exactly") {
    // the unified-API claim, proven: the EXACT driver-contract q38 result
    // (oracle-checked against DuckDB) reproduced by the same transform
    // running as a streaming query. Complete mode emits every window, so
    // equality is total, not just over watermark-closed windows.
    val sf = "/root/testdata/sf0.01"
    val dir = java.nio.file.Files.createTempDirectory("graft-q38-stream-").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val streamed = StreamingOps.runToMemory(spark, dir, "q38_stream",
      df => StreamingOps.tumblingStats(df), OutputMode.Complete())
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val s = key(streamed)
    val b = key(SparkEntry.queries("q38_tumbling_window")(spark, sf))
    assert(b.nonEmpty && s == b,
      s"streaming/batch divergence: ${(s diff b).size} extra, ${(b diff s).size} missing")
  }

  test("streaming dedup keeps one row per content hash within the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream-").toString
    // 3 distinct texts over 9 rows, all inside one watermark window
    val rows = (0 until 9).map { i =>
      (i.toLong, s"doc text ${i % 3}",
        new java.sql.Timestamp(1700000000000L + i * 1000L))
    }
    spark.createDataFrame(rows).toDF("doc_id", "text", "event_time")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val streamed = StreamingOps.runToMemory(spark, dir, "dedup_test",
      df => StreamingOps.dedupStream(df, "text", "event_time"),
      OutputMode.Append())
    val kept = streamed.select("text").collect().map(_.getString(0)).sorted
    assert(kept.length == 3, s"expected 3 survivors, got ${kept.length}")
    assert(kept.toSeq == Seq("doc text 0", "doc text 1", "doc text 2"))
    // survivors are the FIRST arrival of each hash
    val ids = streamed.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(0L, 1L, 2L))
  }

  test("streaming profile summaries close on event-time gap") {
    import StreamingOps.{GliderPing, ProfileSummary}
    val dir = java.nio.file.Files.createTempDirectory("graft-profile-stream-")
    val base = 1700000000000000L // us
    def writeBatch(name: String, rows: Seq[(Double, Long, Double)]): Unit =
      rows.toDF("profile_number", "time_us", "pressure")
        .coalesce(1).write.parquet(s"$dir/$name")
    // batch 1: profiles 0 and 1 (interleaved pings, 1 s apart)
    writeBatch("b1", Seq(
      (0.0, base, 5.0), (0.0, base + 1000000L, 15.0),
      (1.0, base + 2000000L, 7.0), (1.0, base + 3000000L, 3.0)))
    // batch 2: profile 2 far later -> watermark passes 0/1 + gap
    writeBatch("b2", Seq((2.0, base + 3600L * 1000000L, 9.0)))
    // batch 3: another later ping so the timeout actually fires
    writeBatch("b3", Seq((2.0, base + 7200L * 1000000L, 11.0)))

    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/{b1,b2,b3}")
    val summaries = {
      import spark.implicits._
      val typed = stream
        .withColumn("event_time", timestamp_micros(col("time_us")))
        .withWatermark("event_time", "10 seconds")
        .select("profile_number", "time_us", "pressure", "event_time")
        .as[GliderPing]
      StreamingOps.profileSummaries(typed, gapSeconds = 60)
    }
    val q = summaries.writeStream
      .outputMode("append").format("memory").queryName("profiles_test").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("profiles_test").collect()
      .map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    // profiles 0 and 1 closed; profile 2 still open (no later watermark)
    assert(got.keySet == Set(0.0, 1.0), s"closed profiles: ${got.keySet}")
    assert(got(0.0) == ((2L, 15.0, base, base + 1000000L)))
    assert(got(1.0) == ((2L, 7.0, base + 2000000L, base + 3000000L)))
    // the q66 equivalence: every watermark-closed profile must be
    // bit-identical to the batch twin's row over the same pings
    val batch = StreamingOps.profileSummariesBatch(
        spark.read.parquet(s"$dir/b1", s"$dir/b2", s"$dir/b3"))
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    got.foreach { case (profile, row) =>
      assert(batch(profile) == row,
        s"stream/batch divergence on closed profile $profile")
    }
  }

  test("streaming dedup equals the q67 batch twin under an in-order feed") {
    // dedupStream keeps the first PROCESSING arrival; the batch twin keeps
    // min (ts, id). They coincide exactly when micro-batches arrive in
    // event-time order — feed one file per trigger, ascending ts, each
    // hash at most once per file, and require row-level equality
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-eq-")
    val base = 1700000000000L // ms
    def writeBatch(name: String, rows: Seq[(Long, String, Long)]): Unit =
      rows.map { case (id, text, ms) =>
        (id, text, new java.sql.Timestamp(ms)) }
        .toDF("doc_id", "text", "event_time")
        .coalesce(1).write.parquet(s"$dir/$name")
    writeBatch("b1", Seq((10L, "alpha", base), (11L, "beta", base + 1000)))
    writeBatch("b2", Seq((5L, "alpha", base + 2000), (12L, "gamma", base + 3000)))
    writeBatch("b3", Seq((1L, "beta", base + 4000), (2L, "delta", base + 5000)))
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/{b1,b2,b3}")
    val q = StreamingOps.dedupStream(stream, "text", "event_time")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_eq_test").start()
    q.processAllAvailable(); q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val streamed = rows(spark.table("dedup_eq_test"))
    val batch = rows(StreamingOps.dedupFirstArrival(
      spark.read.parquet(s"$dir/b1", s"$dir/b2", s"$dir/b3")
        .withColumn("ts_us", unix_micros(col("event_time"))),
      "text", "ts_us", "doc_id"))
    assert(batch == Set((10L, "alpha"), (11L, "beta"), (12L, "gamma"),
      (2L, "delta")), s"batch twin wrong: $batch")
    assert(streamed == batch,
      s"stream/batch divergence: ${(streamed diff batch)} vs ${(batch diff streamed)}")
  }

  test("streaming gap sessions equal the batch q65 sessionizer on closed sessions") {
    // the q65 equivalence claim: every session the watermark has closed must
    // be bit-identical to the batch (oracle-checked) gap sessionizer's row,
    // and exactly the sessions whose close time the final watermark passed
    // must have been emitted
    val sf = "/root/testdata/sf0.001"
    val gapUs = 43200000000L // 12 h, the q65 constant
    val wmDelayUs = 10L * 60 * 1000000 // 10 minutes
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-stream-").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val streamed = StreamingOps.runToMemory(spark, dir, "sessions_test",
      df => {
        import spark.implicits._
        StreamingOps.gapSessionsStream(
          StreamingOps.withEventTime(df)
            .withWatermark("event_time", "10 minutes")
            .select(col("user_id"),
              graft.queries.Common.tsUs(df).as("ts_us"),
              col("value"), col("event_time"))
            .as[StreamingOps.SessionEvent],
          gapUs).toDF()
      }, OutputMode.Append())
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "n_events", "t_start_us", "t_end_us", "sum_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val batch = StreamingOps.gapSessions(
      graft.queries.Common.events(spark, sf), gapUs)
    // the engine's final watermark: max event time minus the delay; exactly
    // the sessions closed before it (last event + gap < watermark) emit
    val maxTs = graft.queries.Common.events(spark, sf)
      .agg(max(col("ts_us"))).head().getLong(0)
    val expectClosed = key(batch.where(
      col("t_end_us") + gapUs < maxTs - wmDelayUs))
    val got = key(streamed)
    assert(expectClosed.nonEmpty && got == expectClosed,
      s"streaming/batch session divergence: ${(got diff expectClosed).size} extra, " +
        s"${(expectClosed diff got).size} missing of ${expectClosed.size}")
  }

  test("gapSessions assigns tied timestamps deterministically (RANGE frame)") {
    // us-coincident events (the sf1 replica shape: ns jitter floors to the
    // same microsecond) — under a ROWS running sum the tie order decided
    // which tied rows landed in the new session; RANGE hands the whole tie
    // group one id. 3 tied at t=0, then a >12h gap, then 2 tied.
    import spark.implicits._
    val gap = 43200000000L
    val t2 = 50L * 3600 * 1000000
    val ev = Seq((7L, 0L, 1.0), (7L, 0L, 2.0), (7L, 0L, 4.0),
      (7L, t2, 8.0), (7L, t2, 16.0))
      .toDF("user_id", "ts_us", "value")
      .repartition(4) // scramble physical order so ties are genuinely unordered
    val got = StreamingOps.gapSessions(ev, gap)
      .select("session_id", "n_events", "sum_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 3L, 700L), (1L, 2L, 2400L)), s"got $got")
  }

  test("gap session absorbs a cross-batch late row into its start time") {
    // a row older than the open session's first event, arriving one
    // micro-batch later but inside the watermark, must extend the session
    // BACKWARD (t_start_us takes the min) — the batch twin sorts globally
    // and would report the earlier start
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-late-")
    val base = 1700000000000000L // us
    def writeBatch(name: String, rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user_id", "ts_us", "value")
        .coalesce(1).write.parquet(s"$dir/$name")
    writeBatch("b1", Seq((7L, base, 1.0), (7L, base + 60000000L, 1.0)))
    // b2: late row 30 s BEFORE the session start (watermark delay 10 min
    // covers it), plus a fresh row keeping the session open
    writeBatch("b2", Seq((7L, base - 30000000L, 1.0),
      (7L, base + 120000000L, 1.0)))
    // b3: far-future row pushes the watermark past the session's close
    writeBatch("b3", Seq((7L, base + 7200L * 1000000L, 1.0)))
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/{b1,b2,b3}")
    val sessions = {
      import spark.implicits._
      StreamingOps.gapSessionsStream(
        stream.withColumn("event_time", timestamp_micros(col("ts_us")))
          .withWatermark("event_time", "10 minutes")
          .as[StreamingOps.SessionEvent],
        gapUs = 600000000L) // 10 min gap
    }
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("late_sessions_test").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("late_sessions_test")
      .select("user_id", "n_events", "t_start_us", "t_end_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((7L, 4L, base - 30000000L, base + 120000000L)),
      s"expected the late row folded into the session start, got ${got.toSeq}")
  }

  test("a late row beyond the gap becomes its own earlier session, not a merge") {
    // the gapUs < watermark-delay regression: a within-watermark row that
    // precedes the open session's start by MORE than the gap used to be
    // absorbed (the e.ts - tEnd <= gap guard is trivially true for old
    // rows); the batch twin gives it its own earlier session, so the
    // stream must too
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-early-")
    val base = 1700000000000000L // us
    def writeBatch(name: String, rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user_id", "ts_us", "value")
        .coalesce(1).write.parquet(s"$dir/$name")
    val gapUs = 60000000L // 1 min gap << 10 min watermark delay
    writeBatch("b1", Seq((7L, base, 1.0), (7L, base + 30000000L, 2.0)))
    // b2: a row 5 min BEFORE the session start (within watermark, beyond
    // the 1-min gap -> its own earlier session) plus one fresh row inside
    // the gap of the open session
    writeBatch("b2", Seq((7L, base - 300000000L, 4.0),
      (7L, base + 60000000L, 8.0)))
    // b3: far-future row closes everything
    writeBatch("b3", Seq((7L, base + 7200L * 1000000L, 16.0)))
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/{b1,b2,b3}")
    val sessions = {
      import spark.implicits._
      StreamingOps.gapSessionsStream(
        stream.withColumn("event_time", timestamp_micros(col("ts_us")))
          .withWatermark("event_time", "10 minutes")
          .as[StreamingOps.SessionEvent],
        gapUs)
    }
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("early_sessions_test").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("early_sessions_test")
      .select("user_id", "n_events", "t_start_us", "t_end_us", "sum_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // batch semantics: [base-300s] alone; [base, base+30s, base+60s] merged
    assert(got == Set(
      (7L, 1L, base - 300000000L, base - 300000000L, 400L),
      (7L, 3L, base, base + 60000000L, 1100L)),
      s"expected the early row as its own session, got $got")
  }

  test("streaming sessionize converges to the q68 batch totals per user") {
    // the driver-twin claim behind q68: once a user's events drain, the
    // cumulative SessionSummary the stream last emitted equals the batch
    // hash-aggregate — count exactly; the double total to float tolerance
    // (the stream folds in arrival order, the batch in partition order)
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft-q68-stream-").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    // Trigger.Once, not runToMemory: the ProcessingTimeTimeout schedules
    // timeout-evaluation batches forever, so processAllAvailable never
    // settles; one triggered batch ingests the whole file and terminates,
    // and its per-user cumulative emission IS the converged state
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingOps.sessionize(
        stream.select(col("user_id"),
            graft.queries.Common.tsUs(stream).as("ts_us"), col("value"))
          .where(col("value").isNotNull)
          .as[StreamingOps.SessionInput]).toDF()
      .writeStream
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .format("memory").queryName("sessionize_q68_test")
      .start()
    assert(q.awaitTermination(180000), "stream must drain and terminate")
    val streamed = spark.table("sessionize_q68_test")
    val last = streamed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
    val events = graft.queries.Common.events(spark, sf)
      .where(col("value").isNotNull)
    val batch = StreamingOps.sessionTotalsBatch(events)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sums = events.groupBy("user_id").agg(sum("value").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(last.keySet == batch.keySet, "stream must summarize every user")
    last.foreach { case (u, (_, n, total)) =>
      assert(n == batch(u), s"user $u n_events $n != batch ${batch(u)}")
      assert(math.abs(total - sums(u)) <= 1e-6 * math.max(1.0, math.abs(sums(u))),
        s"user $u total $total != batch ${sums(u)}")
    }
  }

  test("stateful sessionization accumulates per-user state") {
    val input = Seq(
      StreamingOps.SessionInput(1L, 1000L, 2.0),
      StreamingOps.SessionInput(1L, 2000L, 3.0),
      StreamingOps.SessionInput(2L, 1500L, 5.0)).toDS()
    val out = StreamingOps.sessionize(input).collect()
      .map(s => s.user_id -> ((s.n_events, s.total))).toMap
    assert(out(1L) == ((2L, 5.0)))
    assert(out(2L) == ((1L, 5.0)))
  }
}
