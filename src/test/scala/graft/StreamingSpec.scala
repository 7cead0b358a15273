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
