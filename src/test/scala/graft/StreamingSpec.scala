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
