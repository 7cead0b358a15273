package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Real multimodal decoders, checked byte-for-byte against hand-built
  * fixture payloads: binary PPM (P6) per the Netpbm layout and
  * zlib-compressed float64 tensor frames, with the deterministic
  * byte-histogram fallback for everything else.
  */
class MultimodalDecodeSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  // 2x2 P6 image, maxval 255: pixels (R,G,B) =
  // (10,20,30) (40,50,60) / (70,80,90) (200,210,220)
  private val ppmPixels = Array[Int](
    10, 20, 30, 40, 50, 60, 70, 80, 90, 200, 210, 220)
  private def ppmBytes(header: String = "P6\n2 2\n255\n"): Array[Byte] =
    header.getBytes("US-ASCII") ++ ppmPixels.map(_.toByte)

  private def tensorBytes(rows: Int, cols: Int, vs: Array[Double]): Array[Byte] = {
    val raw = java.nio.ByteBuffer.allocate(vs.length * 8)
    vs.foreach(raw.putDouble)
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.array()); defl.finish()
    val buf = new Array[Byte](vs.length * 8 + 64)
    val n = defl.deflate(buf); defl.end()
    val head = java.nio.ByteBuffer.allocate(12)
    head.put("GZT1".getBytes("US-ASCII")).putInt(rows).putInt(cols)
    head.array() ++ buf.take(n)
  }

  test("P6 PPM decodes byte-for-byte: dims, per-channel means, byte sum") {
    val d = Multimodal.decodePpm(7L, ppmBytes()).get
    assert(d.width == 2 && d.height == 2)
    assert(d.byte_sum == ppmPixels.sum) // raster bytes only
    assert(d.n_bytes == ppmBytes().length)
    // channel means: R (10+40+70+200)/4, G (20+50+80+210)/4, B (30+60+90+220)/4
    assert(d.features.toSeq == Seq(80.0, 90.0, 100.0, 255.0))
  }

  test("PPM header comments and alternate whitespace parse") {
    val d = Multimodal.decodePpm(1L,
      ppmBytes("P6 # a comment\n# another\n 2\t2 # dims\n255 ")).get
    assert(d.width == 2 && d.height == 2 && d.features(0) == 80.0)
  }

  test("truncated or malformed PPM falls back to the histogram decode") {
    val bad = ppmBytes().dropRight(1) // raster one byte short
    assert(Multimodal.decodePpm(1L, bad).isEmpty)
    val d = Multimodal.decodeOne(1L, bad)
    assert(d.features.length == 4 && d.width == (16 + d.byte_sum % 16).toInt)
  }

  test("zlib tensor frame inflates to exact stats") {
    val vs = Array(1.5, -2.0, 3.0, 0.5)
    val d = Multimodal.decodeTensor(9L, tensorBytes(2, 2, vs)).get
    assert(d.width == 2 && d.height == 2)
    assert(d.features(0) == -2.0 && d.features(1) == 3.0)
    assert(d.features(2) == vs.sum / 4)
    assert(d.features(3) == math.sqrt(vs.map(v => v * v).sum))
    // corrupt stream -> fallback, not a crash
    val broken = tensorBytes(2, 2, vs).updated(20, 0x55.toByte)
    assert(Multimodal.decodeTensor(9L, broken).isEmpty
      || Multimodal.decodeTensor(9L, broken).isDefined) // no exception is the assertion
  }

  // minimal stereo PCM-16 WAV: samples per channel interleaved L,R
  private def wavBytes(rate: Int, samples: Array[Short], channels: Int,
      extraChunk: Boolean = false): Array[Byte] = {
    val dataLen = samples.length * 2
    val extra = if (extraChunk) 8 + 4 else 0 // "LIST" chunk of 4 bytes
    val bb = java.nio.ByteBuffer.allocate(44 + extra + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + extra + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    if (extraChunk) // unknown chunk before fmt: the walker must skip it
      bb.put("LIST".getBytes("US-ASCII")).putInt(4).putInt(0)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("PCM-16 WAV decodes: channels, frames, rms/peak stats, chunk skip") {
    val samples = Array[Short](16384, -16384, 32767, 0) // L R L R
    for (extra <- Seq(false, true)) {
      val d = Multimodal.decodeWav(5L, wavBytes(8000, samples, 2, extra)).get
      assert(d.width == 2 && d.height == 2) // 2 channels x 2 frames
      val norm = samples.map(_ / 32768.0)
      assert(math.abs(d.features(0) -
        math.sqrt(norm.map(v => v * v).sum / 4)) < 1e-12)
      assert(d.features(1) == 32767.0 / 32768.0)
      assert(math.abs(d.features(2) - norm.map(math.abs).sum / 4) < 1e-12)
      assert(d.features(3) == 8000.0)
    }
    // 8-bit or float WAVs reject to the fallback rather than mis-decode
    val bad = wavBytes(8000, samples, 2)
    bad(34) = 8 // bits-per-sample LSB
    assert(Multimodal.decodeWav(5L, bad).isEmpty)
    assert(Multimodal.decodeOne(5L, bad).features.length == 4) // fallback
  }

  test("nearest-neighbor PPM resize emits valid P6 with the right pixels") {
    // 2x2 -> 1x1 keeps pixel (0,0); 2x2 -> 4x4 maps (x,y) -> (x/2, y/2)
    val one = Multimodal.resizePpm(ppmBytes(), 1, 1).get
    val d1 = Multimodal.decodePpm(0L, one).get
    assert(d1.width == 1 && d1.height == 1)
    assert(d1.features.toSeq == Seq(10.0, 20.0, 30.0, 255.0))
    val four = Multimodal.resizePpm(ppmBytes(), 4, 4).get
    val d4 = Multimodal.decodePpm(0L, four).get
    assert(d4.width == 4 && d4.height == 4)
    // each source pixel replicated 2x2 -> channel means unchanged
    assert(d4.features.toSeq == Seq(80.0, 90.0, 100.0, 255.0))
    assert(Multimodal.resizePpm("nope".getBytes, 2, 2).isEmpty)
    assert(Multimodal.resizePpm(ppmBytes(), 0, 2).isEmpty)
  }

  test("tensor frame-sample keeps every k-th frame, re-emitted as valid GZT1") {
    val vs = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0) // 4 frames x 2
    val sampled = Multimodal.sampleTensorFrames(tensorBytes(4, 2, vs), 2).get
    val d = Multimodal.decodeTensor(0L, sampled).get
    assert(d.height == 2 && d.width == 2) // frames 0 and 2 kept
    val kept = Array(1.0, 2.0, 5.0, 6.0)
    assert(d.features(0) == 1.0 && d.features(1) == 6.0)
    assert(d.features(2) == kept.sum / 4)
    assert(d.features(3) == math.sqrt(kept.map(v => v * v).sum))
    // stride 1 round-trips to identical stats
    val same = Multimodal.sampleTensorFrames(tensorBytes(4, 2, vs), 1).get
    assert(Multimodal.decodeTensor(0L, same).get.features.toSeq ==
      Multimodal.decodeTensor(0L, tensorBytes(4, 2, vs)).get.features.toSeq)
    assert(Multimodal.sampleTensorFrames(ppmBytes(), 2).isEmpty)
  }

  test("resize and frameSample transform matching payloads in a DataFrame, pass others") {
    val rows = Seq(
      (1L, ppmBytes()),
      (2L, tensorBytes(4, 2, Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0))),
      (3L, "plain text".getBytes("UTF-8")))
    val df = rows.toDF("doc_id", "payload")
    val resized = Multimodal.decode(Multimodal.resize(df, 1, 1))
      .orderBy("doc_id").collect()
    assert(resized(0).getInt(resized(0).fieldIndex("width")) == 1) // PPM resized
    assert(resized(1).getInt(resized(1).fieldIndex("height")) == 4) // tensor untouched
    val sampled = Multimodal.decode(Multimodal.frameSample(df, 2))
      .orderBy("doc_id").collect()
    assert(sampled(0).getInt(sampled(0).fieldIndex("width")) == 2) // PPM untouched
    assert(sampled(1).getInt(sampled(1).fieldIndex("height")) == 2) // 4 -> 2 frames
    // passthrough payload byte-identical (same fallback byte_sum)
    val sum = "plain text".getBytes("UTF-8").map(_ & 0xff).sum
    assert(sampled(2).getLong(sampled(2).fieldIndex("byte_sum")) == sum)
  }

  test("decode dispatches per payload inside one DataFrame") {
    val rows = Seq(
      (1L, ppmBytes()),
      (2L, tensorBytes(1, 3, Array(2.0, 4.0, 6.0))),
      (3L, "just some text".getBytes("UTF-8")))
    val df = rows.toDF("doc_id", "payload")
    val out = Multimodal.decode(df).orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getInt(out(0).fieldIndex("width")) == 2) // PPM
    assert(out(1).getInt(out(1).fieldIndex("height")) == 1) // tensor rows
    assert(out(1).getSeq[Double](out(1).fieldIndex("features")) ==
      Seq(2.0, 6.0, 4.0, math.sqrt(4 + 16 + 36)))
    // text payload takes the fallback path deterministically
    val sum = "just some text".getBytes("UTF-8").map(_ & 0xff).sum
    assert(out(2).getLong(out(2).fieldIndex("byte_sum")) == sum)
  }

  test("a shared Codecs instance survives corrupt streams and many resets") {
    // per-task codec reuse is only sound if a failed inflate leaves the
    // shared inflater reusable and repeated reset cycles stay bit-exact
    val c = new Multimodal.Codecs
    val good = tensorBytes(2, 2, Array(1.0, 2.0, 3.0, 4.0))
    val corrupt = good.take(16) ++ Array.fill[Byte](8)(0x55)
    try {
      val first = Multimodal.decodeTensor(0L, good, c).get
      assert(Multimodal.decodeTensor(1L, corrupt, c).isEmpty)
      (1 to 50).foreach { i =>
        val again = Multimodal.decodeTensor(i.toLong, good, c).get
        assert(again.features.toSeq == first.features.toSeq)
        val sampled = Multimodal.sampleTensorFrames(good, 2, c).get
        assert(Multimodal.decodeTensor(0L, sampled, c).get.height == 1)
      }
    } finally c.close()
  }
}
