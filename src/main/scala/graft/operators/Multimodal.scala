package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted partition-wise.
  *
  * Three REAL in-sandbox decoders run by header dispatch — binary PPM (P6)
  * images parsed byte-for-byte from the Netpbm header+raster layout,
  * zlib-compressed float64 tensors ("GZT1" frames) inflated via
  * java.util.zip, and RIFF/WAVE PCM-16 audio (chunk walk + sample
  * statistics) — with the original deterministic byte-histogram decode as
  * the fallback for unrecognized payloads (heavier codecs like JPEG
  * aren't available in this environment; they would slot into the same
  * dispatch). The Spark-side shape is the part that matters at 100 TB:
  * binary schema, struct metadata, a streaming mapPartitions (Spark pulls
  * one row at a time through the iterator, so peak memory per task is one
  * payload — no batch buffering needed or pretended), and typed feature
  * columns out. What IS amortized per task: one shared [[Codecs]] instance
  * (zlib Inflater/Deflater native objects + scratch buffer, reset between
  * payloads) instead of an allocate/free pair per payload.
  */
object Multimodal {

  /** Decoded media record. `features` is decoder-specific:
    * PPM -> [meanR, meanG, meanB, maxval]; tensor -> [min, max, mean, l2];
    * WAV -> [rms, peak, meanAbs, sampleRate]; fallback -> 4-bin byte
    * histogram.
    */
  final case class Decoded(
      doc_id: Long,
      n_bytes: Long,
      byte_sum: Long,
      width: Int,
      height: Int,
      features: Array[Double])

  /** Attach a binary payload + typed metadata struct to a text table —
    * stands in for reading real media blobs alongside scalar columns.
    */
  def attachPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("binary").as("payload"))
      .withColumn("media_meta", struct(
        octet_length(col("payload")).as("n_bytes"),
        lit("fake/raw").as("mime")))

  /** Binary PPM (P6): "P6" magic, whitespace/comment-separated width,
    * height, maxval tokens, ONE whitespace byte, then width*height*3 raw
    * RGB bytes (1 byte/sample for maxval < 256 — the common case; 16-bit
    * samples are rejected to the fallback). Returns None unless the payload
    * parses exactly, trailing-byte check included.
    */
  /** Exact P6 parse: (width, height, maxval, raster offset), or None. */
  private def parsePpm(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b.length < 9 || b(0) != 'P' || b(1) != '6') return None
    var i = 2
    def isWs(c: Byte) = c == ' ' || c == '\n' || c == '\r' || c == '\t'
    // Netpbm header token: skip whitespace and '#'-to-newline comments
    def nextInt(): Long = {
      while (i < b.length && (isWs(b(i)) || b(i) == '#')) {
        if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else i += 1
      }
      var v = -1L
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = (if (v < 0) 0L else v) * 10 + (b(i) - '0'); i += 1
        if (v > Int.MaxValue) return -1L
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val mx = nextInt()
    if (w <= 0 || h <= 0 || mx <= 0 || mx > 255) return None
    if (i >= b.length || !isWs(b(i))) return None
    i += 1 // exactly one whitespace byte after maxval
    if (b.length - i != w * h * 3) return None
    Some((w.toInt, h.toInt, mx.toInt, i))
  }

  def decodePpm(id: Long, b: Array[Byte]): Option[Decoded] =
    parsePpm(b).map { case (w, h, mx, off) =>
      val n = w * h * 3
      var sum = 0L; val ch = new Array[Long](3)
      var j = 0
      while (j < n) {
        val v = b(off + j) & 0xff
        sum += v; ch(j % 3) += v
        j += 1
      }
      val px = (w * h).toDouble
      Decoded(id, b.length.toLong, sum, w, h,
        Array(ch(0) / px, ch(1) / px, ch(2) / px, mx.toDouble))
    }

  /** Nearest-neighbor resize of a P6 payload to newW x newH, emitted as a
    * new valid P6 payload (canonical header) — the "resize" step of a
    * media pipeline, real bytes in and out. None unless the input parses
    * as exact P6.
    */
  def resizePpm(b: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] = {
    if (newW <= 0 || newH <= 0) return None
    parsePpm(b).map { case (w, h, mx, off) =>
      val header = s"P6\n$newW $newH\n$mx\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + newW * newH * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var y = 0; var p = header.length
      while (y < newH) {
        val sy = (y.toLong * h / newH).toInt
        var x = 0
        while (x < newW) {
          val sx = (x.toLong * w / newW).toInt
          val so = off + (sy * w + sx) * 3
          out(p) = b(so); out(p + 1) = b(so + 1); out(p + 2) = b(so + 2)
          p += 3; x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Per-task codec state shared across payloads: the zlib native objects
    * and the deflate scratch buffer are the only per-payload allocations a
    * decode round-trip repeats, so one reset-and-reuse instance per
    * mapPartitions task amortizes them. NOT thread-safe (one per task).
    */
  final class Codecs {
    private val inflater = new java.util.zip.Inflater()
    private val deflater = new java.util.zip.Deflater()
    private val scratch = new Array[Byte](8192)

    /** Inflate b[off..] into exactly out.length bytes; false on any
      * mismatch or corrupt stream. Resets the shared inflater first.
      */
    def inflateExact(b: Array[Byte], off: Int, out: Array[Byte]): Boolean = {
      inflater.reset()
      try {
        inflater.setInput(b, off, b.length - off)
        inflater.inflate(out) == out.length && inflater.finished()
      } catch { case _: java.util.zip.DataFormatException => false }
    }

    /** Deflate data with the shared deflater + scratch buffer. */
    def deflate(data: Array[Byte]): Array[Byte] = {
      deflater.reset()
      deflater.setInput(data); deflater.finish()
      val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      while (!deflater.finished())
        bos.write(scratch, 0, deflater.deflate(scratch))
      bos.toByteArray
    }

    /** Free the native zlib state (for one-shot use outside a task). */
    def close(): Unit = { inflater.end(); deflater.end() }
  }

  /** zlib float64 tensor frame: "GZT1" magic, big-endian int32 rows, cols,
    * then a zlib stream inflating to exactly rows*cols big-endian doubles.
    * Returns None unless magic, inflate, and length all check out.
    */
  def decodeTensor(id: Long, b: Array[Byte]): Option[Decoded] = {
    val c = new Codecs
    try decodeTensor(id, b, c) finally c.close()
  }

  def decodeTensor(id: Long, b: Array[Byte], codecs: Codecs): Option[Decoded] = {
    if (b.length < 14 || b(0) != 'G' || b(1) != 'Z' || b(2) != 'T' || b(3) != '1')
      return None
    val bb = java.nio.ByteBuffer.wrap(b, 4, 8)
    val rows = bb.getInt; val cols = bb.getInt
    if (rows <= 0 || cols <= 0 || rows.toLong * cols > (Int.MaxValue >> 3))
      return None
    val n = rows * cols
    val out = new Array[Byte](n * 8)
    if (!codecs.inflateExact(b, 12, out)) return None
    var sum = 0L; var j = 0
    while (j < out.length) { sum += out(j) & 0xff; j += 1 }
    val db = java.nio.ByteBuffer.wrap(out)
    var mn = Double.PositiveInfinity; var mxv = Double.NegativeInfinity
    var tot = 0.0; var sq = 0.0
    var k = 0
    while (k < n) {
      val v = db.getDouble
      if (v < mn) mn = v
      if (v > mxv) mxv = v
      tot += v; sq += v * v
      k += 1
    }
    Some(Decoded(id, b.length.toLong, sum, cols, rows,
      Array(mn, mxv, tot / n, math.sqrt(sq))))
  }

  /** Every `stride`-th frame of a GZT1 tensor payload (rows = frames),
    * re-deflated as a new valid GZT1 payload — the "frame-sample" step of
    * a video/tensor pipeline, real bytes in and out. None unless the input
    * parses, inflates, and length-checks exactly.
    */
  def sampleTensorFrames(b: Array[Byte], stride: Int): Option[Array[Byte]] = {
    val c = new Codecs
    try sampleTensorFrames(b, stride, c) finally c.close()
  }

  def sampleTensorFrames(b: Array[Byte], stride: Int,
      codecs: Codecs): Option[Array[Byte]] = {
    if (stride < 1) return None
    if (b.length < 14 || b(0) != 'G' || b(1) != 'Z' || b(2) != 'T' || b(3) != '1')
      return None
    val bb = java.nio.ByteBuffer.wrap(b, 4, 8)
    val rows = bb.getInt; val cols = bb.getInt
    if (rows <= 0 || cols <= 0 || rows.toLong * cols > (Int.MaxValue >> 3))
      return None
    val raw = new Array[Byte](rows * cols * 8)
    if (!codecs.inflateExact(b, 12, raw)) return None
    val keptRows = (0 until rows by stride).toArray
    val rowBytes = cols * 8
    val sampled = new Array[Byte](keptRows.length * rowBytes)
    keptRows.zipWithIndex.foreach { case (r, i) =>
      System.arraycopy(raw, r * rowBytes, sampled, i * rowBytes, rowBytes)
    }
    val deflated = codecs.deflate(sampled)
    val head = java.nio.ByteBuffer.allocate(12)
    head.put("GZT1".getBytes("US-ASCII")).putInt(keptRows.length).putInt(cols)
    Some(head.array() ++ deflated)
  }

  /** RIFF/WAVE PCM-16 audio: "RIFF"+"WAVE" magic, chunk walk (unknown
    * chunks skipped with word alignment), a PCM `fmt ` chunk (format 1,
    * 16-bit) and a `data` chunk of interleaved little-endian int16 frames.
    * width = channels, height = frames; features = [rms, peak, meanAbs]
    * normalized to [-1, 1] full scale, plus the sample rate. Anything that
    * doesn't parse exactly falls through to the next decoder.
    */
  def decodeWav(id: Long, b: Array[Byte]): Option[Decoded] = {
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
        b(11) != 'E') return None
    def le32(o: Int): Long = (b(o) & 0xffL) | (b(o + 1) & 0xffL) << 8 |
      (b(o + 2) & 0xffL) << 16 | (b(o + 3) & 0xffL) << 24
    def le16(o: Int): Int = (b(o) & 0xff) | (b(o + 1) & 0xff) << 8
    var i = 12
    var channels = -1; var rate = -1L
    var dataOff = -1; var dataLen = -1
    while (i + 8 <= b.length && (dataOff < 0 || channels < 0)) {
      val sz = le32(i + 4)
      if (sz < 0 || sz > Int.MaxValue || i + 8 + sz > b.length) return None
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (sz < 16) return None
        if (le16(i + 8) != 1 || le16(i + 22) != 16) return None // PCM, 16-bit
        channels = le16(i + 10); rate = le32(i + 12)
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
          b(i + 3) == 'a') {
        dataOff = i + 8; dataLen = sz.toInt
      }
      i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || dataOff < 0 || dataLen <= 0) return None
    val nSamp = dataLen / 2
    if (nSamp == 0 || dataLen % 2 != 0 || nSamp % channels != 0) return None
    var sum = 0L; var j = 0
    while (j < b.length) { sum += b(j) & 0xff; j += 1 }
    var sq = 0.0; var absSum = 0.0; var peak = 0.0
    var k = 0
    while (k < nSamp) {
      val o = dataOff + k * 2
      val s = ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toDouble / 32768.0
      sq += s * s; absSum += math.abs(s)
      if (math.abs(s) > peak) peak = math.abs(s)
      k += 1
    }
    Some(Decoded(id, b.length.toLong, sum, channels, nSamp / channels,
      Array(math.sqrt(sq / nSamp), peak, absSum / nSamp, rate.toDouble)))
  }

  /** Fallback for unrecognized payloads: byte-sum "checksum", 4-bin byte
    * histogram features, dims derived from the checksum — deterministic, so
    * plumbing stays testable for arbitrary bytes.
    */
  private[operators] def decodeFallback(id: Long, bytes: Array[Byte]): Decoded = {
    var sum = 0L
    val hist = new Array[Double](4)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sum += v
      hist(v / 64) += 1.0
      i += 1
    }
    Decoded(id, bytes.length.toLong, sum,
      (16 + sum % 16).toInt, (16 + (sum / 16) % 16).toInt, hist)
  }

  def decodeOne(id: Long, bytes: Array[Byte]): Decoded = {
    val c = new Codecs
    try decodeOne(id, bytes, c) finally c.close()
  }

  def decodeOne(id: Long, bytes: Array[Byte], codecs: Codecs): Decoded =
    decodePpm(id, bytes)
      .orElse(decodeTensor(id, bytes, codecs))
      .orElse(decodeWav(id, bytes))
      .getOrElse(decodeFallback(id, bytes))

  /** Partition-wise decode with per-payload format dispatch (PPM / zlib
    * tensor / WAV / fallback). The iterator streams — one payload in memory
    * at a time — and one [[Codecs]] instance per task amortizes the zlib
    * native allocations across every payload the task decodes.
    */
  def decode(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codecs = new Codecs // shared across the task, reset per payload
        it.map { case (id, bytes) => decodeOne(id, bytes, codecs) }
      }
      .toDF()
  }

  /** Partition-wise payload->payload transform (same streaming shape as
    * [[decode]], same per-task [[Codecs]] reuse): payloads `f` recognizes
    * are replaced, everything else passes through untouched, and the
    * metadata struct is refreshed to the new byte length.
    */
  private def transformPayloads(withPayload: DataFrame)(
      f: (Array[Byte], Codecs) => Option[Array[Byte]]): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codecs = new Codecs
        it.map { case (id, bytes) => (id, f(bytes, codecs).getOrElse(bytes)) }
      }
      .toDF("doc_id", "payload")
      .withColumn("media_meta", struct(
        octet_length(col("payload")).as("n_bytes"), lit("fake/raw").as("mime")))
  }

  /** Resize every P6 image payload to newW x newH (nearest neighbor);
    * non-image payloads pass through.
    */
  def resize(withPayload: DataFrame, newW: Int, newH: Int): DataFrame =
    transformPayloads(withPayload)((b, _) => resizePpm(b, newW, newH))

  /** Keep every `stride`-th frame of every tensor payload; non-tensor
    * payloads pass through.
    */
  def frameSample(withPayload: DataFrame, stride: Int): DataFrame =
    transformPayloads(withPayload)(sampleTensorFrames(_, stride, _))
}
