package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted partition-wise in batches.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * environment): a deterministic fake standing where a real decoder would
  * run. The Spark-side plumbing — binary schema, struct metadata, batched
  * mapPartitions (the JVM analog of a vectorized Python mapInPandas), and
  * the resulting typed feature columns — is real and tested. At scale the
  * batch shape bounds peak memory per task: `batchSize` payloads decoded at
  * a time, never a whole partition.
  */
object Multimodal {

  /** Decoded media record (what a real image decoder would emit). */
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

  /** Batched partition-wise decode. STUB decoder: byte-sum "checksum",
    * 4-bin byte histogram as the "feature vector", dims derived from the
    * checksum — a real codec call goes exactly here, one batch at a time.
    */
  def decodeStub(withPayload: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // ??? <- real decoder (e.g. JPEG/PNG/audio frames) would process
          // `batch` here; deterministic fake below keeps the plumbing testable.
          batch.iterator.map { case (id, bytes) =>
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
        }
      }
      .toDF()
  }
}
