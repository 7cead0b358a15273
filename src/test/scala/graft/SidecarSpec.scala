package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Retrieval, Similarity}

/** The r18 driver-readable artifact sidecars (`_meta.txt`,
  * `_centroids.txt`, `_codebooks.txt`): tiny index artifacts are read
  * from a text sidecar (one FS call, no Spark job) with the parquet
  * table as the durable format. Two contracts locked here:
  * (1) BIT-EXACT parity — the sidecar read must return exactly what the
  * parquet read returns, including every IEEE-754 double bit (encoded
  * as raw long bits); (2) LEGACY FALLBACK — deleting the sidecar (an
  * index written before sidecars existed) must leave every reader
  * working off the parquet with identical results.
  */
class SidecarSpec extends AnyFunSuite {
  val spark = TestSpark.spark

  private def docs = graft.queries.Common.table(spark,
    "/root/testdata/sf0.001", "documents")
  private def embs = graft.queries.Common.table(spark,
    "/root/testdata/sf0.001", "embeddings")

  private def rmSidecars(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      else if (f.getName.endsWith(".txt") && f.getName.startsWith("_")) {
        assert(f.delete()); 1
      } else 0
    walk(new java.io.File(dir))
  }

  test("LSH geometry: sidecar and parquet fallback band identically") {
    val dir = java.nio.file.Files.createTempDirectory("sc_lsh").toString
    Dedup.saveLshIndex(docs.where(col("doc_id") % 2 === 0),
      "doc_id", "text", dir)
    val batch = docs.where(col("doc_id") % 2 === 1)
    def probe() = Dedup.matchesAgainstLshIndex(spark, dir, batch,
        maxBucket = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val withSidecar = probe()
    val removed = rmSidecars(dir)
    assert(removed >= 1, "save must have written a geometry sidecar")
    assert(probe() == withSidecar,
      "parquet-fallback geometry must band the batch identically")
    // append still works off the parquet meta (legacy index shape)
    Dedup.appendToLshIndex(spark, dir, docs.where(col("doc_id") % 2 === 1))
    assert(Dedup.matchesAgainstLshIndex(spark, dir, batch,
      maxBucket = None).count() >= withSidecar.size)
  }

  test("IVF centroids: sidecar round-trip is bit-exact vs parquet") {
    val dir = java.nio.file.Files.createTempDirectory("sc_ivf").toString
    Similarity.saveIvfIndex(Similarity.buildIvfIndex(embs, 8, 64), dir)
    val fromSidecar = Similarity.loadIvfIndex(spark, dir).centroids
    val removed = rmSidecars(dir)
    assert(removed >= 1, "save must have written a centroids sidecar")
    val fromParquet = Similarity.loadIvfIndex(spark, dir).centroids
    // bit-level comparison, not ==: NaN-tolerant and catches any
    // precision loss in the sidecar encoding
    assert(fromSidecar.flatten.map(java.lang.Double.doubleToRawLongBits) ==
      fromParquet.flatten.map(java.lang.Double.doubleToRawLongBits),
      "sidecar centroids must be bit-identical to the parquet table")
  }

  test("IVF centroids: a torn sidecar fails loudly, not with ragged rows") {
    // r19 (the codebooks-parity advice item): the centroids sidecar gets
    // the same shape validation as the codebooks one — a corrupt or
    // hand-edited file must abort with the contract spelled out instead
    // of returning ragged centroids that surface later as probe errors
    val dir = java.nio.file.Files.createTempDirectory("sc_torn").toString
    Similarity.saveIvfIndex(Similarity.buildIvfIndex(embs, 8, 64), dir)
    val side = new java.io.File(s"$dir/centroids/_centroids.txt")
    assert(side.exists(), "save must have written a centroids sidecar")
    val lines = java.nio.file.Files.readAllLines(side.toPath)
    // ragged: drop half the components of the second row
    val torn = lines.get(0) + "\n" +
      lines.get(1).split(",").take(3).mkString(",")
    java.nio.file.Files.writeString(side.toPath, torn)
    // drop Hadoop LocalFileSystem's CRC shadow so the read reaches the
    // (torn) content instead of failing on the checksum — object stores
    // have no CRC shadow, so the content check is the only guard there
    java.nio.file.Files.deleteIfExists(
      side.toPath.resolveSibling("._centroids.txt.crc"))
    val e = intercept[IllegalArgumentException] {
      Similarity.loadIvfIndex(spark, dir)
    }
    assert(e.getMessage.contains("sidecar"), e.getMessage)
    // the documented repair: delete the sidecar, fall back to parquet
    assert(side.delete())
    assert(Similarity.loadIvfIndex(spark, dir).centroids.size == 8)
  }

  test("PQ codebooks: sidecar round-trip is bit-exact; probes identical") {
    val dir = java.nio.file.Files.createTempDirectory("sc_pq").toString
    Similarity.saveIvfPqIndex(Similarity.buildIvfPq(embs, nCells = 8,
      dim = 64, m = 8, ksub = 16, iters = 1), dir)
    val q = embs.where(col("vec_id") < 4)
    def probe() = Similarity.probeIvfPq(Similarity.loadIvfPqIndex(spark, dir),
        q, embs, 3, nProbe = 8, shortlist = Int.MaxValue)
      .collect().map(_.toString).sorted.toSeq
    val cbSide = Similarity.loadIvfPqIndex(spark, dir).cb
    val withSidecar = probe()
    val removed = rmSidecars(dir)
    assert(removed >= 2, "save must have written centroid + codebook sidecars")
    val cbPq = Similarity.loadIvfPqIndex(spark, dir).cb
    assert(cbSide.centroids.flatten.flatten
        .map(java.lang.Double.doubleToRawLongBits) ==
      cbPq.centroids.flatten.flatten
        .map(java.lang.Double.doubleToRawLongBits),
      "sidecar codebooks must be bit-identical to the parquet table")
    assert((cbSide.m, cbSide.ksub, cbSide.dsub) == (cbPq.m, cbPq.ksub, cbPq.dsub))
    assert(probe() == withSidecar,
      "parquet-fallback probe must serve identical results")
  }
}
