package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, IndexFiles}

/** [[graft.operators.Dedup.retrainLshIndex]] — the re-geometry verb:
  * recomputing signatures/bands under a new (k, nBands) from the
  * PERSISTED hashed shingle sets must be indistinguishable from a fresh
  * build at that geometry (minhash is an affine-min over the distinct
  * shingle set, and the hash coefficient sequence is deterministic in the
  * signature index), and every later verb — append, compact, merge —
  * must see the retrained geometry, not the save-time meta.
  */
class LshRetrainSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString + "/idx"

  /** Deterministic corpus with planted near-dups across the %3 split
    * (the BpeAndLshIndexSpec fixture shape). */
  private def corpus = {
    val vocab = (0 until 41).map(i => s"tok$i")
    def base(id: Long) = (1 to 12).map(j => vocab(((id * 7 + j) % 41).toInt))
    (0L until 40L).map { id =>
      val toks = if (id % 8 == 3) base(id - 2) else base(id)
      (id, toks.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def probe(dir: String, batch: org.apache.spark.sql.DataFrame) =
    Dedup.matchesAgainstLshIndex(spark, dir, batch, maxBucket = None)
      .select(col("batch_id"), col("dup_of"),
        round(col("jaccard") * 1000).cast("long"))
      .as[(Long, Long, Long)].collect().toSet

  private def bandRows(dir: String) = spark.read
    .parquet(IndexFiles.tablePath(spark, dir, "bands"))
    .select(col("band").cast("int"), col("bsig"), col("doc_id"))
    .as[(Int, String, Long)].collect().toSet

  test("retrained index == fresh build at the new geometry") {
    val docs = corpus
    val idxSide = docs.where(col("doc_id") % 3 =!= 0)
    val batch = docs.where(col("doc_id") % 3 === 0)
    val a = tmpDir("lshrt-a")
    Dedup.saveLshIndex(idxSide, "doc_id", "text", a, k = 16, nBands = 8)
    Dedup.retrainLshIndex(spark, a, k = 8, nBands = 4)
    val fresh = tmpDir("lshrt-f")
    Dedup.saveLshIndex(idxSide, "doc_id", "text", fresh, k = 8, nBands = 4)
    assert(bandRows(a) == bandRows(fresh),
      "regeometried bands must equal a fresh build's row for row")
    val got = probe(a, batch)
    assert(got == probe(fresh, batch))
    assert(got.nonEmpty, "weak fixture: no cross pairs at the new geometry")
  }

  test("append and compact after a retrain use the retrained geometry") {
    val docs = corpus
    val lower = docs.where(col("doc_id") % 3 === 1)
    val upper = docs.where(col("doc_id") % 3 === 2)
    val batch = docs.where(col("doc_id") % 3 === 0)
    val a = tmpDir("lshrt-app")
    Dedup.saveLshIndex(lower, "doc_id", "text", a, k = 16, nBands = 8)
    Dedup.retrainLshIndex(spark, a, k = 8, nBands = 4)
    // append reads the EMBEDDED retrained meta — rows banded at (16, 8)
    // here would silently never collide with the retrained table's
    Dedup.appendToLshIndex(spark, a, upper)
    Dedup.compactLshIndex(spark, a)
    val fresh = tmpDir("lshrt-app-f")
    Dedup.saveLshIndex(lower.unionByName(upper), "doc_id", "text", fresh,
      k = 8, nBands = 4)
    assert(bandRows(a) == bandRows(fresh),
      "append + compact after retrain must match a fresh build at (8, 4)")
    assert(probe(a, batch) == probe(fresh, batch))
  }

  test("k must be a positive multiple of nBands; shingle_n is frozen") {
    val a = tmpDir("lshrt-rej")
    Dedup.saveLshIndex(corpus, "doc_id", "text", a)
    intercept[IllegalArgumentException] {
      Dedup.retrainLshIndex(spark, a, k = 10, nBands = 4)
    }
    // shingle_n is not a parameter: the retrained meta carries the
    // save-time width forward
    Dedup.retrainLshIndex(spark, a, k = 8, nBands = 2)
    val meta = spark.read
      .parquet(s"${IndexFiles.tablePath(spark, a, "bands")}/_meta")
      .select("k", "n_bands", "shingle_n").head()
    assert((meta.getInt(0), meta.getInt(1), meta.getInt(2)) == ((8, 2, 3)))
  }

  test("merge composes with retrain: regeometried shard merges; stale geometry rejects") {
    val docs = corpus
    val partA = docs.where(col("doc_id") % 3 === 1)
    val partB = docs.where(col("doc_id") % 3 === 2)
    val batch = docs.where(col("doc_id") % 3 === 0)
    val host = tmpDir("lshrt-host")
    Dedup.saveLshIndex(partA, "doc_id", "text", host, k = 8, nBands = 4)
    val shard = tmpDir("lshrt-shard")
    Dedup.saveLshIndex(partB, "doc_id", "text", shard, k = 16, nBands = 8)
    intercept[IllegalArgumentException] {
      Dedup.mergeLshIndexes(spark, host, shard)
    }
    // retrain brings the shard to the host's geometry WITHOUT its text
    Dedup.retrainLshIndex(spark, shard, k = 8, nBands = 4)
    Dedup.mergeLshIndexes(spark, host, shard)
    val fresh = tmpDir("lshrt-one")
    Dedup.saveLshIndex(partA.unionByName(partB), "doc_id", "text", fresh,
      k = 8, nBands = 4)
    val got = probe(host, batch)
    assert(got == probe(fresh, batch),
      "merge after retrain must veto exactly like a one-shot index")
    assert(got.nonEmpty)
  }
}
