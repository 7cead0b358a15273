package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, IndexFiles, Retrieval, Similarity}

/** Shard-union merges across the persisted index families: two indexes
  * built independently must merge into one that serves exactly as a
  * one-shot build over the union — and the geometry/artifact guards must
  * reject merges that would silently corrupt (wrong LSH geometry, foreign
  * PQ codebooks, overlapping BM25 doc sets).
  */
class IndexMergeSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.queries.Common.table(spark, sf, "documents")
  private def embs = graft.queries.Common.table(spark, sf, "embeddings")
  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("BM25 merge == one-shot build (serve AND stats), across moduli") {
    val even = pmod(col("doc_id"), lit(2L)) === 0L
    val a = tmp("mrg_bm25_a"); val b = tmp("mrg_bm25_b")
    val one = tmp("mrg_bm25_one")
    Retrieval.buildIndex(docs.where(even), a, nBuckets = 16)
    // deliberately different modulus: the merge must re-bucket
    Retrieval.buildIndex(docs.where(!even), b, nBuckets = 8)
    Retrieval.mergeIndexes(spark, a, b)
    Retrieval.buildIndex(docs, one, nBuckets = 16)
    val qs = Seq("qa" -> Seq("spark", "join"), "qb" -> Seq("window", "scan"))
    def serve(d: String) = Retrieval.searchIndex(spark, d, qs, k = 10)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(serve(a) == serve(one),
      "merged shards must serve exactly as a one-shot build")
    def stats(d: String) = spark.read
      .parquet(IndexFiles.tablePath(spark, d, "stats"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet
    assert(stats(a) == stats(one),
      "merged stats must equal a clean build's (df, n_docs, sum_dl)")
  }

  test("BM25 merge rejects overlapping doc sets") {
    val a = tmp("mrg_bm25_ov_a"); val b = tmp("mrg_bm25_ov_b")
    Retrieval.buildIndex(docs.where(col("doc_id") < 40), a)
    Retrieval.buildIndex(docs.where(col("doc_id") >= 30), b) // overlap
    val e = intercept[IllegalArgumentException] {
      Retrieval.mergeIndexes(spark, a, b)
    }
    assert(e.getMessage.contains("overlap"))
  }

  test("LSH merge == one-shot index (batch veto identity); geometry guarded") {
    def doc(i: Long) = s"unique document body number $i with stable text " +
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i"
    val lower = (0L until 6L).map(i => (i, doc(i))).toDF("doc_id", "text")
    val upper = (6L until 12L).map(i => (i, doc(i))).toDF("doc_id", "text")
    val a = tmp("mrg_lsh_a"); val b = tmp("mrg_lsh_b")
    val one = tmp("mrg_lsh_one")
    Dedup.saveLshIndex(lower, "doc_id", "text", a)
    Dedup.saveLshIndex(upper, "doc_id", "text", b)
    Dedup.mergeLshIndexes(spark, a, b)
    Dedup.saveLshIndex(lower.unionByName(upper), "doc_id", "text", one)
    // probes copy one doc from each shard plus one genuinely new doc:
    // the merged index must veto both copies (one per shard) and pass
    // the new one, exactly as the one-shot index does
    val probe = Seq((100L, doc(2)), (101L, doc(9)), (102L, doc(777L)))
      .toDF("doc_id", "text")
    def survivors(d: String) = Dedup.dedupBatchAgainstLshIndex(spark, d,
      probe, jaccardThreshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors(a) == Set(102L))
    assert(survivors(a) == survivors(one))
    // different geometry must be rejected, never silently never-collide
    val c = tmp("mrg_lsh_c")
    Dedup.saveLshIndex(upper, "doc_id", "text", c, k = 32)
    val e = intercept[IllegalArgumentException] {
      Dedup.mergeLshIndexes(spark, a, c)
    }
    assert(e.getMessage.contains("geometry"))
  }

  test("IVF merge composes with compaction (q100 gates the serve identity)") {
    val half = embs.agg(expr("percentile(vec_id, 0.5)")).head().getDouble(0)
    val lo = tmp("mrg_ivf_lo"); val hi = tmp("mrg_ivf_hi")
    Similarity.saveIvfIndex(
      Similarity.buildIvfIndex(embs.where(col("vec_id") <= half), 8, 64), lo)
    Similarity.saveIvfIndex(
      Similarity.buildIvfIndex(embs.where(col("vec_id") > half), 5, 64), hi)
    Similarity.mergeIvfIndexes(spark, lo, hi)
    def probe() = Similarity.probeIvf(Similarity.loadIvfIndex(spark, lo),
        embs.where(col("vec_id") < 6), 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Similarity.bruteForceTopK(embs.where(col("vec_id") < 6),
        embs, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(probe() == want, "merged probe-all must equal brute force")
    Similarity.compactIvfIndex(spark, lo)
    assert(probe() == want, "compaction after a merge must be invisible")
    // every merged row must live in the cell the HOST quantizer assigns —
    // the invariant static cell pruning relies on (a foreign-quantizer
    // assignment leak would misplace upper-half vectors)
    val cents = Similarity.loadIvfIndex(spark, lo).centroids
    val lists = spark.read.parquet(IndexFiles.tablePath(spark, lo, "lists"))
      .select(col("cell").cast("int").as("cell"), col("vec_id"),
        col("c_vec"))
    val misplaced = lists.withColumn("want",
        Similarity.nearestCell(spark, col("c_vec"), cents))
      .where(col("cell") =!= col("want")).count()
    assert(misplaced == 0L, "merged rows must sit in host-quantizer cells")
  }

  test("IVF-PQ merge: shared-artifact shards union; foreign artifacts rejected") {
    val half = embs.agg(expr("percentile(vec_id, 0.5)")).head().getDouble(0)
    val lower = embs.where(col("vec_id") <= half)
    val upper = embs.where(col("vec_id") > half)
    val a = tmp("mrg_pq_a"); val b = tmp("mrg_pq_b")
    // shard-encode pattern: train once on the lower half, copy the
    // trained artifacts, encode the upper half under them
    Similarity.saveIvfPqIndex(
      Similarity.buildIvfPq(lower, nCells = 8, dim = 64, m = 8, ksub = 16,
        iters = 1), a)
    copyDir(a, b)
    Similarity.appendToIvfPqIndex(spark, b, upper)
    Similarity.deleteFromIvfPqIndex(spark, b, lower.select("vec_id"))
    Similarity.mergeIvfPqIndexes(spark, a, b)
    val queries = embs.where(col("vec_id") < 6)
    // shortlist-inf + probe-all: every candidate reaches the exact rerank
    val got = Similarity.probeIvfPq(Similarity.loadIvfPqIndex(spark, a),
        queries, embs, 5, nProbe = 8, shortlist = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Similarity.bruteForceTopK(queries, embs, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want,
      "merged shard-encoded IVF-PQ must probe exactly as brute force")
    // an independently trained index must be rejected: its codes are
    // meaningless under a's codebooks
    val c = tmp("mrg_pq_c")
    Similarity.saveIvfPqIndex(
      Similarity.buildIvfPq(upper, nCells = 8, dim = 64, m = 8, ksub = 16,
        iters = 1), c)
    val e = intercept[IllegalArgumentException] {
      Similarity.mergeIvfPqIndexes(spark, a, c)
    }
    assert(e.getMessage.contains("not transferable"))
  }

  private def copyDir(from: String, to: String): Unit = {
    val src = java.nio.file.Paths.get(from)
    val dst = java.nio.file.Paths.get(to)
    java.nio.file.Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }
}
