package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, IndexFiles, Retrieval, Similarity}
import graft.streaming.StreamingOps

/** Exactly-once ingest via the per-index batch ledger
  * ([[graft.operators.IndexFiles.wasBatchApplied]]): a RE-DELIVERED
  * micro-batch (same batchId — the foreachBatch crash-replay path) must
  * change NOTHING, without any compaction repair; a genuinely new
  * batchId must still apply. The r12 specs proved replay REPAIR
  * (compact(dedupeRows = true) restores a clean state); these prove
  * replay PREVENTION.
  */
class IngestLedgerSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("LSH ingest skips a re-delivered batchId without compaction") {
    val root = java.nio.file.Files.createTempDirectory("ledger-lsh").toString
    val idx = s"$root/index"; val corpus = s"$root/corpus"
    Dedup.saveLshIndex(
      Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"))
        .toDF("doc_id", "text"), "doc_id", "text", idx)
    val batch = Seq((10L, "iota kappa lambda mu"), (11L, "nu xi omicron pi"))
      .toDF("doc_id", "text")
    StreamingOps.ingestBatch(batch, idx, corpus, batchId = Some(1L))
    def state() = (
      spark.read.parquet(corpus).count(),
      spark.read.parquet(IndexFiles.tablePath(spark, idx, "bands")).count(),
      spark.read.parquet(IndexFiles.tablePath(spark, idx, "shingles")).count(),
      IndexFiles.dataFileCount(spark, idx, "bands"))
    val applied = state()
    StreamingOps.ingestBatch(batch, idx, corpus, batchId = Some(1L))
    assert(state() == applied,
      "a re-delivered batchId must be a no-op (rows AND files)")
    StreamingOps.ingestBatch(
      Seq((20L, "rho sigma tau upsilon")).toDF("doc_id", "text"),
      idx, corpus, batchId = Some(2L))
    assert(state()._1 == applied._1 + 1, "a new batchId must still apply")
  }

  test("vector ingest skips a re-delivered batchId without compaction") {
    val dim = 8
    def oneHot(i: Int): Seq[Float] =
      (0 until dim).map(j => if (j == i) 1.0f else 0.0f)
    val root = java.nio.file.Files.createTempDirectory("ledger-vec").toString
    val idx = s"$root/index"; val corpus = s"$root/corpus"
    val seed = (0 until 4).map(i => (i.toLong, oneHot(i)))
      .toDF("vec_id", "embedding")
    Similarity.saveIvfIndex(Similarity.buildIvfIndex(seed, 2, dim), idx)
    val batch = Seq((10L, oneHot(5)), (11L, oneHot(6)))
      .toDF("vec_id", "embedding")
    StreamingOps.ingestVectorsBatch(batch, idx, corpus, nProbe = 2,
      batchId = Some(1L))
    def state() = (
      spark.read.parquet(corpus).count(),
      spark.read.parquet(IndexFiles.tablePath(spark, idx, "lists")).count(),
      IndexFiles.dataFileCount(spark, idx, "lists"))
    val applied = state()
    StreamingOps.ingestVectorsBatch(batch, idx, corpus, nProbe = 2,
      batchId = Some(1L))
    assert(state() == applied,
      "a re-delivered batchId must be a no-op (rows AND files)")
    StreamingOps.ingestVectorsBatch(
      Seq((20L, oneHot(7))).toDF("vec_id", "embedding"),
      idx, corpus, nProbe = 2, batchId = Some(2L))
    assert(state()._1 == applied._1 + 1, "a new batchId must still apply")
  }

  test("ledger markers are writer-scoped: a second writer's batch 0 is not skipped") {
    // Structured Streaming batchIds restart from 0 under a fresh
    // checkpoint; an unscoped ledger would silently DROP the new stream's
    // batches. Two appIds on one index dir must keep independent ledgers.
    val root = java.nio.file.Files.createTempDirectory("ledger-scope").toString
    val idx = s"$root/index"; val corpus = s"$root/corpus"
    Dedup.saveLshIndex(
      Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    StreamingOps.ingestBatch(
      Seq((10L, "iota kappa lambda mu")).toDF("doc_id", "text"),
      idx, corpus, batchId = Some(0L), appId = Some("pipeline-a"))
    assert(IndexFiles.wasBatchApplied(spark, idx, "pipeline-a", 0L))
    assert(!IndexFiles.wasBatchApplied(spark, idx, "pipeline-b", 0L),
      "writer b must not see writer a's markers")
    // writer b's batch 0 (a different stream sharing the index) applies
    StreamingOps.ingestBatch(
      Seq((20L, "nu xi omicron pi")).toDF("doc_id", "text"),
      idx, corpus, batchId = Some(0L), appId = Some("pipeline-b"))
    assert(spark.read.parquet(corpus).count() == 2,
      "a second writer's batch 0 must apply, not be skipped")
    // and writer a replaying ITS batch 0 is still a no-op
    StreamingOps.ingestBatch(
      Seq((10L, "iota kappa lambda mu")).toDF("doc_id", "text"),
      idx, corpus, batchId = Some(0L), appId = Some("pipeline-a"))
    assert(spark.read.parquet(corpus).count() == 2)
  }

  test("distinct raw writerIds that sanitize identically keep isolated ledgers") {
    // the path-safe char squash is many-to-one ('app/1' and 'app_1' both
    // squash to 'app_1'); sharing a ledger directory would make the
    // second writer silently skip its genuinely new batches — the exact
    // data-loss mode writer scoping exists to prevent. Squashed ids get a
    // raw-id hash suffix, so the directories differ.
    val root = java.nio.file.Files.createTempDirectory("ledger-coll").toString
    val idx = s"$root/index"
    Retrieval.buildIndex(
      Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"), idx, 8)
    IndexFiles.recordBatchApplied(spark, idx, "app/1", 0L)
    assert(IndexFiles.wasBatchApplied(spark, idx, "app/1", 0L))
    assert(!IndexFiles.wasBatchApplied(spark, idx, "app_1", 0L),
      "a literally-underscored appId must not see the squashed id's markers")
    IndexFiles.recordBatchApplied(spark, idx, "app_1", 1L)
    assert(!IndexFiles.wasBatchApplied(spark, idx, "app/1", 1L),
      "and vice versa")
    assert(!IndexFiles.wasBatchApplied(spark, idx, "app:1", 0L),
      "two different squashed ids must not share a directory either")
    // compactLedgers round-trips the encoded directory names (encoded
    // names are fixed points of the encoding): folds must land in the
    // writer's own ledger and answers must be unchanged
    IndexFiles.recordBatchApplied(spark, idx, "app/1", 1L)
    IndexFiles.compactLedgers(spark, idx)
    assert(IndexFiles.wasBatchApplied(spark, idx, "app/1", 1L))
    assert(IndexFiles.wasBatchApplied(spark, idx, "app_1", 1L))
    assert(!IndexFiles.wasBatchApplied(spark, idx, "app_1", 2L))
    assert(!IndexFiles.wasBatchApplied(spark, idx, "app:1", 1L))
  }

  test("legacy flat ledger markers are honored by the local writer only") {
    // pre-writer-scope layout: `_ledger/applied-<id>` with no writer
    // directory. The default non-streaming writer ("local") keeps replay
    // protection across the upgrade (backfills shared one namespace by
    // construction); stream writers must NOT honor foreign flat markers —
    // skipping a new stream's batch is silent data loss.
    val root = java.nio.file.Files.createTempDirectory("ledger-flat").toString
    val idx = s"$root/index"
    Retrieval.buildIndex(
      Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"), idx, 8)
    val flat = new java.io.File(s"$idx/_ledger/applied-3")
    flat.getParentFile.mkdirs()
    assert(flat.createNewFile())
    assert(IndexFiles.wasBatchApplied(spark, idx, "local", 3L),
      "the default writer must keep replay protection across the upgrade")
    assert(!IndexFiles.wasBatchApplied(spark, idx, "local", 4L))
    assert(!IndexFiles.wasBatchApplied(spark, idx, "some-stream-query-id", 3L),
      "a stream writer must not be suppressed by a foreign flat marker")
  }

  test("corpus sink is idempotent even in the residual crash window") {
    // crash AFTER the appends but BEFORE the ledger marker: the replayed
    // batch re-appends index rows (repaired by compact(dedupeRows)) but
    // must NOT duplicate the corpus — each batch overwrites its own
    // ingest_batch partition
    val dim = 8
    def oneHot(i: Int): Seq[Float] =
      (0 until dim).map(j => if (j == i) 1.0f else 0.0f)
    val root = java.nio.file.Files.createTempDirectory("ledger-resid").toString
    val idx = s"$root/index"; val corpus = s"$root/corpus"
    val seed = (0 until 4).map(i => (i.toLong, oneHot(i)))
      .toDF("vec_id", "embedding")
    Similarity.saveIvfIndex(Similarity.buildIvfIndex(seed, 2, dim), idx)
    val batch = Seq((10L, oneHot(5)), (11L, oneHot(6)))
      .toDF("vec_id", "embedding")
    StreamingOps.ingestVectorsBatch(batch, idx, corpus, nProbe = 2,
      batchId = Some(1L))
    val corpusIds = spark.read.parquet(corpus)
      .select("vec_id").as[Long].collect().sorted.toSeq
    // simulate the residual window: the marker never landed
    val marker = new java.io.File(s"$idx/_ledger/local/applied-1")
    assert(marker.exists(), "marker path contract changed")
    assert(marker.delete())
    StreamingOps.ingestVectorsBatch(batch, idx, corpus, nProbe = 2,
      batchId = Some(1L)) // the replay re-runs in full
    assert(spark.read.parquet(corpus)
        .select("vec_id").as[Long].collect().sorted.toSeq == corpusIds,
      "replayed batch must overwrite its own corpus partition, not append")
    // the index side re-appended byte-identical rows; dedupe-compact
    // restores one row per vector (the documented repair)
    Similarity.compactIvfIndex(spark, idx, dedupeRows = true)
    val lists = spark.read.parquet(IndexFiles.tablePath(spark, idx, "lists"))
    assert(lists.count() == lists.select("vec_id").distinct().count(),
      "dedupe compaction must restore one list row per vector")
  }

  test("document indexing skips a re-delivered batchId without compaction") {
    val root = java.nio.file.Files.createTempDirectory("ledger-bm25").toString
    val idx = s"$root/index"
    Retrieval.buildIndex(
      Seq((1L, "alpha beta gamma"), (2L, "beta delta epsilon"))
        .toDF("doc_id", "text"), idx, nBuckets = 8)
    val batch = Seq((10L, "alpha zeta"), (11L, "eta theta"))
      .toDF("doc_id", "text")
    val qs = Seq("q" -> Seq("alpha", "beta"))
    StreamingOps.indexDocumentsBatch(batch, idx, batchId = Some(1L))
    def state() = (
      Retrieval.searchIndex(spark, idx, qs, k = 10).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet,
      spark.read.parquet(IndexFiles.tablePath(spark, idx, "stats"))
        .select("n_docs").head().getLong(0),
      IndexFiles.dataFileCount(spark, idx, "postings"))
    val applied = state()
    StreamingOps.indexDocumentsBatch(batch, idx, batchId = Some(1L))
    assert(state() == applied,
      "a re-delivered batchId must be a no-op (serve, stats, files)")
    StreamingOps.indexDocumentsBatch(
      Seq((20L, "iota kappa")).toDF("doc_id", "text"), idx,
      batchId = Some(2L))
    assert(state()._2 == applied._2 + 1, "a new batchId must still apply")
  }

  test("legacy flat markers fold into the local writer's highwater and are deleted") {
    // an upgraded pipeline would otherwise keep the pre-writer-scope
    // flat files (`_ledger/applied-<id>`) forever: compactLedgers must
    // fold them as the `local` writer's — even when no scoped `local`
    // directory exists yet — without changing a wasBatchApplied answer
    val root = java.nio.file.Files.createTempDirectory("ledger-flatfold").toString
    val idx = s"$root/index"
    Retrieval.buildIndex(
      Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"), idx, 8)
    val ledger = new java.io.File(s"$idx/_ledger")
    ledger.mkdirs()
    // flat 0..2 contiguous, flat 5 beyond a gap (3,4 never applied)
    Seq(0, 1, 2, 5).foreach(i =>
      assert(new java.io.File(ledger, s"applied-$i").createNewFile()))
    IndexFiles.compactLedgers(spark, idx)
    def flatFiles() = ledger.listFiles().filter(_.isFile).map(_.getName)
      .filterNot(_.startsWith(".")).toSet
    assert(flatFiles() == Set("applied-5"),
      s"contiguous flat prefix must fold and be deleted: ${flatFiles()}")
    assert(new java.io.File(s"$idx/_ledger/local/highwater").exists(),
      "fold must land in the scoped local ledger")
    (0L to 2L).foreach(b =>
      assert(IndexFiles.wasBatchApplied(spark, idx, "local", b), s"batch $b"))
    assert(!IndexFiles.wasBatchApplied(spark, idx, "local", 3L))
    assert(IndexFiles.wasBatchApplied(spark, idx, "local", 5L),
      "the beyond-gap flat marker must stay honored")
    assert(!IndexFiles.wasBatchApplied(spark, idx, "stream-x", 1L),
      "flat markers stay invisible to stream writers after the fold")
    // mixed fold: scoped local markers close the gap on the next pass
    Seq(3L, 4L).foreach(
      IndexFiles.recordBatchApplied(spark, idx, "local", _))
    IndexFiles.compactLedgers(spark, idx)
    assert(flatFiles().isEmpty, "gap closed: the last flat marker folds too")
    assert(IndexFiles.wasBatchApplied(spark, idx, "local", 5L))
    assert(!IndexFiles.wasBatchApplied(spark, idx, "local", 6L))
  }

  test("ledger compaction folds the contiguous prefix; semantics unchanged") {
    // a long-lived stream accumulates one marker file per micro-batch;
    // compactLedger folds the contiguous applied prefix into one
    // highwater file without changing a single wasBatchApplied answer
    val root = java.nio.file.Files.createTempDirectory("ledger-hw").toString
    val idx = s"$root/index"
    Retrieval.buildIndex(
      Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"), idx, 8)
    val w = "stream-a"
    // applied 0..3, plus an out-of-order 7 (a gap: 4..6 never applied)
    Seq(0L, 1L, 2L, 3L, 7L).foreach(
      IndexFiles.recordBatchApplied(spark, idx, w, _))
    IndexFiles.compactLedger(spark, idx, w)
    val ledger = new java.io.File(s"$idx/_ledger/$w")
    // ignore Hadoop local-FS .crc sidecars (deleted with their file)
    def files() = ledger.listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSet
    assert(files() == Set("highwater", "applied-7"),
      s"prefix 0..3 folds, the beyond-gap marker stays: ${files()}")
    // every answer identical to the pre-compaction marker set
    (0L to 3L).foreach(b =>
      assert(IndexFiles.wasBatchApplied(spark, idx, w, b), s"batch $b"))
    assert(!IndexFiles.wasBatchApplied(spark, idx, w, 4L),
      "never-applied batch inside the gap must stay unapplied")
    assert(IndexFiles.wasBatchApplied(spark, idx, w, 7L))
    assert(!IndexFiles.wasBatchApplied(spark, idx, w, 8L))
    // writer isolation: the highwater is scoped too
    assert(!IndexFiles.wasBatchApplied(spark, idx, "stream-b", 0L))
    // the ingest path honors the folded mark: a re-delivered batch 2 is
    // still a no-op, and new batches extend the fold on the next pass
    val nDocs = () => spark.read
      .parquet(IndexFiles.tablePath(spark, idx, "stats"))
      .select("n_docs").head().getLong(0)
    val before = nDocs()
    StreamingOps.indexDocumentsBatch(
      Seq((30L, "rho sigma")).toDF("doc_id", "text"), idx,
      batchId = Some(2L), appId = Some(w))
    assert(nDocs() == before, "folded batchId must still be skipped")
    Seq(4L, 5L, 6L).foreach(
      IndexFiles.recordBatchApplied(spark, idx, w, _))
    IndexFiles.compactLedger(spark, idx, w)
    assert(files() == Set("highwater"),
      "closing the gap lets the fold absorb the out-of-order marker")
    assert(IndexFiles.wasBatchApplied(spark, idx, w, 6L))
    assert(!IndexFiles.wasBatchApplied(spark, idx, w, 8L))
  }
}
