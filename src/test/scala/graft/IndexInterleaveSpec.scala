package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, FaultPoints, IndexFiles, Retrieval}

/** The verb×verb interleaving matrix for the MULTI-table index families
  * (BM25: postings/doclens/stats; LSH: shingles/bands). The per-table
  * writer lease serializes writers of one table; whole OPERATIONS
  * interleave at table granularity — these specs prove every unordered
  * verb pair lands in a repairable state: most pairs are EXACT (the
  * read-under-lease rule makes each table write see the other
  * operation's committed state), geometry races abort LOUDLY, and the
  * formerly-drifting case (BM25 append ∥ delete) now SELF-HEALS via the
  * stats epoch — the additive merger detects the concurrent
  * ground-truth rebuild and recomputes exact stats instead of
  * double-adding. IVF and IVF-PQ are single-table families
  * (centroids/codebooks embedded inside the lists version), so their
  * verbs are FULLY serialized by the lists lease — no cross-table
  * window exists to interleave (documented, not tested).
  *
  * Each test drives operation A to a [[graft.operators.FaultPoints]]
  * window (fired with no lease held) and runs the competing operation B
  * to completion there, then asserts the landed state against a one-shot
  * build. For the verbs whose table writes run SEQUENTIALLY (append,
  * merge) the window sits between the two writes; the verbs whose writes
  * overlap as concurrent driver jobs since r19 (compact, delete) fire
  * their hooks after BOTH writes — the between-writes window is no
  * longer injectable there (a competitor truly racing the in-flight pair
  * aborts loudly on a held table lease).
  */
class IndexInterleaveSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** Run `op` with `competing` injected ONCE at window `at` — the
    * one-shot flag stops a same-verb pair from recursing (B's own hook
    * firings are ignored).
    */
  private def interleave(at: (String, String))(competing: => Unit)
      (op: => Unit): Unit = {
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    FaultPoints.withHook((o, t) =>
      if ((o, t) == at && fired.compareAndSet(false, true)) competing)(op)
  }

  // ---------------- BM25 (postings / doclens / stats) ----------------

  /** Shared terms in every doc (stats-sensitive rankings) + unique tail. */
  private def bdoc(i: Long): (Long, String) = {
    val tail = (0 until (i % 3).toInt + 1).map(_ => s"tok$i").mkString(" ")
    (i, s"spark scan join window filter $tail uniq$i")
  }
  private def bdocs(ids: Range) = ids.map(i => bdoc(i.toLong))
    .toDF("doc_id", "text")
  private val hostIds = 0 until 8
  private val batchIds = 20 until 24
  private val shardIds = 40 until 44
  private val shard2Ids = 60 until 64
  private val qs = Seq(
    "q1" -> Seq("spark", "uniq3"), "q2" -> Seq("join", "tok21"),
    "q3" -> Seq("filter", "uniq41"))

  private def host(): String = {
    val d = tmp("il_bm25")
    Retrieval.buildIndex(bdocs(hostIds), d, nBuckets = 16)
    d
  }
  private def serve(d: String) =
    Retrieval.searchIndex(spark, d, qs, k = 20).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  private def servedDocs(d: String) =
    Retrieval.searchIndex(spark, d, qs, k = 20).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
  private def stats(d: String) = spark.read
    .parquet(IndexFiles.tablePath(spark, d, "stats"))
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getInt(4))).toSet
  private def oneShot(ids: Seq[Int]): String = {
    val d = tmp("il_bm25_one")
    Retrieval.buildIndex(ids.map(i => bdoc(i.toLong)).toDF("doc_id", "text"),
      d, nBuckets = 16)
    d
  }
  private def assertExact(d: String, ids: Seq[Int], what: String): Unit = {
    val one = oneShot(ids)
    assert(serve(d) == serve(one), s"$what: serve must equal one-shot")
    assert(stats(d) == stats(one), s"$what: stats must equal one-shot")
  }

  test("bm25 append ∥ append: both land, exact") {
    val d = host()
    interleave("bm25.append" -> "postings") {
      Retrieval.appendToIndex(spark, d, bdocs(22 until 24))
    } { Retrieval.appendToIndex(spark, d, bdocs(20 until 22)) }
    assertExact(d, hostIds ++ batchIds, "append∥append")
  }

  test("bm25 append ∥ delete: epoch-detected rebuild race self-heals, exact") {
    // THE former drift pair (IndexFiles scope doc): the delete's
    // ground-truth rebuild runs after the append's postings landed but
    // before its additive stats merge — pre-r17 the batch's df was
    // counted twice (repairable, not exact). The stats EPOCH (bumped by
    // the rebuild, compared entry-vs-live inside the stats lease) lets
    // the append detect the rebuild and recompute ground truth instead
    // of double-adding: the landed state is now EXACT, stats included.
    val d = host()
    interleave("bm25.append" -> "postings") {
      Retrieval.deleteFromIndex(spark, d, Seq(1L, 2L).toDF("doc_id"))
    } { Retrieval.appendToIndex(spark, d, bdocs(batchIds)) }
    val want = hostIds.filterNot(Set(1, 2)) ++ batchIds
    assertExact(d, want, "append∥delete (self-healed)")
    // the heal is visible in the epoch trail: build = 0, the delete's
    // rebuild = 1, the append's ground-truth recompute = 2 (an
    // undisturbed additive merge would have left it at 1)
    val epoch = spark.read.parquet(IndexFiles.tablePath(spark, d, "stats"))
      .select("stats_epoch").head().getLong(0)
    assert(epoch == 2L,
      s"append must have healed via ground truth (epoch 2), got $epoch")
  }

  test("bm25 append ∥ delete at the doclens window: totals would double too — self-heals, exact") {
    // the OTHER window (rebuild after BOTH batch tables landed): the
    // rebuild counts the full batch, so an additive merge would double
    // df AND n_docs/sum_dl — same epoch detection, same ground-truth
    // recompute, exact either way
    val d = host()
    interleave("bm25.append" -> "doclens") {
      Retrieval.deleteFromIndex(spark, d, Seq(1L, 2L).toDF("doc_id"))
    } { Retrieval.appendToIndex(spark, d, bdocs(batchIds)) }
    assertExact(d, hostIds.filterNot(Set(1, 2)) ++ batchIds,
      "append∥delete at doclens window (self-healed)")
  }

  test("bm25 merge ∥ delete at merge's postings window: self-heals, exact") {
    // the merge-side twin of the drift pair (the delete∥merge test
    // below drives the DELETE to its window; this drives the MERGE):
    // the delete's rebuild counts the shard's landed postings, and the
    // merge's additive stats merge would re-add them — epoch detection
    // recomputes ground truth instead
    val d = host(); val s = tmp("il_bm25_s4")
    Retrieval.buildIndex(bdocs(shard2Ids), s, nBuckets = 8)
    interleave("bm25.merge" -> "postings") {
      Retrieval.deleteFromIndex(spark, d, Seq(1L, 2L).toDF("doc_id"))
    } { Retrieval.mergeIndexes(spark, d, s) }
    assertExact(d, hostIds.filterNot(Set(1, 2)) ++ shard2Ids,
      "merge∥delete at merge's postings window (self-healed)")
  }

  test("bm25 append ∥ merge: both additive, exact") {
    val d = host(); val s = tmp("il_bm25_s")
    Retrieval.buildIndex(bdocs(shardIds), s, nBuckets = 8)
    interleave("bm25.append" -> "postings") {
      Retrieval.mergeIndexes(spark, d, s)
    } { Retrieval.appendToIndex(spark, d, bdocs(batchIds)) }
    assertExact(d, hostIds ++ batchIds ++ shardIds, "append∥merge")
  }

  test("bm25 append ∥ compact: read-under-lease lands the append in the new version, exact") {
    val d = host()
    interleave("bm25.append" -> "postings") {
      Retrieval.compactIndex(spark, d)
    } { Retrieval.appendToIndex(spark, d, bdocs(batchIds)) }
    assertExact(d, hostIds ++ batchIds, "append∥compact")
  }

  test("bm25 delete ∥ delete: both takedowns land, exact") {
    val d = host()
    interleave("bm25.delete" -> "doclens") {
      Retrieval.deleteFromIndex(spark, d, Seq(3L).toDF("doc_id"))
    } { Retrieval.deleteFromIndex(spark, d, Seq(1L, 2L).toDF("doc_id")) }
    assertExact(d, hostIds.filterNot(Set(1, 2, 3)), "delete∥delete")
  }

  test("bm25 delete ∥ merge: shard survives the anti-join, exact") {
    val d = host(); val s = tmp("il_bm25_s2")
    Retrieval.buildIndex(bdocs(shardIds), s, nBuckets = 16)
    interleave("bm25.delete" -> "doclens") {
      Retrieval.mergeIndexes(spark, d, s)
    } { Retrieval.deleteFromIndex(spark, d, Seq(1L, 2L).toDF("doc_id")) }
    assertExact(d, hostIds.filterNot(Set(1, 2)) ++ shardIds, "delete∥merge")
  }

  test("bm25 delete ∥ compact: exact") {
    val d = host()
    interleave("bm25.delete" -> "doclens") {
      Retrieval.compactIndex(spark, d)
    } { Retrieval.deleteFromIndex(spark, d, Seq(1L, 2L).toDF("doc_id")) }
    assertExact(d, hostIds.filterNot(Set(1, 2)), "delete∥compact")
  }

  test("bm25 merge ∥ merge: both shards land, exact") {
    val d = host()
    val s1 = tmp("il_bm25_m1"); val s2 = tmp("il_bm25_m2")
    Retrieval.buildIndex(bdocs(shardIds), s1, nBuckets = 8)
    Retrieval.buildIndex(bdocs(shard2Ids), s2, nBuckets = 4)
    interleave("bm25.merge" -> "postings") {
      Retrieval.mergeIndexes(spark, d, s2)
    } { Retrieval.mergeIndexes(spark, d, s1) }
    assertExact(d, hostIds ++ shardIds ++ shard2Ids, "merge∥merge")
  }

  test("bm25 merge ∥ compact: exact") {
    val d = host(); val s = tmp("il_bm25_s3")
    Retrieval.buildIndex(bdocs(shardIds), s, nBuckets = 8)
    interleave("bm25.merge" -> "postings") {
      Retrieval.compactIndex(spark, d)
    } { Retrieval.mergeIndexes(spark, d, s) }
    assertExact(d, hostIds ++ shardIds, "merge∥compact")
  }

  test("bm25 compact ∥ compact: row-identical rewrites compose, exact") {
    val d = host()
    interleave("bm25.compact" -> "postings") {
      Retrieval.compactIndex(spark, d)
    } { Retrieval.compactIndex(spark, d) }
    assertExact(d, hostIds, "compact∥compact")
  }

  // ---------------- LSH (shingles / bands) ----------------

  private def ldoc(i: Long): (Long, String) =
    (i, s"unique document body number $i with stable text alpha$i " +
      s"beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i")
  private def ldocs(ids: Range) = ids.map(i => ldoc(i.toLong))
    .toDF("doc_id", "text")
  private def lhost(): String = {
    val d = tmp("il_lsh")
    Dedup.saveLshIndex(ldocs(0 until 6), "doc_id", "text", d)
    d
  }
  /** Probe copies of docs 2 (host), 20 (batch), 40 (shard) + a fresh
    * doc: the surviving set identifies exactly which docs veto.
    */
  private def lprobe(d: String): Set[Long] = {
    val probe = Seq((102L, ldoc(2)._2), (120L, ldoc(20)._2),
      (140L, ldoc(40)._2), (199L, ldoc(999)._2)).toDF("doc_id", "text")
    Dedup.dedupBatchAgainstLshIndex(spark, d, probe, jaccardThreshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
  }
  private def lOneShot(ids: Seq[Int], k: Int = 16, nBands: Int = 8): String = {
    val d = tmp("il_lsh_one")
    Dedup.saveLshIndex(ids.map(i => ldoc(i.toLong)).toDF("doc_id", "text"),
      "doc_id", "text", d, k = k, nBands = nBands)
    d
  }
  private def assertLshExact(d: String, ids: Seq[Int], what: String,
      k: Int = 16, nBands: Int = 8): Unit = {
    val one = lOneShot(ids, k, nBands)
    assert(lprobe(d) == lprobe(one), s"$what: veto set must equal one-shot")
  }
  private def rows(d: String, sub: String): Long =
    spark.read.parquet(IndexFiles.tablePath(spark, d, sub)).count()

  test("lsh append ∥ append: both land, veto parity with one-shot") {
    val d = lhost()
    interleave("lsh.append" -> "shingles") {
      Dedup.appendToLshIndex(spark, d, ldocs(22 until 24))
    } { Dedup.appendToLshIndex(spark, d, ldocs(20 until 22)) }
    assertLshExact(d, (0 until 6) ++ (20 until 24), "lsh append∥append")
  }

  test("lsh append ∥ delete: takedown and ingest both land, exact") {
    val d = lhost()
    interleave("lsh.append" -> "shingles") {
      Dedup.deleteFromLshIndex(spark, d, Seq(2L).toDF("doc_id"))
    } { Dedup.appendToLshIndex(spark, d, ldocs(20 until 22)) }
    assertLshExact(d, Seq(0, 1, 3, 4, 5) ++ (20 until 22),
      "lsh append∥delete")
  }

  test("lsh append ∥ merge: both land, exact") {
    val d = lhost(); val s = tmp("il_lsh_s")
    Dedup.saveLshIndex(ldocs(40 until 44), "doc_id", "text", s)
    interleave("lsh.append" -> "shingles") {
      Dedup.mergeLshIndexes(spark, d, s)
    } { Dedup.appendToLshIndex(spark, d, ldocs(20 until 22)) }
    assertLshExact(d, (0 until 6) ++ (20 until 22) ++ (40 until 44),
      "lsh append∥merge")
  }

  test("lsh append ∥ retrain: loud geometry abort; retrain already banded the batch; replay+dedupe leaves no residue") {
    val d = lhost()
    val e = intercept[IllegalArgumentException] {
      interleave("lsh.append" -> "shingles") {
        Dedup.retrainLshIndex(spark, d, k = 8, nBands = 4)
      } { Dedup.appendToLshIndex(spark, d, ldocs(20 until 22)) }
    }
    assert(e.getMessage.contains("geometry changed"), e.getMessage)
    assert(e.getMessage.contains("dedupe"), "abort must name the repair")
    // the retrain read the batch's already-landed shingles, so the index
    // ALREADY vetoes the batch at the new geometry — nothing was lost
    assertLshExact(d, (0 until 6) ++ (20 until 22),
      "lsh append∥retrain post-abort", k = 8, nBands = 4)
    // the documented replay (ledger re-delivery) duplicates shingle AND
    // band rows byte-identically; dedupe-compact removes every duplicate
    Dedup.appendToLshIndex(spark, d, ldocs(20 until 22))
    Dedup.compactLshIndex(spark, d, dedupeRows = true)
    val one = lOneShot((0 until 6) ++ (20 until 22), k = 8, nBands = 4)
    assert(rows(d, "shingles") == rows(one, "shingles"),
      "dedupe-compact must drop the replayed shingle rows")
    assert(rows(d, "bands") == rows(one, "bands"),
      "dedupe-compact must drop the replayed band rows")
    assertLshExact(d, (0 until 6) ++ (20 until 22),
      "lsh append∥retrain after replay+dedupe", k = 8, nBands = 4)
  }

  test("lsh append ∥ compact: exact") {
    val d = lhost()
    interleave("lsh.append" -> "shingles") {
      Dedup.compactLshIndex(spark, d)
    } { Dedup.appendToLshIndex(spark, d, ldocs(20 until 22)) }
    assertLshExact(d, (0 until 6) ++ (20 until 22), "lsh append∥compact")
  }

  test("lsh delete ∥ delete: exact") {
    val d = lhost()
    interleave("lsh.delete" -> "bands") {
      Dedup.deleteFromLshIndex(spark, d, Seq(3L).toDF("doc_id"))
    } { Dedup.deleteFromLshIndex(spark, d, Seq(2L).toDF("doc_id")) }
    assertLshExact(d, Seq(0, 1, 4, 5), "lsh delete∥delete")
  }

  test("lsh delete ∥ merge: shard survives the anti-join, exact") {
    val d = lhost(); val s = tmp("il_lsh_s2")
    Dedup.saveLshIndex(ldocs(40 until 44), "doc_id", "text", s)
    interleave("lsh.delete" -> "bands") {
      Dedup.mergeLshIndexes(spark, d, s)
    } { Dedup.deleteFromLshIndex(spark, d, Seq(2L).toDF("doc_id")) }
    assertLshExact(d, Seq(0, 1, 3, 4, 5) ++ (40 until 44),
      "lsh delete∥merge")
  }

  test("lsh delete ∥ retrain: exact (the delete's rewrites overlap; the hook fires after both)") {
    // r19: the delete's bands/shingles rewrites run as concurrent
    // driver-thread jobs (bands still publishes first), so the formerly
    // injectable bands-published-shingles-pending window — where a
    // retrain re-banded the deleted doc's still-present shingles into
    // dead band rows — is gone: the hook fires after BOTH rewrites and a
    // retrain truly racing the in-flight pair aborts loudly on the held
    // shingles lease instead. At the new window the retrain re-bands
    // from the already-purged shingles: the landed state is EXACT with
    // no residue and nothing to repair.
    val d = lhost()
    interleave("lsh.delete" -> "bands") {
      Dedup.retrainLshIndex(spark, d, k = 8, nBands = 4)
    } { Dedup.deleteFromLshIndex(spark, d, Seq(2L).toDF("doc_id")) }
    val one = lOneShot(Seq(0, 1, 3, 4, 5), k = 8, nBands = 4)
    assert(rows(d, "bands") == rows(one, "bands"),
      "no dead band rows: the retrain saw the purged shingles")
    assertLshExact(d, Seq(0, 1, 3, 4, 5), "lsh delete∥retrain",
      k = 8, nBands = 4)
  }

  test("lsh delete ∥ compact: exact") {
    val d = lhost()
    interleave("lsh.delete" -> "bands") {
      Dedup.compactLshIndex(spark, d)
    } { Dedup.deleteFromLshIndex(spark, d, Seq(2L).toDF("doc_id")) }
    assertLshExact(d, Seq(0, 1, 3, 4, 5), "lsh delete∥compact")
  }

  test("lsh merge ∥ merge: both shards land, exact") {
    val d = lhost()
    val s1 = tmp("il_lsh_m1"); val s2 = tmp("il_lsh_m2")
    Dedup.saveLshIndex(ldocs(40 until 44), "doc_id", "text", s1)
    Dedup.saveLshIndex(ldocs(60 until 64), "doc_id", "text", s2)
    interleave("lsh.merge" -> "shingles") {
      Dedup.mergeLshIndexes(spark, d, s2)
    } { Dedup.mergeLshIndexes(spark, d, s1) }
    assertLshExact(d, (0 until 6) ++ (40 until 44) ++ (60 until 64),
      "lsh merge∥merge")
  }

  test("lsh merge ∥ retrain: loud geometry abort; retrain already banded the shard") {
    val d = lhost(); val s = tmp("il_lsh_s3")
    Dedup.saveLshIndex(ldocs(40 until 44), "doc_id", "text", s)
    val e = intercept[IllegalArgumentException] {
      interleave("lsh.merge" -> "shingles") {
        Dedup.retrainLshIndex(spark, d, k = 8, nBands = 4)
      } { Dedup.mergeLshIndexes(spark, d, s) }
    }
    assert(e.getMessage.contains("geometry changed"), e.getMessage)
    // the retrain re-banded EVERY doc in shingles — including the
    // shard's just-landed ones — so the landed state already equals the
    // one-shot union at the new geometry; no replay needed
    assertLshExact(d, (0 until 6) ++ (40 until 44),
      "lsh merge∥retrain post-abort", k = 8, nBands = 4)
  }

  test("lsh merge ∥ compact: exact") {
    val d = lhost(); val s = tmp("il_lsh_s4")
    Dedup.saveLshIndex(ldocs(40 until 44), "doc_id", "text", s)
    interleave("lsh.merge" -> "shingles") {
      Dedup.compactLshIndex(spark, d)
    } { Dedup.mergeLshIndexes(spark, d, s) }
    assertLshExact(d, (0 until 6) ++ (40 until 44), "lsh merge∥compact")
  }

  test("lsh compact ∥ retrain: the retrained geometry survives the compaction, exact") {
    val d = lhost()
    interleave("lsh.compact" -> "bands") {
      Dedup.retrainLshIndex(spark, d, k = 8, nBands = 4)
    } { Dedup.compactLshIndex(spark, d) }
    assertLshExact(d, 0 until 6, "lsh compact∥retrain", k = 8, nBands = 4)
  }

  test("lsh compact ∥ compact: exact") {
    val d = lhost()
    interleave("lsh.compact" -> "bands") {
      Dedup.compactLshIndex(spark, d)
    } { Dedup.compactLshIndex(spark, d) }
    assertLshExact(d, 0 until 6, "lsh compact∥compact")
  }
}
