package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IndexFiles, Retrieval, Similarity}

/** Zero-downtime versioned index swap ([[graft.operators.IndexFiles]]):
  * readers racing a compaction cutover must never error and must serve
  * byte-identical results; every crash window must leave a resolvable,
  * fully-written live table (the old delete+rename swap had a reader
  * outage window and a crash window that lost the live table outright).
  */
class IndexSwapSpec extends AnyFunSuite {
  val spark = TestSpark.spark

  private def docs = graft.queries.Common.table(spark,
    "/root/testdata/sf0.001", "documents")

  private def versionDirs(dir: String, sub: String): Set[String] =
    new java.io.File(dir).listFiles().map(_.getName)
      .filter(n => n == sub || (n.startsWith(s"$sub.v") && !n.endsWith(".tmp")))
      .toSet

  test("BM25 serve is error-free and byte-identical across a live compaction loop") {
    val dir = java.nio.file.Files.createTempDirectory("swap_bm25").toString
    val qs = Seq("qa" -> Seq("spark", "join"), "qb" -> Seq("window", "scan"))
    Retrieval.buildIndex(docs, dir, nBuckets = 16)
    def key() = Retrieval.searchIndex(spark, dir, qs, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val baseline = key()
    assert(baseline.nonEmpty)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    @volatile var compacting = true
    val compactor = Future {
      try (1 to 4).foreach(_ => Retrieval.compactIndex(spark, dir))
      finally compacting = false
    }
    var probes = 0
    while (compacting && probes < 500) {
      assert(key() == baseline,
        s"probe $probes diverged during a concurrent compaction")
      probes += 1
    }
    Await.result(compactor, 300.seconds)
    assert(probes > 0, "at least one probe must have raced the loop")
    assert(key() == baseline, "post-loop serve diverged")
  }

  test("IVF probe is stable across compaction; old versions are pruned") {
    val e = graft.queries.Common.table(spark, "/root/testdata/sf0.001",
      "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("swap_ivf").toString
    Similarity.saveIvfIndex(Similarity.buildIvfIndex(e, 8, 64), dir)
    def probe() = Similarity.probeIvf(Similarity.loadIvfIndex(spark, dir),
        e.where(col("vec_id") < 4), 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val baseline = probe()
    assert(baseline.nonEmpty)
    (1 to 4).foreach { i =>
      Similarity.compactIvfIndex(spark, dir)
      assert(probe() == baseline, s"probe diverged after compaction $i")
    }
    // keep-two-priors pruning: after 4 rewrites the live v4 plus v3 and
    // v2 remain; v1 and the legacy unversioned dir are gone
    assert(versionDirs(dir, "lists") ==
      Set("lists.v2", "lists.v3", "lists.v4"),
      s"unexpected version dirs: ${versionDirs(dir, "lists")}")
    assert(IndexFiles.tablePath(spark, dir, "lists").endsWith("lists.v4"))
  }

  test("every publish crash window resolves to a fully-written table") {
    val e = graft.queries.Common.table(spark, "/root/testdata/sf0.001",
      "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("swap_crash").toString
    Similarity.saveIvfIndex(Similarity.buildIvfIndex(e, 8, 64), dir)
    Similarity.compactIvfIndex(spark, dir) // live = lists.v1, legacy kept
    def probe() = Similarity.probeIvf(Similarity.loadIvfIndex(spark, dir),
        e.where(col("vec_id") < 4), 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val baseline = probe()

    // crash window A: next version fully written, manifest not yet moved
    // (simulate: copy v1 -> v2 with no manifest update). The manifest
    // still points at v1 — the probe stays on the old, intact table.
    val src = java.nio.file.Paths.get(dir, "lists.v1")
    val dst = java.nio.file.Paths.get(dir, "lists.v2")
    java.nio.file.Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    }
    assert(IndexFiles.tablePath(spark, dir, "lists").endsWith("lists.v1"))
    assert(probe() == baseline, "orphan next version must not be served")

    // crash window B: manifest deleted, replacement rename not yet done.
    // Resolution falls back to the HIGHEST on-disk version — v2, which a
    // real publish only reaches after it is fully written (here a full
    // copy of v1), so the probe still serves complete, identical data.
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "lists.manifest"))
    assert(IndexFiles.tablePath(spark, dir, "lists").endsWith("lists.v2"))
    assert(probe() == baseline,
      "manifest-less fallback must serve the fully-written top version")
  }

  test("FIRST rewrite of a legacy table bootstraps a manifest before v1 appears") {
    // The initial save paths write no manifest. Without a bootstrap pin,
    // a crash mid-write of lists.v1 (or a reader racing the write) would
    // resolve the PARTIAL v1 via the highest-on-disk fallback instead of
    // the intact legacy table.
    val e = graft.queries.Common.table(spark, "/root/testdata/sf0.001",
      "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("swap_boot").toString
    Similarity.saveIvfIndex(Similarity.buildIvfIndex(e, 8, 64), dir)
    def probe() = Similarity.probeIvf(Similarity.loadIvfIndex(spark, dir),
        e.where(col("vec_id") < 4), 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val baseline = probe()
    assert(!new java.io.File(s"$dir/lists.manifest").exists())

    // crash mid-FIRST-rewrite: the write callback dies after leaving
    // partial v1 files on disk
    val boom = intercept[RuntimeException] {
      IndexFiles.writeNextVersion(spark, dir, "lists") { next =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(next))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(next, "part-00000.parquet"),
          Array[Byte](1, 2, 3)) // garbage: unreadable if ever resolved
        sys.error("simulated crash mid-first-rewrite")
      }
    }
    assert(boom.getMessage.contains("simulated crash"))
    // the bootstrap manifest pins the legacy table; the half-written v1
    // (present on disk) must be invisible to every reader
    assert(new java.io.File(s"$dir/lists.v1").exists())
    assert(IndexFiles.tablePath(spark, dir, "lists").endsWith("lists"),
      "reader must stay on the intact legacy table after a first-rewrite crash")
    assert(probe() == baseline)

    // recovery: the retried rewrite clears the residue and publishes a
    // complete v1
    Similarity.compactIvfIndex(spark, dir)
    assert(IndexFiles.tablePath(spark, dir, "lists").endsWith("lists.v1"))
    assert(probe() == baseline, "retried first rewrite must serve identically")
  }
}
