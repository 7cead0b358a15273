package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shard-merge + takedown-delete rehearsal at corpus scale — the two
  * maintenance verbs CompactionBench doesn't cover. Per family:
  *
  *  1. build a one-shot index over the full corpus and serve it (the
  *     reference result);
  *  2. build the SAME corpus as two independent shard indexes, MERGE one
  *     into the other, and serve — require'd identical to the one-shot
  *     serve (BM25; for IVF, whose shard quantizers legitimately differ,
  *     the require is the structural invariant instead: every merged row
  *     sits in the cell the host quantizer assigns, row count exact);
  *  3. DELETE 10% of the ids from the merged index and serve again —
  *     require'd to surface no deleted id, with the stats/row counts
  *     shrunk by exactly the takedown count.
  *
  * Any violated invariant crashes the run (the CompactionBench
  * discipline: a bench that can silently serve garbage measures nothing).
  * One JSON line per family. Usage:
  * `runMain graft.operators.MaintenanceBench [nBase]`.
  */
object MaintenanceBench {

  private def timed[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val v = f
    ((System.nanoTime() - t0) / 1e9, v)
  }

  private def r3(d: Double): Double = math.round(d * 1000) / 1000.0

  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toLong else 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-maintenance-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val takedown = pmod(col("doc_id"), lit(10L)) === 3L

    // ---- BM25 inverted index ----
    locally {
      val corpus = CorpusBench.synth(spark, nBase)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      corpus.count()
      val qs = Seq("qa" -> Seq("glider", "ocean", "current"),
        "qb" -> Seq("depth", "water", "signal"))
      val one = java.nio.file.Files.createTempDirectory("mnt_bm25_one").toString
      val a = java.nio.file.Files.createTempDirectory("mnt_bm25_a").toString
      val b = java.nio.file.Files.createTempDirectory("mnt_bm25_b").toString
      def serve(d: String) = Retrieval.searchIndex(spark, d, qs, k = 10)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val (tBuildOne, _) = timed(Retrieval.buildIndex(corpus, one, 64))
      val (tServeOne, servedOne) = timed(serve(one))
      val even = pmod(col("doc_id"), lit(2L)) === 0L
      val (tShards, _) = timed {
        Retrieval.buildIndex(corpus.where(even), a, 64)
        // a different modulus: the merge re-buckets, as foreign shards do
        Retrieval.buildIndex(corpus.where(!even), b, 32)
      }
      // shards are disjoint by the parity split — skip the O(n) check,
      // the thing a production id-range sharding would also skip
      val (tMerge, _) = timed(
        Retrieval.mergeIndexes(spark, a, b, requireDisjoint = false))
      val (tServeMerged, servedMerged) = timed(serve(a))
      require(servedMerged == servedOne,
        "BM25 merged shards served differently from the one-shot build")
      val (tDelete, _) = timed(Retrieval.deleteFromIndex(spark, a,
        corpus.where(takedown).select("doc_id")))
      val (tServeDel, servedDel) = timed(serve(a))
      val deadServed = servedDel.count { case (_, id, _, _) => id % 10 == 3 }
      require(deadServed == 0, s"$deadServed deleted docs still served")
      val nDocsAfter = spark.read
        .parquet(IndexFiles.tablePath(spark, a, "stats"))
        .select(col("n_docs")).head().getLong(0)
      val nDeleted = corpus.where(takedown).count()
      require(nDocsAfter == nBase - nDeleted,
        s"stats n_docs $nDocsAfter != ${nBase - nDeleted} after delete")
      corpus.unpersist()
      println(s"""{"metric":"maintenance_bm25","n":$nBase,""" +
        s""""build_full_sec":${r3(tBuildOne)},"serve_full_sec":${r3(tServeOne)},""" +
        s""""build_shards_sec":${r3(tShards)},"merge_sec":${r3(tMerge)},""" +
        s""""serve_merged_sec":${r3(tServeMerged)},""" +
        s""""n_deleted":$nDeleted,"delete_sec":${r3(tDelete)},""" +
        s""""serve_after_delete_sec":${r3(tServeDel)}}""")
    }

    // ---- LSH band index ----
    locally {
      val corpus = CorpusBench.synth(spark, nBase)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      corpus.count()
      val a = java.nio.file.Files.createTempDirectory("mnt_lsh_a").toString
      val b = java.nio.file.Files.createTempDirectory("mnt_lsh_b").toString
      val even = pmod(col("doc_id"), lit(2L)) === 0L
      val (tShards, _) = timed {
        Dedup.saveLshIndex(corpus.where(even), "doc_id", "text", a)
        Dedup.saveLshIndex(corpus.where(!even), "doc_id", "text", b)
      }
      val (tMerge, _) = timed(Dedup.mergeLshIndexes(spark, a, b))
      // probe: exact copies of 200 docs spanning BOTH parities — every
      // one must hit post-merge (a shard-local index would miss half)
      val probeBatch = corpus.where(col("doc_id") < 200)
        .select((col("doc_id") + lit(5L * nBase)).as("doc_id"), col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nProbe = probeBatch.count()
      def hits() = {
        val sc = new Dedup.CacheScope
        try Dedup.matchesAgainstLshIndex(spark, a, probeBatch, scope = sc)
          .where(col("jaccard") >= 0.8)
          .select("batch_id").distinct().count()
        finally sc.release()
      }
      val (tProbeMerged, hitsMerged) = timed(hits())
      require(hitsMerged == nProbe,
        s"only $hitsMerged/$nProbe copies hit the merged LSH index")
      // takedown: delete exactly the probed originals — every copy must
      // now pass (the right-to-be-forgotten acceptance test)
      val (tDelete, _) = timed(Dedup.deleteFromLshIndex(spark, a,
        corpus.where(col("doc_id") < 200).select("doc_id")))
      val (tProbeDel, hitsDel) = timed(hits())
      require(hitsDel == 0L,
        s"$hitsDel copies of deleted docs still vetoed post-delete")
      probeBatch.unpersist(); corpus.unpersist()
      println(s"""{"metric":"maintenance_lsh","n":$nBase,""" +
        s""""build_shards_sec":${r3(tShards)},"merge_sec":${r3(tMerge)},""" +
        s""""probe_merged_sec":${r3(tProbeMerged)},""" +
        s""""n_deleted":200,"delete_sec":${r3(tDelete)},""" +
        s""""probe_after_delete_sec":${r3(tProbeDel)}}""")
    }

    // ---- IVF inverted lists ----
    locally {
      val dim = 64
      val nCells = math.max(16, math.sqrt(nBase.toDouble).toInt)
      val vecs = AnnBench.synth(spark, nBase, dim, nClusters = 200)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      vecs.count()
      val a = java.nio.file.Files.createTempDirectory("mnt_ivf_a").toString
      val b = java.nio.file.Files.createTempDirectory("mnt_ivf_b").toString
      val half = nBase / 2
      val (tShards, _) = timed {
        Similarity.saveIvfIndex(Similarity.buildIvfIndex(
          vecs.where(col("vec_id") < half), nCells, dim), a)
        Similarity.saveIvfIndex(Similarity.buildIvfIndex(
          vecs.where(col("vec_id") >= half), nCells / 2, dim), b)
      }
      val (tMerge, _) = timed(Similarity.mergeIvfIndexes(spark, a, b))
      // structural invariants a wrong merge breaks: exact row count, and
      // every row in the cell the HOST quantizer assigns (shard quantizers
      // differ, so a foreign-assignment leak would misplace rows and the
      // static cell pruning would serve wrong candidates)
      val lists = spark.read.parquet(IndexFiles.tablePath(spark, a, "lists"))
        .select(col("cell").cast("int").as("cell"), col("vec_id"),
          col("c_vec"))
      require(lists.count() == nBase, "merged IVF lost/duplicated rows")
      val cents = Similarity.loadIvfIndex(spark, a).centroids
      val misplaced = lists.withColumn("want",
          Similarity.nearestCell(spark, col("c_vec"), cents))
        .where(col("cell") =!= col("want")).count()
      require(misplaced == 0L,
        s"$misplaced merged rows not in host-quantizer cells")
      val queries = vecs.where(col("vec_id") % lit(nBase / 50 + 1) === 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      queries.count()
      def probe() = {
        val scope = new Dedup.CacheScope
        try Similarity.probeIvf(Similarity.loadIvfIndex(spark, a),
          queries, k = 10, nProbe = 3, scope = scope)
          .select("vec_id").collect().map(_.getLong(0))
        finally scope.release()
      }
      val (tProbeMerged, _) = timed(probe())
      val del = pmod(col("vec_id"), lit(10L)) === 3L
      val (tDelete, _) = timed(Similarity.deleteFromIvfIndex(spark, a,
        vecs.where(del).select("vec_id")))
      val (tProbeDel, served) = timed(probe())
      val dead = served.count(_ % 10 == 3)
      require(dead == 0, s"$dead deleted vectors still served")
      val nAfter = spark.read
        .parquet(IndexFiles.tablePath(spark, a, "lists")).count()
      val nDeleted = vecs.where(del).count()
      require(nAfter == nBase - nDeleted,
        s"lists count $nAfter != ${nBase - nDeleted} after delete")
      queries.unpersist(); vecs.unpersist()
      println(s"""{"metric":"maintenance_ivf","n":$nBase,""" +
        s""""build_shards_sec":${r3(tShards)},"merge_sec":${r3(tMerge)},""" +
        s""""probe_merged_sec":${r3(tProbeMerged)},""" +
        s""""n_deleted":$nDeleted,"delete_sec":${r3(tDelete)},""" +
        s""""probe_after_delete_sec":${r3(tProbeDel)}}""")
    }

    spark.stop()
  }
}
