package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-search scale rehearsal — the ANN analog of [[CorpusBench]]:
  * synthesize N embeddings on the executors (deterministic, hash-seeded,
  * clustered so recall is meaningful), build the IVF index once, probe a
  * query sample, and report build/probe wall-clock plus measured recall@k
  * against the brute-force oracle as one JSON line.
  *
  * The corpus is drawn from `nClusters` latent directions with small
  * deterministic perturbations, so nearest neighbors are genuinely
  * concentrated (a uniform-random corpus would make every method look
  * equally bad and recall meaningless).
  * Usage: `runMain graft.operators.AnnBench [nVecs] [dim] [nProbe]`.
  */
object AnnBench {

  /** Deterministic pseudo-uniform double in [-1, 1) from (seed, j). */
  private def u(seed: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
    (pmod(xxhash64(seed, j), lit(1000000)).cast("double") / 500000.0) - 1.0

  /** N float embeddings: cluster center (id % nClusters) plus a +-0.15
    * per-coordinate perturbation keyed by id — pure Column algebra.
    */
  def synth(spark: SparkSession, n: Long, dim: Int, nClusters: Int): DataFrame = {
    val ds = spark.range(n)
    val center = col("id") % nClusters
    val vec = transform(sequence(lit(1), lit(dim)),
      j => (u(center, j) + u(col("id"), j) * lit(0.15)).cast("float"))
    ds.select(col("id").as("vec_id"), vec.as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val nProbe = if (args.length > 2) args(2).toInt else 8
    val k = 10
    val nQueries = 50
    val nCells = math.max(4, math.sqrt(n.toDouble).toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-ann-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = synth(spark, n, dim, nClusters = 200)
      .repartition(32).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()
    // query sample: every n/nQueries-th vector
    val queries = base.where(col("vec_id") % (n / nQueries) === 0)

    val t0 = System.nanoTime()
    val index = Similarity.buildIvfIndex(base, nCells, dim)
    index.lists.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    index.lists.count()
    val buildSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val approx = Similarity.probeIvf(index, queries, k, nProbe)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val probeSec = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val exact = Similarity.bruteForceTopK(queries, base, k)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val bruteSec = (System.nanoTime() - t2) / 1e9

    val exactSets = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(pairs: Array[(Long, Long)]): Double =
      pairs.count { case (q, v) =>
        exactSets.getOrElse(q, Set.empty)(v) }.toDouble / exact.length
    val recall = recallOf(approx)

    // PQ compressed-domain path: train on a deterministic 20% sample
    // (codebooks converge on a sample; full-corpus Lloyd is wasted work),
    // encode the whole corpus once, then ADC-scan + exact rerank of a
    // 0.5%-of-corpus shortlist — the memory-bound regime (m ints/vector
    // instead of dim floats) measured on the same corpus and queries
    val t3 = System.nanoTime()
    val cb = Similarity.trainPq(base.where(col("vec_id") % 5 === 0),
      m = 8, ksub = 256, dim = dim)
    val codes = Similarity.pqEncode(base, cb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    codes.count()
    val pqBuildSec = (System.nanoTime() - t3) / 1e9
    val t4 = System.nanoTime()
    val pq = Similarity.pqTopKRerankCodes(queries, codes, base, k, cb,
      shortlist = math.max(100, (n / 200).toInt))
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val pqSec = (System.nanoTime() - t4) / 1e9
    val pqRecall = recallOf(pq)
    codes.unpersist()

    index.lists.unpersist(); base.unpersist(blocking = true)
    println(s"""{"metric":"ann_ivf","n_vecs":$n,"dim":$dim,"n_cells":$nCells,""" +
      s""""n_probe":$nProbe,"k":$k,"n_queries":$nQueries,""" +
      s""""build_sec":${math.round(buildSec * 10) / 10.0},""" +
      s""""probe_sec":${math.round(probeSec * 10) / 10.0},""" +
      s""""brute_sec":${math.round(bruteSec * 10) / 10.0},""" +
      s""""recall_at_$k":${math.round(recall * 1000) / 1000.0},""" +
      s""""pq_build_sec":${math.round(pqBuildSec * 10) / 10.0},""" +
      s""""pq_rerank_sec":${math.round(pqSec * 10) / 10.0},""" +
      s""""pq_recall_at_$k":${math.round(pqRecall * 1000) / 1000.0}}""")
    spark.stop()
  }
}
