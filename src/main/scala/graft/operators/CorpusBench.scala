package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-pipeline scale rehearsal — the LLM-training-data analog of
  * [[graft.pipeline.PipelineBench]]: synthesize an N-document corpus
  * entirely on the executors (no driver loop, no input files), run the
  * full [[Corpus.preprocess]] composition (quality gate -> capped LSH ->
  * exact Jaccard -> cluster resolution -> keep min-id), and report
  * wall-clock, docs/s, survivor counts, peak heap, and cache hygiene as
  * one JSON line.
  *
  * The synthetic corpus is deterministic (hash-seeded, no RNG state) and
  * adversarially shaped: ~10% of docs arrive as exact-duplicate pairs,
  * ~4% as junk that the language gate must drop, and every doc shares a
  * high-frequency stopword backbone so LSH buckets are realistically
  * skewed. Usage: `runMain graft.operators.CorpusBench [nDocs]`.
  *
  * `cached_rdds_after_release` counts what [[Dedup.releaseCaches]] cannot
  * free: [[Dedup.connectedComponents]]'s final-round localCheckpoint RDDs,
  * which pin O(paired docs) label rows for as long as the result frame is
  * live — unpersisting a localCheckpoint severs truncated lineage rather
  * than triggering recompute, so they are deliberately not tracked.
  * Measured: 100k docs 23.6 s (4.2k docs/s), 200k docs 32.4 s (6.2k
  * docs/s) at local[32] — throughput grows with scale as per-round fixed
  * costs amortize.
  */
object CorpusBench {

  /** English-ish vocabulary: the langId stopword list plus filler words,
    * so the gate recognizes the corpus as "en" at a realistic stopword
    * density.
    */
  private val vocab: Seq[String] =
    graft.functions.Text.stopwords.collectFirst { case ("en", ws) => ws }.get ++
      Seq("glider", "ocean", "current", "shear", "profile", "sensor",
        "velocity", "depth", "water", "signal", "measurement", "survey",
        "transect", "column", "density", "pressure", "beam", "echo",
        "range", "sample", "drift", "heading", "salinity", "thermocline",
        "plume", "eddy", "front", "mixing", "layer", "buoyancy",
        "ballast", "pitch", "antenna", "surface", "mission", "battery")

  /** Deterministic synthetic corpus: doc i's text is `nTok` words drawn by
    * xxhash64(seed, position) from the vocabulary — pure Column algebra,
    * generated in parallel on the executors. Docs with id % 20 in {0, 1}
    * share a seed (exact-duplicate pairs -> dedup work); id % 25 == 7 is
    * unrecognizable junk (gate work).
    */
  def synth(spark: SparkSession, n: Long, nTok: Int = 60): DataFrame = {
    val v = typedLit(vocab)
    val nv = vocab.size
    val seed = when(col("id") % 20 < 2, col("id") - col("id") % 20)
      .otherwise(col("id"))
    val words = transform(sequence(lit(1), lit(nTok)),
      i => element_at(v, pmod(xxhash64(seed, i), lit(nv)).cast("int") + 1))
    spark.range(n)
      .withColumn("text",
        when(col("id") % 25 === 7,
          concat_ws(" ", transform(sequence(lit(1), lit(nTok)),
            i => concat(lit("z"), conv(pmod(xxhash64(col("id"), i), lit(999)), 10, 36)))))
        .otherwise(concat_ws(" ", words)))
      .select(col("id").as("doc_id"), col("text"))
  }

  private def peakHeapMb: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(_.getPeakUsage.getUsed).sum / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-corpus-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.NativeHash48.register(spark)

    // materialize the input first so the timed section measures the
    // pipeline, not the synthesis
    val docs = synth(spark, n)
      .repartition(32).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()

    val t0 = System.nanoTime()
    val kept = Corpus.preprocess(docs, "doc_id", "text").count()
    val secs = (System.nanoTime() - t0) / 1e9

    Dedup.releaseCaches()
    docs.unpersist(blocking = true)
    val cachedAfter = spark.sparkContext.getPersistentRDDs.size
    println(s"""{"metric":"corpus_preprocess","n_docs":$nDocs,"kept":$kept,""" +
      s""""sec":${math.round(secs * 10) / 10.0},"docs_per_s":${math.round(nDocs / secs)},""" +
      s""""peak_heap_mb":$peakHeapMb,"cached_rdds_after_release":$cachedAfter}""")
    spark.stop()
  }
}
