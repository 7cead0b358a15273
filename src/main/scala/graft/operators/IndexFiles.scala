package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared file-layout maintenance for the persisted index families (IVF
  * lists, LSH bands/shingles, BM25 postings/doclens). Every append path
  * adds at least one new file per touched partition, so a year of daily
  * ingest turns each `cell=`/`band=`/`bucket=` directory into hundreds of
  * small files — the listing/open overhead then dominates the
  * partition-pruned probes these layouts exist for. Compaction rewrites a
  * table to one file per partition (row-identical by default) and swaps
  * it in with the checked delete+rename of
  * [[Retrieval.appendToIndex]]'s stats swap.
  */
private[graft] object IndexFiles {

  /** Rewrite `sub` (a parquet table under `dir`) compacted: partitioned
    * tables repartition on `partitionBy` (one task -> one file per
    * partition, the writeLists discipline), unpartitioned ones coalesce
    * to `flatFiles`. `dedupeRows` drops full-row duplicates first — the
    * at-least-once replay repair (a replayed micro-batch re-appends
    * byte-identical rows).
    *
    * The rewrite goes to `<sub>.next` and swaps in atomically-enough;
    * readers racing the swap window fail loudly rather than read a mix.
    */
  def compact(spark: SparkSession, dir: String, sub: String,
      partitionBy: Option[String], dedupeRows: Boolean,
      flatFiles: Int = 4): Unit = {
    val live = s"$dir/$sub"
    val next = s"$dir/$sub.next"
    val df0 = spark.read.parquet(live)
    val df = if (dedupeRows) df0.distinct() else df0
    val writer = partitionBy match {
      case Some(p) => df.repartition(col(p)).write.partitionBy(p)
      case None => df.coalesce(flatFiles).write
    }
    writer.mode("overwrite").parquet(next)
    swapDir(spark, next, live)
  }

  /** Checked delete+rename swap (see [[Retrieval.appendToIndex]]): the
    * result booleans are require'd — a silently failed rename leaves the
    * index without the table.
    */
  def swapDir(spark: SparkSession, from: String, to: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(to), spark.sparkContext.hadoopConfiguration)
    val toPath = new org.apache.hadoop.fs.Path(to)
    require(fs.delete(toPath, true), s"swapDir: could not delete $to")
    require(fs.rename(new org.apache.hadoop.fs.Path(from), toPath),
      s"swapDir: rename $from -> $to failed; restore $from manually")
    ()
  }

  /** Files (ignoring _SUCCESS/metadata) under a table directory,
    * recursively — the compaction metric and the specs' assertion.
    */
  def dataFileCount(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1
      else 0
    walk(new java.io.File(dir))
  }
}
