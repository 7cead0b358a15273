package graft

import org.apache.spark.sql.functions._

/** Microbenchmark for the fixed costs the index-lifecycle queries are
  * built from (r18 measurement aid): tiny partitioned/flat parquet
  * writes, metadata head jobs, and small shuffles — run in the exact
  * bench session shape to price one unit of each.
  * `runMain graft.WriteMicro [reps]`
  */
object WriteMicro {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()
    val root = java.nio.file.Files.createTempDirectory("graft_wm_").toString
    val df = spark.range(10000).select(col("id").as("doc_id"),
      (col("id") % 64).as("bucket"), (col("id") * 7).as("tf"))
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val df8 = spark.range(10000).select(col("id").as("doc_id"),
      (col("id") % 8).as("bucket"), (col("id") * 7).as("tf"))
    (1 to reps).foreach { i =>
      t(s"partitioned64 write $i") {
        df.repartition(col("bucket")).write.mode("overwrite")
          .partitionBy("bucket").parquet(s"$root/wm_part")
      }
      t(s"partitioned64 append $i") {
        df.repartition(col("bucket")).write.mode("append")
          .partitionBy("bucket").parquet(s"$root/wm_part")
      }
      t(s"partitioned8 write $i") {
        df8.repartition(col("bucket")).write.mode("overwrite")
          .partitionBy("bucket").parquet(s"$root/wm_part8")
      }
      t(s"partitioned64 norepart write $i") {
        df.write.mode("overwrite")
          .partitionBy("bucket").parquet(s"$root/wm_partnr")
      }
      t(s"partitioned64 coalesce1 write $i") {
        df.coalesce(1).write.mode("overwrite")
          .partitionBy("bucket").parquet(s"$root/wm_partc1")
      }
      t(s"flat write $i") {
        df.write.mode("overwrite").parquet(s"$root/wm_flat")
      }
      t(s"flat coalesce1 write $i") {
        df.coalesce(1).write.mode("overwrite").parquet(s"$root/wm_flat1")
      }
      t(s"read+head $i") {
        spark.read.parquet(s"$root/wm_flat").select(col("doc_id")).head()
        ()
      }
      t(s"read+collect tiny $i") {
        spark.read.parquet(s"$root/wm_flat1").limit(5).collect()
        ()
      }
      t(s"shuffle agg noop $i") {
        df.groupBy("bucket").agg(sum("tf"))
          .write.format("noop").mode("overwrite").save()
      }
      t(s"map-only noop $i") {
        df.select(col("doc_id") * 2).write.format("noop")
          .mode("overwrite").save()
      }
    }
    spark.stop()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(root))
  }
}
