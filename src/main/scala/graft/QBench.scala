package graft
object QBench {
  def main(args: Array[String]): Unit = {
    // private temp root (the Bench discipline): isolated-query runs of
    // the index-lifecycle queries otherwise leave their temp indexes in
    // the shared tmpdir forever
    System.setProperty("graft.tmpdir", java.nio.file.Files
      .createTempDirectory("graft_qbench_").toString)
    // try/finally: a failing query must not leak the private root
    try {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // the Bench AQE coalescing floor (see Bench.main) — QBench must
      // time the same session shape the bench does
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))
      .config("spark.ui.enabled", "false").getOrCreate()
    // stop in a finally: a failing query must not let the outer tmp-root
    // delete race a still-running session's spill/cache dirs
    try {
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        // noop write, not count(): see Bench.pass — count() lets Catalyst
        // prune map-only work and eliminate unused-side joins entirely
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // outside the timed window: the Bench.pass cache-scope hygiene
        graft.operators.Dedup.releaseCaches()
      }
    }
    } finally spark.stop()
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(System.getProperty("graft.tmpdir")))
      System.clearProperty("graft.tmpdir")
    }
  }
}
