package graft

/** Dump `.explain("formatted")` output for named driver-contract queries
  * to files — the plan-evidence companion the optimization rounds commit
  * under `plans/r<N>/`:
  * `runMain graft.ExplainDump <outDir> <tag> <queryName>... [-- sfDir]`
  * writes `<outDir>/<queryName>_<tag>.txt` per query.
  *
  * Same session shape as [[QBench]] (local[32], shuffle.partitions=32,
  * private tmp root) so the dumped plans are the plans the bench times.
  * Index-lifecycle queries run their build/maintenance actions while the
  * final DataFrame is being constructed; the dumped plan is the SERVE
  * plan (the timed query's final job), which is where the exchanges and
  * join strategies the optimization claims live.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val (names, dir) = args.indexOf("--") match {
      case -1 => (args.drop(2).toSeq, "/root/testdata/sf0.1")
      case i  => (args.slice(2, i).toSeq, args(i + 1))
    }
    val outDir = args(0)
    val tag = args(1)
    System.setProperty("graft.tmpdir", java.nio.file.Files
      .createTempDirectory("graft_explain_").toString)
    try {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        // the Bench AQE coalescing floor (see Bench.main)
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
          sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))
        .config("spark.ui.enabled", "false").getOrCreate()
      try {
        spark.sparkContext.setLogLevel("ERROR")
        new java.io.File(outDir).mkdirs()
        names.foreach { name =>
          val df = SparkEntry.queries(name)(spark, dir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
            txt.getBytes("UTF-8"))
          println(s"$name -> $outDir/${name}_$tag.txt (${txt.length} chars)")
          graft.operators.Dedup.releaseCaches()
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
