package graft

import scala.collection.mutable.ArrayBuffer

/** Per-query job-level profiler — the measurement companion the r18
  * optimization round needs on a UI-less host: run a named driver-contract
  * query under a SparkListener and report each job's wall time plus the
  * DRIVER-SIDE GAPS between jobs (planning, file listing, lease sleeps,
  * collect-driven round trips). A query whose time is mostly gaps is
  * bounded by sequential driver work / job count, not by stage compute —
  * a different fix (fewer actions, fused jobs) than a slow-stage fix.
  * `runMain graft.JobProfile <queryName> [sfDir [runs]]`.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.tmpdir", java.nio.file.Files
      .createTempDirectory("graft_jobprof_").toString)
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
        spark.range(1000).selectExpr("sum(id)").count()
        val name = args(0)
        val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
        val runs = if (args.length > 2) args(2).toInt else 3
        // (jobId, desc, submitted, completed, nTasks)
        val jobs = ArrayBuffer[(Int, String, Long, Long, Int)]()
        val listener = new org.apache.spark.scheduler.SparkListener {
          private val starts =
            scala.collection.concurrent.TrieMap[Int, (String, Long, Int)]()
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts(js.jobId) = (
              Option(js.properties)
                .flatMap(p => Option(p.getProperty("spark.job.description")))
                .orElse(js.stageInfos.lastOption.map(_.name))
                .getOrElse(""),
              System.nanoTime(),
              js.stageInfos.map(_.numTasks).sum)
          override def onJobEnd(
              je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            starts.remove(je.jobId).foreach { case (d, t0, nt) =>
              jobs.synchronized {
                jobs += ((je.jobId, d, t0, System.nanoTime(), nt))
              }
            }
        }
        spark.sparkContext.addSparkListener(listener)
        (1 to runs).foreach { i =>
          jobs.synchronized(jobs.clear())
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          val t1 = System.nanoTime()
          // listener events are async (no public drain API); settle briefly
          Thread.sleep(300)
          val js = jobs.synchronized(jobs.sortBy(_._3).toVector)
          val total = (t1 - t0) / 1e9
          val inJobs = js.map(j => (j._4 - j._3) / 1e9).sum
          println(f"== $name run$i: total $total%.3f s, " +
            f"${js.size} jobs, in-job $inJobs%.3f s, " +
            f"gaps ${total - inJobs}%.3f s")
          var prevEnd = t0
          js.foreach { case (id, d, s, e, nt) =>
            val gap = (s - prevEnd) / 1e9
            prevEnd = math.max(prevEnd, e)
            println(f"  job$id%-4d +gap $gap%6.3f  run ${(e - s) / 1e9}%6.3f" +
              f"  tasks $nt%4d  ${d.take(80)}")
          }
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
