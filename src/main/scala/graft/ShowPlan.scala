package graft

/** Print a driver-contract query's full physical plan tree — the
  * plan-iteration companion to [[PlanAudit]]'s summary counters (use this
  * to see WHERE an exchange sits, not just how many there are).
  * `runMain graft.ShowPlan <queryName> [sfDir]`.
  */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = SparkEntry.queries(args(0))(spark, dir)
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
