package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution

/** Plan auditor: prints the formatted physical plan of selected queries and
  * flags the properties that matter at 100 TB — parquet filter pushdown,
  * pruned read schemas, broadcast joins for dim tables, and whole-stage
  * codegen coverage. `sbt "runMain graft.PlanAudit [queryName ...]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_scan_filter_project", "q13_join_broadcast", "q04_grid2d_mean",
        "q10_interp_join", "q51_dedup_minhash_lsh", "q55_ann_bruteforce",
        "q47_quality_filter", "q48_dedup_corpus")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: not found")
        case Some(fn) =>
          val df = fn(spark, dir)
          // execute THIS QueryExecution's physical plan (df.count()/write
          // would plan anew), so AQE finalizes it and codegen markers show
          val ep = df.queryExecution.executedPlan
          ep.execute().count()
          val plan = ep.toString()
          val formatted = org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
          val full = df.queryExecution.explainString(formatted)
          val pushed = full.linesIterator.filter(l =>
            l.contains("PushedFilters") || l.contains("ReadSchema") ||
            l.contains("DataFilters")).map(_.trim).toSeq
          // whole-stage codegen spans appear as `*(n)` operator prefixes
          val nCodegen = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
            .map(_.group(1)).toSet.size
          val nExchange = "Exchange".r.findAllIn(plan).length
          val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
          println(s"\n== $name: codegenSpans=$nCodegen exchanges=$nExchange broadcastJoins=$nBroadcast")
          pushed.distinct.take(6).foreach(l => println(s"   $l"))
      }
    }
    spark.stop()
  }
}
