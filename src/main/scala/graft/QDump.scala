package graft

/** Dump driver-contract query results as deterministic CSV — the
  * refactor-parity companion to [[QBench]]: capture a query's rows before
  * an internal rewrite, rerun after, and diff the files to prove the
  * results (and therefore the driver's hash check) are unchanged.
  * `runMain graft.QDump <outDir> <queryName>... [-- sfDir]`.
  */
object QDump {
  def main(args: Array[String]): Unit = {
    val (names, dir) = args.indexOf("--") match {
      case -1 => (args.drop(1).toSeq, "/root/testdata/sf0.01")
      case i  => (args.slice(1, i).toSeq, args(i + 1))
    }
    val outDir = args(0)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val cols = df.columns.sorted
      val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.mkString(",")).sorted
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name.csv"),
        ((cols.mkString(",") + "\n") + rows.mkString("\n"))
          .getBytes("UTF-8"))
      println(s"$name: ${rows.length} rows -> $outDir/$name.csv")
    }
    spark.stop()
  }
}
