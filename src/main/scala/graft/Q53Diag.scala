package graft
import org.apache.spark.sql.functions._
import graft.functions.Text
object Q53Diag {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def prep(alias: String) = docs.select(col("source"), col("doc_id").as(s"doc_$alias"),
      array_distinct(transform(Text.shingles(Text.tokens(col("text")), 2),
        sh => Text.hashMod(sh))).as(s"sh_$alias"))
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    time("prep_b_only")(prep("b").count())
    time("prep_b_arrays")(prep("b").select(sum(size(col("sh_b")))).first().getLong(0))
    val a = prep("a").where(col("doc_a") % 20 === 0)
    val b = prep("b")
    time("pair_join_count")(broadcast(a).join(b, "source").where(col("doc_a") < col("doc_b")).count())
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    time("full_jaccard")(broadcast(a).join(b, "source").where(col("doc_a") < col("doc_b"))
      .withColumn("jac", inter.cast("double") / (size(col("sh_a")) + size(col("sh_b")) - inter))
      .where(col("jac") > 0.0).count())
    spark.stop()
  }
}
