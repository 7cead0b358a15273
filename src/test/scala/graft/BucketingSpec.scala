package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins (the 100 TB design note in README): writing
  * both join sides bucketed by the key lets the sort-merge join run with
  * zero Exchange — the shuffle happens once at write time, then every
  * subsequent join on that key is free. Demonstrated against the driver
  * testdata, with a plan assertion that no Exchange remains.
  */
class BucketingSpec extends AnyFunSuite {
  val spark = TestSpark.spark

  test("bucketed tables join without a shuffle") {
    // default warehouse (./spark-warehouse, gitignored) — warehouse.dir is
    // a static conf and can't be changed on the shared test session
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$dir/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    val joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
    // disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val n = joined.count()
      assert(n == 1500, s"join lost rows: $n")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(800)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
