package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Grid2d, Windows}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] demonstrates one operator from SURVEY.md §2 on
  * the driver testdata; [[oracleSql]] carries the DuckDB-equivalent SQL for
  * every SQL-expressible operator (identical column names and ORDER BY on
  * both sides — see [[graft.queries.Common]] for the determinism rules).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's `grid_shear` shape (process_adcp.py:2060-2064) mapped
    * onto the events table: QC-threshold mask -> per-key ordered shear
    * (centered gradient) -> grid2d(mean) over (day, value-band) — scan,
    * filter, window, and 2-D binned aggregation in one lazily-composed plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ev = Common.events(spark, dir)
      .where(col("value").isNotNull && col("value") <= 400.0) // remove_outliers
    val w = Windows.ordered(Seq(col("ts_us"), col("event_id")), Seq(col("user_id")))
    val sheared = ev
      .withColumn("t", col("ts_us").cast("double") / 1e6)
      .withColumn("shear", Windows.gradient(col("value"), col("t"), w))
      .withColumn("day",
        (col("ts_us") - lit(1704067200000000L)).cast("double") / 8.64e10)
    Grid2d.grid2d(sheared,
      col("day"), 0.0, 1.0, 31,
      col("value"), 0.0, 25.0, 20,
      col("shear"), avg)
  }

  // a def, not a val: TextQueries.oracle embeds the BM25 idf literals its
  // query entries stash at run time, so oracleSql must be re-evaluated
  // after the queries run (Verify dumps it last)
  private def packs: Seq[(Map[String, Common.Q], Map[String, String])] = Seq(
    (RelationalQueries.queries, RelationalQueries.oracle),
    (WindowQueries.queries, WindowQueries.oracle),
    (GridQueries.queries, GridQueries.oracle),
    (PipelineMathQueries.queries, PipelineMathQueries.oracle),
    (TextQueries.queries, TextQueries.oracle),
    (DedupQueries.queries, DedupQueries.oracle),
    (VectorQueries.queries, VectorQueries.oracle),
    (ExtraRelationalQueries.queries, ExtraRelationalQueries.oracle)
  ) // (q61_pivot lives in ExtraRelationalQueries)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_._2).toMap
}
