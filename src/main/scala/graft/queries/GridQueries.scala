package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Bins, Grid2d, InterpJoin}
import Common._

/** The reference's central 2-D binned aggregation (`grid2d`,
  * process_adcp.py:117-134) and its temporal-alignment joins (`interp`,
  * :144-146; nearest-neighbor match, :1503-1507) demonstrated on the events
  * table: x = continuous day-of-month, y = value band, exactly the
  * (profile, depth-bin) gridding shape of the reference.
  */
object GridQueries {

  private val T0us = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros

  /** Continuous day offset since 2024-01-01 (micros-exact in both engines). */
  private def dayCol = (col("ts_us") - lit(T0us)).cast("double") / 8.64e10

  private val sqlDay = "(epoch_us(ts) - 1704067200000000) / 86400000000.0"

  val queries: Map[String, Q] = Map(
    // grid2d with mean agg: pd.cut right-closed bins on both axes. Mean is
    // emitted via the exact-integerized form so both engines divide the same
    // exact sums.
    "q04_grid2d_mean" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("day", dayCol)
      Grid2d.grid2d(ev,
          col("day"), 0.0, 1.0, 31,
          col("value"), 0.0, 25.0, 20,
          col("value"), c => exactMeanMilli(c))
        .select(col("xbin"), col("ybin"), col("value").as("mean_milli"))
        .orderBy("xbin", "ybin")
    }),

    // grid2d with exact median (the reference default agg).
    "q05_grid2d_median" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("day", dayCol)
      Grid2d.grid2d(ev,
          col("day"), 0.0, 1.0, 31,
          col("value"), 0.0, 25.0, 20,
          col("value"), median)
        .select(col("xbin"), col("ybin"), fp(col("value")).as("median_milli"))
        .orderBy("xbin", "ybin")
    }),

    // grid2d count + population stddev (np.nanstd ddof=0) in one grid.
    "q05b_grid2d_count_std" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("day", dayCol)
      ev.select(
          Bins.cutRight(col("day"), 0.0, 1.0, 31).as("xbin"),
          Bins.cutRight(col("value"), 0.0, 50.0, 10).as("ybin"),
          col("value"))
        .where(col("xbin").isNotNull && col("ybin").isNotNull)
        .groupBy("xbin", "ybin")
        .agg(count(col("value")).as("n"),
          fp(stddev_pop(col("value"))).as("std_milli"))
        .orderBy("xbin", "ybin")
    }),

    // Dense-grid fill (process_adcp.py:125-131): every cell of a coarse
    // 7x5 grid materialized, empty cells null, plus the reference's phantom
    // trailing row/col.
    "q23_grid2d_dense" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("day", dayCol)
      val sparse = Grid2d.grid2d(ev,
        col("day"), 0.0, 7.0, 5,
        col("value"), 0.0, 100.0, 5,
        col("value"), c => count(c).cast("long"))
      Grid2d.denseFill(s, sparse, 5, 5, phantomEdge = true)
        .orderBy("xbin", "ybin")
    }),

    // Linear-interpolation join (`interp`): view-series value interpolated
    // onto each click event's timestamp, per user. Null outside the hull,
    // exact at coincident knots.
    "q10_interp_join" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("x", col("ts_us"))
      val src = ev.where(col("event_type") === "view").select("user_id", "x", "value")
      val dst = ev.where(col("event_type") === "click").select("user_id", "event_id", "x")
      InterpJoin.interpolate(src, dst, "x", Seq("value"), Seq("user_id"))
        .select(col("event_id"), fp(col("interp_value")).as("interp_milli"))
        .orderBy("event_id")
    }),

    // Tumbling event-time window (Structured Streaming surface, SURVEY.md
    // §7.5): the exact transformation the streaming path runs, checked here
    // in batch mode against the oracle — Spark's unified batch/stream API.
    "q38_tumbling_window" -> ((s, dir) => {
      graft.streaming.StreamingOps.tumblingStats(events(s, dir))
        .orderBy("win_start_us", "event_type")
    }),

    // Nearest as-of match (process_adcp.py:1503-1507): each click matched to
    // the temporally nearest error event per user; ties toward earlier.
    "q11_asof_nearest" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("x", col("ts_us"))
      val src = ev.where(col("event_type") === "error").select("user_id", "x", "value")
      val dst = ev.where(col("event_type") === "click").select("user_id", "event_id", "x")
      InterpJoin.nearest(src, dst, "x", Seq("value"), Seq("user_id"))
        .select(col("event_id"), fp(col("nearest_value")).as("near_milli"))
        .orderBy("event_id")
    })
  )

  private def interpSql(srcType: String, dstType: String, valueExpr: String): String = {
    val ord = "ORDER BY x, is_src DESC"
    s"""WITH src AS (SELECT user_id, epoch_us(ts) AS x, $valueExpr AS v FROM events WHERE event_type = '$srcType'),
       dst AS (SELECT user_id, event_id, epoch_us(ts) AS x FROM events WHERE event_type = '$dstType'),
       u AS (SELECT user_id, x, 1 AS is_src, v, CAST(NULL AS BIGINT) AS event_id FROM src
             UNION ALL
             SELECT user_id, x, 0, NULL, event_id FROM dst),
       w AS (SELECT *,
         last_value(CASE WHEN is_src = 1 AND v IS NOT NULL THEN CAST(x AS DOUBLE) END IGNORE NULLS)
           OVER (PARTITION BY user_id $ord ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x0,
         last_value(CASE WHEN is_src = 1 AND v IS NOT NULL THEN v END IGNORE NULLS)
           OVER (PARTITION BY user_id $ord ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y0,
         first_value(CASE WHEN is_src = 1 AND v IS NOT NULL THEN CAST(x AS DOUBLE) END IGNORE NULLS)
           OVER (PARTITION BY user_id $ord ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS x1,
         first_value(CASE WHEN is_src = 1 AND v IS NOT NULL THEN v END IGNORE NULLS)
           OVER (PARTITION BY user_id $ord ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS y1
         FROM u)"""
  }

  val oracle: Map[String, String] = Map(
    "q04_grid2d_mean" ->
      s"""SELECT ${Bins.cutRightSql(sqlDay, 0.0, 1.0, 31)} AS xbin,
          ${Bins.cutRightSql("value", 0.0, 25.0, 20)} AS ybin,
          ${sqlExactMeanMilli("value")} AS mean_milli
          FROM events
          WHERE ${Bins.cutRightSql(sqlDay, 0.0, 1.0, 31)} IS NOT NULL
            AND ${Bins.cutRightSql("value", 0.0, 25.0, 20)} IS NOT NULL
          GROUP BY 1, 2 ORDER BY xbin, ybin""",

    "q05_grid2d_median" ->
      s"""SELECT ${Bins.cutRightSql(sqlDay, 0.0, 1.0, 31)} AS xbin,
          ${Bins.cutRightSql("value", 0.0, 25.0, 20)} AS ybin,
          ${sqlFp("median(value)")} AS median_milli
          FROM events
          WHERE ${Bins.cutRightSql(sqlDay, 0.0, 1.0, 31)} IS NOT NULL
            AND ${Bins.cutRightSql("value", 0.0, 25.0, 20)} IS NOT NULL
          GROUP BY 1, 2 ORDER BY xbin, ybin""",

    "q05b_grid2d_count_std" ->
      s"""SELECT ${Bins.cutRightSql(sqlDay, 0.0, 1.0, 31)} AS xbin,
          ${Bins.cutRightSql("value", 0.0, 50.0, 10)} AS ybin,
          count(value) AS n, ${sqlFp("stddev_pop(value)")} AS std_milli
          FROM events
          WHERE ${Bins.cutRightSql(sqlDay, 0.0, 1.0, 31)} IS NOT NULL
            AND ${Bins.cutRightSql("value", 0.0, 50.0, 10)} IS NOT NULL
          GROUP BY 1, 2 ORDER BY xbin, ybin""",

    "q23_grid2d_dense" ->
      s"""WITH sparse AS (
            SELECT ${Bins.cutRightSql(sqlDay, 0.0, 7.0, 5)} AS xbin,
              ${Bins.cutRightSql("value", 0.0, 100.0, 5)} AS ybin,
              count(value) AS value
            FROM events
            WHERE ${Bins.cutRightSql(sqlDay, 0.0, 7.0, 5)} IS NOT NULL
              AND ${Bins.cutRightSql("value", 0.0, 100.0, 5)} IS NOT NULL
            GROUP BY 1, 2),
          cells AS (SELECT x.xbin, y.ybin
            FROM (SELECT unnest(generate_series(0, 5)) AS xbin) x,
                 (SELECT unnest(generate_series(0, 5)) AS ybin) y)
          SELECT cells.xbin, cells.ybin, sparse.value
          FROM cells LEFT JOIN sparse USING (xbin, ybin)
          ORDER BY xbin, ybin""",

    "q38_tumbling_window" ->
      """SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS win_start_us,
           event_type, count(*) AS n,
           CAST(sum(round(value * 100)) AS BIGINT) AS sum_cents
         FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type""",

    "q10_interp_join" ->
      s"""${interpSql("view", "click", "value")}
          SELECT event_id, ${sqlFp(
        "CASE WHEN x0 = x THEN y0 WHEN x1 = x THEN y1 " +
          "WHEN x0 IS NOT NULL AND x1 IS NOT NULL THEN y0 + (y1 - y0) * (x - x0) / (x1 - x0) END")} AS interp_milli
          FROM w WHERE is_src = 0 ORDER BY event_id""",

    "q11_asof_nearest" ->
      s"""WITH src AS (SELECT user_id, epoch_us(ts) AS x, value AS v FROM events WHERE event_type = 'error'),
          dst AS (SELECT user_id, event_id, epoch_us(ts) AS x FROM events WHERE event_type = 'click'),
          u AS (SELECT user_id, x, 1 AS is_src, v, CAST(NULL AS BIGINT) AS event_id FROM src
                UNION ALL
                SELECT user_id, x, 0, NULL, event_id FROM dst),
          w AS (SELECT *,
            last_value(CASE WHEN is_src = 1 THEN CAST(x AS DOUBLE) END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY x, is_src DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x0,
            last_value(CASE WHEN is_src = 1 THEN v END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY x, is_src DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y0,
            first_value(CASE WHEN is_src = 1 THEN CAST(x AS DOUBLE) END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY x, is_src DESC ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS x1,
            first_value(CASE WHEN is_src = 1 THEN v END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY x, is_src DESC ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS y1
            FROM u)
          SELECT event_id, ${sqlFp(
        "CASE WHEN x1 IS NULL OR (x0 IS NOT NULL AND abs(x - x0) <= abs(x1 - x)) THEN y0 ELSE y1 END")} AS near_milli
          FROM w WHERE is_src = 0 ORDER BY event_id"""
  )
}
