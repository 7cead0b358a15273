package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** q89's synthetic ping frame (shared with OracleMarginSpec's guard-band
    * check on the per-regime mean chain): depth/pressure = value, pitch
    * sign from user parity, a 3-slot u array (middle null — the nan-mean),
    * synthetic time from a bit-split of the id:
    * `(id & 0x3FFFFF) * 1e9 + (id >> 22) * 1000`. A raw event_id x 1e9
    * overflows BIGINT once ids pass ~9.2e9 (the sf10 replicas reach
    * ~1e11 — found by the 100x rehearsal; sf1's ~9e9 squeaked under by
    * 2%), and any MODULAR wrap either ties massively (a 9e9 modulus is
    * a multiple of the ScaleUp 1e9 id stride — at sf10 it tied ~91% of
    * rows and the zero-dt guards emptied the result) or pushes time_us
    * past 2^53, where replica-dependent double rounding of t moved
    * ~361 histogram rows across bin edges differently per engine. The
    * bit-split has neither failure mode: it is INJECTIVE for
    * id < 2^22 x 1e6 ≈ 4.2e12 (low 22 bits stride 1e9 us, high bits
    * stride 1000 us < the 1e9 gap — no two ids ever tie), every value
    * stays under (2^22)x1e9 + 2.4e8 < 2^53 (the BIGINT→DOUBLE cast is
    * EXACT, so both engines' t is bit-identical by construction), the
    * minimum 1 ms gap bounds |gradient| <= ~25/1e-3, keeping the
    * nano-integerized regime sums far from BIGINT overflow, and below
    * 2^22 (every driver SF) it is bit-identical to the original
    * event_id x 1e9 form.
    */
  def q89Pings(s: SparkSession, dir: String): DataFrame =
    events(s, dir).where(col("value").isNotNull).select(
      col("user_id"),
      (col("event_id").bitwiseAND(lit(4194303L)) * 1000000000L +
        shiftright(col("event_id"), 22) * 1000L).as("time_us"),
      col("value").as("depth"), col("value").as("pressure"),
      when(pmod(col("user_id"), lit(2)) === 0, lit(15.0))
        .otherwise(lit(-15.0)).as("pitch"),
      array(
        (pmod(col("event_id"), lit(40L)).cast("double") - 20.0) / 1000.0,
        lit(null).cast("double"),
        (pmod(col("event_id") * 7L, lit(40L)).cast("double") - 20.0) / 1000.0
      ).as("u"))

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

    // Gap-based sessionization (Structured Streaming surface, SURVEY.md
    // §7.5/§2.10): the batch twin of StreamingOps.gapSessionsStream — a new
    // session when >12h passes between a user's events. StreamingSpec pins
    // the flatMapGroupsWithState form to this oracle-checked one.
    "q65_sessionize" -> ((s, dir) => {
      graft.streaming.StreamingOps.gapSessions(events(s, dir), 43200000000L)
        .orderBy("user_id", "session_id")
    }),

    // Per-profile summaries (Structured Streaming surface): the batch twin
    // of StreamingOps.profileSummaries over events-as-pings (profile =
    // user_id mod 40, pressure = value — the q62 mapping). max/min are
    // value selections, not accumulations, so doubles stay oracle-exact.
    "q66_profile_summaries" -> ((s, dir) => {
      val pings = events(s, dir).select(
        pmod(col("user_id"), lit(40)).cast("long").as("profile_number"),
        col("ts_us").as("time_us"), col("value").as("pressure"))
      graft.streaming.StreamingOps.profileSummariesBatch(pings)
        .orderBy("profile_number")
    }),

    // Per-user session totals (Structured Streaming surface): the batch
    // twin of StreamingOps.sessionize — the cumulative (n, total) its
    // per-user mapGroupsWithState state converges to once a user's events
    // drain. Restricted to non-null values (the typed-encoder envelope
    // sessionize itself requires); totals in exact cents (q65 convention)
    // so the oracle is bit-deterministic.
    "q68_session_totals" -> ((s, dir) => {
      graft.streaming.StreamingOps.sessionTotalsBatch(
          events(s, dir).where(col("value").isNotNull))
        .orderBy("user_id")
    }),

    // verify_depth_bias computational core (process_adcp.py:1859-1950) on an
    // events-derived grid: travel direction from the across-profile latitude
    // gradient, 20 depth slabs, per-(var, slab, direction) 99-bin density
    // histograms over [-0.5, 0.5). Drives the real GridOutput.verifyDepthBias
    // operator; cell values are exact integer/rational constructions so the
    // DuckDB mirror is bit-deterministic (Common determinism rules).
    "q62_depth_bias_hist" -> ((s, dir) => {
      import graft.pipeline.{GridOutput, Options}
      val ev = events(s, dir).where(col("value").isNotNull)
      val glider = ev.select(
        pmod(col("user_id"), lit(40)).cast("long").as("profile_number"),
        col("value").as("pressure"), col("value"))
      val ax = GridOutput.axes(glider, Options(yRes = 25.0))
      val out = GridOutput.withXbin(glider, ax)
        .withColumn("ybin", GridOutput.depthBin(ax, col("pressure")))
        .where(col("xbin").isNotNull && col("ybin").isNotNull)
        .groupBy("xbin", "ybin")
        .agg(sum(round(col("value") * 100)).as("lat_cents"),
          count(lit(1)).as("n_cell"))
        .withColumn("latitude", col("lat_cents"))
        .withColumn("ADCP_E",
          (pmod(col("lat_cents").cast("long"), lit(1000L)).cast("double") - 500.0) / 1000.0)
        .withColumn("ADCP_N",
          (pmod(col("n_cell") * 37L, lit(1000L)).cast("double") - 500.0) / 1000.0)
        .withColumn("pressure_adcp", col("ybin").cast("double") * 25.0)
      GridOutput.verifyDepthBias(out, ax, s)
        .select(col("var"), col("slab").cast("long").as("slab"),
          col("direction"), col("bin"),
          col("n"), fp(col("density")).as("density_milli"))
        .orderBy("var", "slab", "direction", "bin")
    }),

    // verify_calcENUfromXYZ computational core (process_adcp.py:1289-1316)
    // on an events-derived ping frame: depth/pressure = value, pitch sign
    // from user parity, a 3-slot u array (middle slot null — exercises the
    // nan-mean) of exact rationals in [-0.02, 0.02), and a synthetic
    // strictly-monotone time axis (event_id x 1000 s) sized so dP =
    // np.gradient(depth, t) mostly lands inside the reference's bins/10
    // histogram range. Drives the real GridOutput.verifyEnu operator
    // (pressure gate, per-mission window gradient, regime masks, 99-bin
    // histogram + per-regime nan-mean); every value chain is IEEE basic
    // ops mirrored op-for-op, so the full frame hash-checks.
    "q89_verify_enu" -> ((s, dir) => {
      import graft.pipeline.GridOutput
      // mean_micro from the EXACT integer nano-sum (integerize-before-sum,
      // the q04 exactMeanMilli discipline): sum_d_nano is an order-
      // independent BIGINT, so the whole chain to the emitted integer is
      // one fixed IEEE divide sequence both engines execute identically —
      // no reliance on avg()'s summation order staying clear of a
      // rounding boundary
      GridOutput.verifyEnu(q89Pings(s, dir), missionCols = Seq("user_id"))
        .select(col("user_id"), col("regime"), col("bin"), col("n"),
          col("n_regime"),
          floor(col("sum_d_nano").cast("double") / lit(1000.0) /
            col("n_regime") + lit(0.5)).cast("long").as("mean_micro"))
        .orderBy("user_id", "regime", "bin")
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

    "q66_profile_summaries" ->
      """SELECT CAST(user_id % 40 AS BIGINT) AS profile_number,
           count(*) AS n_pings, max(value) AS max_pressure,
           min(epoch_us(ts)) AS t_start_us, max(epoch_us(ts)) AS t_end_us
         FROM events GROUP BY 1 ORDER BY profile_number""",

    "q65_sessionize" ->
      """WITH o AS (
           SELECT user_id, epoch_us(ts) AS tus, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts) > 43200000000
                  THEN 1 ELSE 0 END AS f
           FROM events),
         s AS (
           SELECT user_id, tus, value,
             CAST(sum(f) OVER (PARTITION BY user_id ORDER BY tus
               RANGE UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM o)
         SELECT user_id, session_id, count(*) AS n_events,
           min(tus) AS t_start_us, max(tus) AS t_end_us,
           CAST(sum(round(value * 100)) AS BIGINT) AS sum_cents
         FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""",

    "q68_session_totals" ->
      """SELECT user_id, count(*) AS n_events,
           CAST(sum(round(value * 100)) AS BIGINT) AS total_cents
         FROM events WHERE value IS NOT NULL
         GROUP BY user_id ORDER BY user_id""",

    "q10_interp_join" ->
      s"""${interpSql("view", "click", "value")}
          SELECT event_id, ${sqlFp(
        "CASE WHEN x0 = x THEN y0 WHEN x1 = x THEN y1 " +
          "WHEN x0 IS NOT NULL AND x1 IS NOT NULL THEN y0 + (y1 - y0) * (x - x0) / (x1 - x0) END")} AS interp_milli
          FROM w WHERE is_src = 0 ORDER BY event_id""",

    // the u nan-mean ((0 + ua + uc) / 2 — the middle null slot drops),
    // np.gradient via the q09 lag/lead pattern, regime masks, cutLeft
    // histogram and per-regime avg/count — every op mirrored in order.
    "q89_verify_enu" -> {
      val cut = Bins.cutLeftHistSql("d", -0.02, 0.04 / 99, 99)
      s"""WITH p AS (SELECT user_id, (event_id & 4194303) * 1000000000 + (event_id >> 22) * 1000 AS time_us,
                value AS depth, value AS pressure,
                CASE WHEN user_id % 2 = 0 THEN 15.0 ELSE -15.0 END AS pitch,
                ((event_id % 40) - 20.0) / 1000.0 AS ua,
                (((event_id * 7) % 40) - 20.0) / 1000.0 AS uc
              FROM events WHERE value IS NOT NULL),
          f AS (SELECT *, CAST(time_us AS DOUBLE) / 1000000.0 AS t
                FROM p WHERE pressure > 10),
          g AS (SELECT user_id, pitch, depth,
                  (0.0 + ua + uc) / 2 AS u,
                  lag(depth) OVER w AS vp, lead(depth) OVER w AS vn,
                  lag(t) OVER w AS tp, lead(t) OVER w AS tn,
                  depth AS v, t
                FROM f WINDOW w AS (PARTITION BY user_id ORDER BY time_us)),
          rr AS (SELECT user_id,
                  CASE WHEN pitch < 0 AND depth > 20.0 THEN 'dive'
                       WHEN pitch > 0 AND depth > 20.0 THEN 'climb' END AS regime,
                  (CASE WHEN tp IS NOT NULL AND tn IS NOT NULL
                          AND (t - tp) <> 0 AND (tn - t) <> 0 THEN
                          (-(tn - t) / ((t - tp) * ((t - tp) + (tn - t)))) * vp
                          + (((tn - t) - (t - tp)) / ((t - tp) * (tn - t))) * v
                          + ((t - tp) / ((tn - t) * ((t - tp) + (tn - t)))) * vn
                        WHEN tp IS NULL AND tn IS NOT NULL AND (tn - t) <> 0 THEN (vn - v) / (tn - t)
                        WHEN tn IS NULL AND tp IS NOT NULL AND (t - tp) <> 0 THEN (v - vp) / (t - tp) END) - u AS d
                FROM g
                WHERE (CASE WHEN pitch < 0 AND depth > 20.0 THEN 'dive'
                            WHEN pitch > 0 AND depth > 20.0 THEN 'climb' END) IS NOT NULL),
          hist AS (SELECT user_id, regime, bin, count(*) AS n
                   FROM (SELECT user_id, regime, $cut AS bin FROM rr)
                   WHERE bin IS NOT NULL GROUP BY 1, 2, 3),
          stats AS (SELECT user_id, regime,
                      CAST(sum(CAST(floor(d * 1000000000.0 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_d_nano,
                      count(d) AS n_regime
                    FROM rr GROUP BY 1, 2)
          SELECT h.user_id, h.regime, h.bin, h.n,
            CAST(s.n_regime AS BIGINT) AS n_regime,
            CAST(floor(CAST(s.sum_d_nano AS DOUBLE) / 1000.0 / s.n_regime
              + 0.5) AS BIGINT) AS mean_micro
          FROM hist h JOIN stats s USING (user_id, regime)
          ORDER BY user_id, regime, bin"""
    },

    "q62_depth_bias_hist" -> {
      val step = 1.0 / 99 // GridOutput.histStep, shortest-repr round-trips
      s"""WITH ev AS (SELECT user_id % 40 AS pn, value FROM events WHERE value IS NOT NULL),
          ym AS (SELECT max(ceil(value)) AS ymax FROM ev),
          dim AS (SELECT pn, CAST(dense_rank() OVER (ORDER BY pn) AS BIGINT) - 2 AS xb
                  FROM (SELECT DISTINCT pn FROM ev)),
          xl AS (SELECT max(xb) AS x_last FROM dim),
          cells AS (
            SELECT d.xb AS xbin,
              CASE WHEN CAST(ceil((e.value - 0.0)/25.0) AS BIGINT) - 1 >= 0
                    AND CAST(ceil((e.value - 0.0)/25.0) AS BIGINT) - 1 < CAST(y.ymax AS BIGINT) - 1
                   THEN CAST(ceil((e.value - 0.0)/25.0) AS BIGINT) - 1 END AS ybin,
              e.value
            FROM ev e JOIN dim d ON e.pn = d.pn CROSS JOIN ym y
            WHERE d.xb IS NOT NULL),
          grid AS (
            SELECT xbin, ybin, sum(round(value*100)) AS lat, count(*) AS n_cell
            FROM cells WHERE ybin IS NOT NULL GROUP BY 1, 2),
          g2 AS (
            SELECT xbin, ybin, lat,
              (CAST((CAST(lat AS BIGINT) % 1000) AS DOUBLE) - 500.0)/1000.0 AS e,
              (CAST(((n_cell*37) % 1000) AS DOUBLE) - 500.0)/1000.0 AS n_,
              CAST(ybin AS DOUBLE)*25.0 AS p
            FROM grid),
          dirs AS (
            SELECT g2.*, xl.x_last,
              lag(xbin) OVER w AS xp, lead(xbin) OVER w AS xn,
              lag(lat) OVER w AS lp, lead(lat) OVER w AS ln_
            FROM g2 CROSS JOIN xl
            WINDOW w AS (PARTITION BY ybin ORDER BY xbin)),
          dird AS (
            SELECT *,
              CASE WHEN grad > 0 THEN 'N' WHEN grad < 0 THEN 'S' END AS direction
            FROM (SELECT *,
              CASE WHEN xbin = 0 THEN (CASE WHEN xn = xbin + 1 THEN ln_ - lat END)
                   WHEN xbin = x_last THEN (CASE WHEN xp = xbin - 1 THEN lat - lp END)
                   ELSE (CASE WHEN xp = xbin - 1 AND xn = xbin + 1 THEN (ln_ - lp)/2.0 END)
              END AS grad FROM dirs)
            WHERE grad > 0 OR grad < 0),
          vals AS (
            SELECT direction, p, 'ADCP_E' AS var, e AS v FROM dird
            UNION ALL SELECT direction, p, 'ADCP_N', n_ FROM dird
            UNION ALL SELECT direction, p, 'MAG', sqrt(pow(e,2)+pow(n_,2)) FROM dird),
          slabs AS (SELECT CAST(i AS BIGINT) AS slab, (y.ymax - 5.0) * i / 19.0 AS sd
                    FROM (SELECT unnest(generate_series(0, 19)) AS i) CROSS JOIN ym y),
          dr AS (SELECT (((y.ymax - 5.0) / 19.0) / 2.0) AS drange FROM ym y),
          binned AS (
            SELECT var, slab, direction, ${graft.core.Bins.cutLeftHistSql("v", -0.5, step, 99)} AS bin
            FROM vals CROSS JOIN slabs CROSS JOIN dr
            WHERE abs(vals.p - slabs.sd) < dr.drange)
          SELECT var, slab, direction, bin, count(*) AS n,
            CAST(round((count(*) / (sum(count(*)) OVER (PARTITION BY var, slab, direction) * $step)) * 1000.0) AS BIGINT) AS density_milli
          FROM binned WHERE bin IS NOT NULL
          GROUP BY var, slab, direction, bin
          ORDER BY var, slab, direction, bin"""
    },

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
