package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Windows
import Common._

/** Ordered-window operator surface (SURVEY.md §2.5): centered running
  * stats, adjacent diff, centered gradient, ffill, running/reverse cumsum,
  * reset-at-anchor integration, de-mean, parity split — each on the events
  * table partitioned by user_id and ordered by (ts, event_id).
  *
  * Window state is bounded per user, so every one of these scales
  * horizontally: the shuffle key is user_id and no partition ever holds
  * more than one user's rows.
  */
object WindowQueries {

  private def ev(s: org.apache.spark.sql.SparkSession, dir: String) =
    events(s, dir)

  private def w = Windows.ordered(
    Seq(col("ts_us"), col("event_id")), Seq(col("user_id")))

  /** Shared DuckDB window clause. */
  private val W = "PARTITION BY user_id ORDER BY epoch_us(ts), event_id"

  val queries: Map[String, Q] = Map(
    // RunningMean (process_adcp.py:137-141): centered 2N+1 frame, edge-
    // shrinking, null-skipping. Emitted via the exact-integerized mean so
    // Spark's incremental sliding frame and DuckDB's segment tree agree
    // bit-for-bit.
    "q06_running_mean" -> ((s, dir) => {
      val frame = w.rowsBetween(-2, 2)
      val exact = round(lit(1000.0) * sum(round(col("value") * 100)).over(frame) /
        100.0 / count(col("value")).over(frame)).cast("long")
      ev(s, dir)
        .select(col("event_id"), exact.as("rmean_milli"))
        .orderBy("event_id")
    }),

    // Centered running median/max/min (notebook cell 10 variants). Spark
    // disallows `median` over a row frame, so the frame is materialized with
    // collect_list + array_sort — exact selection-based median, identical to
    // the sort DuckDB's windowed median performs.
    "q06b_running_median" -> ((s, dir) => {
      ev(s, dir)
        .select(col("event_id"),
          fp(Windows.runningMedian(col("value"), 2, w)).as("rmed_milli"),
          fp(Windows.runningMax(col("value"), 2, w)).as("rmax_milli"),
          fp(Windows.runningMin(col("value"), 2, w)).as("rmin_milli"))
        .orderBy("event_id")
    }),

    // Running sum (np.cumsum; process_adcp.py:1345-1346).
    "q07_cumsum" -> ((s, dir) => {
      ev(s, dir)
        .select(col("event_id"), fp(Windows.cumsum(col("value"), w)).as("cum_milli"))
        .orderBy("event_id")
    }),

    // ffill over gaps (process_adcp.py:1329-1333): error rows are gaps.
    "q08_ffill" -> ((s, dir) => {
      ev(s, dir)
        .withColumn("gapped", when(col("event_type") =!= "error", col("value")))
        .select(col("event_id"), fp(Windows.ffill(col("gapped"), w)).as("filled_milli"))
        .orderBy("event_id")
    }),

    // np.gradient parity (centered, one-sided edges; process_adcp.py:1171).
    "q09_gradient" -> ((s, dir) => {
      val t = col("ts_us").cast("double") / 1e6
      ev(s, dir)
        .withColumn("t", t)
        .select(col("event_id"),
          fp(Windows.gradient(col("value"), col("t"), w), 6).as("grad_micro"))
        .orderBy("event_id")
    }),

    // Adjacent diff (np.diff; process_adcp.py:1221) — dt between events.
    "q09b_diff" -> ((s, dir) => {
      ev(s, dir)
        .withColumn("t", col("ts_us").cast("double") / 1e6)
        .select(col("event_id"), fp(Windows.diff(col("t"), w)).as("dt_milli"))
        .orderBy("event_id")
    }),

    // Reverse (suffix) cumsum — bottom-up integration (process_adcp.py:1203).
    "q25_reverse_cumsum" -> ((s, dir) => {
      val wDesc = Windows.ordered(
        Seq(col("ts_us").desc, col("event_id").desc), Seq(col("user_id")))
      ev(s, dir)
        .select(col("event_id"), fp(Windows.cumsum(col("value"), wDesc)).as("suffix_milli"))
        .orderBy("event_id")
    }),

    // reset_transport_at_GPS (process_adcp.py:1329-1349): running integral
    // minus its value at the most recent anchor (purchase) row.
    "q24_reset_cumsum" -> ((s, dir) => {
      val running = Windows.cumsum(col("value"), w)
      val anchor = col("event_type") === "purchase"
      ev(s, dir)
        .withColumn("run", running)
        .select(col("event_id"),
          fp(Windows.resetAtAnchor(col("run"), anchor, w)).as("reset_milli"))
        .orderBy("event_id")
    }),

    // De-mean over partition (process_adcp.py:1682,1959) with the exact-
    // integerized mean so both engines compute an identical divisor.
    "q26_demean" -> ((s, dir) => {
      val pw = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      val exactMean = sum(round(col("value") * 100)).over(pw) / 100.0 /
        count(lit(1)).over(pw)
      ev(s, dir)
        .select(col("event_id"), fp(col("value") - exactMean).as("demean_milli"))
        .orderBy("event_id")
    }),

    // Parity split (process_adcp.py:1863-1864 up/down casts via pmod).
    "q27_parity" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(pmod(col("user_id"), lit(2)).as("parity"))
        .agg(count(lit(1)).as("n"), intSum(col("value"), 2).as("sum_cents"))
        .orderBy("parity")
    }),

    // Reverse running count of finite values (bottom-10-bins mask,
    // process_adcp.py:1756-1759): tail position of non-error rows.
    "q25b_count_from_end" -> ((s, dir) => {
      val wDesc = Windows.ordered(
        Seq(col("ts_us").desc, col("event_id").desc), Seq(col("user_id")))
      ev(s, dir)
        .withColumn("finite", when(col("event_type") =!= "error", col("value")))
        .select(col("event_id"),
          Windows.cumsum(when(col("finite").isNotNull, 1L).otherwise(0L), wDesc)
            .cast("long").as("n_from_end"))
        .orderBy("event_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q06_running_mean" ->
      s"""SELECT event_id,
          CAST(round(1000.0 * sum(round(value * 100)) OVER ($W ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
            / 100.0 / count(value) OVER ($W ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)) AS BIGINT) AS rmean_milli
          FROM events ORDER BY event_id""",

    "q06b_running_median" ->
      s"""SELECT event_id,
          ${sqlFp(s"median(value) OVER ($W ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)")} AS rmed_milli,
          ${sqlFp(s"max(value) OVER ($W ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)")} AS rmax_milli,
          ${sqlFp(s"min(value) OVER ($W ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)")} AS rmin_milli
          FROM events ORDER BY event_id""",

    "q07_cumsum" ->
      s"""SELECT event_id,
          ${sqlFp(s"sum(value) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS cum_milli
          FROM events ORDER BY event_id""",

    "q08_ffill" ->
      s"""SELECT event_id,
          ${sqlFp("last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS) " +
        s"OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS filled_milli
          FROM events ORDER BY event_id""",

    "q09_gradient" ->
      s"""WITH t AS (SELECT event_id, user_id, ts, value, epoch_us(ts) / 1000000.0 AS t FROM events),
          g AS (SELECT event_id,
            lag(value) OVER ($W) AS vp, lead(value) OVER ($W) AS vn,
            lag(t) OVER ($W) AS tp, lead(t) OVER ($W) AS tn,
            value AS v, t FROM t)
          SELECT event_id, ${sqlFp(
        "CASE WHEN tp IS NOT NULL AND tn IS NOT NULL " +
          "AND (t - tp) <> 0 AND (tn - t) <> 0 THEN " +
          "(-(tn - t) / ((t - tp) * ((t - tp) + (tn - t)))) * vp " +
          "+ (((tn - t) - (t - tp)) / ((t - tp) * (tn - t))) * v " +
          "+ ((t - tp) / ((tn - t) * ((t - tp) + (tn - t)))) * vn " +
          "WHEN tp IS NULL AND tn IS NOT NULL AND (tn - t) <> 0 THEN (vn - v) / (tn - t) " +
          "WHEN tn IS NULL AND tp IS NOT NULL AND (t - tp) <> 0 THEN (v - vp) / (t - tp) END", 6)} AS grad_micro
          FROM g ORDER BY event_id""",

    "q09b_diff" ->
      s"""WITH t AS (SELECT event_id, user_id, ts, epoch_us(ts) / 1000000.0 AS t FROM events)
          SELECT event_id, ${sqlFp(s"t - lag(t) OVER ($W)")} AS dt_milli
          FROM t ORDER BY event_id""",

    "q25_reverse_cumsum" ->
      s"""SELECT event_id,
          ${sqlFp("sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS suffix_milli
          FROM events ORDER BY event_id""",

    "q24_reset_cumsum" ->
      s"""WITH r AS (SELECT *,
            sum(value) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
          FROM events)
          SELECT event_id, ${sqlFp(
        "run - coalesce(last_value(CASE WHEN event_type = 'purchase' THEN run END IGNORE NULLS) " +
          s"OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)")} AS reset_milli
          FROM r ORDER BY event_id""",

    "q26_demean" ->
      s"""SELECT event_id,
          ${sqlFp("value - sum(round(value * 100)) OVER (PARTITION BY user_id) / 100.0 " +
        "/ count(*) OVER (PARTITION BY user_id)")} AS demean_milli
          FROM events ORDER BY event_id""",

    "q27_parity" ->
      s"""SELECT user_id % 2 AS parity, count(*) AS n, ${sqlIntSum("value", 2)} AS sum_cents
          FROM events GROUP BY 1 ORDER BY parity""",

    "q25b_count_from_end" ->
      s"""SELECT event_id,
          CAST(sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_from_end
          FROM events ORDER BY event_id"""
  )
}
