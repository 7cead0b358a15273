package graft.queries

import org.apache.spark.sql.functions._
import Common._

/** Relational surface: scans, projections, filters, equi/broadcast/semi/anti
  * joins, global and grouped aggregates, set ops, rollup, top-k, JSON, and
  * banker's rounding. Covers SURVEY.md §2.1, §2.2, §2.3 (key joins), §2.4
  * (global aggs), §2.10 (Spark-free categories exercised via the oracle).
  */
object RelationalQueries {

  val queries: Map[String, Q] = Map(
    // §2.1/§2.2 — scan + projection + predicate; both pushed to parquet.
    "q01_scan_filter_project" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .where(col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"),
          fp(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_milli"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // §2.2 — QC threshold mask (remove_outliers semantics,
    // process_adcp.py:478-566): null-out out-of-band values, report the
    // removed fraction per group exactly like the reference's "% removed".
    "q02_qc_mask" -> ((s, dir) => {
      val ev = events(s, dir)
      ev.select(col("event_type"),
          when(col("value") <= 300.0, col("value")).as("v"),
          (col("value") > 300.0).cast("double").as("removed"))
        .groupBy("event_type")
        .agg(count(col("v")).as("n_kept"),
          fp(avg(col("removed"))).as("pct_removed_milli"),
          exactMeanMilli(col("v")).as("mean_kept_milli"))
        .orderBy("event_type")
    }),

    // §2.4 — grouped global aggregates (TPC-H Q1 shape).
    "q03_agg_pricing" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          intSum(col("l_quantity"), 0).as("sum_qty"),
          intSum(col("l_extendedprice"), 2).as("sum_base_cents"),
          intSum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100), 0)
            .as("sum_disc_cents"),
          exactMeanMilli(col("l_quantity"), 0).as("avg_qty_milli"),
          exactMeanMilli(col("l_discount"), 2).as("avg_disc_milli"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // §2.3/§2.10 — hash equi-join + grouped agg.
    "q12_join_equi" -> ((s, dir) => {
      val o = table(s, dir, "orders"); val c = table(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), intSum(col("o_totalprice"), 2).as("sum_cents"))
        .orderBy("c_mktsegment")
    }),

    // §2.10 — broadcast join: part is a dim table, hint it explicitly so the
    // 100 TB plan never shuffles lineitem for this join.
    "q13_join_broadcast" -> ((s, dir) => {
      val li = table(s, dir, "lineitem"); val p = table(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy("p_brand")
        .agg(intSum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100), 0)
          .as("revenue_cents"), count(lit(1)).as("n"))
        .orderBy("p_brand")
    }),

    // §2.10 — left-semi (EXISTS).
    "q14_join_semi" -> ((s, dir) => {
      val c = table(s, dir, "customer"); val o = table(s, dir, "orders")
      val n = table(s, dir, "nation")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n_cust"))
        .orderBy("n_name")
    }),

    // §2.10 — left-anti (NOT EXISTS): parts never shipped at max quantity.
    "q15_join_anti" -> ((s, dir) => {
      val p = table(s, dir, "part"); val li = table(s, dir, "lineitem")
      p.join(li.where(col("l_quantity") >= 50.0),
          p("p_partkey") === col("l_partkey"), "left_anti")
        .groupBy("p_brand").agg(count(lit(1)).as("n_parts"))
        .orderBy("p_brand")
    }),

    // §2.4 — per-key first/last via min_by/max_by (per-dive first/last GPS
    // fix, process_adcp.py:1352-1369). Deterministic arg: offset-us * 1e6 +
    // event_id packs (time, id) into one monotone BIGINT.
    "q16_first_last" -> ((s, dir) => {
      val ev = events(s, dir)
      val key = (col("ts_us") - lit(1704067200000000L)) * lit(1000000L) + col("event_id")
      ev.groupBy("user_id")
        .agg(fp(min_by(col("value"), key)).as("first_val_milli"),
          fp(max_by(col("value"), key)).as("last_val_milli"),
          count(lit(1)).as("n"))
        .orderBy("user_id")
    }),

    // §2.4 — exact median + population stddev (np.nanmedian / np.nanstd
    // ddof=0 parity — stddev_pop, NOT sample stddev).
    "q17_median_stddev" -> ((s, dir) => {
      events(s, dir)
        .groupBy("event_type")
        .agg(fp(median(col("value"))).as("median_milli"),
          fp(stddev_pop(col("value"))).as("stddev_milli"),
          exactMeanMilli(col("value")).as("mean_milli"))
        .orderBy("event_type")
    }),

    // §2.10 — top-k (orderBy + limit).
    "q18_topk" -> ((s, dir) => {
      events(s, dir)
        .groupBy("user_id").agg(intSum(col("value"), 2).as("total_cents"))
        .orderBy(col("total_cents").desc, col("user_id"))
        .limit(10)
    }),

    // §2.10 — rollup with grouping ids.
    "q19_rollup" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("day", floor(col("ts_us").cast("double") / 8.64e10).cast("long"))
      ev.rollup("event_type", "day")
        .agg(count(lit(1)).as("n"), intSum(col("value"), 2).as("sum_cents"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("event_type").asc_nulls_first, col("day").asc_nulls_first)
    }),

    // §2.4 — distinct day axis (unique(time.round('D')),
    // process_adcp.py:1654).
    "q20_distinct_days" -> ((s, dir) => {
      events(s, dir)
        .select(floor(col("ts_us").cast("double") / 8.64e10).cast("long").as("day"))
        .distinct()
        .orderBy("day")
    }),

    // §2.10 — set ops: retention cohorts via intersect / except.
    "q21_set_ops" -> ((s, dir) => {
      val ev = events(s, dir)
      val day0 = 1704067200000000L // 2024-01-01 UTC epoch micros
      val dayUs = 86400000000L
      def usersBetween(lo: Long, hi: Long) = ev
        .where(col("ts_us") >= lit(lo) && col("ts_us") < lit(hi))
        .select("user_id")
      val wk1 = usersBetween(day0, day0 + 7 * dayUs)
      val wk4 = usersBetween(day0 + 21 * dayUs, day0 + 28 * dayUs)
      wk1.intersect(wk4).withColumn("cohort", lit("both"))
        .unionAll(wk1.except(wk4).withColumn("cohort", lit("wk1_only")))
        .orderBy("cohort", "user_id")
    }),

    // §2.10 — JSON extraction from the events props payload.
    "q22_json" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(exactMeanMilli(col("k"), 0).as("avg_k_milli"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // §2.6 — banker's rounding (np.round half-even on interpolated profile
    // numbers, process_adcp.py:181). Inputs k/2 are exact binary doubles, so
    // half-even ties are hit exactly and deterministically.
    "q28_bround" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .select(bround(col("l_quantity") / 2.0).cast("long").as("q_even"))
        .groupBy("q_even").agg(count(lit(1)).as("n"))
        .orderBy("q_even")
    }),

    // §2.6 — scalar-function surface: trig / log / sqrt compositions with
    // the reference's angle-wrap idiom (process_adcp.py:359-373 heading,
    // :362-365 circ wrap).
    "q29_elementwise" -> ((s, dir) => {
      val v = col("value")
      val headingDeg = degrees(atan2(sin(radians(v * 7.0)), cos(radians(v * 3.0))))
      val wrapped = pmod(headingDeg + 360.0, lit(360.0))
      events(s, dir)
        .select(col("event_id"),
          fp(wrapped).as("wrap_milli"),
          fp(sqrt(v) + log(lit(1.0) + v) + exp(-v / 100.0)).as("mix_milli"))
        .orderBy("event_id")
    }),

    // §2.4 — rmsd = sqrt(mean(x^2)) (process_adcp.py:149-150) with exact
    // integerized inner sum.
    "q30_rmsd" -> ((s, dir) => {
      events(s, dir)
        .groupBy("event_type")
        .agg(fp(sqrt(sum(pow(round(col("value") * 100), 2)) / count(lit(1))) / 100.0)
          .as("rmsd_milli"))
        .orderBy("event_type")
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      s"""SELECT l_orderkey, l_linenumber,
          ${sqlFp("l_extendedprice * (1.0 - l_discount)")} AS net_milli
          FROM lineitem
          WHERE l_shipdate < TIMESTAMP '1998-01-01' AND l_quantity > 45
          ORDER BY l_orderkey, l_linenumber""",

    "q02_qc_mask" ->
      s"""SELECT event_type,
          count(CASE WHEN value <= 300.0 THEN value END) AS n_kept,
          ${sqlFp("avg(CASE WHEN value > 300.0 THEN 1.0 ELSE 0.0 END)")} AS pct_removed_milli,
          ${sqlExactMeanMilli("CASE WHEN value <= 300.0 THEN value END")} AS mean_kept_milli
          FROM events GROUP BY event_type ORDER BY event_type""",

    "q03_agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
          ${sqlIntSum("l_quantity", 0)} AS sum_qty,
          ${sqlIntSum("l_extendedprice", 2)} AS sum_base_cents,
          ${sqlIntSum("round(l_extendedprice * (1.0 - l_discount) * 100)", 0)} AS sum_disc_cents,
          ${sqlExactMeanMilli("l_quantity", 0)} AS avg_qty_milli,
          ${sqlExactMeanMilli("l_discount", 2)} AS avg_disc_milli,
          count(*) AS count_order
          FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
          GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q12_join_equi" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders,
          ${sqlIntSum("o_totalprice", 2)} AS sum_cents
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q13_join_broadcast" ->
      s"""SELECT p_brand,
          ${sqlIntSum("round(l_extendedprice * (1.0 - l_discount) * 100)", 0)} AS revenue_cents,
          count(*) AS n
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand ORDER BY p_brand""",

    "q14_join_semi" ->
      """SELECT n_name, count(*) AS n_cust
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY n_name ORDER BY n_name""",

    "q15_join_anti" ->
      """SELECT p_brand, count(*) AS n_parts
         FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem
                           WHERE l_partkey = p_partkey AND l_quantity >= 50.0)
         GROUP BY p_brand ORDER BY p_brand""",

    "q16_first_last" ->
      s"""SELECT user_id,
          ${sqlFp("min_by(value, (epoch_us(ts) - 1704067200000000) * 1000000 + event_id)")} AS first_val_milli,
          ${sqlFp("max_by(value, (epoch_us(ts) - 1704067200000000) * 1000000 + event_id)")} AS last_val_milli,
          count(*) AS n
          FROM events GROUP BY user_id ORDER BY user_id""",

    "q17_median_stddev" ->
      s"""SELECT event_type,
          ${sqlFp("median(value)")} AS median_milli,
          ${sqlFp("stddev_pop(value)")} AS stddev_milli,
          ${sqlExactMeanMilli("value")} AS mean_milli
          FROM events GROUP BY event_type ORDER BY event_type""",

    "q18_topk" ->
      s"""SELECT user_id, ${sqlIntSum("value", 2)} AS total_cents
          FROM events GROUP BY user_id
          ORDER BY total_cents DESC, user_id LIMIT 10""",

    "q19_rollup" ->
      s"""SELECT event_type, day, count(*) AS n, ${sqlIntSum("value", 2)} AS sum_cents,
          CAST(GROUPING(event_type) * 2 + GROUPING(day) AS BIGINT) AS gid
          FROM (SELECT *, CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day FROM events)
          GROUP BY ROLLUP(event_type, day)
          ORDER BY gid, event_type NULLS FIRST, day NULLS FIRST""",

    "q20_distinct_days" ->
      """SELECT DISTINCT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day
         FROM events ORDER BY day""",

    "q21_set_ops" ->
      """WITH wk1 AS (SELECT DISTINCT user_id FROM events
           WHERE epoch_us(ts) >= 1704067200000000 AND epoch_us(ts) < 1704672000000000),
         wk4 AS (SELECT DISTINCT user_id FROM events
           WHERE epoch_us(ts) >= 1705881600000000 AND epoch_us(ts) < 1706486400000000)
         SELECT user_id, 'both' AS cohort FROM wk1 INTERSECT SELECT user_id, 'both' FROM wk4
         UNION ALL
         (SELECT user_id, 'wk1_only' AS cohort FROM wk1 EXCEPT SELECT user_id, 'wk1_only' FROM wk4)
         ORDER BY cohort, user_id""",

    "q22_json" ->
      s"""SELECT event_type,
          ${sqlExactMeanMilli("CAST(json_extract_string(props, '$.k') AS BIGINT)", 0)} AS avg_k_milli,
          min(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS min_k,
          max(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS max_k
          FROM events GROUP BY event_type ORDER BY event_type""",

    "q28_bround" ->
      """SELECT CAST(CASE WHEN l_quantity / 2.0 - floor(l_quantity / 2.0) = 0.5
           THEN CASE WHEN CAST(floor(l_quantity / 2.0) AS BIGINT) % 2 = 0
                THEN floor(l_quantity / 2.0) ELSE floor(l_quantity / 2.0) + 1 END
           ELSE round(l_quantity / 2.0) END AS BIGINT) AS q_even,
         count(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY q_even""",

    "q29_elementwise" ->
      s"""SELECT event_id,
          ${sqlFp("fmod(fmod(degrees(atan2(sin(radians(value * 7.0)), cos(radians(value * 3.0)))) + 360.0, 360.0) + 360.0, 360.0)")} AS wrap_milli,
          ${sqlFp("sqrt(value) + ln(1 + value) + exp(-value / 100.0)")} AS mix_milli
          FROM events ORDER BY event_id""",

    "q30_rmsd" ->
      s"""SELECT event_type,
          ${sqlFp("sqrt(sum(pow(round(value * 100), 2)) / count(*)) / 100.0")} AS rmsd_milli
          FROM events GROUP BY event_type ORDER BY event_type"""
  )
}
