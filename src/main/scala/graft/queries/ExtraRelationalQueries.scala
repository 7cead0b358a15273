package graft.queries

import org.apache.spark.sql.functions._
import Common._

/** Remaining SURVEY.md §2.10 categories with no reference counterpart,
  * exercised through the oracle: cube, grouping sets, exact + approximate
  * distinct aggregation, string-function battery.
  */
object ExtraRelationalQueries {

  val queries: Map[String, Q] = Map(
    // cube over (event_type, parity) with grouping ids.
    "q36_cube" -> ((s, dir) => {
      events(s, dir)
        .withColumn("parity", pmod(col("user_id"), lit(2)))
        .cube("event_type", "parity")
        .agg(count(lit(1)).as("n"), intSum(col("value"), 2).as("sum_cents"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("event_type").asc_nulls_first,
          col("parity").asc_nulls_first)
    }),

    // explicit grouping sets via SQL (Dataset API exposes rollup/cube only).
    "q37_grouping_sets" -> ((s, dir) => {
      events(s, dir).createOrReplaceTempView("ev_gs")
      s.sql("""
        SELECT event_type, user_id % 2 AS parity, count(*) AS n,
               CAST(grouping(event_type) * 2 + grouping(user_id % 2) AS BIGINT) AS gid
        FROM ev_gs
        GROUP BY GROUPING SETS ((event_type), (user_id % 2), ())
        ORDER BY gid, event_type ASC NULLS FIRST, parity ASC NULLS FIRST""")
    }),

    // exact distinct aggregation (countDistinct).
    "q39_distinct_agg" -> ((s, dir) => {
      events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          countDistinct(floor(col("ts_us").cast("double") / 8.64e10).cast("long"))
            .as("n_days"))
        .orderBy("event_type")
    }),

    // approximate distinct (HLL) as an accuracy CONTRACT: the sketch value
    // itself is engine-specific, so the engine emits the exact count plus
    // the contract bit |approx - exact| <= 5% * exact and the oracle asserts
    // (exact, 1) — the HLL path becomes hash-checkable without cross-engine
    // sketch parity. rsd 0.01 vs the 5%-bound: HLL error is deterministic
    // per dataset, measured <= 0.7% at sf0.001/0.01/0.1 (5x headroom; the
    // default rsd 0.05 measured 6.7% at sf0.1 — would break the contract).
    // r18 shape: pre-deduplicate (event_type, user_id) with a codegen'd
    // hash aggregate, THEN count + sketch the distinct pairs. Result is
    // bit-identical: countDistinct(user_id) == count(user_id) over the
    // deduped pairs (both skip NULLs), and an HLL sketch is a per-register
    // max over hashed values, so duplicates never move it — same estimate
    // over the same value set. What changes is the plan: the mixed
    // distinct/non-distinct aggregate forced an Expand (2 rows per input)
    // and ran the non-codegen imperative HLL update over every expanded
    // row (200k at sf0.1); now the 100k-row pass is a pure whole-stage-
    // codegen distinct and the HLL sees only the 7.5k distinct pairs —
    // measured 2.4-3.3 s -> ~0.6 s warm at sf0.1 (the same factoring is
    // what a 100 TB run wants: partial distinct is map-side combinable,
    // the heavy sketch runs on post-dedup cardinality, not row count).
    "q39b_approx_distinct" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_type"), col("user_id"))
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("__dup"))
        .groupBy("event_type")
        .agg(count(col("user_id")).as("n_users_exact"),
          approx_count_distinct(col("user_id"), 0.01).as("__approx"))
        .withColumn("within_5pct",
          (abs(col("__approx") - col("n_users_exact")) <=
            lit(0.05) * col("n_users_exact")).cast("long"))
        .drop("__approx")
        .orderBy("event_type")
    }),

    // Pivot (the reference's dense-grid export shape, §2.7): per-day sums
    // pivoted across a fixed event-type list — deterministic columns.
    "q61_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      events(s, dir)
        .withColumn("day", floor(col("ts_us").cast("double") / 8.64e10).cast("long"))
        .groupBy("day")
        .pivot("event_type", types)
        .agg(sum(round(col("value") * 100)).cast("long"))
        .orderBy("day")
    }),

    // exact interpolated percentiles (quartiles) — §2.4 depth beyond the
    // reference's median-only usage.
    "q62_percentiles" -> ((s, dir) => {
      events(s, dir)
        .groupBy("event_type")
        .agg(fp(expr("percentile(value, 0.25)")).as("p25_milli"),
          fp(expr("percentile(value, 0.5)")).as("p50_milli"),
          fp(expr("percentile(value, 0.75)")).as("p75_milli"))
        .orderBy("event_type")
    }),

    // map-typed columns: construction, key lookup, cardinality. Engine-
    // specific map hashing — rows-only driver check; asserted in spec.
    "q63_map_funcs" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_id"),
          map(lit("type"), col("event_type"),
            lit("bucket"), (col("value") > 100).cast("string")).as("m"))
        .select(col("event_id"),
          element_at(col("m"), "type").as("type_val"),
          size(map_keys(col("m"))).cast("long").as("n_keys"))
        .orderBy("event_id")
    }),

    // string-function battery: case, trim/pad, substring, split, replace,
    // position, concat — all ANSI-portable.
    "q60_string_funcs" -> ((s, dir) => {
      val t = col("p_type")
      table(s, dir, "part").select(col("p_partkey"),
          upper(t).as("up"),
          substring(t, 1, 5).as("pre5"),
          length(t).cast("long").as("len"),
          regexp_replace(t, "[aeiou]", "_").as("devowel"),
          instr(t, "a").cast("long").as("a_pos"),
          concat_ws("|", col("p_brand"), t).as("joined"))
        .orderBy("p_partkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q36_cube" ->
      s"""SELECT event_type, user_id % 2 AS parity, count(*) AS n,
          ${sqlIntSum("value", 2)} AS sum_cents,
          CAST(GROUPING(event_type) * 2 + GROUPING(user_id % 2) AS BIGINT) AS gid
          FROM events
          GROUP BY CUBE(event_type, user_id % 2)
          ORDER BY gid, event_type ASC NULLS FIRST, parity ASC NULLS FIRST""",

    "q37_grouping_sets" ->
      """SELECT event_type, user_id % 2 AS parity, count(*) AS n,
           CAST(GROUPING(event_type) * 2 + GROUPING(user_id % 2) AS BIGINT) AS gid
         FROM events
         GROUP BY GROUPING SETS ((event_type), (user_id % 2), ())
         ORDER BY gid, event_type ASC NULLS FIRST, parity ASC NULLS FIRST""",

    "q39_distinct_agg" ->
      """SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT)) AS n_days
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q39b_approx_distinct" ->
      """SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           CAST(1 AS BIGINT) AS within_5pct
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q62_percentiles" ->
      s"""SELECT event_type,
          ${sqlFp("quantile_cont(value, 0.25)")} AS p25_milli,
          ${sqlFp("quantile_cont(value, 0.5)")} AS p50_milli,
          ${sqlFp("quantile_cont(value, 0.75)")} AS p75_milli
          FROM events GROUP BY event_type ORDER BY event_type""",

    "q63_map_funcs" ->
      """SELECT event_id, event_type AS type_val, CAST(2 AS BIGINT) AS n_keys
         FROM events ORDER BY event_id""",

    "q61_pivot" ->
      """SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
           CAST(sum(round(value * 100)) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(sum(round(value * 100)) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
           CAST(sum(round(value * 100)) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(sum(round(value * 100)) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
           CAST(sum(round(value * 100)) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
         FROM events GROUP BY 1 ORDER BY day""",

    "q60_string_funcs" ->
      """SELECT p_partkey,
           upper(p_type) AS up,
           substring(p_type, 1, 5) AS pre5,
           CAST(length(p_type) AS BIGINT) AS len,
           regexp_replace(p_type, '[aeiou]', '_', 'g') AS devowel,
           CAST(strpos(p_type, 'a') AS BIGINT) AS a_pos,
           p_brand || '|' || p_type AS joined
         FROM part ORDER BY p_partkey"""
  )
}
