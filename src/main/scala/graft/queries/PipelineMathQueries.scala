package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Teos10
import Common._

/** The ADCP pipeline's scalar-function surface (SURVEY.md §2.6)
  * demonstrated on driver testdata with DuckDB mirrors: angles are
  * synthesized deterministically from the events value column, then run
  * through the exact production Column expressions (ENU rotation matrix,
  * beam-angle remap, Francois-Garrison absorption, haversine geo scale
  * factors, Mackenzie sound speed + Saunders depth).
  */
object PipelineMathQueries {

  val queries: Map[String, Q] = Map(
    // calcENUfromXYZ rotation (process_adcp.py:1134-1160) on synthetic
    // attitude+velocity derived from `value`.
    "q31_enu_rotation" -> ((s, dir) => {
      val v = col("value")
      val h = pmod(v * 37.0, lit(360.0))
      val p = pmod(v, lit(40.0)) - 20.0
      val r = pmod(v, lit(20.0)) - 10.0
      val x = sin(v); val y = cos(v); val z = v / 500.0
      val hh = radians(h - 90.0); val pp = radians(p); val rr = radians(r)
      val e = cos(hh) * cos(pp) * x +
        (-cos(hh) * sin(pp) * sin(rr) + sin(hh) * cos(rr)) * y +
        (-cos(hh) * sin(pp) * cos(rr) - sin(hh) * sin(rr)) * z
      val n = -sin(hh) * cos(pp) * x +
        (sin(hh) * sin(pp) * sin(rr) + cos(hh) * cos(rr)) * y +
        (sin(hh) * sin(pp) * cos(rr) - cos(hh) * sin(rr)) * z
      val u = sin(pp) * x + cos(pp) * sin(rr) * y + cos(pp) * cos(rr) * z
      events(s, dir).select(col("event_id"),
        fp(e, 6).as("e_micro"), fp(n, 6).as("n_micro"), fp(u, 6).as("u_micro"))
        .orderBy("event_id")
    }),

    // remapADCPdepth beam geometry (process_adcp.py:226-270): angle from
    // vertical + cell depth at a 10 m along-beam range, bottom-mounted.
    "q32_beam_geometry" -> ((s, dir) => {
      val v = col("value")
      val p = pmod(v, lit(40.0)) - 20.0
      val r = pmod(v, lit(20.0)) - 10.0
      val theta1 = acos(cos(radians(lit(47.5) + p)) * cos(radians(r)))
      val theta2 = acos(cos(radians(lit(25.0) + r)) * cos(radians(p)))
      val depth = v / 2.0
      val d1 = depth + lit(10.0) * cos(theta1) // dir = -1
      val d2 = depth + lit(10.0) * cos(theta2)
      events(s, dir).select(col("event_id"),
        fp(degrees(theta1), 6).as("theta1_micro"),
        fp(d1, 6).as("d1_micro"), fp(d2, 6).as("d2_micro"))
        .orderBy("event_id")
    }),

    // Francois-Garrison absorption (process_adcp.py:808-838) incl. the
    // T<=20 pure-water branch.
    "q33_fg_absorption" -> ((s, dir) => {
      val v = col("value")
      val sal = lit(35.0) + v / 100.0
      val t = v / 20.0
      val z = v
      events(s, dir).select(col("event_id"),
        fp(Teos10.francoisGarrison(1000.0, sal, t, 8.1, z) * 1000.0, 6)
          .as("alpha_milli_micro"))
        .orderBy("event_id")
    }),

    // gsw.distance geo scale factors (process_adcp.py:1386-1387).
    "q34_haversine" -> ((s, dir) => {
      val lon = col("value") / 10.0
      val lat = lit(50.0) + col("value") / 50.0
      events(s, dir).select(col("event_id"),
        fp(Teos10.lonToMeters(lon, lat), 3).as("lon2m_milli"),
        fp(Teos10.latToMeters(lon, lat), 3).as("lat2m_milli"))
        .orderBy("event_id")
    }),

    // TEOS-10 load derivations (process_adcp.py:107-109,184): SA scale,
    // Saunders depth, Mackenzie sound speed.
    "q35_teos10" -> ((s, dir) => {
      val sp = lit(30.0) + col("value") / 50.0
      val t = col("value") / 25.0
      val p = col("value") * 2.0
      val lat = lit(50.0) + col("value") / 50.0
      val depth = Teos10.depthFromPressure(p, lat)
      events(s, dir).select(col("event_id"),
        fp(Teos10.saFromSp(sp), 6).as("sa_micro"),
        fp(depth, 6).as("depth_micro"),
        fp(Teos10.soundSpeed(t, sp, depth), 6).as("ss_micro"))
        .orderBy("event_id")
    })
  )

  private val a1Const = {
    // same driver-side constant the Column expression embeds
    val v = math.pow(10.0, 0.78 * 8.1 - 5.0)
    f"$v%.17g"
  }

  val oracle: Map[String, String] = Map(
    "q31_enu_rotation" ->
      s"""WITH a AS (SELECT event_id,
            radians(fmod(fmod(value * 37.0, 360.0) + 360.0, 360.0) - 90.0) AS hh,
            radians(fmod(fmod(value, 40.0) + 40.0, 40.0) - 20.0) AS pp,
            radians(fmod(fmod(value, 20.0) + 20.0, 20.0) - 10.0) AS rr,
            sin(value) AS x, cos(value) AS y, value / 500.0 AS z
          FROM events)
          SELECT event_id,
          ${sqlFp("cos(hh)*cos(pp)*x + (-cos(hh)*sin(pp)*sin(rr) + sin(hh)*cos(rr))*y + (-cos(hh)*sin(pp)*cos(rr) - sin(hh)*sin(rr))*z", 6)} AS e_micro,
          ${sqlFp("-sin(hh)*cos(pp)*x + (sin(hh)*sin(pp)*sin(rr) + cos(hh)*cos(rr))*y + (sin(hh)*sin(pp)*cos(rr) - cos(hh)*sin(rr))*z", 6)} AS n_micro,
          ${sqlFp("sin(pp)*x + cos(pp)*sin(rr)*y + cos(pp)*cos(rr)*z", 6)} AS u_micro
          FROM a ORDER BY event_id""",

    "q32_beam_geometry" ->
      s"""WITH a AS (SELECT event_id,
            fmod(fmod(value, 40.0) + 40.0, 40.0) - 20.0 AS p,
            fmod(fmod(value, 20.0) + 20.0, 20.0) - 10.0 AS r,
            value / 2.0 AS depth
          FROM events),
          b AS (SELECT event_id, depth,
            acos(cos(radians(47.5 + p)) * cos(radians(r))) AS theta1,
            acos(cos(radians(25.0 + r)) * cos(radians(p))) AS theta2
          FROM a)
          SELECT event_id,
          ${sqlFp("degrees(theta1)", 6)} AS theta1_micro,
          ${sqlFp("depth + 10.0 * cos(theta1)", 6)} AS d1_micro,
          ${sqlFp("depth + 10.0 * cos(theta2)", 6)} AS d2_micro
          FROM b ORDER BY event_id""",

    "q33_fg_absorption" ->
      s"""WITH i AS (SELECT event_id, 35.0 + value / 100.0 AS s,
            value / 20.0 AS t, value AS z FROM events),
          m AS (SELECT event_id, s, t, z,
            1412.0 + t * 3.21 + s * 1.19 + z * 0.0167 AS c,
            t + 273.0 AS theta FROM i),
          f AS (SELECT *,
            2.8 * sqrt(s / 35.0) * pow(10.0, 4.0 - 1245.0 / theta) AS f1,
            8.17 * pow(10.0, 8.0 - 1990.0 / theta) / (1.0 + 0.0018 * (s - 35.0)) AS f2,
            8.86 / c * $a1Const AS a1,
            21.44 * s / c * (1.0 + 0.025 * t) AS a2,
            CASE WHEN t <= 20.0
              THEN 4.937e-4 - 2.59e-5 * t + 9.11e-7 * t * t - 1.50e-8 * t * t * t
              ELSE 3.964e-4 - 1.146e-5 * t + 1.45e-7 * t * t - 6.5e-10 * t * t * t END AS a3,
            1.0 - 1.35e-4 * z + 6.2e-9 * z * z AS p2,
            1.0 - 3.83e-5 * z + 4.9e-10 * z * z AS p3
          FROM m)
          SELECT event_id, ${sqlFp(
        "(a1 * f1 * 1000000.0 / (f1 * f1 + 1000000.0) + a2 * p2 * f2 * 1000000.0 / (f2 * f2 + 1000000.0) + a3 * p3 * 1000000.0) / 1000.0 * 1000.0", 6)} AS alpha_milli_micro
          FROM f ORDER BY event_id""",

    "q34_haversine" ->
      s"""WITH i AS (SELECT event_id, value / 10.0 AS lon, 50.0 + value / 50.0 AS lat FROM events)
          SELECT event_id,
          ${sqlFp("2.0 * 6371000.0 * asin(sqrt(pow(sin(radians(lat - lat) / 2), 2) + cos(radians(lat)) * cos(radians(lat)) * pow(sin(radians(lon + 1.0 - lon) / 2), 2)))", 3)} AS lon2m_milli,
          ${sqlFp("2.0 * 6371000.0 * asin(sqrt(pow(sin(radians(lat + 1.0 - lat) / 2), 2) + cos(radians(lat)) * cos(radians(lat + 1.0)) * pow(sin(radians(lon - lon) / 2), 2)))", 3)} AS lat2m_milli
          FROM i ORDER BY event_id""",

    "q35_teos10" ->
      s"""WITH i AS (SELECT event_id, 30.0 + value / 50.0 AS sp, value / 25.0 AS t,
            value * 2.0 AS p, 50.0 + value / 50.0 AS lat FROM events),
          d AS (SELECT *,
            (1.0 - (5.92 + 5.25 * sin(radians(lat)) * sin(radians(lat))) * 1e-3) * p
              - 2.21e-6 * p * p AS depth FROM i)
          SELECT event_id,
          ${sqlFp(s"sp * ${35.16504 / 35.0}", 6)} AS sa_micro,
          ${sqlFp("depth", 6)} AS depth_micro,
          ${sqlFp("1448.96 + t * 4.591 - t * t * 5.304e-2 + t * t * t * 2.374e-4 + (sp - 35.0) * 1.340 + depth * 1.630e-2 + depth * depth * 1.675e-7 - t * (sp - 35.0) * 1.025e-2 - t * depth * depth * depth * 7.139e-13", 6)} AS ss_micro
          FROM d ORDER BY event_id"""
  )
}
