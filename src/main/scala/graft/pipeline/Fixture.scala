package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic glider + ADCP mission (FIXTURES.md §4) built by
  * inverting the pipeline's own math chain: a prescribed sheared current
  * field ENU(z) is rotated into instrument XYZ per ping (transpose of the
  * ENU rotation), projected onto the four beams (closed-form inverse of the
  * 3-beam combinations), and sampled at each beam's true cell depth. A
  * correct pipeline must therefore recover the prescribed field exactly
  * (linear interpolation of a linear profile is exact), which gives the e2e
  * test a quantitative golden without any external oracle.
  *
  * No RNG: all "noise" is deterministic trigonometry of the sample index.
  */
object Fixture {

  // prescribed current field (m/s as a function of depth in meters)
  def currentE(z: Double): Double = 0.10 + 0.002 * z
  def currentN(z: Double): Double = -0.05 + 0.001 * z
  def currentU(z: Double): Double = 0.0

  val cellSize = 2.0
  val blankingDistance = 1.0
  val nBins = 15
  val magTarget = 487.0

  val opts: Options = Options(
    topMounted = false,
    geomagTargetMilligauss = magTarget)

  private val t0ns = 1700000000000000000L // fixed epoch origin
  private val profileSeconds = 800
  val nProfiles = 6 // default mission size; scaled generators take their own

  // scalar copies of the Teos10 column formulas, for exact inversion
  private def saundersDepth(p: Double, lat: Double): Double = {
    val s2 = math.pow(math.sin(math.toRadians(lat)), 2)
    val c1 = (5.92 + 5.25 * s2) * 1e-3
    (1.0 - c1) * p - 2.21e-6 * p * p
  }

  /** Pressure whose Saunders depth equals `depth` exactly (Newton). */
  private def pressureFor(depth: Double, lat: Double): Double = {
    var p = depth / 0.99
    var i = 0
    while (i < 6) {
      val s2 = math.pow(math.sin(math.toRadians(lat)), 2)
      val c1 = (5.92 + 5.25 * s2) * 1e-3
      val f = (1.0 - c1) * p - 2.21e-6 * p * p - depth
      val df = (1.0 - c1) - 2 * 2.21e-6 * p
      p -= f / df
      i += 1
    }
    p
  }

  private def mackenzie(t: Double, s: Double, d: Double): Double =
    1448.96 + 4.591 * t - 5.304e-2 * t * t + 2.374e-4 * t * t * t +
      1.340 * (s - 35.0) + 1.630e-2 * d + 1.675e-7 * d * d -
      1.025e-2 * t * (s - 35.0) - 7.139e-13 * t * d * d * d

  private def tempAt(i: Int): Double = 15.0 - depthAt(i) * 0.1 + 0.2 * math.sin(i * 0.01)
  private def salAt(i: Int): Double = 35.0 + depthAt(i) * 0.01
  private def latAt(i: Int): Double = 57.0 + i * 1e-7

  /** The glider soundspeed the pipeline will compute at sample i. */
  def gliderSoundspeedAt(i: Int): Double = {
    val p = pressureFor(depthAt(i), latAt(i))
    mackenzie(tempAt(i), salAt(i), saundersDepth(p, latAt(i)))
  }

  /** Glider depth trajectory: sawtooth 0..50 m, 1 Hz; even profiles dive,
    * odd profiles climb; ~40 s surface interval at each apex with GPS fixes.
    */
  private def depthAt(i: Int): Double = {
    val phase = i % (2 * profileSeconds)
    val d = if (phase < profileSeconds) phase * 50.0 / profileSeconds
            else (2 * profileSeconds - phase) * 50.0 / profileSeconds
    math.max(d, 0.0)
  }

  private def pitchAt(i: Int): Double = {
    val phase = i % (2 * profileSeconds)
    if (phase < profileSeconds) -17.4 else 17.4 // diving pitch down
  }

  private def headingAt(i: Int): Double = 45.0 + 10.0 * math.sin(i * 0.001)

  def glider(spark: SparkSession): DataFrame = glider(spark, nProfiles)

  def glider(spark: SparkSession, profiles: Int): DataFrame = {
    import spark.implicits._
    val n = profiles * profileSeconds
    (0 until n).map { i =>
      val depth = depthAt(i)
      val surfaced = depth < 0.5
      val profile = i / profileSeconds
      val dive = profile / 2 + 1
      val lat = latAt(i)
      val lon = 11.0 + i * 2e-7
      val pressure = pressureFor(depth, lat)
      (t0ns + i.toLong * 1000000000L, // 1 Hz
        tempAt(i), salAt(i),
        lat, lon,
        profile.toDouble, dive.toDouble, pressure,
        if (pitchAt(i) < 0) 0.1 else -0.1, // speed_vert sign with dive dir
        0.25, // speed_horz
        if (surfaced) 0.0 else 2.0, // dead_reckoning (<1 = GPS)
        if (surfaced) 116.0 else 0.0, // nav_resource
        0.0) // declination
    }.toDF("time_ns", "temperature", "salinity", "latitude", "longitude",
      "profile_number", "dive_number", "pressure", "speed_vert", "speed_horz",
      "dead_reckoning", "nav_resource", "declination")
  }

  /** Per-ping beam synthesis: invert ENU -> XYZ -> beams at each beam's
    * true cell depth (bottom-mounted: dir = -1, cells below the glider).
    */
  def adcp(spark: SparkSession): DataFrame = adcp(spark, nProfiles)

  def adcp(spark: SparkSession, profiles: Int): DataFrame = {
    import spark.implicits._
    val tf = 47.5; val ts = 25.0
    def sinD(x: Double) = math.sin(math.toRadians(x))
    def cosD(x: Double) = math.cos(math.toRadians(x))
    val aTf = 1.0 / (2 * sinD(tf)); val aTs = 1.0 / (2 * sinD(ts))
    val bTf = 1.0 / (4 * cosD(tf)); val bTs = 1.0 / (4 * cosD(ts))
    val dir = opts.direction.toDouble // -1

    val pingEvery = 4 // seconds
    val n = profiles * profileSeconds / pingEvery
    val ranges = (0 until nBins).map(b => blankingDistance + cellSize * (b + 0.5))

    (0 until n).map { p =>
      val i = p * pingEvery
      val depth = depthAt(i)
      val pitch = pitchAt(i)
      val roll = 0.0
      val heading = headingAt(i)
      // pre-divide by the soundspeed ratio the pipeline will multiply back,
      // so corrected velocities equal the prescribed field exactly
      val ssRatio = gliderSoundspeedAt(i) / 1500.0

      // beam angles from vertical (bottom-mounted branch, remapDepth :233-237)
      val t1 = math.acos(cosD(tf + pitch) * cosD(roll))
      val t2 = math.acos(cosD(ts + roll) * cosD(pitch))
      val t3 = math.acos(cosD(tf - pitch) * cosD(roll))
      val t4 = math.acos(cosD(ts - roll) * cosD(pitch))

      // rotation matrix (calcENUfromXYZ :1134-1146)
      val hh = math.toRadians(heading - 90); val pp = math.toRadians(pitch)
      val rr = math.toRadians(roll)
      val m = Array(
        Array(math.cos(hh) * math.cos(pp),
          -math.cos(hh) * math.sin(pp) * math.sin(rr) + math.sin(hh) * math.cos(rr),
          -math.cos(hh) * math.sin(pp) * math.cos(rr) - math.sin(hh) * math.sin(rr)),
        Array(-math.sin(hh) * math.cos(pp),
          math.sin(hh) * math.sin(pp) * math.sin(rr) + math.cos(hh) * math.cos(rr),
          math.sin(hh) * math.sin(pp) * math.cos(rr) - math.cos(hh) * math.sin(rr)),
        Array(math.sin(pp), math.cos(pp) * math.sin(rr), math.cos(pp) * math.cos(rr)))

      def beamsAt(thetas: (Double, Double, Double, Double)): (Seq[Double], Seq[Double], Seq[Double], Seq[Double]) = {
        def xyzAtDepth(z: Double): (Double, Double, Double) = {
          val enu = Array(currentE(z), currentN(z), currentU(z))
          // [X, dir*Y, dir*Z] = M^T * ENU  (M orthonormal)
          val x = m(0)(0) * enu(0) + m(1)(0) * enu(1) + m(2)(0) * enu(2)
          val yd = m(0)(1) * enu(0) + m(1)(1) * enu(1) + m(2)(1) * enu(2)
          val zd = m(0)(2) * enu(0) + m(1)(2) * enu(1) + m(2)(2) * enu(2)
          (x, yd / dir, zd / dir)
        }
        val (th1, th2, th3, th4) = thetas
        def cellDepth(th: Double, r: Double): Double = depth - dir * r * math.cos(th)
        val v1 = ranges.map { r =>
          val (x, _, z) = xyzAtDepth(cellDepth(th1, r)); x / (2 * aTf) + z / (4 * bTf) }
        val v3 = ranges.map { r =>
          val (x, _, z) = xyzAtDepth(cellDepth(th3, r)); -x / (2 * aTf) + z / (4 * bTf) }
        val v2 = ranges.map { r =>
          val (_, y, z) = xyzAtDepth(cellDepth(th2, r)); -y / (2 * aTs) + z / (4 * bTs) }
        val v4 = ranges.map { r =>
          val (_, y, z) = xyzAtDepth(cellDepth(th4, r)); y / (2 * aTs) + z / (4 * bTs) }
        (v1, v2, v3, v4)
      }
      val (v1r, v2r, v3r, v4r) = beamsAt((t1, t2, t3, t4))
      val v1 = v1r.map(_ / ssRatio); val v2 = v2r.map(_ / ssRatio)
      val v3 = v3r.map(_ / ssRatio); val v4 = v4r.map(_ / ssRatio)

      // magnetometer consistent with the tilt-compensated heading formula
      // (declination 0, roll 0): atan2d(rot_x, rot_y) = heading + 90
      val want = math.toRadians(heading + 90)
      val mh = magTarget * 0.8
      val mv = magTarget * 0.2
      val rotX = mh * math.sin(want); val rotY = mh * math.cos(want)
      val mx = (rotX - mv * math.sin(pp)) / math.cos(pp)
      val my = rotY
      val mz = mv
      val norm = math.sqrt(mx * mx + my * my + mz * mz)
      val k = magTarget / norm

      val corr = ranges.map(r => 90.0 - r * 0.2) // > threshold everywhere
      val amp = ranges.map(r => 70.0 - r * 0.5) // < threshold everywhere
      val press = pressureFor(depth, latAt(i))

      (t0ns + i.toLong * 1000000000L, press, pitch, roll, heading,
        mx * k, my * k, mz * k,
        1500.0, // ADCP factory speed of sound
        ranges, v1, v2, v3, v4, corr, corr, corr, corr, amp, amp, amp, amp)
    }.toDF("time_ns", "pressure", "pitch", "roll", "heading",
      "mag_x", "mag_y", "mag_z", "speed_of_sound", "ranges",
      "vel1", "vel2", "vel3", "vel4",
      "corr1", "corr2", "corr3", "corr4",
      "amp1", "amp2", "amp3", "amp4")
  }
}
