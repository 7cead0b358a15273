package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline._

/** Per-mission compass calibration: each mission's magnetometer must solve
  * against that mission's OWN geomagnetic field target (the reference does
  * one BGS lookup + one solve per run, process_adcp.py:315-339; the fleet
  * generalization is one per mission key).
  *
  * Discriminating construction: mission 2's magnetometer is mission 1's
  * scaled by 1.2 and its target is 487 * 1.2. Identity calibration is then
  * the exact optimum for BOTH missions — but only if each solve uses its
  * own target. A solve that leaks mission 1's target (487) into mission 2
  * converges to A ~ I/1.2 instead, so the identity assertion on mission 2
  * fails.
  */
class PerMissionHeadingSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val scale = 1.2

  private def twoMissionAligned = {
    val glider = GliderStages.deriveGlider(Fixture.glider(spark))
    val one = AdcpStages.align(Fixture.adcp(spark), glider)
    one.withColumn("mission", lit(1))
      .unionByName(one.withColumn("mission", lit(2))
        .withColumn("mag_x", col("mag_x") * scale)
        .withColumn("mag_y", col("mag_y") * scale)
        .withColumn("mag_z", col("mag_z") * scale))
  }

  private val targets: Map[Seq[Any], Double] = Map(
    Seq(1) -> Fixture.magTarget, Seq(2) -> Fixture.magTarget * scale)

  test("each mission solves against its own field target") {
    val cals = HeadingCorrection.solvePerMission(
      twoMissionAligned, targets, Seq("mission"), Fixture.magTarget)
    assert(cals.map(_._1) == Seq(Seq(1), Seq(2)))
    cals.foreach { case (k, c) =>
      assert(c.rmsd < 1.0, s"mission $k rmsd ${c.rmsd}")
      // identity is optimal only when the mission's own target was used;
      // a leaked first-mission target drives mission 2 to ~1/1.2 diagonals
      Seq(0, 4, 8).foreach(i => assert(math.abs(c.a(i) - 1.0) < 2e-2,
        s"mission $k A[$i] = ${c.a(i)} drifted from identity"))
    }
  }

  test("perMission applies each mission's calibration and keeps heading") {
    val corrected = HeadingCorrection.perMission(
      Fixture.opts, targets, Seq("mission"))(twoMissionAligned)
    val drift = corrected
      .groupBy("mission")
      .agg(max(abs(col("heading") - col("heading_old"))).as("mx"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(drift.keySet == Set(1, 2))
    drift.foreach { case (m, d) =>
      assert(d < 0.5, s"mission $m heading drifted $d deg")
    }
    // coefficient plumbing columns must not leak into the output
    assert(!corrected.columns.exists(_.startsWith("__cal")))
    assert(!corrected.columns.exists(_.startsWith("__mc_")))
  }

  test("applyGeomagPerMission resolves one field target per mission") {
    object LatGeomag extends GeomagProvider {
      def declination(lat: Double, lon: Double, epochSec: Double): Double = 1.5
      def fieldStrengthMilligauss(lat: Double, lon: Double, epochSec: Double): Double =
        400.0 + lat // lat-dependent: different missions -> different targets
    }
    val bare = GliderStages.deriveGlider(Fixture.glider(spark)).drop("declination")
    val two = bare.withColumn("mission", lit(1))
      .unionByName(bare.withColumn("mission", lit(2))
        .withColumn("latitude", col("latitude") + 10.0))
    val opts = Fixture.opts.copy(geomag = Some(LatGeomag))
    val r = GliderStages.applyGeomagPerMission(two, opts, Seq("mission"))
    assert(r.targets.keySet == Set(Seq(1), Seq(2)))
    val t1 = r.targets(Seq(1)); val t2 = r.targets(Seq(2))
    assert(math.abs((t2 - t1) - 10.0) < 1e-9,
      s"per-mission targets must track each mission's own latitude: $t1 / $t2")
    // the scalar Options target stays the first mission's (back-compat)
    assert(r.opts.geomagTargetMilligauss == t1)
  }
}
