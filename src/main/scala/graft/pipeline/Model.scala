package graft.pipeline

/** Pipeline configuration — the reference's untyped `options` dict
  * (tests/test_adcp_processing.py:14-27) as a typed case class with the
  * same defaults. HTTP-derived scalars (declination, geomagnetic target
  * field strength) are injected as plain values: the reference fetches them
  * from NOAA/BGS web services driver-side (process_adcp.py:59-77,315-339);
  * here the caller supplies them (pluggable, zero-egress).
  */
final case class Options(
    topMounted: Boolean = false,
    correctAdcpHeading: Boolean = true,
    correlationThreshold: Double = 70.0,
    amplitudeThreshold: Double = 75.0,
    velocityThreshold: Double = 0.8,
    regridCorrelationThreshold: Double = 20.0,
    correctXshear: Boolean = false,
    correctYshear: Boolean = false,
    correctZshear: Boolean = false,
    correctZZshear: Boolean = false,
    yRes: Double = 1.0, // vertical grid resolution (process_adcp.py:49)
    geomagTargetMilligauss: Double = 487.0,
    soundFreqKhz: Double = 1000.0,
    ph: Double = 8.1,
    geomag: Option[GeomagProvider] = None) {
  /** Mount direction sign (process_adcp.py:226-237). */
  def direction: Int = if (topMounted) 1 else -1
}

/** Seam for the reference's NOAA/BGS web lookups (get_declination,
  * process_adcp.py:59-77; getGeoMagStrength, :315-339). The engine itself
  * performs no IO — zero-egress by default; a caller plugs an
  * implementation (their HTTP client, a lookup table, the IGRF model) via
  * `Options.geomag` and the pipeline evaluates it driver-side once per
  * mission, exactly the cardinality of the reference's web calls.
  */
trait GeomagProvider extends Serializable {
  /** Magnetic declination, degrees east (NOAA calculateDeclination). */
  def declination(lat: Double, lon: Double, epochSec: Double): Double
  /** Total geomagnetic field strength, milligauss (BGS IGRF). */
  def fieldStrengthMilligauss(lat: Double, lon: Double, epochSec: Double): Double
}

/** Long/wide schema contract for the two input tables (FIXTURES.md §1-2).
  *
  * Glider (1 row per sample): time_ns LONG, date_float DOUBLE(ns),
  * temperature, salinity, latitude, longitude, profile_number, dive_number,
  * pressure, speed_vert, speed_horz, dead_reckoning, nav_resource,
  * declination — all DOUBLE.
  *
  * ADCP (1 row per ping, per-bin vars as fixed-length arrays): time_ns LONG,
  * pressure, pitch, roll, heading, mag_x/y/z, speed_of_sound DOUBLE,
  * ranges ARRAY<DOUBLE> (distance along beam per bin),
  * vel1..vel4, corr1..corr4, amp1..amp4 ARRAY<DOUBLE>.
  */
object Schema {
  val beams = Seq("1", "2", "3", "4")
}
