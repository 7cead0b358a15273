package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline entry points mirroring the reference's three public
  * compositions (process_adcp.py:2046-2083). Each stage is a lazy
  * `DataFrame => DataFrame`; one Catalyst plan per entry point, actions
  * only at the driver-side solves (heading calibration, shear-correction
  * vectors, regrid ladder, bias coefficient) and the final sink.
  */
object AdcpPipeline {

  // every persist the pipeline creates internally (stage barriers, the DAC
  // glider) is registered here so entry-point callers can release them once
  // the final sink has materialized — the cache discipline the Axes
  // scaladoc asks of callers, extended to the pipeline's own barriers
  private val trackedPersists =
    new scala.collection.mutable.ArrayBuffer[DataFrame]()

  private def trackPersist(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    trackedPersists.synchronized { trackedPersists += p }
    p
  }

  /** Unpersist every cache the pipeline created (stage barriers, DAC
    * glider). Call after the final output has been materialized/written;
    * long-lived sessions otherwise accumulate cached RDDs across runs.
    *
    * Session-wide by design (like `spark.catalog.clearCache` scoped to
    * this pipeline's caches): with concurrent pipeline runs in one JVM it
    * releases the barriers of ALL in-flight runs, so serialize runs or
    * call it only at a quiescent point.
    */
  def releaseCaches(): Unit = trackedPersists.synchronized {
    trackedPersists.foreach(_.unpersist())
    trackedPersists.clear()
  }

  /** shear_from_adcp (:2046-2057): glider-aligned, QC'd, regridded,
    * 3-beam-solved, ENU-rotated shear per ping.
    *
    * Stage BARRIERS matter as much as the stages: `withColumn` chains
    * collapse into a single projection at the API level, and every stage
    * that references an earlier array column more than once doubles its
    * recomputation — exponential in chain depth (measured: 4,800 pings took
    * 392 s fully collapsed vs 19 s with barriers). Each multi-reference
    * stage therefore ends at a persisted boundary; at cluster scale these
    * are the natural checkpoint/intermediate-write points.
    */
  def shearFromAdcp(
      adcpRaw: DataFrame, gliderRaw: DataFrame, opts0: Options,
      cellSize: Double, blankingDistance: Double,
      solveHeading: Boolean = true,
      missionCols: Seq[String] = Nil): (DataFrame, DataFrame) = {
    def barrier(df: DataFrame): DataFrame = trackPersist(df)
    // resolve declination/geomag targets through the provider seam (no-op
    // without a configured provider — opts0.geomag defaults to None);
    // with mission keys every mission gets its own field target
    val geo = GliderStages.applyGeomagPerMission(
      GliderStages.deriveGlider(gliderRaw), opts0, missionCols)
    val glider = geo.glider; val opts = geo.opts
    var adcp = AdcpStages.align(adcpRaw, glider, missionCols)
    // the alignment window collapses a single-mission dataset to one
    // partition; fan back out so the (embarrassingly parallel) elementwise
    // beam math uses every core — at cluster scale this is the exchange
    // that spreads a mission's pings across executors
    adcp = adcp.repartition(adcp.sparkSession.sparkContext.defaultParallelism)
    adcp = AdcpStages.remapDepth(opts)(adcp)
    // correct_heading is gated (:451-460): when disabled the compass
    // heading stays raw and declination is NOT added. With mission keys
    // each mission's compass solves against its own field target
    // (reference cardinality: one solve per mission, :315-339)
    adcp = if (!opts.correctAdcpHeading) adcp
           else if (solveHeading && missionCols.nonEmpty)
             HeadingCorrection.perMission(opts, geo.targets, missionCols)(adcp)
           else if (solveHeading) HeadingCorrection(opts)(adcp)
           else HeadingCorrection.correctedHeading(opts,
             HeadingCorrection.Calibration(
               Array(1, 0, 0, 0, 1, 0, 0, 0, 1), Array(0, 0, 0), 0.0))(adcp)
    adcp = AdcpStages.soundspeedCorrection(adcp)
    adcp = barrier(AdcpStages.removeOutliers(opts)(adcp))
    adcp = barrier(correctShear(opts)(adcp))
    adcp = AdcpStages.backscatterCorrection(opts)(adcp)
    adcp = barrier(AdcpStages.regrid(opts, cellSize, blankingDistance)(adcp))
    adcp = barrier(AdcpStages.threeBeamXyz(opts)(adcp))
    adcp = AdcpStages.enuAndShear(opts)(adcp)
    (adcp, glider)
  }

  /** correct_shear composite (:771-784): XYZZ transform, optional per-axis
    * shear-bias removal, inverse transform. X4..ZZ4 stay attached (used by
    * the 3-beam speed-through-water and bias stages).
    */
  def correctShear(opts: Options)(adcp0: DataFrame): DataFrame = {
    var adcp = AdcpStages.beamToXyzz(adcp0)
    val toFix = Seq(
      opts.correctZZshear -> "zz4", opts.correctZshear -> "z4",
      opts.correctYshear -> "y4", opts.correctXshear -> "x4")
    val anyFix = toFix.exists(_._1)
    toFix.foreach { case (enabled, v) =>
      if (enabled) adcp = AdcpStages.shearCorrection(v)(adcp)
    }
    if (anyFix) AdcpStages.xyzzToBeam(adcp) else adcp
  }

  /** grid_shear (:2060-2064): axes + the full combined grid (Sh_E/N/U from
    * the exploded ADCP bins, ADCP attitude grids, every numeric glider
    * column) — three shuffles total via [[GridOutput.gridData]].
    */
  def gridShear(adcp: DataFrame, glider: DataFrame, opts: Options,
      missionCols: Seq[String] = Nil): (DataFrame, GridOutput.Axes) = {
    val ax = GridOutput.axes(glider, opts, missionCols)
    (GridOutput.gridData(adcp, glider, ax), ax)
  }

  /** velocity_from_shear (:2067-2083): DAC + full grid + shear referencing +
    * bias solve + final dataset. `btRaw` optional bottom-track table.
    */
  def velocityFromShear(
      adcp0: DataFrame, glider0: DataFrame, opts: Options,
      btRaw: Option[DataFrame], spark: SparkSession,
      missionCols: Seq[String] = Nil): (DataFrame, GridOutput.Axes) = {
    // the DAC-augmented glider feeds ~10 downstream scans (axes + every
    // gridded variable + profile datetimes); persist it or each scan
    // re-runs the dead-reckoning windows and interp joins
    val glider = trackPersist(GliderStages.getDac(adcp0, glider0, missionCols))
    val adcp = btRaw match {
      case Some(bt) => GliderStages.bottomTrack(opts)(adcp0, bt, missionCols)
      case None => adcp0
    }
    val ax = GridOutput.axes(glider, opts, missionCols)
    val grid0 = GridOutput.gridData(adcp, glider, ax)
    val referenced = GridOutput.referenceShear(grid0, ax, opts.yRes)
    val biased = GridOutput.calcBias(referenced, ax, spark)
    (GridOutput.makeDataset(biased, ax), ax)
  }
}
