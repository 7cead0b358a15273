package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pipeline throughput benchmark: runs shear_from_adcp end-to-end (incl.
  * the magnetometer calibration solve) on a scaled synthetic mission and
  * reports pings/second. Context for the number: the reference executes the
  * regrid stage as a vectorized-Python per-ping loop
  * (xr.apply_ufunc(..., vectorize=True), process_adcp.py:937-946) plus
  * O(n*m) nearest-neighbor Python loops (:1506,1524) — single-digit
  * thousands of pings/second at best on the same stage.
  * `sbt "runMain graft.pipeline.PipelineBench [nProfiles]"` (default 100
  * profiles -> 20k pings; 6 -> the test fixture).
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val profiles = if (args.nonEmpty) args(0).toInt else 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-pipeline-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val glider = Fixture.glider(spark, profiles).cache()
    val adcpRaw = Fixture.adcp(spark, profiles).cache()
    val nPings = adcpRaw.count(); glider.count() // materialize inputs first

    val t0 = System.nanoTime()
    val (adcp, gliderOut) = AdcpPipeline.shearFromAdcp(adcpRaw, glider, Fixture.opts,
      Fixture.cellSize, Fixture.blankingDistance, solveHeading = true)
    val cells = adcp.select(explode(col("sh_e"))).where(col("col").isNotNull).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val fullJson = if (args.length > 1 && args(1) == "full") {
      val t1 = System.nanoTime()
      val (ds, _) = AdcpPipeline.velocityFromShear(adcp, gliderOut, Fixture.opts, None, spark)
      val nE = ds.where(col("ADCP_E").isNotNull && !isnan(col("ADCP_E"))).count()
      f""","velocity_seconds":${(System.nanoTime() - t1) / 1e9}%.2f,"grid_cells_with_E":$nE"""
    } else ""
    println(f"""{"pings":$nPings,"finite_shear_cells":$cells,"seconds":$secs%.2f,"pings_per_sec":${nPings / secs}%.0f$fullJson}""")
    spark.stop()
  }
}
