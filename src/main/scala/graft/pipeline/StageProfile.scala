package graft.pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
object StageProfile {
  def main(args: Array[String]): Unit = {
    val profiles = if (args.nonEmpty) args(0).toInt else 24
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val opts = Fixture.opts
    val glider = GliderStages.deriveGlider(Fixture.glider(spark, profiles)).cache()
    var adcp = Fixture.adcp(spark, profiles).cache()
    println(s"pings=${adcp.count()} glider=${glider.count()}")
    def step(tag: String)(f: DataFrame => DataFrame): Unit = {
      val t0 = System.nanoTime()
      adcp = f(adcp).cache()
      adcp.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    step("align")(a => AdcpStages.align(a, glider).repartition(32))
    step("remapDepth")(AdcpStages.remapDepth(opts))
    step("heading")(a => HeadingCorrection(opts)(a))
    step("soundspeed")(AdcpStages.soundspeedCorrection)
    step("outliers")(AdcpStages.removeOutliers(opts))
    step("xyzz")(AdcpStages.beamToXyzz)
    step("backscatter")(AdcpStages.backscatterCorrection(opts))
    step("regrid")(AdcpStages.regrid(opts, Fixture.cellSize, Fixture.blankingDistance))
    step("threeBeam")(AdcpStages.threeBeamXyz(opts))
    step("enuShear")(AdcpStages.enuAndShear(opts))
    spark.stop()
  }
}
