package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline._

/** calc_bias distributed solve: the bias columns and the fmin objective's
  * sufficient statistics stay on the executors, and the scalar coefficient
  * is solved PER MISSION — missions with different prescribed biases must
  * each recover their own coefficient (a shared coefficient cannot zero
  * both residuals).
  *
  * Fixture algebra: speed_e(y) = y+1 per column, so the de-meaned nancumsum
  * is bias_e(y) = (y+1)(y+2)/2 - 22 over ybin 0..9; setting
  * ADCP = -k * bias makes coeff = k the exact optimum with residual 0.
  */
class CalcBiasSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def biasE(y: Int): Double = (y + 1) * (y + 2) / 2.0 - 22.0

  test("calcBias recovers a distinct coefficient per mission") {
    val glider = (for (m <- Seq(1, 2); p <- 0 to 3)
      yield (m, p.toDouble, 10.0)).toDF("mission", "profile_number", "pressure")
    val axes = GridOutput.axes(glider, Options(), Seq("mission"))
    val k = Map(1 -> 2.0, 2 -> 5.0)
    val out = (for (m <- Seq(1, 2); x <- 0L to 2L; y <- 0L to 9L) yield {
      val b = biasE(y.toInt)
      (m, x, y, (y + 1).toDouble, 2.0 * (y + 1), -k(m) * b, -k(m) * 2.0 * b)
    }).toDF("mission", "xbin", "ybin", "speed_e", "speed_n", "ADCP_E", "ADCP_N")
    val res = GridOutput.calcBias(out, axes, spark)
    val resid = res.groupBy("mission")
      .agg(max(abs(col("ADCP_E"))).as("mx_e"), max(abs(col("ADCP_N"))).as("mx_n"))
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(resid.keySet == Set(1, 2))
    resid.foreach { case (m, (e, n)) =>
      assert(e < 1e-6 && n < 1e-6,
        s"mission $m residual e=$e n=$n (own coefficient not recovered)")
    }
    axes.release()
  }

  test("null mission key keeps its own solved coefficient (null-safe join)") {
    // a null key forms its own group in the solve; the coefficient re-join
    // must be null-safe or the null mission silently gets no bias applied
    val glider = (for (m <- Seq(Some(1), None); p <- 0 to 3)
      yield (m, p.toDouble, 10.0)).toDF("mission", "profile_number", "pressure")
    val axes = GridOutput.axes(glider, Options(), Seq("mission"))
    val k = Map(Some(1) -> 2.0, (None: Option[Int]) -> 5.0)
    val out = (for (m <- Seq(Some(1), None); x <- 0L to 2L; y <- 0L to 9L) yield {
      val b = biasE(y.toInt)
      (m, x, y, (y + 1).toDouble, 2.0 * (y + 1), -k(m) * b, -k(m) * 2.0 * b)
    }).toDF("mission", "xbin", "ybin", "speed_e", "speed_n", "ADCP_E", "ADCP_N")
    val res = GridOutput.calcBias(out, axes, spark)
    val resid = res.groupBy("mission")
      .agg(max(abs(col("ADCP_E"))).as("mx_e"), max(abs(col("ADCP_N"))).as("mx_n"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)),
        (r.getDouble(1), r.getDouble(2)))).toMap
    assert(resid.keySet == Set(Some(1), None))
    resid.foreach { case (m, (e, n)) =>
      assert(e < 1e-6 && n < 1e-6,
        s"mission $m residual e=$e n=$n (null-safe coefficient join broken)")
    }
    axes.release()
  }

  test("single-mission calcBias solves the same algebra without mission keys") {
    val glider = (0 to 3).map(p => (p.toDouble, 10.0))
      .toDF("profile_number", "pressure")
    val axes = GridOutput.axes(glider, Options())
    val out = (for (x <- 0L to 2L; y <- 0L to 9L) yield {
      val b = biasE(y.toInt)
      (x, y, (y + 1).toDouble, 2.0 * (y + 1), -3.0 * b, -6.0 * b)
    }).toDF("xbin", "ybin", "speed_e", "speed_n", "ADCP_E", "ADCP_N")
    val res = GridOutput.calcBias(out, axes, spark)
    val mx = res.agg(max(abs(col("ADCP_E"))), max(abs(col("ADCP_N")))).first()
    assert(mx.getDouble(0) < 1e-6 && mx.getDouble(1) < 1e-6,
      s"residuals ${mx.getDouble(0)} / ${mx.getDouble(1)}")
    axes.release()
  }

  test("missing speed yields no bias: velocities pass through untouched") {
    val glider = (0 to 3).map(p => (p.toDouble, 10.0))
      .toDF("profile_number", "pressure")
    val axes = GridOutput.axes(glider, Options())
    val out = (for (x <- 0L to 2L; y <- 0L to 9L) yield
      (x, y, Option.empty[Double], Option.empty[Double], 0.25 * y, -0.5 * y))
      .toDF("xbin", "ybin", "speed_e", "speed_n", "ADCP_E", "ADCP_N")
    val res = GridOutput.calcBias(out, axes, spark)
    val diff = res
      .withColumn("d_e", abs(col("ADCP_E") - col("ybin") * 0.25))
      .withColumn("d_n", abs(col("ADCP_N") + col("ybin") * 0.5))
      .agg(max("d_e"), max("d_n")).first()
    assert(diff.getDouble(0) == 0.0 && diff.getDouble(1) == 0.0,
      "null-speed cells must not be biased")
    axes.release()
  }
}
