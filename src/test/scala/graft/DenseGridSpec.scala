package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline._

/** makeDataset dense mode: the reference scatters every grid into a
  * NaN-initialized len(yaxis) x len(xaxis) matrix (process_adcp.py:125-131)
  * and make_dataset keeps that dense shape (:2029-2043), so the dense
  * variant must emit exactly nY x (per-mission nX) cells per mission —
  * all-null rows and columns included — while sparse stays the default.
  */
class DenseGridSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  // missions of different widths: mission 1 has 5 profiles (nX=4 after the
  // first-profile drop), mission 2 has 3 (nX=2); yMax 10 -> nY=10
  private def gliderDf = (for {
    (m, nP) <- Seq(1 -> 5, 2 -> 3); p <- 0 until nP
  } yield (m, p.toDouble, 10.0)).toDF("mission", "profile_number", "pressure")

  // sparse grid: only a few populated cells, none in mission 2's xbin 1
  private def sparseOut = Seq(
    (1, 0L, 0L, 100.0), (1, 0L, 3L, 101.0), (1, 2L, 5L, 102.0),
    (2, 0L, 9L, 200.0))
    .toDF("mission", "xbin", "ybin", "date_float")

  test("dense variant has exactly nY x per-mission nX cells per mission") {
    val axes = GridOutput.axes(gliderDf, Options(), Seq("mission"))
    val dense = GridOutput.makeDataset(sparseOut, axes, dense = true).cache()
    val counts = dense.groupBy("mission").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(1 -> 40L, 2 -> 20L),
      s"expected nY(10) x nX(4 / 2) cells per mission, got $counts")
    // dense cell ids tile the full rectangle
    val distinctY = dense.select("ybin").distinct().count()
    assert(distinctY == 10)
    // populated cells keep their values; empty cells are null
    val kept = dense.where(col("date_float").isNotNull).count()
    assert(kept == 4, "original sparse cells must survive the fill")
    // all-empty columns get a null profile_datetime (mean over no cells)
    val emptyColDt = dense.where(col("mission") === 2 && col("xbin") === 1)
      .select("profile_datetime_ns").distinct().collect()
    assert(emptyColDt.length == 1 && emptyColDt(0).isNullAt(0),
      "all-NaN column must carry a null profile datetime")
    // populated columns average only their populated cells
    val m1x0 = dense.where(col("mission") === 1 && col("xbin") === 0)
      .select("profile_datetime_ns").distinct().collect()
    assert(m1x0.length == 1 && m1x0(0).getDouble(0) == 100.5)
    dense.unpersist(); axes.release()
  }

  test("sparse remains the default shape") {
    val axes = GridOutput.axes(gliderDf, Options(), Seq("mission"))
    assert(GridOutput.makeDataset(sparseOut, axes).count() == 4)
    axes.release()
  }

  test("dense output exports to per-mission netCDF via dataset_to_nc.py") {
    import scala.sys.process._
    val have = Process(Seq("python3", "-c", "import pyarrow, numpy, pandas"))
      .!(ProcessLogger(_ => ())) == 0
    assume(have, "python3 with pyarrow/numpy/pandas not available")
    val axes = GridOutput.axes(gliderDf, Options(), Seq("mission"))
    val dense = GridOutput.makeDataset(sparseOut, axes, dense = true)
    val dir = java.nio.file.Files.createTempDirectory("nc_export").toString
    dense.coalesce(1).write.mode("overwrite").parquet(s"$dir/dense.parquet")
    val rc = Process(Seq("python3", "tools/dataset_to_nc.py",
      "--in", s"$dir/dense.parquet", "--out", s"$dir/out.nc",
      "--mission-col", "mission")).!(ProcessLogger(_ => ()))
    assert(rc == 0, s"dataset_to_nc.py failed (rc=$rc)")
    // one file per mission (reference cardinality), shapes = nY x nX and
    // the populated cell values survive bit-exact
    val check = Process(Seq("python3", "-c",
      """import sys; sys.path.insert(0, 'tools')
        |import numpy as np
        |from nc_to_parquet import read_netcdf_classic
        |a1, _, _ = read_netcdf_classic(sys.argv[1])
        |a2, _, _ = read_netcdf_classic(sys.argv[2])
        |assert a1['date_float'].shape == (10, 4), a1['date_float'].shape
        |assert a2['date_float'].shape == (10, 2), a2['date_float'].shape
        |assert a1['date_float'][0, 0] == 100.0
        |assert a1['date_float'][3, 0] == 101.0
        |assert a2['date_float'][9, 0] == 200.0
        |assert np.isnan(a2['date_float'][:, 1]).all()
        |print('ok')""".stripMargin,
      s"$dir/out__1.nc", s"$dir/out__2.nc")).!!
    assert(check.trim.endsWith("ok"))
    axes.release()
  }

  test("single-mission dense fill (no mission columns)") {
    val glider = (0 until 4).map(p => (p.toDouble, 5.0))
      .toDF("profile_number", "pressure")
    val axes = GridOutput.axes(glider, Options())
    val out = Seq((0L, 1L, 42.0)).toDF("xbin", "ybin", "date_float")
    val dense = GridOutput.makeDataset(out, axes, dense = true)
    assert(dense.count() == axes.nX * axes.nY) // 3 x 5
    assert(dense.where(col("date_float").isNotNull).count() == 1)
    axes.release()
  }
}
