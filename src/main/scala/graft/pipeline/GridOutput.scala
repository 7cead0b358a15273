package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Optimize

/** The gridded-output half of the pipeline (SURVEY.md §2.9 entry points 2-3):
  * profile/depth axes, shear gridding + vertical integration, DAC
  * referencing, glider-variable gridding, scalar bias solve, final tall
  * dataset (grid_shear_data / reference_shear / grid_data / calc_bias /
  * make_dataset, process_adcp.py:1600-2043).
  *
  * The output grid is the tall relation (xbin, ybin, columns...) — the
  * scalable form; the reference's dense 2-D matrices exist only inside the
  * driver-side bias solve, where the grid is O(profiles x depth-bins) small
  * by construction.
  */
object GridOutput {

  /** Axes (grid_shear_data, :1648-1656): yaxis = arange(0, ceil(max
    * pressure), yRes); xaxis = sorted unique profile numbers; per-profile
    * mean date_float as the time axis.
    *
    * pd.cut semantics with the xaxis itself as edges mean profile
    * xaxis[k] lands in column k-1 and the first profile is dropped —
    * replicated via a profile -> dense-rank-minus-2 mapping.
    */
  final case class Axes(yMax: Double, yRes: Double, profiles: Seq[Double]) {
    def nY: Int = math.ceil(yMax).toInt
    def nX: Int = profiles.size - 1 // column k-1 per profile, first dropped
  }

  def axes(glider: DataFrame, opts: Options): Axes = {
    val yMax = glider.agg(max(ceil(col("pressure"))).cast("double")).first().getDouble(0)
    val profiles = glider.select("profile_number").distinct()
      .orderBy("profile_number").collect().map(_.getDouble(0)).toSeq
    Axes(yMax, opts.yRes, profiles)
  }

  /** pd.cut(x, xaxis) ordinal for x values that are exactly the profile
    * numbers: value == edge k -> bin k-1; first edge -> null.
    */
  def profileBin(axes: Axes): Column = {
    val m = map(axes.profiles.zipWithIndex.flatMap { case (p, i) =>
      Seq(lit(p), if (i == 0) lit(null).cast("long") else lit((i - 1).toLong))
    }: _*)
    element_at(m, col("profile_number"))
  }

  /** Right-closed pressure bin (uniform yaxis, pd.cut parity). */
  def depthBin(axes: Axes, y: Column): Column =
    graft.core.Bins.cutRight(y, 0.0, axes.yRes, axes.nY - 1)

  /** Grid one exploded ADCP shear variable by (profile, bin_depth):
    * (xbin, ybin, value-mean) tall grid (reference_shear Sh grid, :1670).
    */
  def gridAdcpVar(adcp: DataFrame, axes: Axes, varCol: String): DataFrame =
    adcp
      .select(col("profile_number"),
        posexplode(arrays_zip(col("bin_depth"), col(varCol))).as(Seq("i", "zv")))
      .select(col("profile_number"),
        col("zv.bin_depth").as("bd"), col("zv." + varCol).as("v"))
      .withColumn("xbin", profileBin(axes))
      .withColumn("ybin", depthBin(axes, col("bd")))
      .where(col("xbin").isNotNull && col("ybin").isNotNull && col("v").isNotNull)
      .groupBy("xbin", "ybin").agg(avg("v").as(varCol))

  /** Grid a glider column by (profile, pressure) with a pluggable agg. */
  def gridGliderVar(glider: DataFrame, axes: Axes, varCol: String,
      agg: Column => Column = avg): DataFrame =
    glider
      .withColumn("xbin", profileBin(axes))
      .withColumn("ybin", depthBin(axes, col("pressure")))
      .where(col("xbin").isNotNull && col("ybin").isNotNull && col(varCol).isNotNull)
      .groupBy("xbin", "ybin").agg(agg(col(varCol)).as(varCol))

  /** Vertical integration of a gridded shear column into velocity
    * (reference_shear, :1676-1682): cumsum down depth with zeros for
    * missing cells, original nulls restored, times yRes, then column
    * de-meaned (baroclinic zero-mean).
    */
  def integrateShear(grid: DataFrame, varCol: String, yRes: Double): DataFrame = {
    val wCum = Window.partitionBy("xbin").orderBy("ybin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wCol = Window.partitionBy("xbin")
    grid
      .withColumn("v_int",
        when(col(varCol).isNotNull,
          sum(coalesce(col(varCol), lit(0.0))).over(wCum) * yRes))
      .withColumn("v_ref", col("v_int") - avg(col("v_int")).over(wCol))
      .drop("v_int")
  }

  /** DAC referencing (reference_shear, :1690-1717): residence-time weights
    * SpB = yRes / dPdz clipped at one global std, reference =
    * colMean(DAC) - sum(V*SpB)/sum(SpB), added back per column.
    */
  def referenceToDac(
      vGrid: DataFrame, dacGrid: DataFrame, dpdzGrid: DataFrame,
      dacCol: String, yRes: Double): DataFrame = {
    // the std clip needs an action before the final projection; persist so
    // the gridded/integrated upstream isn't computed twice
    val joined = vGrid
      .join(dacGrid, Seq("xbin", "ybin"), "left")
      .join(dpdzGrid, Seq("xbin", "ybin"), "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // SpB = yRes/dPdz; inf (dPdz==0) -> 0; empty cells stay null so the
    // weighted sums nan-skip them exactly like the reference's nansum; the
    // clip assigns +std regardless of sign (SpB[|SpB| > std] = std,
    // process_adcp.py:1705-1708 — reference behavior, not symmetric).
    val spb0 = when(col("speed_vert").isNull, lit(null).cast("double"))
      .when(col("speed_vert") === 0.0, lit(0.0))
      .otherwise(lit(yRes) / col("speed_vert"))
    val std = joined.select(stddev_pop(spb0).as("s")).first().getDouble(0)
    val spb = when(abs(spb0) > std, lit(std)).otherwise(spb0)
    val wCol = Window.partitionBy("xbin")
    // numerator nansum(V*SpB) skips cells where either is missing; the
    // denominator is nansum(SpB) over ALL cells (reference does not mask it
    // by V, process_adcp.py:1713).
    val ref = avg(col(dacCol)).over(wCol) -
      sum(col("v_ref") * spb).over(wCol) / sum(spb).over(wCol)
    joined
      .withColumn("v_final", col("v_ref") + ref)
      .select(col("xbin"), col("ybin"), col("v_final"))
  }

  /** Scalar bias solve (calc_bias, :1954-1984): per-column nancumsum of the
    * gridded glider speed, de-meaned, scaled by the coefficient minimizing
    * the combined E/N RMSD score (fmin, maxiter=100, ftol=1e-5). The grid is
    * driver-sized (profiles x depth bins); collect once, solve, apply
    * distributed.
    */
  def calcBias(out: DataFrame, spark: SparkSession): DataFrame = {
    val rows = out.select("xbin", "ybin", "ADCP_E", "ADCP_N", "speed_e", "speed_n")
      .collect()
    val byCol = rows.groupBy(_.getLong(0))
    def series(colIdx: Int, xbin: Long): Array[(Long, Double)] =
      byCol(xbin).map(r => (r.getLong(1),
        if (r.isNullAt(colIdx)) Double.NaN else r.getDouble(colIdx)))
        .sortBy(_._1)
    def biasColumn(speed: Array[(Long, Double)]): Array[(Long, Double)] = {
      var cum = 0.0
      val raw = speed.map { case (y, v) =>
        if (!v.isNaN) cum += v
        (y, if (v.isNaN) Double.NaN else cum)
      }
      val finite = raw.map(_._2).filter(v => !v.isNaN)
      val mean = if (finite.isEmpty) 0.0 else finite.sum / finite.length
      raw.map { case (y, v) => (y, v - mean) }
    }
    val xbins = byCol.keys.toArray.sorted
    val biasE = xbins.map(x => x -> biasColumn(series(4, x)).toMap).toMap
    val biasN = xbins.map(x => x -> biasColumn(series(5, x)).toMap).toMap

    def score(coeff: Double): Double = {
      // rmsd over columns of (rmsd_h(E) + rmsd_h(N)) per row — reference
      // computes row-wise rmsd over profiles then an overall rmsd (:1962-1966)
      val byRow = rows.groupBy(_.getLong(1))
      val rowScores = byRow.toSeq.sortBy(_._1).map { case (ybin, rs) =>
        def rmsdOf(colIdx: Int, bias: Map[Long, Map[Long, Double]]): Double = {
          val vs = rs.flatMap { r =>
            val x = r.getLong(0)
            val base = if (r.isNullAt(colIdx)) Double.NaN else r.getDouble(colIdx)
            val b = bias(x).getOrElse(ybin, Double.NaN)
            val v = base + b * coeff
            if (v.isNaN) None else Some(v * v)
          }
          if (vs.isEmpty) Double.NaN else math.sqrt(vs.sum / vs.size)
        }
        val e = rmsdOf(2, biasE); val n = rmsdOf(3, biasN)
        e + n
      }
      val finite = rowScores.filter(v => !v.isNaN)
      if (finite.isEmpty) 0.0
      else math.sqrt(finite.map(v => v * v).sum / finite.size) * 1e6
    }

    val r = Optimize.nelderMead(x => score(x(0)), Array(1.0),
      fatol = 1e-5, maxIter = 100)
    val coeff = r.x(0)

    import spark.implicits._
    val biasDf = xbins.flatMap { x =>
      biasE(x).keys.map { y =>
        (x, y, biasE(x)(y), biasN(x)(y))
      }
    }.toSeq.toDF("xbin", "ybin", "bias_e", "bias_n")
    out.join(biasDf, Seq("xbin", "ybin"), "left")
      .withColumn("ADCP_E", col("ADCP_E") +
        when(!isnan(col("bias_e")), col("bias_e")).otherwise(lit(0.0)) * coeff)
      .withColumn("ADCP_N", col("ADCP_N") +
        when(!isnan(col("bias_n")), col("bias_n")).otherwise(lit(0.0)) * coeff)
      .drop("bias_e", "bias_n")
  }

  /** CSV export of the gridded output (the reference notebook's
    * exportCSVfiles, ProcessADCPSeaExplorer.ipynb cell 103).
    */
  def exportCsv(ds: DataFrame, path: String): Unit =
    ds.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Final dataset (make_dataset, :2029-2043): tall (xbin, ybin) grid with
    * one column per variable plus per-profile mean datetime.
    */
  def makeDataset(out: DataFrame, glider: DataFrame, axes: Axes): DataFrame = {
    // ds.date_float.mean(dim='depth_bin') — the mean of the GRIDDED
    // per-cell date_float means (:2042), not of the raw samples
    val profDt = out
      .groupBy("xbin").agg(avg("date_float").as("profile_datetime_ns"))
    out.join(profDt, Seq("xbin"), "left")
  }
}
