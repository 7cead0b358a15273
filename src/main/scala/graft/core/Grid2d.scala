package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's central operator: 2-D binned aggregation
  * (`grid2d`, seaexplorertools/process_adcp.py:117-134; ~20 call sites).
  *
  * Bin `x` and `y` by uniform right-closed edges (pd.cut parity — see
  * [[Bins]]), group by `(xbin, ybin)`, aggregate `v` with a pluggable
  * aggregate. The reference scatters into a dense NaN-initialized
  * `len(yi) x len(xi)` matrix; here the native output is the *sparse tall*
  * relation `(xbin, ybin, value)` — the scalable form (a dense 2-D matrix is
  * a driver-side artifact) — with an optional dense fill that left-joins the
  * full bin-id cross product, re-materializing the reference's empty cells
  * as nulls.
  *
  * Shuffle profile: one exchange on (xbin, ybin) with map-side partial
  * aggregation for algebraic aggs (avg/count/stddev). `median` is
  * sort-based within groups; group cardinality is bounded by nx*ny, so
  * post-shuffle parallelism is capped by grid size, not input size — fine
  * for the reference's O(10^3..10^5)-cell grids at any input scale.
  */
object Grid2d {

  /** Pluggable aggregates mirroring the reference call sites:
    * 'mean' | 'median' | 'count' | 'stddev' (np.nanstd is population std,
    * ddof=0 -> stddev_pop, NOT sample stddev) | 'sum' | 'min' | 'max'.
    */
  def aggFor(name: String): Column => Column = name match {
    case "mean"   => avg
    case "median" => median
    case "count"  => c => count(c).cast("long")
    case "stddev" => stddev_pop
    case "sum"    => sum
    case "min"    => min
    case "max"    => max
    case other    => throw new IllegalArgumentException(s"unknown agg: $other")
  }

  /** Sparse tall grid: (xbin, ybin, value), rows only for populated cells.
    * Rows with either bin out of range are dropped (pd.cut NaN semantics).
    */
  def grid2d(
      df: DataFrame,
      x: Column, xLo: Double, xStep: Double, xN: Int,
      y: Column, yLo: Double, yStep: Double, yN: Int,
      v: Column,
      agg: Column => Column = avg): DataFrame =
    df.select(
        Bins.cutRight(x, xLo, xStep, xN).as("xbin"),
        Bins.cutRight(y, yLo, yStep, yN).as("ybin"),
        v.as("v"))
      .where(col("xbin").isNotNull && col("ybin").isNotNull)
      .groupBy("xbin", "ybin")
      .agg(agg(col("v")).as("value"))

  /** Dense fill: every (xbin, ybin) in [0,xN) x [0,yN), null value for empty
    * cells. The reference additionally allocates one phantom trailing row and
    * column (grid sized to len(edges) though cut yields <= len(edges)-1
    * ordinals — process_adcp.py:125-131); pass `phantomEdge = true` to
    * reproduce those always-null cells bit-for-bit.
    */
  def denseFill(
      spark: SparkSession,
      sparse: DataFrame,
      xN: Int,
      yN: Int,
      phantomEdge: Boolean = false): DataFrame = {
    val nx = if (phantomEdge) xN + 1 else xN
    val ny = if (phantomEdge) yN + 1 else yN
    val cells = spark.range(nx).select(col("id").as("xbin"))
      .crossJoin(spark.range(ny).select(col("id").as("ybin")))
    cells.join(sparse, Seq("xbin", "ybin"), "left")
  }
}
