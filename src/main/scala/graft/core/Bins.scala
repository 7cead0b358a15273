package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `pd.cut`-compatible edge binning as pure Column expressions.
  *
  * Reference semantics (seaexplorertools/process_adcp.py:117-134, grid2d):
  * edges are `arange(lo, hi + step, step)`; `pd.cut(x, edges, labels=False)`
  * yields right-closed intervals `(edges[k], edges[k+1]]` with ordinal label
  * `k`, NaN for values outside the edges, and NaN for `x == edges[0]`
  * (include_lowest defaults to False).
  *
  * For uniform edges the ordinal is computable in closed form:
  * `k = ceil((x - lo)/step) - 1`, valid iff `0 <= k < n`. The identical
  * arithmetic runs in any ANSI SQL engine, which keeps the driver's DuckDB
  * oracle in exact agreement (same IEEE double ops on both sides).
  */
object Bins {

  /** Right-closed `(lo, hi]` ordinal bin (pd.cut parity). Null outside
    * [lo, lo + n*step], null at exactly `lo`, null for null/NaN input.
    */
  def cutRight(x: Column, lo: Double, step: Double, n: Int): Column = {
    val k = ceil((x - lit(lo)) / lit(step)).cast("long") - 1
    when(x.isNotNull && !isnan(x) && k >= 0 && k < n, k)
  }

  /** Left-closed `[lo, hi)` ordinal bin (width_bucket-style floor binning). */
  def cutLeft(x: Column, lo: Double, step: Double, n: Int): Column = {
    val k = floor((x - lit(lo)) / lit(step)).cast("long")
    when(x.isNotNull && !isnan(x) && k >= 0 && k < n, k)
  }

  /** [[cutLeft]] with np.histogram's LAST-bin closure: every bin is
    * [edge, edge) except the last, which is [edge98, hi] — a value landing
    * exactly on (or floor-dividing to) the upper edge while still &lt;= hi
    * joins bin n-1 instead of being dropped. This is plt.hist/np.histogram
    * parity for the verify histograms (process_adcp.py:1300,1310-1311).
    */
  def cutLeftHist(x: Column, lo: Double, step: Double, n: Int): Column = {
    val k = floor((x - lit(lo)) / lit(step)).cast("long")
    when(x.isNotNull && !isnan(x) && k >= 0 && k < n, k)
      .when(x.isNotNull && !isnan(x) && k === n && x <= lit(lo + n * step),
        lit(n - 1L))
  }

  /** Reference edge generation: `arange(min, max + step, step)` from data
    * aggregates (process_adcp.py:118-121). Returns (lo, n) given observed
    * min/max; driver-side because edges parameterize the plan.
    */
  def arangeEdges(min: Double, max: Double, step: Double): (Double, Int) = {
    // np.arange(min, max + step, step) yields ceil((max + step - min)/step)
    // edge points => that many minus one intervals.
    val nEdges = math.ceil((max + step - min) / step).toInt
    (min, math.max(nEdges - 1, 0))
  }

  /** SQL fragment mirroring [[cutRight]] for oracle queries (DuckDB/ANSI). */
  def cutRightSql(x: String, lo: Double, step: Double, n: Int): String =
    s"(CASE WHEN $x IS NOT NULL AND CAST(ceil(($x - $lo)/$step) AS BIGINT) - 1 >= 0 " +
      s"AND CAST(ceil(($x - $lo)/$step) AS BIGINT) - 1 < $n " +
      s"THEN CAST(ceil(($x - $lo)/$step) AS BIGINT) - 1 END)"

  /** SQL fragment mirroring [[cutLeft]]. */
  def cutLeftSql(x: String, lo: Double, step: Double, n: Int): String =
    s"(CASE WHEN $x IS NOT NULL AND CAST(floor(($x - $lo)/$step) AS BIGINT) >= 0 " +
      s"AND CAST(floor(($x - $lo)/$step) AS BIGINT) < $n " +
      s"THEN CAST(floor(($x - $lo)/$step) AS BIGINT) END)"

  /** DuckDB mirror of [[cutLeftHist]] — identical chain, last bin closed. */
  def cutLeftHistSql(x: String, lo: Double, step: Double, n: Int): String =
    s"(CASE WHEN $x IS NOT NULL AND CAST(floor(($x - $lo)/$step) AS BIGINT) >= 0 " +
      s"AND CAST(floor(($x - $lo)/$step) AS BIGINT) < $n " +
      s"THEN CAST(floor(($x - $lo)/$step) AS BIGINT) " +
      s"WHEN $x IS NOT NULL AND CAST(floor(($x - $lo)/$step) AS BIGINT) = $n " +
      s"AND $x <= ${lo + n * step} THEN CAST(${n - 1} AS BIGINT) END)"
}
