package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Array-column helpers for the per-ping wide form (one row per ping,
  * per-bin variables as fixed-length arrays): centered gradients along the
  * bin axis and the per-ping linear regridding interpolator.
  */
object ArrayOps {

  /** Centered first derivative along the array index with one-sided edges —
    * xarray `differentiate` over a unit-spaced integer coordinate
    * (process_adcp.py:1186-1194: Sh_* differentiate w.r.t. `gridded_bin`,
    * NOT meters — preserved exactly). Null elements propagate like NaN.
    */
  def gradientUnit(a: Column): Column = {
    val n = size(a)
    transform(a, (_, i) => {
      val prev = element_at(a, i) // i is 0-based; element_at is 1-based => a[i-1]
      val cur = element_at(a, i + 1)
      val next = when(i + 2 <= n, element_at(a, i + 2))
      when(i === 0, next - cur)
        .when(i === n - 1, cur - prev)
        .otherwise((next - prev) / 2.0)
    })
  }

  /** np.interp-style linear interpolation of (x, y) samples onto fixed
    * targets, null outside the hull, null result when fewer than 2 finite
    * samples (regridADCPdata per-ping semantics, process_adcp.py:928-946).
    * x must be ascending where finite; pairs with null x or y are dropped.
    *
    * Implemented as a deterministic Scala UDF over array columns — the one
    * operator where per-ping imperative code beats Column algebra (SURVEY.md
    * §7.3); the UDF is a narrow map, so it parallelizes per-row with zero
    * shuffle.
    */
  val interpToTargets =
    udf((xs: Seq[java.lang.Double], ys: Seq[java.lang.Double], targets: Seq[Double]) => {
      val pairs = xs.zip(ys).collect {
        case (x, y) if x != null && y != null && !x.isNaN && !y.isNaN =>
          (x.doubleValue, y.doubleValue)
      }.sortBy(_._1)
      if (pairs.length < 2) targets.map(_ => null.asInstanceOf[java.lang.Double])
      else {
        val px = pairs.map(_._1).toArray
        val py = pairs.map(_._2).toArray
        targets.map { t =>
          if (t < px.head || t > px.last) null.asInstanceOf[java.lang.Double]
          else {
            var idx = java.util.Arrays.binarySearch(px, t)
            if (idx >= 0) java.lang.Double.valueOf(py(idx))
            else {
              idx = -idx - 1 // insertion point; 0 < idx < n here
              val x0 = px(idx - 1); val x1 = px(idx)
              val y0 = py(idx - 1); val y1 = py(idx)
              java.lang.Double.valueOf(y0 + (y1 - y0) * (t - x0) / (x1 - x0))
            }
          }
        }
      }
    })

  /** Elementwise combine of two equal-length arrays, null-propagating. */
  def zipMul(a: Column, b: Column): Column = zip_with(a, b, _ * _)

  /** Scale every element by a per-row scalar. */
  def scale(a: Column, k: Column): Column = transform(a, x => x * k)

  /** Mean over an array ignoring nulls (xarray .mean(dim='bin')). */
  def arrayMean(a: Column): Column = {
    val finite = filter(a, x => x.isNotNull)
    when(size(finite) > 0, aggregate(finite, lit(0.0), _ + _) / size(finite))
  }
}
