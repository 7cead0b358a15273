package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-alignment joins — the reference's `interp` linear-interpolation
  * join (seaexplorertools/process_adcp.py:144-146 and its 12 call sites) and
  * the nearest-neighbor time match used by bottom-track processing
  * (process_adcp.py:1503-1507,1521-1525,1586-1595).
  *
  * Implementation is a single shuffle: union the source knots with the
  * destination probes, then ordered window passes find each probe's
  * bracketing knots. Both directions use RUNNING frames — the "next knot"
  * comes from a descending-order running `last`, never an
  * unbounded-FOLLOWING frame, because Spark re-evaluates following frames
  * from scratch per row (O(n^2) in partition size — measured as a hang at
  * 10^5 rows). With partition keys supplied the window state is bounded per
  * key and the plan scales horizontally.
  */
object InterpJoin {

  private val SRC = "__ij_is_src"
  private val X = "__ij_x"

  private def wAsc(parts: Seq[String]) =
    Windows.ordered(Seq(col(X).asc, col(SRC).desc), parts.map(col))
      .rowsBetween(Window.unboundedPreceding, 0)

  // ties: src (1) sorts after dst (0) in DESC-x order with SRC asc, so an
  // equal-x knot is NOT in the descending running frame — exactly matching
  // the ascending side, where the equal-x knot IS in the preceding frame
  // and the interpolation formula returns it exactly.
  private def wDesc(parts: Seq[String]) =
    Windows.ordered(Seq(col(X).desc, col(SRC).asc), parts.map(col))
      .rowsBetween(Window.unboundedPreceding, 0)

  /** For each row of `dst`, linearly interpolate each of `valueCols` from
    * `src` as a function of `xCol` (both sides; numeric or castable to
    * double), within `partitionCols` groups. Null outside the source hull,
    * exact at knots, null-valued source knots dropped per column (np.interp
    * over nan-filtered pairs — reference `interp`).
    *
    * Output: all columns of `dst` plus one interpolated column per value
    * column, named `outPrefix + valueCol`.
    */
  def interpolate(
      src: DataFrame,
      dst: DataFrame,
      xCol: String,
      valueCols: Seq[String],
      partitionCols: Seq[String] = Nil,
      outPrefix: String = "interp_"): DataFrame = {
    val vals = valueCols.map(c => s"__ij_v_$c")
    val srcPrep = src.select(
      (partitionCols.map(col) :+ col(xCol).cast("double").as(X) :+ lit(1).as(SRC)) ++
        valueCols.zip(vals).map { case (c, a) => col(c).cast("double").as(a) }: _*)
    val dstPrep = dst
      .withColumn(X, col(xCol).cast("double"))
      .withColumn(SRC, lit(0))
    val unioned = dstPrep.unionByName(srcPrep, allowMissingColumns = true)

    val prev = wAsc(partitionCols)
    val next = wDesc(partitionCols)

    val withInterp = valueCols.zip(vals).foldLeft(unioned) { case (df, (out, v)) =>
      val knot = col(SRC) === 1 && col(v).isNotNull
      val x0 = last(when(knot, col(X)), ignoreNulls = true).over(prev)
      val y0 = last(when(knot, col(v)), ignoreNulls = true).over(prev)
      val x1 = last(when(knot, col(X)), ignoreNulls = true).over(next)
      val y1 = last(when(knot, col(v)), ignoreNulls = true).over(next)
      df.withColumn(
        outPrefix + out,
        when(x0 === col(X), y0)
          .when(x1 === col(X), y1)
          .when(x0.isNotNull && x1.isNotNull, y0 + (y1 - y0) * (col(X) - x0) / (x1 - x0)))
    }
    withInterp
      .where(col(SRC) === 0)
      .drop(SRC, X)
      .drop(vals: _*)
  }

  /** For each row of `dst`, attach the `valueCols` of the nearest `src` row
    * by |x_dst - x_src| within `partitionCols`; ties break toward the earlier
    * source row (argmin-first, matching np.argmin on |dt| at
    * process_adcp.py:1503-1507). `tolerance` (same units as x) optionally
    * nulls matches farther than the bound.
    */
  def nearest(
      src: DataFrame,
      dst: DataFrame,
      xCol: String,
      valueCols: Seq[String],
      partitionCols: Seq[String] = Nil,
      tolerance: Option[Double] = None,
      outPrefix: String = "nearest_"): DataFrame = {
    val vals = valueCols.map(c => s"__ij_v_$c")
    val srcPrep = src.select(
      (partitionCols.map(col) :+ col(xCol).cast("double").as(X) :+ lit(1).as(SRC)) ++
        valueCols.zip(vals).map { case (c, a) => col(c).cast("double").as(a) }: _*)
    val dstPrep = dst
      .withColumn(X, col(xCol).cast("double"))
      .withColumn(SRC, lit(0))
    val unioned = dstPrep.unionByName(srcPrep, allowMissingColumns = true)

    val prev = wAsc(partitionCols)
    val next = wDesc(partitionCols)

    val knot = col(SRC) === 1
    val x0 = last(when(knot, col(X)), ignoreNulls = true).over(prev)
    val x1 = last(when(knot, col(X)), ignoreNulls = true).over(next)
    val dPrev = abs(col(X) - x0)
    val dNext = abs(x1 - col(X))
    val usePrev = x1.isNull || (x0.isNotNull && dPrev <= dNext)

    val base = unioned
      .withColumn("__ij_x0", x0).withColumn("__ij_x1", x1)
      .withColumn("__ij_use_prev", usePrev)
    val withVals = valueCols.zip(vals).foldLeft(base) { case (df, (out, v)) =>
      // struct-wrap so `ignoreNulls` skips probe rows (when() -> null) but
      // still matches knot rows whose value happens to be null.
      val y0k = last(when(knot, struct(col(v).as("v"))), ignoreNulls = true)
        .over(prev).getField("v")
      val y1k = last(when(knot, struct(col(v).as("v"))), ignoreNulls = true)
        .over(next).getField("v")
      val matchedDist = when(col("__ij_use_prev"), abs(col(X) - col("__ij_x0")))
        .otherwise(abs(col("__ij_x1") - col(X)))
      val inTol = tolerance.map(t => matchedDist <= lit(t)).getOrElse(lit(true))
      df.withColumn(outPrefix + out,
        when(inTol, when(col("__ij_use_prev"), y0k).otherwise(y1k)))
    }
    withVals
      .where(col(SRC) === 0)
      .drop(SRC, X, "__ij_x0", "__ij_x1", "__ij_use_prev")
      .drop(vals: _*)
  }
}
