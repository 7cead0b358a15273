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
  * destination probes, then one ordered window pass finds each probe's
  * bracketing knots via `last/first(..., ignoreNulls)`. No O(n*m) loops, no
  * driver materialization; with partition keys supplied the window state is
  * bounded per key and the plan scales horizontally. This is Spark-first
  * (declarative window algebra) rather than a custom physical operator: the
  * sort the window needs is exactly the sort a purpose-built as-of join
  * would perform, so Catalyst's existing WindowExec is already the right
  * physical strategy.
  */
object InterpJoin {

  private val SRC = "__ij_is_src"
  private val X = "__ij_x"

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

    // Order source knots before probes at equal x so the "previous knot"
    // frame sees an exactly-coincident knot; the knot formula then returns
    // the knot value exactly.
    val w = Windows.ordered(Seq(col(X).asc, col(SRC).desc), partitionCols.map(col))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = w.rowsBetween(0, Window.unboundedFollowing)

    val withInterp = valueCols.zip(vals).foldLeft(unioned) { case (df, (out, v)) =>
      val knot = col(SRC) === 1 && col(v).isNotNull
      val x0 = last(when(knot, col(X)), ignoreNulls = true).over(wPrev)
      val y0 = last(when(knot, col(v)), ignoreNulls = true).over(wPrev)
      val x1 = first(when(knot, col(X)), ignoreNulls = true).over(wNext)
      val y1 = first(when(knot, col(v)), ignoreNulls = true).over(wNext)
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

    val w = Windows.ordered(Seq(col(X).asc, col(SRC).desc), partitionCols.map(col))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = w.rowsBetween(0, Window.unboundedFollowing)

    val knot = col(SRC) === 1
    val x0 = last(when(knot, col(X)), ignoreNulls = true).over(wPrev)
    val x1 = first(when(knot, col(X)), ignoreNulls = true).over(wNext)
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
        .over(wPrev).getField("v")
      val y1k = first(when(knot, struct(col(v).as("v"))), ignoreNulls = true)
        .over(wNext).getField("v")
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
