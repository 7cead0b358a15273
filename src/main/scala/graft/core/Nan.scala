package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** NaN <-> null normalization and epoch helpers.
  *
  * The reference engine (seaexplorertools/process_adcp.py:121-123,521,527,534)
  * uses IEEE NaN as the universal null and nan-skipping aggregates
  * (np.nanmean / np.nanmedian). Spark's SQL aggregates skip *null* but
  * propagate NaN, so the engine-wide convention is: normalize NaN to null at
  * ingest, compute with null semantics (Spark aggregates then behave exactly
  * like numpy nan-aggregates), and only re-materialize NaN at export if a
  * consumer needs bit-parity with the reference.
  */
object Nan {

  /** NaN -> null for a double column (ingest normalization). */
  def nanToNull(c: Column): Column = when(!isnan(c), c)

  /** null -> NaN (export denormalization, for reference bit-parity). */
  def nullToNan(c: Column): Column = coalesce(c, lit(Double.NaN))

  /** Sentinel-NaN: null out values where `cond` holds (QC masking).
    * Mirrors the reference's `mask * value` products with 0/1-NaN masks
    * (process_adcp.py:517-538) without ever materializing NaN.
    */
  def nanIf(c: Column, cond: Column): Column = when(!cond, c)

  /** Keep value only where `cond` holds. */
  def keepIf(c: Column, cond: Column): Column = when(cond, c)

  /** Timestamp -> double nanoseconds since epoch.
    *
    * The reference keeps a `date_float` float64-ns column for interpolation
    * math (process_adcp.py:105,164,1337). Spark timestamps are microsecond
    * precision, so ns here = us * 1000 exactly; sub-microsecond information
    * never exists on the Spark side.
    */
  def dateFloatNs(ts: Column): Column = unix_micros(ts).cast("double") * 1e3

  /** Timestamp -> double seconds since epoch (gradient/integration math). */
  def epochSeconds(ts: Column): Column = unix_micros(ts).cast("double") / 1e6

  /** Deterministic fixed-point projection used by oracle-checked queries:
    * round(x * 10^scale) as BIGINT. Both Spark and DuckDB round doubles
    * half-away-from-zero, so emitting integers makes result hashing robust
    * to sub-milli float jitter from differing summation orders.
    */
  def fixedPoint(c: Column, scale: Int = 3): Column = {
    val factor = math.pow(10, scale)
    round(c * lit(factor)).cast("long")
  }
}
