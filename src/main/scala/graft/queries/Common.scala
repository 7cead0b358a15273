package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared plumbing for the driver-contract query packs.
  *
  * Determinism conventions (the driver hash-compares against DuckDB):
  *  - Every query ends in an explicit ORDER BY present in both dialects.
  *  - Money-like exact decimals are integerized *before* aggregation
  *    (`sum(round(x*100))` — integer-valued doubles sum exactly in any
  *    order), making sums bit-identical across engines.
  *  - Means are emitted as `round(1000 * exact_integer_sum / count)` so the
  *    division is a single deterministic IEEE op.
  *  - Continuous statistics (stddev, interpolation, trig) are emitted as
  *    `round(x * 10^k) :: BIGINT`; both engines round doubles
  *    half-away-from-zero and boundary collisions are measure-zero.
  *  - Timestamps are reduced to integer epoch micros (`unix_micros` /
  *    `epoch_us`) — both engines floor parquet ns to us identically.
  */
object Common {
  type Q = (SparkSession, String) => DataFrame

  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    // If events.ts is parquet TIMESTAMP(NANOS) (pre-2026-08 testdata),
    // Spark 4 reads it only as a nanosecond BIGINT behind this legacy flag
    // (dynamic SQLConf); harmless for micros data, where the column
    // arrives as TIMESTAMP_NTZ instead — [[tsUs]] adapts to either.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.plans.NativeHash48.register(s)
    graft.plans.NativeInterp.register(s)
    graft.plans.NativeNormalize.register(s)
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** Epoch micros (BIGINT) from the `ts` column, whichever physical shape
    * it arrived in: BIGINT nanoseconds (parquet TIMESTAMP(NANOS) behind
    * the legacy flag, or a [[graft.ScaleUp]] replica table written as
    * plain ns BIGINT) floors ns -> us; TIMESTAMP/TIMESTAMP_NTZ (parquet
    * micros; NTZ cast resolves in the session's UTC zone) is exact. Both
    * equal DuckDB's `epoch_us(ts)` on the same file — the shared time
    * axis for every oracle-checked temporal query.
    */
  def tsUs(df: DataFrame): Column = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => expr("ts div 1000")
    case _ => unix_micros(col("ts").cast("timestamp"))
  }

  /** Epoch nanos (BIGINT) from `ts` — micros-shaped columns upscale
    * exactly (x1000); used by [[graft.ScaleUp]] to re-jitter below the
    * microsecond every consumer observes.
    */
  def tsNs(df: DataFrame): Column = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => col("ts")
    case _ => unix_micros(col("ts").cast("timestamp")) * lit(1000L)
  }

  /** The events table with `ts_us`: epoch micros as BIGINT ([[tsUs]]). */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = table(s, dir, "events")
    df.withColumn("ts_us", tsUs(df))
  }

  /** Epoch microseconds as BIGINT (ntz-safe; for us/ms-precision columns). */
  def epochUs(ts: Column): Column = unix_micros(ts.cast("timestamp"))

  /** Continuous double -> fixed-point BIGINT at 10^scale. */
  def fp(c: Column, scale: Int = 3): Column =
    round(c * lit(math.pow(10, scale))).cast("long")

  /** Exact integer sum of a k-decimal value: sum(round(x*10^k)) :: BIGINT. */
  def intSum(c: Column, k: Int = 2): Column =
    sum(round(c * lit(math.pow(10, k)))).cast("long")

  /** Deterministic mean in milli-units of a k-decimal value. */
  def exactMeanMilli(c: Column, k: Int = 2): Column =
    round(lit(1000.0) * sum(round(c * lit(math.pow(10, k)))) /
      lit(math.pow(10, k)) / count(c)).cast("long")

  // SQL-side mirrors (DuckDB dialect, ANSI-portable).
  def sqlFp(x: String, scale: Int = 3): String =
    s"CAST(round(($x) * ${math.pow(10, scale)}) AS BIGINT)"
  def sqlIntSum(x: String, k: Int = 2): String =
    s"CAST(sum(round(($x) * ${math.pow(10, k)})) AS BIGINT)"
  def sqlExactMeanMilli(x: String, k: Int = 2): String =
    s"CAST(round(1000.0 * sum(round(($x) * ${math.pow(10, k)})) / ${math.pow(10, k)} / count($x)) AS BIGINT)"
}
