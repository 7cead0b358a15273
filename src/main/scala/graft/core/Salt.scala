package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §4 / the 100 TB design
  * notes): when one key dominates a shuffle, fan its rows across
  * `nSalts` sub-keys, do the heavy work per (key, salt), and merge.
  * AQE's skew-join handling covers sort-merge joins automatically; these
  * helpers cover aggregations and broadcast-unfriendly joins where the
  * planner can't split a hot key by itself.
  */
object Salt {

  /** Deterministic per-row salt in [0, nSalts): hash of the whole row, so
    * repeated runs partition identically (no rand(), which would break
    * retry idempotence at scale).
    */
  def rowSalt(df: DataFrame, nSalts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(nSalts))

  /** Two-phase salted sum/count aggregation: partial per (keys, salt),
    * final per keys. Exact for any algebraic aggregate expressible through
    * sum/count — the salted partials here.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      nSalts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", rowSalt(df, nSalts))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(col(valueCol)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as(s"count_$valueCol"))
  }

  /** Salted equi-join for a skewed big side against a small-but-not-
    * broadcastable side: big rows get a random-ish salt, the small side is
    * replicated across all salts, and the join key becomes (key, salt) —
    * the hot key's rows spread over nSalts reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      nSalts: Int = 16, joinType: String = "inner"): DataFrame = {
    val bigS = big.withColumn("__salt", rowSalt(big, nSalts))
    val smallS = small
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
      .withColumn("__salt", col("__salt").cast(bigS.schema("__salt").dataType))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
