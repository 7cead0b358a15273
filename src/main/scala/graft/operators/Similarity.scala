package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vec

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the candidate table, so the big side streams with no shuffle and
  * the only exchange is the final per-query top-k. Scale path: sign-LSH
  * bucketing (deterministic md5-derived hyperplanes) so candidates shrink to
  * one bucket per query; at 100 TB the bucket column is a partition key.
  */
object Similarity {

  /** Brute-force cosine top-k: queries (small, broadcast) x candidates.
    * Output: (q_id, vec_id, rank, cosine), rank 1..k per query, ties broken
    * by candidate id.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      Vec.asDouble(col(vecCol)).as("q_vec")))
    val c = candidates.select(col(idCol).as("vec_id"),
      Vec.asDouble(col(vecCol)).as("c_vec"))
    val scored = c.crossJoin(q)
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", Vec.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "vec_id", "rank", "cosine")
  }

  /** Attach the sign-LSH bucket id (2^nPlanes buckets). */
  def withLshBucket(df: DataFrame, nPlanes: Int, dim: Int,
      vecCol: String = "embedding"): DataFrame =
    df.withColumn("bucket",
      Vec.lshBucket(Vec.asDouble(col(vecCol)), Vec.planes(nPlanes, dim)))

  /** LSH-bucketed ANN: candidates restricted to the query's bucket, then
    * exact cosine top-k within it. Recall trades off against nPlanes.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      nPlanes: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(withLshBucket(queries, nPlanes, dim, vecCol)
      .select(col(idCol).as("q_id"), Vec.asDouble(col(vecCol)).as("q_vec"), col("bucket")))
    val c = withLshBucket(candidates, nPlanes, dim, vecCol)
      .select(col(idCol).as("vec_id"), Vec.asDouble(col(vecCol)).as("c_vec"), col("bucket"))
    val scored = c.join(q, "bucket")
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", Vec.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "vec_id", "rank", "cosine")
  }

  /** Embedding near-dup: top-1 most-similar pair per group (or pairs above
    * a cosine threshold when one exists) within a blocking key — the
    * all-pairs search is bounded per block.
    */
  def nearDupPairs(df: DataFrame, groupCol: String, topPerGroup: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(groupCol).as("grp"), col(idCol).as("id_a"),
      Vec.asDouble(col(vecCol)).as("va"))
    val b = df.select(col(groupCol).as("grp"), col(idCol).as("id_b"),
      Vec.asDouble(col(vecCol)).as("vb"))
    val pairs = a.join(b, "grp").where(col("id_a") < col("id_b"))
      .withColumn("cosine", Vec.cosine(col("va"), col("vb")))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topPerGroup)
      .select(col("grp"), col("id_a"), col("id_b"), col("cosine"))
  }
}
