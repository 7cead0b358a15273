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

  /** A built IVF index: the refined centroids (tiny — nCells x dim, lives
    * on the driver and broadcasts into probe plans) and the inverted
    * lists (cell, vec_id, c_vec). [[saveIvfIndex]] persists the lists
    * partitioned BY CELL, so a loaded index's probe is a partition-pruned
    * scan — only the probed cells' files are read.
    */
  final case class IvfIndex(centroids: Seq[Seq[Double]], lists: DataFrame)

  // array_max over (dot, cell) structs: every dot evaluated exactly once
  // (a when-chain reduce would duplicate the subtrees at each level)
  private def nearestCell(v: org.apache.spark.sql.Column,
      cents: Seq[Seq[Double]]) =
    array_max(array(cents.zipWithIndex.map { case (c, i) =>
      struct(Vec.dot(v, array(c.map(lit): _*)).as("d"), lit(i).as("cell"))
    }: _*)).getField("cell")

  /** Build the IVF index: deterministic seed directions refined by one
    * distributed Lloyd iteration, then every candidate assigned to its
    * nearest centroid's inverted list. The only collect is the nCells x dim
    * centroid matrix.
    */
  def buildIvfIndex(candidates: DataFrame, nCells: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    import org.apache.spark.sql.Row
    val seeds = Vec.planes(nCells, dim) // deterministic unit-ish directions
    val c0 = candidates.select(col(idCol), Vec.asDouble(col(vecCol)).as("v"))
    // one Lloyd iteration: assign to seed cells, recompute centroids
    val assigned = c0.withColumn("cell", nearestCell(col("v"), seeds))
    val centroids: Map[Int, Seq[Double]] = assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("cell", "d").agg(avg("x").as("m"))
      .groupBy("cell").agg(sort_array(collect_list(struct(col("d"), col("m")))).as("c"))
      .collect()
      .map { r: Row =>
        r.getInt(0) -> r.getSeq[Row](1).map(_.getDouble(1)).toSeq
      }.toMap
    val cents = (0 until nCells).map(i => centroids.getOrElse(i, seeds(i)))
    val lists = c0.withColumn("cell", nearestCell(col("v"), cents))
      .select(col("cell"), col(idCol).as("vec_id"), col("v").as("c_vec"))
    IvfIndex(cents, lists)
  }

  /** Persist an index: inverted lists as parquet partitioned by cell
    * (probe-time partition pruning), centroids as a tiny parquet table.
    */
  def saveIvfIndex(index: IvfIndex, dir: String): Unit = {
    val spark = index.lists.sparkSession
    import spark.implicits._
    index.lists.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/lists")
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Load a saved index. The probe over a loaded index reads only the
    * probed cells' files (parquet partition pruning on `cell`).
    */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): IvfIndex = {
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    val lists = spark.read.parquet(s"$dir/lists")
      .select(col("cell").cast("int").as("cell"), col("vec_id"), col("c_vec"))
    IvfIndex((0 until cents.size).map(cents), lists)
  }

  /** Probe a built/loaded index: each query searches its nProbe closest
    * cells (multi-probe), exact cosine within them.
    */
  def probeIvf(index: IvfIndex, queries: DataFrame, k: Int, nProbe: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = index.centroids
    val cellScores = array(cents.zipWithIndex.map { case (c, i) =>
      struct(Vec.dot(col("q_vec"), array(c.map(lit): _*)).as("d"), lit(i).as("cell"))
    }: _*)
    val probed = slice(reverse(array_sort(cellScores)), 1, nProbe)
    val q = broadcast(queries.select(col(idCol).as("q_id"),
        Vec.asDouble(col(vecCol)).as("q_vec"))
      .withColumn("probe", explode(probed))
      .withColumn("cell", col("probe.cell")).drop("probe"))
    val scored = index.lists.join(q, "cell")
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", Vec.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "vec_id", "rank", "cosine")
  }

  /** IVF-style ANN: a coarse quantizer (deterministic seed directions
    * refined by one distributed Lloyd iteration) assigns every vector to a
    * cell; search runs only inside the query's cell — the inverted-list
    * scale path where `cell` becomes the partition key at 100 TB. Exact
    * brute force within the probed cell; recall trades off with nCells.
    * One-shot form of [[buildIvfIndex]] + [[probeIvf]].
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      nCells: Int, dim: Int, nProbe: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    probeIvf(buildIvfIndex(candidates, nCells, dim, idCol, vecCol),
      queries, k, nProbe, idCol, vecCol)

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
