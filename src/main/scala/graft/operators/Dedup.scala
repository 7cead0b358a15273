package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Document deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH (shingle -> signature -> band -> bucket
  * self-join), SimHash, and n-gram Jaccard verification.
  *
  * Scale design: every stage is a narrow map except the band self-join,
  * which shuffles on (band, signature) — cardinality O(docs * bands) with
  * tiny payloads, and bucket sizes are bounded by signature collisions, so
  * the join never degenerates into a cross product. At 100 TB the exact
  * per-pair Jaccard verification runs only on LSH candidates (linear-ish in
  * docs), never all-pairs.
  */
object Dedup {

  /** Exact dedup via content hash: one row per distinct text with the
    * keeper (min id) and duplicate count.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(Text.hash48(col(textCol)).as("key_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_docs"))

  /** Per-doc prep: tokens, shingles, hashed shingles, minhash signature. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int, shingleN: Int = 3): DataFrame = {
    val toks = Text.tokens(col(textCol))
    docs
      .withColumn("__toks", toks)
      .where(size(col("__toks")) >= shingleN)
      .withColumn("__sh", Text.shingles(col("__toks"), shingleN))
      .withColumn("__sig", Text.minhashSig(Text.hashedArray(col("__sh")), k))
      .select(col(idCol), col("__sh").as("shingles"), col("__sig").as("sig"))
  }

  /** LSH banding: explode the signature into `bands` rows of
    * (band_id, band_signature-string) per doc.
    */
  def bands(sigs: DataFrame, idCol: String, k: Int, nBands: Int): DataFrame = {
    val rows = k / nBands
    val bandSig = transform(sequence(lit(0), lit(nBands - 1)), b =>
      concat_ws(",", (1 to rows).map(r =>
        element_at(col("sig"), b * rows + r).cast("string")): _*))
    sigs.select(col(idCol), posexplode(bandSig).as(Seq("band", "bsig")))
  }

  /** Candidate pairs from band-bucket collisions (a < b, distinct). */
  def candidates(bandDf: DataFrame, idCol: String): DataFrame = {
    val a = bandDf.select(col("band"), col("bsig"), col(idCol).as("doc_a"))
    val b = bandDf.select(col("band"), col("bsig"), col(idCol).as("doc_b"))
    a.join(b, Seq("band", "bsig"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Exact shingle-set Jaccard on candidate pairs (native set intersection,
    * no per-element lambdas).
    */
  def withJaccard(pairs: DataFrame, sigs: DataFrame, idCol: String): DataFrame = {
    val sa = sigs.select(col(idCol).as("doc_a"), array_distinct(col("shingles")).as("__sa"))
    val sb = sigs.select(col(idCol).as("doc_b"), array_distinct(col("shingles")).as("__sb"))
    val inter = size(array_intersect(col("__sa"), col("__sb")))
    // LSH bounds the candidate-pair count, so pairs is the broadcastable
    // side at any scale; the shingle tables stream with no shuffle.
    broadcast(pairs).join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jaccard",
        inter.cast("double") / (size(col("__sa")) + size(col("__sb")) - inter))
      .drop("__sa", "__sb")
  }

  /** End-to-end MinHash-LSH near-dup candidates with exact Jaccard. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, nBands: Int = 8): DataFrame = {
    // signatures feed both the banding and the Jaccard verification;
    // materialize once (one md5 pass over every shingle, the dominant cost)
    val sigs = signatures(docs, idCol, textCol, k).cache()
    withJaccard(candidates(bands(sigs, idCol, k, nBands), idCol), sigs, idCol)
  }

  /** SimHash fingerprint per document. */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 16): DataFrame =
    docs.select(col(idCol),
      Text.simhash(transform(Text.tokens(col(textCol)), s => Text.hash48(s)), bits)
        .as("simhash"))
}
