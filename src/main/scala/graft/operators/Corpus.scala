package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Corpus-level preprocessing compositions for training-data pipelines:
  * the quality gate (language + quality score + within-doc repetition) and
  * the full filter->dedup pass. Everything is pure Column algebra over one
  * scan plus [[Dedup]]'s scale-safe stages — no UDFs, no driver loops.
  */
object Corpus {

  /** Attach the three quality signals every filtering recipe starts from:
    * `lang_pred` (stopword language-ID), `quality` (composite score in
    * [0,1]), `rep_milli` (duplicate word-2-gram per-mille — the Gopher
    * repetition signal, exact integer so any engine computes it
    * identically).
    */
  def withQualitySignals(docs: DataFrame, textCol: String): DataFrame = {
    val toks = Text.tokens(col(textCol))
    val sh = Text.shingles(toks, 2)
    docs
      .withColumn("lang_pred", Text.langId(toks))
      .withColumn("quality", Text.qualityScore(col(textCol), toks))
      .withColumn("__nt", size(sh).cast("long"))
      .withColumn("__nd", size(array_distinct(sh)).cast("long"))
      .withColumn("rep_milli",
        when(col("__nt") > 0,
          expr("((__nt - __nd) * 1000) div __nt")).otherwise(0L))
      .drop("__nt", "__nd")
  }

  /** The quality gate: keep documents in a recognized language with
    * quality >= minQuality and repetition <= maxRepMilli. Signal columns
    * stay on the output for auditability.
    */
  def qualityFilter(docs: DataFrame, textCol: String,
      minQuality: Double = 0.3, maxRepMilli: Long = 500,
      dropUndetermined: Boolean = true): DataFrame = {
    val scored = withQualitySignals(docs, textCol)
    val langOk =
      if (dropUndetermined) col("lang_pred") =!= "und" else lit(true)
    scored.where(langOk && col("quality") >= minQuality &&
      col("rep_milli") <= maxRepMilli)
  }

  /** The full preprocessing pass a training pipeline runs: quality gate,
    * then near-duplicate removal ([[Dedup.dedupCorpus]] — LSH pairs,
    * Jaccard threshold, cluster resolution, keep min-id per cluster).
    */
  def preprocess(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.3, maxRepMilli: Long = 500,
      jaccardThreshold: Double = 0.8,
      maxBucket: Option[Int] = None): DataFrame =
    Dedup.dedupCorpus(
      qualityFilter(docs, textCol, minQuality, maxRepMilli),
      idCol, textCol, jaccardThreshold, maxBucket = maxBucket)
}
