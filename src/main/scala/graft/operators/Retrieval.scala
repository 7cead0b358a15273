package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Ranked full-text retrieval over a document corpus — the BM25 scoring a
  * training-data pipeline uses for targeted corpus slicing (pulling the
  * documents most relevant to an evaluation domain, boosting a topic in a
  * mix, or auditing what a filter kept). Okapi BM25 (Robertson et al.,
  * TREC-3): for query term t and document d,
  *
  *   score(d, t) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b*dl/avgdl))
  *   idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
  *
  * Plan shape, built for the 100 TB corpus: ONE tokenize pass computes
  * per-doc length (no explode — `size` of the token array), one
  * explode+filter pass restricted to the query vocabulary (a tiny
  * compile-time `isin`, so non-matching tokens die inside whole-stage
  * codegen before any shuffle) feeds a (doc, term) count with map-side
  * combine; corpus stats (N, sum dl) are a single-row aggregate joined by
  * broadcast, document frequencies a |vocab|-row broadcast join. The only
  * wide exchange is the (doc, term) hash aggregate over MATCHED tokens —
  * cost scales with hits, not corpus size. Ranking is per-query
  * (`row_number` partitioned by q_id over matched docs only).
  *
  * Determinism across engines (the driver's DuckDB oracle): per-(doc,term)
  * scores are integerized to micro-units BEFORE the per-doc sum (integer
  * sums are exact and commutative, so shuffle order can't perturb the
  * total), and ties rank by doc id. The float chain (one ln, a handful of
  * mul/div in fixed order) is mirrored op-for-op in
  * [[graft.queries.TextQueries]]'s oracle SQL.
  */
object Retrieval {

  /** Batch BM25: score every (query, matching doc) pair, keep the top `k`
    * docs per query. `queries` = (q_id, terms); duplicate terms within one
    * query are counted once (set semantics, the standard bag-of-words
    * simplification). Output: (q_id, doc_id, rank, score_micro).
    */
  def bm25(docs: DataFrame, queries: Seq[(String, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val vocab = queries.flatMap(_._2).distinct
    require(vocab.nonEmpty, "bm25: empty query vocabulary")

    // one tokenize per doc; dl = token count (the BM25 document length)
    val docsTok = docs.select(col(idCol).as("doc_id"),
      Text.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        size(col("__toks")).cast("long").as("dl"))

    // corpus stats: one row, broadcast — N counts every doc (null-text
    // docs score nothing but still dilute idf, per the textbook N)
    val stats = docsTok.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))

    // (doc, term) frequencies over vocabulary hits only: the isin filter
    // runs inside the scan's codegen, so the shuffle carries hits, not the
    // corpus token stream
    val tf = docsTok
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("w"))
      .where(col("w").isin(vocab: _*))
      .groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))

    // document frequency per term (|vocab| rows), derived from the already
    // aggregated tf frame — no second corpus pass
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))

    // query membership: (q_id, w) literal rows, broadcast
    import spark.implicits._
    val qterms = queries.flatMap { case (q, ts) => ts.distinct.map((q, _)) }
      .toDF("q_id", "w")

    val scored = tf
      .join(broadcast(dfreq), "w")
      .join(broadcast(qterms), "w")
      .crossJoin(broadcast(stats))
    // integerize per (doc, term) BEFORE summing: the per-doc total is an
    // exact integer sum, bit-stable under any aggregation order
    val perTerm = scored.withColumn("__s",
      round(idfExpr * tfExpr(k1, b) * lit(1000000.0)).cast("long"))

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    perTerm.groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("__s")).as("score_micro"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), col("rank").cast("long").as("rank"),
        col("score_micro"))
  }

  /** The idf over bound `n_docs`/`df` columns —
    * ln(1 + (N - df + 0.5)/(df + 0.5)), the Okapi BM25+ form. One shared
    * definition for [[bm25]] and [[searchIndex]], so serving from a
    * persisted index is bit-identical to the in-memory pass.
    */
  private def idfExpr: org.apache.spark.sql.Column =
    log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))

  /** The tf saturation over bound `tf`/`dl`/`sum_dl`/`n_docs` columns —
    * tf(k1+1) / (tf + k1(1 - b + b·dl/avgdl)).
    */
  private def tfExpr(k1: Double, b: Double): org.apache.spark.sql.Column = {
    val tfd = col("tf").cast("double")
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    tfd * lit(k1 + 1.0) /
      (tfd + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / avgdl)))
  }

  /** Build and persist an inverted index — the build-once/serve-many shape
    * for retrieval, the text analog of `Similarity.saveIvfIndex`:
    * `postings/` holds (term, doc_id, tf) parquet partitioned BY TERM
    * BUCKET (hash48(term) mod `nBuckets` — direct term partitioning would
    * create one directory per vocabulary word), `doclens/` the per-doc
    * token counts, `stats/` the corpus N / sum-dl / per-term df. A query
    * batch then reads ONLY its terms' posting buckets — partition-pruned
    * retrieval over an index that never rebuilds per query.
    *
    * At 100 TB the posting lists are the only large artifact; `bucket` is
    * their partition key exactly as `cell` is the IVF lists'. Building is
    * one tokenize + one explode-groupBy pass over the corpus.
    */
  def buildIndex(docs: DataFrame, dir: String, nBuckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    require(nBuckets > 0, s"nBuckets $nBuckets must be positive")
    graft.plans.NativeHash48.register(docs.sparkSession)
    val docsTok = docs.select(col(idCol).as("doc_id"),
      Text.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        size(col("__toks")).cast("long").as("dl"))
    val postings = docsTok
      .select(col("doc_id"), explode(col("__toks")).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(Text.hash48(col("term")), lit(nBuckets.toLong)))
    // repartition on the partition column: each bucket lands in one task,
    // one file per bucket directory (the writeLists discipline)
    postings.repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(s"$dir/postings")
    docsTok.select(col("doc_id"), col("dl")).write.mode("overwrite")
      .parquet(s"$dir/doclens")
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docsTok.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    dfreq.crossJoin(stats).withColumn("n_buckets", lit(nBuckets))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** BM25 over a persisted index: the query batch's terms resolve to
    * their hash buckets, a static `bucket IN (...)` filter prunes the
    * postings scan to those partitions (the IVF static-pruning
    * discipline — no DPP heuristics to drop), and scoring runs on the
    * pre-aggregated (term, doc, tf) rows — no tokenize, no corpus pass.
    * Identical arithmetic to [[bm25]] (same integerize-then-sum, same
    * ranking), so serving from the index returns bit-identical results —
    * the q77 oracle identity.
    */
  def searchIndex(spark: SparkSession, dir: String,
      queries: Seq[(String, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val vocab = queries.flatMap(_._2).distinct
    require(vocab.nonEmpty, "searchIndex: empty query vocabulary")
    val statsAll = spark.read.parquet(s"$dir/stats")
    val nBuckets = statsAll.select(col("n_buckets")).head().getInt(0)
    val buckets = vocab
      .map(t => graft.functions.Vec.hash48(t) % nBuckets).distinct
    val postings = spark.read.parquet(s"$dir/postings")
      .where(col("bucket").isin(buckets.map(Long.box): _*))
      .where(col("term").isin(vocab: _*))
    val doclens = spark.read.parquet(s"$dir/doclens")
    val dfreq = broadcast(statsAll.where(col("term").isin(vocab: _*))
      .select(col("term"), col("df")))
    val stats = broadcast(statsAll
      .select(col("n_docs"), col("sum_dl")).limit(1))
    import spark.implicits._
    val qterms = queries.flatMap { case (q, ts) => ts.distinct.map((q, _)) }
      .toDF("q_id", "term")
    val scored = postings
      .join(dfreq, "term")
      .join(broadcast(qterms), "term")
      .join(doclens, "doc_id")
      .crossJoin(stats)
    val perTerm = scored.withColumn("__s",
      round(idfExpr * tfExpr(k1, b) * lit(1000000.0)).cast("long"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    perTerm.groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("__s")).as("score_micro"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), col("rank").cast("long").as("rank"),
        col("score_micro"))
  }

  /** DuckDB mirror of [[bm25]] for the driver oracle — identical arithmetic
    * in identical order (ln, the k1/b literals, micro-integerization before
    * the per-doc sum, rank tiebreak on doc id).
    */
  def bm25Sql(queries: Seq[(String, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      table: String = "documents", idCol: String = "doc_id",
      textCol: String = "text"): String = {
    val vocab = queries.flatMap(_._2).distinct
    val vocabLst = vocab.map(t => s"'$t'").mkString("[", ", ", "]")
    val qRows = queries.flatMap { case (q, ts) => ts.distinct.map(t => s"('$q', '$t')") }
      .mkString(", ")
    val toks = graft.functions.TextSql.tokens(textCol)
    s"""WITH d AS (SELECT $idCol AS doc_id, $toks AS toks FROM $table),
        dt AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM d),
        stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dt),
        tf AS (SELECT doc_id, dl, w, count(*) AS tf
               FROM (SELECT doc_id, dl, unnest(toks) AS w FROM dt)
               WHERE list_contains($vocabLst, w) GROUP BY 1, 2, 3),
        dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
        qt(q_id, w) AS (VALUES $qRows),
        per_term AS (SELECT q_id, doc_id,
            CAST(round(
              ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5))
              * (CAST(tf AS DOUBLE) * ${k1 + 1.0}
                 / (CAST(tf AS DOUBLE) + $k1 * (1.0 - $b + $b *
                     (CAST(dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
              * 1000000.0) AS BIGINT) AS s
          FROM tf JOIN dfreq USING (w) JOIN qt USING (w), stats),
        totals AS (SELECT q_id, doc_id, sum(s) AS score_micro
                   FROM per_term GROUP BY 1, 2),
        ranked AS (SELECT q_id, doc_id, score_micro,
                     row_number() OVER (PARTITION BY q_id
                       ORDER BY score_micro DESC, doc_id) AS rank
                   FROM totals)
        SELECT q_id, doc_id, CAST(rank AS BIGINT) AS rank, score_micro
        FROM ranked WHERE rank <= $k ORDER BY q_id, rank"""
  }
}
