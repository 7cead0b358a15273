package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Corpus-level preprocessing compositions for training-data pipelines:
  * the quality gate (language + quality score + within-doc repetition) and
  * the full filter->dedup pass. Everything is one exploded-token aggregate
  * pass plus [[Dedup]]'s scale-safe stages — no UDFs, no driver loops.
  */
object Corpus {

  /** Attach the three quality signals every filtering recipe starts from:
    * `lang_pred` (stopword language-ID), `quality` (composite score in
    * [0,1]), `rep_milli` (duplicate word-2-gram per-mille — the Gopher
    * repetition signal, exact integer so any engine computes it
    * identically).
    *
    * Plan shape: every per-token signal comes from ONE posexplode of the
    * token array — per-language stopword hits and the union hit count as
    * conditional counts (the stopword lists are tiny compile-time
    * constants, so `isin` stays in whole-stage codegen), the 2-gram
    * repetition via the window-lead shingling idiom
    * ([[Dedup.signatures]]) — then a single groupBy(id) joined back to the
    * doc-level length/punctuation columns. The naive Column-algebra form
    * (`Text.langId(toks)` + `Text.qualityScore` + shingle arrays inline)
    * re-evaluated `split(text)` and its filter-scans at every one of the
    * ~100 places CollapseProject inlined them — a ~100x plan blowup that
    * made this the slowest operator in the engine. The aggregate form
    * evaluates each token exactly once and the decision arithmetic
    * ([[Text.langIdFrom]] / [[Text.qualityScoreFrom]]) is shared with the
    * scalar path, so results are bit-identical.
    *
    * `idCol` must be a non-null unique document key (it is the shuffle and
    * re-join key); all other `docs` columns pass through untouched.
    */
  def withQualitySignals(docs: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val exploded = docs.select(col(idCol),
      posexplode(Text.tokens(col(textCol))).as(Seq("__pos", "__w")))
    // word 2-grams via window lead; identical window expressions are
    // computed once by the Window operator, and groupBy(idCol) below reuses
    // the same hash partitioning — one shuffle for the whole token pass
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val next = lead(col("__w"), 1).over(wDoc)
    val shingled = exploded.withColumn("__s2",
      when(next.isNotNull, concat_ws(" ", col("__w"), next)))
    val langAggs = Text.stopwords.map { case (lang, ws) =>
      count(when(col("__w").isin(ws: _*), 1)).as(s"__c_$lang")
    }
    val unionStop = Text.stopwords.flatMap(_._2).distinct
    val aggs = shingled.groupBy(col(idCol)).agg(
      count(lit(1)).as("__ntok"),
      Seq(count(col("__s2")).as("__nt"),
        countDistinct(col("__s2")).as("__nd"),
        count(when(col("__w").isin(unionStop: _*), 1)).as("__cstop"))
        ++ langAggs: _*)
    // left join: a doc whose text is null has no exploded rows -> all-null
    // aggregates, reproducing the scalar path (lang "und", null quality,
    // repetition 0)
    val joined = docs.join(aggs, Seq(idCol), "left")
    val scores = Text.stopwords.map { case (lang, _) => lang -> col(s"__c_$lang") }
    val repMilli = when(col("__nt") > 0,
      expr("((__nt - __nd) * 1000) div __nt")).otherwise(0L)
    joined.select(docs.columns.map(col) ++ Seq(
      Text.langIdFrom(scores).as("lang_pred"),
      Text.qualityScoreFrom(col(textCol), col("__ntok").cast("double"),
        col("__cstop").cast("double")).as("quality"),
      repMilli.as("rep_milli")): _*)
  }

  /** The quality gate: keep documents in a recognized language with
    * quality >= minQuality and repetition <= maxRepMilli. Signal columns
    * stay on the output for auditability.
    */
  def qualityFilter(docs: DataFrame, textCol: String,
      minQuality: Double = 0.3, maxRepMilli: Long = 500,
      dropUndetermined: Boolean = true,
      idCol: String = "doc_id"): DataFrame = {
    val scored = withQualitySignals(docs, textCol, idCol)
    val langOk =
      if (dropUndetermined) col("lang_pred") =!= "und" else lit(true)
    scored.where(langOk && col("quality") >= minQuality &&
      col("rep_milli") <= maxRepMilli)
  }

  /** Per-million threshold for a sampling rate: the exact integer both
    * engines compare the 48-bit key hash against.
    */
  private def rateMicro(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0, 1]")
    math.round(rate * 1000000.0)
  }

  /** Deterministic Bernoulli sampling keyed by content, not chance: keep a
    * row iff hash48(salt || key) mod 1e6 < rate * 1e6. Unlike
    * `df.sample()` (rand() — partition-layout- and run-dependent), the
    * decision is a pure function of the row's key, so the sample is
    * reproducible across runs, engines, cluster layouts, and appends (a
    * re-run over a grown corpus keeps exactly the old rows plus the new
    * ones that qualify) — the property a training-data pipeline needs to
    * audit or re-derive a mix. The filter is one codegen'd expression, so
    * it pushes into the scan like any predicate; `salt` decorrelates
    * independent samples over the same keys. Rate granularity 1e-6.
    */
  def sampleByHash(df: DataFrame, keyCol: String, rate: Double,
      salt: String = ""): DataFrame =
    df.where(pmod(Text.hash48(
        concat(lit(salt), col(keyCol).cast("string"))), lit(1000000L))
      < lit(rateMicro(rate)))

  /** Stratified deterministic sampling — the training-mix builder: each
    * stratum (e.g. language, source, quality band) keeps its own
    * hash-keyed rate; strata absent from `rates` keep `defaultRate`. The
    * per-stratum rate resolves through a `when` chain over the (small,
    * compile-time) rates map, so the whole operator is still one
    * pushdown-friendly filter — no join, no shuffle, no driver loop.
    * Decisions are per-key deterministic exactly as [[sampleByHash]].
    */
  def stratifiedSample(df: DataFrame, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      keyCol: String = "doc_id", salt: String = ""): DataFrame = {
    val threshold = rates.foldLeft(lit(rateMicro(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(rateMicro(rate))).otherwise(acc)
    }
    df.where(pmod(Text.hash48(
        concat(lit(salt), col(keyCol).cast("string"))), lit(1000000L))
      < threshold)
  }

  /** Deterministic per-stratum quota: keep at most `k` rows per stratum,
    * chosen by hash order over (salt, key) with the key as tiebreak — a
    * stable "which k" (re-runs, layouts, and engines agree), unlike
    * first-k-seen, and uncorrelated with any natural key order. The
    * source-capping half of mix construction ([[stratifiedSample]] rates
    * by fraction; this caps by count).
    *
    * One shuffle on the stratum key. A pathologically dominant stratum
    * concentrates its rows in one window partition — when k is small
    * relative to such a stratum, pre-thin with [[sampleByHash]] (keeps
    * determinism: the hash order is preserved under subset).
    */
  def quotaPerStratum(df: DataFrame, strataCol: String, k: Int,
      keyCol: String = "doc_id", salt: String = ""): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(Text.hash48(
        concat(lit(salt), col(keyCol).cast("string"))).asc, col(keyCol).asc)
    df.withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k).drop("__rank")
  }

  /** Pack rows into fixed-budget shards (epoch/file construction): in
    * deterministic `orderCol` order within each group, a row's shard is
    * the exclusive prefix sum of `weightCol` divided by `budget` — shard
    * boundaries fall at budget multiples, every shard holds a contiguous
    * run, and the assignment is a pure function of the data (bit-stable
    * across engines: exact integer window arithmetic). One window pass;
    * `groupCols` (e.g. source) is the partition key, so packing
    * parallelizes across groups at any scale. `orderCol` must be UNIQUE
    * within each group (doc_id in the driver queries): a running ROWS sum
    * over a tied ordering key assigns tie-order-dependent offsets — the
    * q65 sessionize lesson.
    */
  def packShards(df: DataFrame, weightCol: String, budget: Long,
      orderCol: String, groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // integer `div`, not double /: exact at any corpus size (a double
    // quotient drifts past 2^53 total weight)
    df.withColumn("__cum", sum(col(weightCol)).over(w) - col(weightCol))
      .withColumn("shard", expr(s"__cum div $budget")).drop("__cum")
  }

  /** Deterministic weighted upsampling — the mix-builder's other
    * direction: where [[stratifiedSample]] thins a stratum by rate &lt; 1,
    * this REPLICATES by weight &gt;= 0 (domain temperature/up-weighting: a
    * stratum with weight 2.5 emits every doc 2 times plus a third copy
    * for the hash-selected 50%). copies = floor(w) + (1 iff
    * hash48(salt ‖ key) mod 1e6 &lt; frac(w)·1e6): exact integer
    * arithmetic, so the full (doc, copy) multiset is a pure function of
    * (salt, key) — identical across runs, engines, layouts, and appends,
    * and weights &lt; 1 degrade to exactly [[stratifiedSample]]'s Bernoulli
    * keep. The output `copy` index (0..copies-1) keeps replica identity
    * for downstream packing/shuffling (e.g. re-salt per copy).
    *
    * Scale: weights resolve through a compile-time `when` chain (no join)
    * and the explode's fan-out is the per-row copy count — map-only, no
    * shuffle; output size is exactly the weighted corpus size.
    */
  def upsample(df: DataFrame, strataCol: String, weights: Map[String, Double],
      defaultWeight: Double = 1.0, keyCol: String = "doc_id",
      salt: String = ""): DataFrame = {
    def wMicro(w: Double): Long = {
      require(w >= 0.0, s"weight $w must be non-negative")
      math.round(w * 1000000.0)
    }
    val micro = weights.foldLeft(lit(wMicro(defaultWeight))) {
      case (acc, (stratum, w)) =>
        when(col(strataCol) === stratum, lit(wMicro(w))).otherwise(acc)
    }
    val hashU = pmod(Text.hash48(
      concat(lit(salt), col(keyCol).cast("string"))), lit(1000000L))
    // exact integer floor: the numerator is a multiple of 1e6, so the
    // double quotient is exact for any sane weight (< 2^53 micro-units)
    val whole = ((micro - pmod(micro, lit(1000000L))) / lit(1000000L))
      .cast("long")
    df.withColumn("__copies",
        whole + when(hashU < pmod(micro, lit(1000000L)), 1L).otherwise(0L))
      .where(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Temperature-scaled mixing weights — the multilingual/multi-source
    * sampling rule (GPT-3 appendix / XLM-R: target share_s ∝ n_s^alpha;
    * alpha &lt; 1 flattens the distribution toward small strata, alpha = 1
    * is the natural distribution, alpha = 0 equalizes). Driver-side BY
    * DESIGN — the pow/normalize chain is transcendental, so it runs once
    * over the ≤ |strata| collected totals (the BM25-idf / DSIR-lambda
    * discipline) and enters every plan as exact literal weights; all
    * per-row work stays integer/hash arithmetic inside [[upsample]].
    *
    * Returns stratum -&gt; expected-copies weight
    * w_s = share_s * T / n_s, where n_s sums `weightCol` (docs when None,
    * tokens when e.g. Some("n_tokens")) and T = `targetTotal` (default:
    * the current total, i.e. same corpus size redistributed).
    */
  def temperatureWeights(docs: DataFrame, strataCol: String, alpha: Double,
      weightCol: Option[String] = None,
      targetTotal: Option[Double] = None): Map[String, Double] = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha $alpha outside [0, 1]")
    // the returned map keys on the STRING stratum and upsample matches it
    // with an === chain: a non-string column would re-key through
    // getString's ClassCastException (or worse, silently via toString
    // drift vs SQL casting), and a null stratum becomes a map key ===
    // can never match — both fail loudly here instead
    require(docs.schema(strataCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"temperatureWeights: strata column '$strataCol' must be StringType, " +
      s"got ${docs.schema(strataCol).dataType.simpleString}")
    val w = weightCol.map(c => sum(col(c))).getOrElse(count(lit(1)))
    val ns = docs.groupBy(col(strataCol)).agg(w.cast("double").as("n"))
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"temperatureWeights: null stratum in '$strataCol' — its rows " +
          "could never match a weight key and would silently drop; filter " +
          "or impute nulls upstream")
        r.getString(0) -> r.getDouble(1)
      }.toMap
    require(ns.values.forall(_ > 0.0), "every stratum total must be positive")
    val t = targetTotal.getOrElse(ns.values.sum)
    val z = ns.values.map(math.pow(_, alpha)).sum
    ns.map { case (s, n) => s -> (math.pow(n, alpha) / z * t / n) }
  }

  /** Temperature-scaled corpus mix: [[temperatureWeights]] over the
    * observed strata, realized by [[upsample]]'s exact integer
    * whole-copies + hash-Bernoulli fraction. Strata unseen at weighing
    * time drop (defaultWeight 0) — the weights are a closed set by
    * construction. Pass `weights` to reuse a table you already computed
    * (e.g. for an oracle stash): computing it twice runs the aggregation
    * job twice AND risks a last-ulp difference between two collect-order-
    * dependent float sums flipping a micro-rounding boundary.
    */
  def temperatureMix(docs: DataFrame, strataCol: String, alpha: Double,
      weightCol: Option[String] = None, targetTotal: Option[Double] = None,
      keyCol: String = "doc_id", salt: String = "",
      weights: Option[Map[String, Double]] = None): DataFrame =
    upsample(docs, strataCol,
      weights.getOrElse(
        temperatureWeights(docs, strataCol, alpha, weightCol, targetTotal)),
      defaultWeight = 0.0, keyCol = keyCol, salt = salt)

  /** End-to-end deterministic training-mix construction — the composition
    * a corpus pipeline actually ships: quality gate (language recognized,
    * integerized quality/repetition thresholds — the q47 boundary
    * semantics, engine-exact) → exact content dedup (keep the smallest id
    * per text hash) → [[upsample]] by predicted-language weight → token
    * counting → [[packShards]] into fixed token-budget shards per
    * stratum. Output: one row per (doc, copy) with its shard assignment —
    * a pure function of (corpus, weights, salt, budget), bit-stable
    * across engines (q85 hash-checks the whole table).
    *
    * Scale: one exploded-token pass for the gate signals, one
    * hash-partition window for dedup, a map-only upsample, one window
    * pass per stratum for packing — no driver loops, every shuffle keyed.
    * The LSH near-dup stage is deliberately NOT in this composition
    * (compose [[preprocess]] upstream when near-dup semantics are wanted;
    * its own q48 oracle covers that path) — exact dedup here keeps the
    * composition's arithmetic closed-form on both engines.
    */
  def trainingMix(docs: DataFrame, weights: Map[String, Double],
      budget: Long, textCol: String = "text", idCol: String = "doc_id",
      defaultWeight: Double = 0.0, salt: String = "",
      minQualityMilli: Long = 300, maxRepMilli: Long = 500): DataFrame = {
    require(weights.values.forall(_ < 1000000.0),
      "per-stratum weights must stay below 1e6 (ord-encoding bound)")
    val gated = withQualitySignals(docs, textCol, idCol)
      .where(col("lang_pred") =!= "und" &&
        round(col("quality") * 1000).cast("long") >= minQualityMilli &&
        col("rep_milli") <= maxRepMilli)
    val wDup = Window.partitionBy(Text.hash48(col(textCol)))
      .orderBy(col(idCol))
    val deduped = gated.withColumn("__rn", row_number().over(wDup))
      .where(col("__rn") === 1).drop("__rn")
    val up = upsample(deduped, "lang_pred", weights, defaultWeight,
      idCol, salt)
    // deterministic pack order over (doc, copy): copy < 1e6 by the weight
    // bound, so the encoding is collision-free exact integer arithmetic
    val withTok = up
      .withColumn("n_tokens", size(Text.tokens(col(textCol))).cast("long"))
      .withColumn("__ord", col(idCol) * lit(1000000L) + col("copy"))
    packShards(withTok, "n_tokens", budget, "__ord", Seq("lang_pred"))
      .select(col(idCol), col("copy"), col("lang_pred"), col("n_tokens"),
        col("shard"))
  }

  /** Deterministic within-shard training order — the loader's shuffle,
    * pinned: each row gets a 0-origin `shuffle_pos` inside its shard,
    * ordered by hash48(salt ‖ key…) with the keys as tiebreak. The order
    * is a pure function of (salt, keys) — reproducible across runs and
    * engines, re-randomizable per epoch by re-salting ("epoch3‖…"), and
    * uncorrelated with document order, which is exactly what a training
    * loader wants from "shuffled" data without ever materializing a
    * global sort (one window pass partitioned by shard — parallel across
    * shards at any corpus size).
    */
  def shuffleWithinShards(df: DataFrame, shardCols: Seq[String],
      keyCols: Seq[String], salt: String = ""): DataFrame = {
    val keyStr = concat(lit(salt) +:
      keyCols.flatMap(k => Seq(lit("|"), col(k).cast("string"))): _*)
    val w = Window.partitionBy(shardCols.map(col): _*)
      .orderBy(Text.hash48(keyStr).asc +: keyCols.map(col(_).asc): _*)
    df.withColumn("shuffle_pos", row_number().over(w).cast("long") - 1)
  }

  /** CCNet-style perplexity bucketing (arXiv:1911.00359 §4.3): rank each
    * stratum's documents by LM score per bigram and cut into `nBuckets`
    * equal tiles — head/middle/tail quality bands for mix construction
    * (keep head, sample middle, drop tail). The rate is exact integer
    * arithmetic ((lm_micro·1000) div n_bigrams — length-normalized so
    * long docs aren't penalized by the raw sum), bigramless docs sink to
    * the tail via a sentinel, ties break on the id, and `ntile` follows
    * the SQL-standard floor+remainder split — the full bucket assignment
    * is a pure data function, mirrored verbatim in the oracle.
    *
    * One window pass per stratum (the [[quotaPerStratum]] note applies: a
    * pathologically dominant stratum concentrates in one partition —
    * pre-thin or sub-stratify if a single stratum exceeds executor
    * memory).
    */
  def perplexityBuckets(scored: DataFrame, nBuckets: Int,
      strataCols: Seq[String], idCol: String = "doc_id"): DataFrame = {
    require(nBuckets > 0, s"nBuckets $nBuckets must be positive")
    val rate = when(col("n_bigrams") > 0,
      expr("(lm_micro * 1000) div n_bigrams"))
      .otherwise(lit(-1000000000000000000L))
    scored.withColumn("lm_rate_milli", rate)
      .withColumn("bucket", ntile(nBuckets).over(
        Window.partitionBy(strataCols.map(col): _*)
          .orderBy(col("lm_rate_milli").desc, col(idCol)))
        .cast("long"))
  }

  /** Token-level sequence packing — training-batch construction: the
    * documents of each group, concatenated in deterministic `orderCol`
    * order, form one token stream that is cut into fixed-length sequences
    * of `seqLen` tokens; a document SPANS sequence boundaries (unlike
    * [[packShards]], which assigns whole rows), so the output has one row
    * per (document, sequence) slice: `seq` (0-origin sequence id within
    * the group), `tok_start` (offset of the slice inside the document) and
    * `tok_len`. Every sequence except a group's last is exactly full —
    * the "pack then chunk" layout training loaders consume.
    *
    * Arithmetic is exact integer window math (offsets via one exclusive
    * prefix sum, slice bounds via min/max of multiples of `seqLen`), so
    * the full assignment is a pure function of the data and bit-stable
    * across engines — the q75 driver row hash-checks every slice. One
    * window pass partitioned by `groupCols` plus a narrow explode whose
    * fan-out is ceil(weight/seqLen) per row: linear in total token count,
    * parallel across groups at any corpus size. `orderCol` must be UNIQUE
    * within each group (see [[packShards]]).
    */
  def packSequences(df: DataFrame, weightCol: String, seqLen: Long,
      orderCol: String, groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(seqLen > 0, s"seqLen $seqLen must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = col(weightCol).cast("long")
    df.withColumn("__off", sum(col(weightCol)).over(w) - col(weightCol))
      .withColumn("seq",
        explode(when(n > 0,
          sequence(expr(s"__off div $seqLen"),
            expr(s"(__off + $weightCol - 1) div $seqLen")))
          .otherwise(array().cast("array<bigint>"))))
      .withColumn("tok_start",
        greatest(col("seq") * seqLen, col("__off")) - col("__off"))
      .withColumn("tok_len",
        least((col("seq") + 1) * seqLen, col("__off") + n) -
          greatest(col("seq") * seqLen, col("__off")))
      .drop("__off")
  }

  /** Email pattern for [[scrub]] — conservative ASCII classes with the
    * same leftmost-greedy behavior under Java regex and RE2, so an
    * external engine (the DuckDB oracle) redacts byte-identically.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** URL pattern for [[scrub]] — explicit path charclass instead of \\S
    * (whitespace classes are a known dialect divergence). */
  val urlPattern = "https?://[A-Za-z0-9./_%-]+"

  /** PII / link scrubbing — the redaction pass run before training:
    * replace emails then URLs with typed placeholder tokens and keep
    * per-doc match counts for auditability. One codegen projection
    * (regexp_replace / regexp_extract_all are native expressions); at
    * 100 TB this is a map-only pass that pipelines into the scan.
    * Output: input columns + `text_clean`, `n_emails`, `n_urls`.
    */
  def scrub(df: DataFrame, textCol: String,
      emailToken: String = "<EMAIL>",
      urlToken: String = "<URL>"): DataFrame =
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(emailPattern), lit(0)))
          .cast("long"))
      .withColumn("n_urls",
        size(regexp_extract_all(col(textCol), lit(urlPattern), lit(0)))
          .cast("long"))
      .withColumn("text_clean",
        regexp_replace(
          regexp_replace(col(textCol), emailPattern, emailToken),
          urlPattern, urlToken))

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169): score
    * every document by how much its hashed n-gram feature distribution
    * looks like a TARGET domain versus the raw corpus. Features are word
    * unigrams + bigrams hashed into `nBuckets` buckets; each bucket gets a
    * Laplace-smoothed log-likelihood ratio
    *
    *   lambda(b) = ln((tgt_b + a) / (tgtT + a*B)) - ln((raw_b + a) / (rawT + a*B))
    *
    * and a document's weight is the sum of lambda over its feature
    * OCCURRENCES (the bag-of-hashed-ngrams likelihood ratio). Documents
    * whose features concentrate where the target does score high — the
    * standard cheap proxy for "select pretraining data that looks like
    * the eval domain".
    *
    * Determinism across engines (the r11 BM25 discipline): each bucket's
    * lambda is integerized to micro-units BEFORE the per-doc sum, so the
    * total is an exact integer and shuffle order can't perturb it — and
    * the two ln's are NOT part of any cross-engine contract: the bucket
    * table is bounded (`nBuckets` rows), so [[dsirLambdaTable]] collects
    * it and evaluates the lambdas ONCE in driver-side Scala
    * (`StrictMath.log`, bit-specified by the JVM); the engine plan joins
    * the resulting literal table. An oracle mirrors the same literals as
    * a VALUES CTE, leaving only exact-integer feature extraction and
    * sums in the shared chain.
    *
    * Plan, built for the 100 TB corpus: ONE tokenize+posexplode pass with
    * a window lead yields both feature kinds per token row (bigram null at
    * the last position) — one shuffle on the doc key; bucket statistics
    * are a map-side-combined aggregate onto at most `nBuckets` rows,
    * lambda joins back as a BROADCAST (the bucket table is tiny by
    * construction), and the final per-doc sum reuses the window's doc-key
    * hash partitioning. Output: (idCol, dsir_micro), one row per input
    * document (featureless docs score 0).
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: org.apache.spark.sql.Column, nBuckets: Int = 1024,
      alpha: Double = 0.5,
      lambdaTable: Option[Map[Long, Long]] = None): DataFrame = {
    require(nBuckets >= 2, "importanceWeights: need nBuckets >= 2")
    val spark = docs.sparkSession
    val feats = dsirFeatures(docs, idCol, textCol, isTarget, nBuckets)
    val lamMap = lambdaTable.getOrElse(
      dsirLambdaTable(docs, idCol, textCol, isTarget, nBuckets, alpha))
    import spark.implicits._
    val lam = lamMap.toSeq.toDF("__b", "lam_micro")
    val perDoc = feats.join(broadcast(lam), Seq("__b"))
      .groupBy(col(idCol)).agg(sum(col("lam_micro")).as("dsir_micro"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("dsir_micro"))
  }

  /** The hashed unigram+bigram feature rows (idCol, __tgt, __b) shared by
    * the scoring plan and the lambda-table builder — one
    * tokenize+posexplode pass with a window lead, one shuffle on the doc
    * key.
    */
  private def dsirFeatures(docs: DataFrame, idCol: String, textCol: String,
      isTarget: org.apache.spark.sql.Column, nBuckets: Int): DataFrame = {
    val exploded = docs
      .select(col(idCol), isTarget.cast("boolean").as("__tgt"),
        posexplode(Text.tokens(col(textCol))).as(Seq("__pos", "__w")))
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val uniH = Text.hashMod(col("__w"))
    val bigH = Text.hashMod(concat_ws(" ", col("__w"), col("__next")))
    exploded
      .withColumn("__next", lead(col("__w"), 1).over(wDoc))
      .select(col(idCol), col("__tgt"),
        explode(when(col("__next").isNotNull, array(uniH, bigH))
          .otherwise(array(uniH))).as("__f"))
      .withColumn("__b", col("__f") % nBuckets.toLong) // hashMod >= 0
  }

  /** Driver-side (bucket -> lambda_micro): the bucket statistics are a
    * bounded aggregate (`nBuckets` rows), collected and mapped through
    * `StrictMath.log` in Scala so no transcendental enters the
    * distributed plan or the cross-engine oracle contract. Totals are
    * exact integer sums of the collected rows.
    */
  def dsirLambdaTable(docs: DataFrame, idCol: String, textCol: String,
      isTarget: org.apache.spark.sql.Column, nBuckets: Int = 1024,
      alpha: Double = 0.5): Map[Long, Long] = {
    val rows = dsirFeatures(docs, idCol, textCol, isTarget, nBuckets)
      .groupBy(col("__b")).agg(
        count(lit(1)).as("raw_n"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("tgt_n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rawT = rows.map(_._2).sum
    val tgtT = rows.map(_._3).sum
    rows.map { case (b, rawN, tgtN) =>
      b -> Math.round(1e6 *
        (StrictMath.log((tgtN + alpha) / (tgtT + alpha * nBuckets)) -
         StrictMath.log((rawN + alpha) / (rawT + alpha * nBuckets))))
    }.toMap
  }

  /** CCNet-style n-gram language-model scoring (Wenzek et al. 2020,
    * arXiv:1911.00359 use a KenLM for exactly this): train a bigram LM
    * with Stupid Backoff (Brants et al. 2007) on the documents matching
    * `trainPred`, then score EVERY document's token stream under it —
    * the classic "does this look like the reference corpus" quality
    * signal, complementary to [[importanceWeights]] (a discriminative
    * bucket ratio; this is a generative sequence model).
    *
    * Per bigram occurrence (w1, w2):
    *
    *   score = ln(c2(w1,w2) / c1(w1))                 if c2 > 0
    *         = ln(0.4 * (c1(w2) + 0.5) / (N + 0.5*V)) otherwise
    *
    * (c1/c2 = train unigram/bigram counts, N = train token count, V =
    * train vocabulary size; the add-half unigram term keeps OOV w2
    * finite). A document's `lm_micro` is the sum of per-occurrence
    * scores integerized to micro-units BEFORE the sum (the BM25/DSIR
    * determinism discipline — exact integer totals, order-proof);
    * `n_bigrams` rides along so callers can form the mean (per-token
    * perplexity) without losing exactness.
    *
    * Plan at corpus scale: one posexplode+lead pass forms bigram rows
    * (one shuffle on the doc key); the LM tables are map-side-combined
    * aggregates (vocabulary-sized, NOT corpus-sized) joined back on the
    * token keys — the classic LM-scoring hash join, broadcast when the
    * vocabulary is small and a plain shuffle join when it isn't (left to
    * AQE, which sees the actual table sizes); the per-doc sum reuses the
    * doc-key partitioning. Scores for featureless docs are 0 with
    * n_bigrams 0. An EMPTY training subset degenerates deterministically
    * to all-zero scores (the null LM totals null out every per-occurrence
    * score and the fill normalizes them) — the caller owns picking a
    * non-empty `trainPred`, and the operator stays lazy rather than
    * paying an eager emptiness check per plan build.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      trainPred: org.apache.spark.sql.Column,
      backoff: Double = 0.4): DataFrame = {
    // floor(x+0.5), not round(x): exact for any IEEE double, so no
    // engine half-case semantics in the contract (the Common.fp rule)
    val scored = lmOccurrenceScores(docs, idCol, textCol, trainPred, backoff)
      .withColumn("__s", floor(col("__x") + lit(0.5)).cast("long"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__s")).as("lm_micro"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_bigrams", "lm_micro"))
  }

  /** The per-bigram-occurrence frame with the PRE-ROUND micro-scaled
    * float score `__x = 1e6 * ln-chain` — [[lmScore]]'s internals, also
    * consumed by OracleMarginSpec to assert every occurrence's distance
    * to its rounding boundary exceeds a safety band (the ln stays inside
    * the engine here because its input cardinality — distinct bigram
    * count — is unbounded, unlike BM25/DSIR where it was hoisted to
    * driver-side literals).
    */
  private[graft] def lmOccurrenceScores(docs: DataFrame, idCol: String,
      textCol: String, trainPred: org.apache.spark.sql.Column,
      backoff: Double): DataFrame = {
    val exploded = docs
      .select(col(idCol), trainPred.cast("boolean").as("__tr"),
        posexplode(Text.tokens(col(textCol))).as(Seq("__pos", "__w")))
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val toks = exploded.select(col(idCol), col("__tr"), col("__w"))
    val bigrams = exploded
      .withColumn("__w2", lead(col("__w"), 1).over(wDoc))
      .where(col("__w2").isNotNull)
      .select(col(idCol), col("__tr"), col("__w"), col("__w2"))
    val uni = toks.where(col("__tr"))
      .groupBy(col("__w")).agg(count(lit(1)).as("c1"))
    val big = bigrams.where(col("__tr"))
      .groupBy(col("__w"), col("__w2")).agg(count(lit(1)).as("c2"))
    val tot = uni.agg(sum(col("c1")).as("lmN"), count(lit(1)).as("lmV"))
    bigrams
      .join(big, Seq("__w", "__w2"), "left")
      .join(uni.withColumnRenamed("c1", "c1_w1"), Seq("__w"), "left")
      .join(uni.withColumnRenamed("__w", "__w2")
        .withColumnRenamed("c1", "c1_w2"), Seq("__w2"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("__x", lit(1e6) *
        when(col("c2").isNotNull && col("c2") > 0,
          log(col("c2").cast("double") / col("c1_w1").cast("double")))
        .otherwise(log(lit(backoff) *
          (coalesce(col("c1_w2"), lit(0L)) + lit(0.5)) /
          (col("lmN") + lit(0.5) * col("lmV")))))
  }

  /** The full preprocessing pass a training pipeline runs: quality gate,
    * then near-duplicate removal ([[Dedup.dedupCorpus]] — LSH pairs,
    * Jaccard threshold, cluster resolution, keep min-id per cluster).
    */
  def preprocess(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.3, maxRepMilli: Long = 500,
      jaccardThreshold: Double = 0.8,
      maxBucket: Option[Int] = Dedup.defaultMaxBucket): DataFrame =
    Dedup.dedupCorpus(
      qualityFilter(docs, textCol, minQuality, maxRepMilli, idCol = idCol),
      idCol, textCol, jaccardThreshold, maxBucket = maxBucket)
}
