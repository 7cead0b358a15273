package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{Text, TextSql}
import Common._

/** Text-analysis operators over the documents table: token counting
  * (whitespace + BPE-ish regex), language-ID (stopword n-gram heuristic),
  * quality scoring (length/punct/stopword ratios), and document
  * fingerprinting (positional rolling hash + SimHash). All pure Column
  * algebra — narrow maps, no shuffle except final aggregates.
  */
object TextQueries {

  private val toksSql = TextSql.tokens("text")

  /** The q85/q86 composition mirror's shared CTE chain: gate survivors →
    * min-id dedup keepers → copy counts → exploded copies with token
    * counts → the packed mix table (doc_id, copy, lang_pred, n_tokens,
    * shard).
    */
  private lazy val mixCtes: String =
    s"""g AS (
            SELECT doc_id, text, lang_pred FROM (
              SELECT doc_id, text, lang_pred, quality_milli,
                CAST(CASE WHEN n_total > 0
                  THEN ((n_total - n_distinct) * 1000) // n_total
                  ELSE 0 END AS BIGINT) AS rep_milli
              FROM (
                SELECT doc_id, text,
                  ${TextSql.langId("toks")} AS lang_pred,
                  ${sqlFp(TextSql.qualityScore("text", "toks"))} AS quality_milli,
                  CAST(len(sh) AS BIGINT) AS n_total,
                  CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct
                FROM (SELECT doc_id, text, $toksSql AS toks,
                        ${TextSql.shingles(toksSql, 2)} AS sh FROM documents)))
            WHERE lang_pred <> 'und' AND quality_milli >= 300
              AND rep_milli <= 500),
          d AS (SELECT doc_id, text, lang_pred FROM (
              SELECT doc_id, text, lang_pred, row_number() OVER (
                  PARTITION BY ${TextSql.hash48("text")} ORDER BY doc_id)
                AS rn FROM g) WHERE rn = 1),
          u AS (SELECT doc_id, lang_pred, text,
              (w // 1000000) + CASE WHEN hm < w % 1000000 THEN 1 ELSE 0 END
                AS copies
            FROM (SELECT doc_id, lang_pred, text,
                CASE lang_pred WHEN 'en' THEN 2000000 WHEN 'de' THEN 1500000
                               WHEN 'zh' THEN 700000 ELSE 0 END AS w,
                ${TextSql.hash48("'mix3' || CAST(doc_id AS VARCHAR)")} % 1000000
                  AS hm FROM d)),
          e AS (SELECT doc_id, lang_pred,
                CAST(len($toksSql) AS BIGINT) AS n_tokens,
                unnest(range(0, copies)) AS copy
              FROM u WHERE copies > 0),
          t AS (SELECT doc_id, lang_pred, copy, n_tokens,
                doc_id * 1000000 + copy AS ord FROM e),
          mix AS (SELECT doc_id, copy, lang_pred, n_tokens,
            CAST((sum(n_tokens) OVER (PARTITION BY lang_pred ORDER BY ord
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
              // 2000 AS BIGINT) AS shard
          FROM t)"""

  /** The q80/q87 Stupid-Backoff LM mirror's shared CTE chain, ending in
    * `lm` (doc_id, lang, n_bigrams, lm_micro) over ALL documents.
    */
  private lazy val lmCtes: String =
    s"""t AS (SELECT doc_id, lang = 'en' AS tr, $toksSql AS tk
                     FROM documents),
          toks AS (SELECT doc_id, tr, unnest(tk) AS w FROM t),
          bg AS (SELECT doc_id, tr, unnest(tk[1:len(tk)-1]) AS w1,
                   unnest(tk[2:len(tk)]) AS w2
                 FROM t WHERE len(tk) >= 2),
          uni AS (SELECT w, count(*) AS c1 FROM toks WHERE tr GROUP BY w),
          big AS (SELECT w1, w2, count(*) AS c2 FROM bg WHERE tr
                  GROUP BY w1, w2),
          tot AS (SELECT sum(c1) AS lmN, count(*) AS lmV FROM uni),
          sc AS (SELECT bg.doc_id,
                   CAST(floor(1e6 * CASE WHEN big.c2 IS NOT NULL AND big.c2 > 0
                     THEN ln(CAST(big.c2 AS DOUBLE) / CAST(u1.c1 AS DOUBLE))
                     ELSE ln(0.4 * (COALESCE(u2.c1, 0) + 0.5)
                       / (lmN + 0.5 * lmV)) END + 0.5) AS BIGINT) AS s
                 FROM bg
                 LEFT JOIN big ON bg.w1 = big.w1 AND bg.w2 = big.w2
                 LEFT JOIN uni u1 ON bg.w1 = u1.w
                 LEFT JOIN uni u2 ON bg.w2 = u2.w, tot),
          per AS (SELECT doc_id, count(*) AS n_bigrams, sum(s) AS lm_micro
                  FROM sc GROUP BY doc_id),
          lm AS (SELECT d.doc_id, d.lang,
              CAST(COALESCE(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
              CAST(COALESCE(per.lm_micro, 0) AS BIGINT) AS lm_micro
            FROM documents d LEFT JOIN per USING (doc_id))"""

  val queries: Map[String, Q] = Map(
    "q40_token_counts" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(col("doc_id"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens"),
          size(Text.bpeTokens(col("text"))).cast("long").as("n_bpe"))
        .orderBy("doc_id")
    }),

    // Explode + broadcast stopword join: one pass over tokens instead of
    // one filter-scan per (language, use-site) — the Column-algebra form
    // (Text.langId) re-evaluates its vocabCounts wherever referenced.
    "q41_langid" -> ((s, dir) => {
      import s.implicits._
      val docs = table(s, dir, "documents")
      val langs = Text.stopwords.map(_._1)
      val stop = Text.stopwords
        .flatMap { case (lang, ws) => ws.map(w => (lang, w)) }.toDF("lang", "w")
      val counts = docs
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
        .join(broadcast(stop), "w")
        .groupBy("doc_id").pivot("lang", langs).count()
      val filled = docs.select(col("doc_id"))
        .join(counts, Seq("doc_id"), "left")
        .na.fill(0L, langs)
      val maxScore = greatest(langs.map(col): _*)
      val best = langs.foldRight(lit("und")) { case (lang, rest) =>
        when(col(lang) === maxScore, lit(lang)).otherwise(rest)
      }
      filled
        .select(when(maxScore === 0, lit("und")).otherwise(best).as("lang_pred"))
        .groupBy("lang_pred").agg(count(lit(1)).as("n"))
        .orderBy("lang_pred")
    }),

    "q42_quality" -> ((s, dir) => {
      val toks = Text.tokens(col("text"))
      table(s, dir, "documents")
        .select(col("doc_id"),
          fp(Text.qualityScore(col("text"), toks)).as("quality_milli"))
        .orderBy("doc_id")
    }),

    "q43_fingerprint" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(col("doc_id"),
          Text.fingerprint(Text.tokens(col("text"))).as("fingerprint"))
        .orderBy("doc_id")
    }),

    "q44_lang_stats" -> ((s, dir) => {
      table(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          exactMeanMilli(size(Text.tokens(col("text"))), 0).as("avg_tokens_milli"),
          exactMeanMilli(length(col("text")), 0).as("avg_chars_milli"))
        .orderBy("lang")
    }),

    // Vocabulary building: per-token document frequency + collection
    // frequency, top-50 under a total order (df, tf, tok — tok is unique
    // per group so the limit is deterministic). explode -> groupBy(tok) is
    // the classic wordcount shape: partial aggregation combines map-side,
    // and the distinct-doc count expands to (tok, doc_id) pairs first —
    // both scale linearly in corpus token count.
    "q45_vocab_df" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
        .groupBy("tok")
        .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
        .orderBy(col("df").desc, col("tf").desc, col("tok"))
        .limit(50)
    }),

    // Within-document repetition (the Gopher duplicate-n-gram quality
    // signal): fraction of word 2-grams that are repeats, as an exact
    // integer per-mille. Explode + window lead + countDistinct, NOT the
    // Text.shingles HOF: an interpreted per-element lambda costs ~30us
    // per shingle (the Dedup.signatures lesson) and this query was 18.5 s
    // warm at sf0.1 under the honest noop-write bench — the exploded form
    // keeps every step in whole-stage codegen and runs ~0.5 s. Docs with
    // < 2 tokens re-enter via left join with zero counts, matching the
    // oracle's empty-shingle-list CASE.
    "q46_repetition" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("__pos"))
      val counts = docs
        .select(col("doc_id"), posexplode(Text.tokens(col("text"))).as(Seq("__pos", "__w")))
        .withColumn("__w2", lead(col("__w"), 1).over(wDoc))
        .where(col("__w2").isNotNull)
        .select(col("doc_id"), concat_ws(" ", col("__w"), col("__w2")).as("__g"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_total"),
          countDistinct(col("__g")).as("n_distinct"))
      docs.select("doc_id").join(counts, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_total", "n_distinct"))
        .withColumn("rep_milli",
          when(col("n_total") > 0,
            expr("((n_total - n_distinct) * 1000) div n_total"))
            .otherwise(0L))
        .orderBy("doc_id")
    }),

    // The corpus quality gate (operators/Corpus.qualityFilter): language
    // recognized, composite quality above threshold, repetition below —
    // filtering on the integerized quality (fp parity proven by q42) so
    // the predicate is engine-exact at the boundary.
    "q47_quality_filter" -> ((s, dir) => {
      graft.operators.Corpus
        .withQualitySignals(table(s, dir, "documents"), "text")
        .withColumn("quality_milli", fp(col("quality")))
        .where(col("lang_pred") =!= "und" &&
          col("quality_milli") >= 300 && col("rep_milli") <= 500)
        .select("doc_id", "lang_pred", "quality_milli", "rep_milli")
        .orderBy("doc_id")
    }),

    // Deterministic stratified sampling (operators/Corpus.stratifiedSample)
    // — the training-mix builder. Keep decisions are a pure function of
    // (salt, doc_id) through the 48-bit md5-prefix hash mirrored in DuckDB,
    // so the EXACT kept row set hash-checks: no tolerance, no seed
    // plumbing, and the same rows stay kept under re-runs and appends.
    "q69_stratified_sample" -> ((s, dir) => {
      graft.operators.Corpus.stratifiedSample(table(s, dir, "documents"),
          "lang", Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.1),
          defaultRate = 0.05, keyCol = "doc_id", salt = "mix1")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // Deterministic weighted upsampling (operators/Corpus.upsample): the
    // mix-builder's up-direction — en 2.5x (2 copies + hash-selected
    // third), de 0.4x (the sub-1 Bernoulli degenerate ≡ stratified
    // sampling), zh 1.0x, everything else dropped. The full (doc, copy)
    // multiset hash-checks: copies = floor(w) + (hm < frac) in exact
    // integer micro-units on both engines.
    // Temperature-scaled source mixing (operators/Corpus.temperatureMix,
    // the GPT-3/XLM-R share ∝ n^alpha rule at alpha = 0.5): per-lang
    // doc counts collected once, pow/normalize driver-side (the DSIR
    // lambda discipline — no transcendental crosses engines), realized by
    // upsample's exact whole-copies + hash-Bernoulli arithmetic. The
    // micro weights are stashed for the oracle's VALUES CTE; the full
    // (doc, lang, copy) assignment hash-checks.
    "q92_temperature_mix" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      // weights computed ONCE and threaded into the mix: a recompute
      // would run the aggregation twice and could differ in the last ulp
      // from the stashed literals at a micro-rounding boundary
      val w = graft.operators.Corpus.temperatureWeights(docs, "lang", 0.5)
      tempMixStash.set(w.map { case (k, v) => k -> math.round(v * 1000000.0) })
      graft.operators.Corpus.temperatureMix(docs, "lang", 0.5, salt = "temp",
          weights = Some(w))
        .select(col("doc_id"), col("lang"), col("copy"))
        .orderBy("doc_id", "copy")
    }),

    "q84_upsample" -> ((s, dir) => {
      graft.operators.Corpus.upsample(table(s, dir, "documents"),
          "lang", Map("en" -> 2.5, "de" -> 0.4, "zh" -> 1.0),
          defaultWeight = 0.0, keyCol = "doc_id", salt = "mix2")
        .select(col("doc_id"), col("lang"), col("copy"))
        .orderBy("doc_id", "copy")
    }),

    // End-to-end training-mix composition (operators/Corpus.trainingMix):
    // quality gate → exact content dedup (min-id keeper per text hash) →
    // upsample by PREDICTED language → token count → per-stratum
    // token-budget shard packing. The full (doc, copy, lang_pred,
    // n_tokens, shard) table hash-checks against a DuckDB mirror that
    // chains the q47/q84/q70 arithmetic verbatim — one wrong boundary,
    // keeper, copy decision, or pack order anywhere in the composition
    // breaks the hash.
    "q85_training_mix" -> ((s, dir) => {
      graft.operators.Corpus.trainingMix(table(s, dir, "documents"),
          Map("en" -> 2.0, "de" -> 1.5, "zh" -> 0.7), budget = 2000,
          salt = "mix3")
        .orderBy("doc_id", "copy")
    }),

    // Deterministic within-shard training order (operators/Corpus
    // .shuffleWithinShards) over the SAME mix: every row's 0-origin
    // shuffle_pos inside its (lang_pred, shard), ordered by
    // hash48('sh1'|doc|copy) with (doc, copy) tiebreak — the loader's
    // epoch shuffle as a pure data function, hash-checked row for row.
    "q86_shuffle_order" -> ((s, dir) => {
      val mix = graft.operators.Corpus.trainingMix(
        table(s, dir, "documents"),
        Map("en" -> 2.0, "de" -> 1.5, "zh" -> 0.7), budget = 2000,
        salt = "mix3")
      graft.operators.Corpus.shuffleWithinShards(mix,
          Seq("lang_pred", "shard"), Seq("doc_id", "copy"), salt = "sh1")
        .select(col("doc_id"), col("copy"), col("lang_pred"), col("shard"),
          col("shuffle_pos"))
        .orderBy("doc_id", "copy")
    }),

    // Token-budget shard packing (operators/Corpus.packShards): shard =
    // exclusive prefix sum of token count div budget, per source in
    // doc_id order — exact integer window arithmetic, so the full
    // (doc, shard) assignment hash-checks.
    "q70_pack_shards" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      graft.operators.Corpus.packShards(docs, "n_tokens", budget = 2000,
          orderCol = "doc_id", groupCols = Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tokens"), col("shard"))
        .orderBy("doc_id")
    }),

    // Deterministic per-stratum quota (operators/Corpus.quotaPerStratum):
    // at most 30 docs per language, chosen by hash order (stable across
    // runs/engines, uncorrelated with doc_id order) — the source-capping
    // half of mix construction, exact under the driver hash.
    "q71_quota_per_lang" -> ((s, dir) => {
      graft.operators.Corpus.quotaPerStratum(table(s, dir, "documents"),
          "lang", 30, keyCol = "doc_id", salt = "cap1")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // BM25 ranked retrieval (operators/Retrieval.bm25): three query
    // batches over the corpus vocabulary, top-10 each. Per-(doc,term)
    // scores integerize to micro-units BEFORE the per-doc sum, so the
    // total is an exact integer and the ranking (score desc, doc_id)
    // hash-checks. The one transcendental (ln in idf) is computed
    // driver-side in Scala and injected into BOTH plans as a literal
    // (term -> idf_micro) table (stashed here for the oracle's VALUES
    // CTE), so the cross-engine chain is exact integers + IEEE basic ops
    // + floor — no libm, no round() half-case semantics.
    "q74_bm25" -> ((s, dir) => {
      val idf = graft.operators.Retrieval.idfMicroTable(
        table(s, dir, "documents"), bm25Queries.flatMap(_._2).distinct)
      bm25IdfStash.set(() => idf)
      graft.operators.Retrieval.bm25(table(s, dir, "documents"),
          bm25Queries, k = 10, idfTable = Some(idf))
        .orderBy("q_id", "rank")
    }),

    // Index-served BM25 (Retrieval.buildIndex + searchIndex): the
    // build-once/serve-many retrieval path — postings persisted as
    // parquet partitioned by term-hash bucket, the query batch statically
    // pruned to its terms' buckets (the IVF loaded-index discipline on
    // text). Serving from the index is bit-identical to the in-memory
    // q74 pass (shared scoring expressions), so the same BM25 SQL is an
    // exact oracle for the whole build->persist->load->serve cycle: a
    // lost posting, wrong df, or stale stat breaks the hash.
    "q77_bm25_index" -> ((s, dir) => {
      // Populate the idf stash here too (not just in q74): a filtered
      // Verify run (`only=q77_bm25_index`) must dump the same
      // literal-table oracle the Spark plan used, never the ln fallback.
      bm25IdfStash.set(memoThunk(() =>
        graft.operators.Retrieval.idfMicroTable(
          table(s, dir, "documents"), bm25Queries.flatMap(_._2).distinct)))
      val tmp = Common.tempDir("q77_idx")
      graft.operators.Retrieval.buildIndex(table(s, dir, "documents"), tmp)
      graft.operators.Retrieval.searchIndex(s, tmp, bm25Queries, k = 10)
        .orderBy("q_id", "rank")
    }),

    // Incremental index maintenance under the driver hash (the q56f
    // recipe on the retrieval surface): build the inverted index on the
    // lower half, APPEND the upper half (new postings files in the frozen
    // term buckets, additively merged df/n_docs/sum_dl stats), then serve
    // the same query batch. The grown index's stats equal a one-shot
    // build's, so the SAME BM25 SQL is an exact oracle for the whole
    // build->append->merge->serve cycle — a lost posting, double-counted
    // df, or stale total breaks the hash.
    "q91_bm25_index_append" -> ((s, dir) => {
      bm25IdfStash.set(memoThunk(() =>
        graft.operators.Retrieval.idfMicroTable(
          table(s, dir, "documents"), bm25Queries.flatMap(_._2).distinct)))
      val docs = table(s, dir, "documents")
      val half = docs.agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0)
      val tmp = Common.tempDir("q91_idx")
      graft.operators.Retrieval.buildIndex(
        docs.where(col("doc_id") <= half), tmp)
      graft.operators.Retrieval.appendToIndex(s, tmp,
        docs.where(col("doc_id") > half))
      graft.operators.Retrieval.searchIndex(s, tmp, bm25Queries, k = 10)
        .orderBy("q_id", "rank")
    }),

    // Full index MAINTENANCE cycle under the oracle — q91 plus the
    // compaction step a year of daily appends requires: build the lower
    // half, append the upper half, COMPACT (postings/doclens rewritten to
    // one file per bucket and cut over through the r13 zero-downtime
    // versioned swap), then serve. The oracle is the same corpus-level
    // BM25 mirror as q74/q77/q91: the entire maintenance lifecycle must
    // be invisible to ranked results, while the serve scan reads the
    // compacted layout through the version manifest.
    "q93_bm25_compacted_serve" -> ((s, dir) => {
      bm25IdfStash.set(memoThunk(() =>
        graft.operators.Retrieval.idfMicroTable(
          table(s, dir, "documents"), bm25Queries.flatMap(_._2).distinct)))
      val docs = table(s, dir, "documents")
      val half = docs.agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0)
      val tmp = Common.tempDir("q93_idx")
      graft.operators.Retrieval.buildIndex(
        docs.where(col("doc_id") <= half), tmp)
      graft.operators.Retrieval.appendToIndex(s, tmp,
        docs.where(col("doc_id") > half))
      graft.operators.Retrieval.compactIndex(s, tmp)
      graft.operators.Retrieval.searchIndex(s, tmp, bm25Queries, k = 10)
        .orderBy("q_id", "rank")
    }),

    // Takedown DELETE under the oracle (Retrieval.deleteFromIndex — the
    // right-to-be-forgotten maintenance path): build the inverted index
    // over the FULL corpus, DELETE every doc_id % 7 == 3 (postings and
    // doclens rewritten minus the set through the versioned swap, stats
    // rebuilt from the survivors), then serve. df / n_docs / sum_dl now
    // equal a one-shot build over the corpus WITHOUT the deleted docs, so
    // the surviving-corpus BM25 mirror is an exact oracle for the whole
    // build -> delete -> rebuild-stats -> serve cycle: a doc that
    // outlives its takedown, a lost survivor, or a stale df breaks the
    // hash.
    "q97_bm25_delete" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val kept = docs.where(pmod(col("doc_id"), lit(7L)) =!= 3L)
      bm25DelIdfStash.set(memoThunk(() =>
        graft.operators.Retrieval.idfMicroTable(
          kept, bm25Queries.flatMap(_._2).distinct)))
      val tmp = Common.tempDir("q97_idx")
      graft.operators.Retrieval.buildIndex(docs, tmp)
      graft.operators.Retrieval.deleteFromIndex(s, tmp,
        docs.where(pmod(col("doc_id"), lit(7L)) === 3L).select("doc_id"))
      graft.operators.Retrieval.searchIndex(s, tmp, bm25Queries, k = 10)
        .orderBy("q_id", "rank")
    }),

    // Shard-union MERGE under the oracle (Retrieval.mergeIndexes): index
    // the even and odd doc_id halves INDEPENDENTLY (two builds, two
    // disjoint stats tables — the per-region/per-backfill sharding
    // pattern), merge the odd shard into the even one (postings
    // re-bucketed under the host modulus, doclens union, df/n_docs/
    // sum_dl additively merged through the versioned swap), then serve.
    // The merged index must serve bit-identically to a one-shot build
    // over the whole corpus — the same corpus-level BM25 mirror as
    // q74/q77/q91: a lost posting, a double-counted df, or a
    // wrong-modulus bucket (unreachable by the pruned probe) breaks the
    // hash.
    "q99_bm25_merge" -> ((s, dir) => {
      bm25IdfStash.set(memoThunk(() =>
        graft.operators.Retrieval.idfMicroTable(
          table(s, dir, "documents"), bm25Queries.flatMap(_._2).distinct)))
      val docs = table(s, dir, "documents")
      val even = Common.tempDir("q99_even")
      val odd = Common.tempDir("q99_odd")
      // the two shard builds are independent (disjoint inputs, disjoint
      // dirs) — run them as concurrent driver-thread jobs (guide §2.6)
      // so one build's task tail back-fills with the other's work; the
      // merge below still sees both fully built (Await before it)
      graft.operators.Par.overlap {
        graft.operators.Retrieval.buildIndex(
          docs.where(pmod(col("doc_id"), lit(2L)) === 0L), even)
      } {
        // the odd shard deliberately uses a DIFFERENT bucket modulus: the
        // merge must re-bucket, not trust the foreign geometry
        graft.operators.Retrieval.buildIndex(
          docs.where(pmod(col("doc_id"), lit(2L)) === 1L), odd, nBuckets = 32)
      }
      graft.operators.Retrieval.mergeIndexes(s, even, odd)
      graft.operators.Retrieval.searchIndex(s, even, bm25Queries, k = 10)
        .orderBy("q_id", "rank")
    }),

    // DISTRIBUTED-batch index serve (Retrieval.searchIndexBatch): the
    // query set arrives as a DataFrame of (q_id, terms), so a
    // corpus-scale retrieval pass never routes query rows through the
    // driver — the searchIndex Seq contract's 100-TB twin. idf is
    // recomputed per distinct term from the index's persisted df with
    // the same StrictMath chain, so serving is bit-identical to
    // q74/q77 and shares their BM25 mirror.
    "q96_bm25_batch_serve" -> ((s, dir) => {
      bm25IdfStash.set(memoThunk(() =>
        graft.operators.Retrieval.idfMicroTable(
          table(s, dir, "documents"), bm25Queries.flatMap(_._2).distinct)))
      val tmp = Common.tempDir("q96_idx")
      graft.operators.Retrieval.buildIndex(table(s, dir, "documents"), tmp)
      import s.implicits._
      val qFrame = bm25Queries.toDF("q_id", "terms")
      graft.operators.Retrieval.searchIndexBatch(s, tmp, qFrame, k = 10)
        .orderBy("q_id", "rank")
    }),

    // Token-level sequence packing (operators/Corpus.packSequences): the
    // per-source token streams cut into 128-token training sequences,
    // documents spanning boundaries — one row per (doc, sequence) slice,
    // exact integer window arithmetic, full assignment hash-checked.
    "q75_pack_sequences" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      graft.operators.Corpus.packSequences(docs, "n_tokens", seqLen = 128,
          orderCol = "doc_id", groupCols = Seq("source"))
        .select(col("doc_id"), col("source"), col("seq"),
          col("tok_start"), col("tok_len"))
        .orderBy("doc_id", "seq")
    }),

    // DSIR importance weights (operators/Corpus.importanceWeights, the
    // Xie et al. 2023 hashed-n-gram importance-resampling score): docs
    // scored by the log-likelihood ratio of their unigram+bigram buckets
    // under the target domain (lang = 'en') vs the raw corpus. The
    // per-bucket lambdas are driver-side Scala literals (the r11 BM25
    // discipline — no ln in the cross-engine chain), stashed here for the
    // oracle's VALUES CTE; integerized to micro-units BEFORE the per-doc
    // sum, so the full score table hash-checks exactly.
    "q79_dsir" -> ((s, dir) => {
      val lam = graft.operators.Corpus.dsirLambdaTable(
        table(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", nBuckets = 1024)
      dsirLamStash.set(lam)
      graft.operators.Corpus.importanceWeights(table(s, dir, "documents"),
          "doc_id", "text", col("lang") === "en", nBuckets = 1024,
          lambdaTable = Some(lam))
        .orderBy("doc_id")
    }),

    // CCNet-style bigram-LM scoring (operators/Corpus.lmScore): a Stupid
    // Backoff LM trained on the lang='en' subset scores every document's
    // token stream — the generative "looks like the reference corpus"
    // signal next to q79's discriminative ratio. Per-occurrence scores
    // integerize to micro before the per-doc sum, so the full
    // (doc, n_bigrams, lm_micro) table hash-checks exactly.
    "q80_lm_score" -> ((s, dir) => {
      graft.operators.Corpus.lmScore(table(s, dir, "documents"),
          "doc_id", "text", col("lang") === "en")
        .orderBy("doc_id")
    }),

    // CCNet head/middle/tail perplexity split (operators/Corpus
    // .perplexityBuckets) over q80's LM scores, per metadata language:
    // exact integer per-bigram rate, sentinel for bigramless docs, ntile
    // with id tiebreak — the full bucket assignment hash-checks.
    "q87_ppl_buckets" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val scored = graft.operators.Corpus.lmScore(docs,
          "doc_id", "text", col("lang") === "en")
        .join(docs.select("doc_id", "lang"), "doc_id")
      graft.operators.Corpus.perplexityBuckets(scored, 3, Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n_bigrams"),
          col("lm_micro"), col("lm_rate_milli"), col("bucket"))
        .orderBy("doc_id")
    }),

    // PII/link scrubbing (operators/Corpus.scrub): the synthetic corpus
    // carries no PII, so emails/URLs are PLANTED deterministically (docs
    // divisible by 7 get an email, by 11 a URL — both derived from
    // doc_id, mirrored verbatim in the oracle), then redacted. The
    // cleaned text is emitted as its 48-bit hash: full byte equality of
    // the redacted corpus under the driver check without shipping text.
    "q73_pii_scrub" -> ((s, dir) => {
      val planted = table(s, dir, "documents").withColumn("t",
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id"),
              lit("@example.com now"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" see https://example.org/p/"), col("doc_id"),
              lit(" page"))).otherwise(lit(""))))
      graft.operators.Corpus.scrub(planted, "t")
        .select(col("doc_id"), col("n_emails"), col("n_urls"),
          Text.hash48(col("text_clean")).as("clean_hash"))
        .orderBy("doc_id")
    }),

    // BPE pair statistics (operators/Bpe.pairStats): the adjacent
    // character-pair counts BPE's first iteration maximizes, weighted by
    // word frequency. The engine explodes over the BOUNDED word histogram
    // (vocabulary-sized, not corpus-sized); the oracle counts over raw
    // token occurrences — the same statistic. The query restricts to
    // ascii-alnum words because that is where Java-regex and RE2
    // character semantics agree (code units vs code points); the corpus
    // is entirely alnum, so the filter drops nothing here.
    "q81_bpe_pairs" -> ((s, dir) => {
      val hist = graft.operators.Bpe
        .wordHistogram(table(s, dir, "documents"), "text")
        .where(col("word").rlike("^[a-z0-9]+$"))
      graft.operators.Bpe.pairStatsFromHistogram(hist).orderBy("pair")
    }),

    // BPE encode under a FIXED ranked merge list (operators/Bpe
    // .encodeToken): the wrapped-symbol string fold — one literal
    // `replace(" a  b ", " ab ")` per merge, greedy left-to-right by
    // replace's own scan semantics — mirrored verbatim in DuckDB, so
    // every (doc, token, piece) row hash-checks exactly. The merge list
    // is a data-independent literal (training is data-dependent and
    // can't live in static oracle SQL; Bpe.train is property-locked
    // against a from-scratch reference in BpeSpec instead, and q81
    // oracle-checks the statistic training maximizes).
    "q81b_bpe_encode" -> ((s, dir) => {
      val toks = table(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(Text.tokens(col("text"))).as(Seq("tok_pos", "word")))
        .where(col("word").rlike("^[a-z0-9]+$"))
      toks.select(col("doc_id"), col("tok_pos").cast("long").as("tok_pos"),
          posexplode(graft.operators.Bpe.encodeToken(col("word"), bpeMerges))
            .as(Seq("piece_pos", "piece")))
        .select(col("doc_id"), col("tok_pos"),
          col("piece_pos").cast("long").as("piece_pos"), col("piece"))
        .orderBy("doc_id", "tok_pos", "piece_pos")
    }),

    // Token-budget packing in MODEL tokens (operators/Bpe +
    // Corpus.packShards): per-doc BPE piece counts under the q81b fixed
    // merge list become the shard-packing weight — "budget the corpus in
    // what the model actually consumes", the composition the Bpe scaladoc
    // promises. Docs with no alnum tokens weigh 0 and ride along via the
    // left join; the full (doc, n_pieces, shard) assignment hash-checks.
    "q88_bpe_budget_shards" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val pieces = docs
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("word"))
        .where(col("word").rlike("^[a-z0-9]+$"))
        .select(col("doc_id"),
          size(graft.operators.Bpe.encodeToken(col("word"), bpeMerges))
            .cast("long").as("__np"))
        .groupBy("doc_id").agg(sum("__np").as("n_pieces"))
      val weighted = docs.select(col("doc_id"), col("source"))
        .join(pieces, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_pieces"))
      graft.operators.Corpus.packShards(weighted, "n_pieces",
          budget = 3000, orderCol = "doc_id", groupCols = Seq("source"))
        .select("doc_id", "source", "n_pieces", "shard")
        .orderBy("doc_id")
    }),

    // Unicode canonicalization (plans/NativeNormalize via Text.nfc /
    // Text.stripAccents): each doc gets accents planted deterministically
    // in BOTH engines — precomposed á/é via replace, plus a DECOMPOSED
    // "e"+U+0301 and ñ ç ü appended — then NFC-composed and
    // accent-stripped. Whole normalized strings hash-check byte-exact
    // (nfc_hash proves composition: the combining acute must fuse into é
    // before strip sees it), and byte_delta pins the multi-byte
    // accounting. Parity is asserted exactly on the planted characters
    // (the q73 discipline: both engines provably agree on Latin accents
    // and Mn marks; the underlying corpus is ASCII, where both are
    // identity).
    "q83_normalize" -> ((s, dir) => {
      val acc = concat(
        call_function("replace",
          call_function("replace", col("text"), lit("a"), lit("\u00e1")),
          lit("e"), lit("\u00e9")),
        lit(" e\u0301 \u00f1 \u00e7 \u00fc"))
      val nf = Text.nfc(acc)
      val norm = Text.stripAccents(nf)
      table(s, dir, "documents")
        .select(col("doc_id"),
          Text.hash48(nf).as("nfc_hash"),
          Text.hash48(norm).as("norm_hash"),
          (octet_length(acc) - octet_length(norm)).cast("long")
            .as("byte_delta"))
        .orderBy("doc_id")
    })
  )

  /** q81b's fixed merge ranking — common English digraphs that fire on the
    * corpus vocabulary, including one cascade (t,h)→(th,e).
    */
  private val bpeMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("e", "r"), ("i", "n"), ("o", "w"),
    ("a", "t"), ("s", "t"), ("a", "l"), ("u", "e"), ("q", "u"))

  /** The q81b/q88 DuckDB mirror of [[graft.operators.Bpe.encodeToken]]
    * over a column named `word`: wrap each char " c ", one literal
    * replace per merge in rank order.
    */
  private lazy val bpeFoldSql: String = bpeMerges.foldLeft(
    "regexp_replace(word, '(.)', ' \\1 ', 'g')") { case (acc, (a, b)) =>
    s"replace($acc, ' $a  $b ', ' ${a + b} ')"
  }

  /** The q74 retrieval batch — corpus-vocabulary terms so every query
    * matches documents at every SF.
    */
  private val bm25Queries: Seq[(String, Seq[String])] = Seq(
    "qa" -> Seq("spark", "join", "merge"),
    "qb" -> Seq("window", "hash", "scan"),
    "qc" -> Seq("vector", "stream", "batch", "line"))

  /** The driver-computed (term -> idf_micro) table, set by the q74 entry
    * when it runs. [[oracle]] is a `def` and Verify dumps it AFTER running
    * every query, so the stash is populated by then and the BM25 oracle
    * SQL embeds the exact literals the Spark plans used.
    *
    * Stashed as a MEMOIZED THUNK (r18): only q74 needs the idf map inside
    * its own plan; the index-lifecycle entries (q77/q91/q93/q96/q99)
    * compute idf from the index's persisted df and stash this table
    * purely for the oracle's VALUES CTE. Eager stashing ran its two
    * corpus jobs (vocab-df aggregate + doc count) inside every TIMED
    * query for an artifact only Verify's oracle dump reads — a
    * measurement distortion, not query work. The thunk defers those jobs
    * to the dump (same session, same immutable source table, so the
    * forced map is identical to the eager one) and memoizes so the six
    * oracle entries sharing [[bm25OracleSql]] force it once.
    */
  private val bm25IdfStash =
    new java.util.concurrent.atomic.AtomicReference[() => Map[String, Long]](null)

  /** Memoize a stash thunk: forced once, shared by every oracle entry. */
  private def memoThunk[T](f: () => T): () => T = {
    lazy val v = f()
    () => v
  }

  /** q97's idf stash: computed over the SURVIVING corpus (the takedown
    * set removed), set by the q97 entry when it runs — the [[bm25IdfStash]]
    * discipline.
    */
  private val bm25DelIdfStash =
    new java.util.concurrent.atomic.AtomicReference[() => Map[String, Long]](null)

  /** q97's oracle: the BM25 mirror over the corpus minus the takedown set
    * (`doc_id % 7 = 3`), with idf literals computed on the survivors.
    */
  private def bm25DeleteOracleSql: String =
    Option(bm25DelIdfStash.get()).map(_.apply()).filter(_.nonEmpty) match {
      case Some(idf) =>
        graft.operators.Retrieval.bm25Sql(bm25Queries, k = 10,
          idfTable = idf,
          table = "(SELECT * FROM documents WHERE doc_id % 7 <> 3)")
      case None => // standalone evaluation (specs/tooling) — never Verify
        bm25OracleSql
    }

  /** Same pattern for q79: the driver-computed DSIR (bucket -> lambda)
    * literals, stashed by the query entry for the oracle's VALUES CTE.
    */
  private val dsirLamStash =
    new java.util.concurrent.atomic.AtomicReference[Map[Long, Long]](null)

  /** Same pattern for q92: the driver-computed temperature-mix
    * (lang -> weight_micro) literals.
    */
  private val tempMixStash =
    new java.util.concurrent.atomic.AtomicReference[Map[String, Long]](null)

  /** BM25 oracle: the idf-literal mirror when the stash is live (the
    * Verify flow), else a self-contained ln-based approximation so
    * evaluating [[oracle]] standalone (specs, tooling) never throws.
    */
  private def bm25OracleSql: String = Option(bm25IdfStash.get())
      .map(_.apply()).filter(_.nonEmpty) match {
    case Some(idf) =>
      graft.operators.Retrieval.bm25Sql(bm25Queries, k = 10, idfTable = idf)
    case None => // pre-r11 inline-ln form; never reached in the Verify flow
      val toks = s"list_filter($toksSql, t -> t <> '')"
      val vocab = bm25Queries.flatMap(_._2).distinct
      val vocabLst = vocab.map(t => s"'$t'").mkString("[", ", ", "]")
      val qRows = bm25Queries.flatMap { case (q, ts) =>
        ts.distinct.map(t => s"('$q', '$t')") }.mkString(", ")
      s"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents),
          dt AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM d),
          stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dt),
          tf AS (SELECT doc_id, dl, w, count(*) AS tf
                 FROM (SELECT doc_id, dl, unnest(toks) AS w FROM dt)
                 WHERE list_contains($vocabLst, w) GROUP BY 1, 2, 3),
          dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
          qt(q_id, w) AS (VALUES $qRows),
          per_term AS (SELECT q_id, doc_id,
              CAST(floor(
                CAST(round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                          / (CAST(df AS DOUBLE) + 0.5)) * 1000000.0) AS DOUBLE)
                * (CAST(tf AS DOUBLE) * 2.2
                   / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 *
                       (CAST(dl AS DOUBLE)
                        / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
                + 0.5) AS BIGINT) AS s
            FROM tf JOIN dfreq USING (w) JOIN qt USING (w), stats),
          totals AS (SELECT q_id, doc_id, CAST(sum(s) AS BIGINT) AS score_micro
                     FROM per_term GROUP BY 1, 2),
          ranked AS (SELECT q_id, doc_id, score_micro,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY score_micro DESC, doc_id) AS rank
                     FROM totals)
          SELECT q_id, doc_id, CAST(rank AS BIGINT) AS rank, score_micro
          FROM ranked WHERE rank <= 10 ORDER BY q_id, rank"""
  }

  def oracle: Map[String, String] = Map(
    "q40_token_counts" ->
      s"""SELECT doc_id,
          CAST(len($toksSql) AS BIGINT) AS n_tokens,
          CAST(len(${TextSql.bpeTokens("text")}) AS BIGINT) AS n_bpe
          FROM documents ORDER BY doc_id""",

    "q41_langid" ->
      s"""SELECT ${TextSql.langId("toks")} AS lang_pred, count(*) AS n
          FROM (SELECT $toksSql AS toks FROM documents)
          GROUP BY 1 ORDER BY lang_pred""",

    "q42_quality" ->
      s"""SELECT doc_id,
          ${sqlFp(TextSql.qualityScore("text", "toks"))} AS quality_milli
          FROM (SELECT doc_id, text, $toksSql AS toks FROM documents)
          ORDER BY doc_id""",

    "q43_fingerprint" ->
      s"""SELECT doc_id, ${TextSql.fingerprint("toks")} AS fingerprint
          FROM (SELECT doc_id, $toksSql AS toks FROM documents)
          ORDER BY doc_id""",

    "q44_lang_stats" ->
      s"""SELECT lang, count(*) AS n_docs,
          ${sqlExactMeanMilli(s"len($toksSql)", 0)} AS avg_tokens_milli,
          ${sqlExactMeanMilli("length(text)", 0)} AS avg_chars_milli
          FROM documents GROUP BY lang ORDER BY lang""",

    "q45_vocab_df" ->
      s"""SELECT tok, count(DISTINCT doc_id) AS df, count(*) AS tf
          FROM (SELECT doc_id, unnest($toksSql) AS tok FROM documents)
          GROUP BY tok ORDER BY df DESC, tf DESC, tok LIMIT 50""",

    "q46_repetition" ->
      s"""SELECT doc_id, n_total, n_distinct,
          CAST(CASE WHEN n_total > 0
            THEN ((n_total - n_distinct) * 1000) // n_total
            ELSE 0 END AS BIGINT) AS rep_milli
          FROM (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_total,
                  CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct
                FROM (SELECT doc_id, ${TextSql.shingles(toksSql, 2)} AS sh
                      FROM documents))
          ORDER BY doc_id""",

    "q47_quality_filter" ->
      s"""SELECT doc_id, lang_pred, quality_milli, rep_milli FROM (
            SELECT doc_id, lang_pred, quality_milli,
              CAST(CASE WHEN n_total > 0
                THEN ((n_total - n_distinct) * 1000) // n_total
                ELSE 0 END AS BIGINT) AS rep_milli
            FROM (
              SELECT doc_id,
                ${TextSql.langId("toks")} AS lang_pred,
                ${sqlFp(TextSql.qualityScore("text", "toks"))} AS quality_milli,
                CAST(len(sh) AS BIGINT) AS n_total,
                CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct
              FROM (SELECT doc_id, text, $toksSql AS toks,
                      ${TextSql.shingles(toksSql, 2)} AS sh FROM documents)))
          WHERE lang_pred <> 'und' AND quality_milli >= 300
            AND rep_milli <= 500
          ORDER BY doc_id""",

    "q69_stratified_sample" ->
      s"""SELECT doc_id, lang FROM documents
          WHERE ${TextSql.hash48("'mix1' || CAST(doc_id AS VARCHAR)")} % 1000000 <
            CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 250000
                      WHEN 'zh' THEN 100000 ELSE 50000 END
          ORDER BY doc_id""",

    // The composition mirror: the q47 gate inner query (verbatim
    // arithmetic) → min-id keeper per text hash → the q84 copy formula on
    // lang_pred → the q70 exclusive-prefix-sum pack over the same
    // collision-free ord encoding (doc_id * 1e6 + copy). The CTE chain is
    // shared with q86, which adds the loader's within-shard hash order.
    "q85_training_mix" ->
      s"""WITH $mixCtes
          SELECT doc_id, copy, lang_pred, n_tokens, shard
          FROM mix ORDER BY doc_id, copy""",

    // One more window over the SAME mix: the deterministic within-shard
    // shuffle position (hash order, keys as tiebreak).
    "q86_shuffle_order" ->
      s"""WITH $mixCtes
          SELECT doc_id, copy, lang_pred, shard,
            row_number() OVER (PARTITION BY lang_pred, shard
              ORDER BY ${TextSql.hash48(
                "'sh1' || '|' || CAST(doc_id AS VARCHAR) || '|' || CAST(copy AS VARCHAR)")},
                doc_id, copy) - 1 AS shuffle_pos
          FROM mix ORDER BY doc_id, copy""",

    // weights CTE from the stash when live (the Verify flow); a pow-based
    // recompute otherwise so standalone evaluation never throws (the
    // bm25OracleSql fallback pattern — unreachable in Verify, which
    // restricts the oracle dump to queries that ran)
    "q92_temperature_mix" -> {
      val wCte = Option(tempMixStash.get()).filter(_.nonEmpty) match {
        case Some(m) =>
          val rows = m.toSeq.sorted
            .map { case (l, v) => s"('$l', CAST($v AS BIGINT))" }
            .mkString(", ")
          s"w(lang, wm) AS (VALUES $rows)"
        case None =>
          """lc AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
                    FROM documents GROUP BY 1),
             tz AS (SELECT sum(pow(n, 0.5)) AS z, sum(n) AS t FROM lc),
             w AS (SELECT lang,
                     CAST(round(1000000.0 * pow(n, 0.5) / z * t / n) AS BIGINT)
                       AS wm
                   FROM lc, tz)"""
      }
      s"""WITH $wCte,
          c AS (SELECT doc_id, lang,
                  (wm // 1000000)
                    + CASE WHEN hm < wm % 1000000 THEN 1 ELSE 0 END AS copies
                FROM (SELECT doc_id, lang,
                    ${TextSql.hash48("'temp' || CAST(doc_id AS VARCHAR)")} % 1000000
                      AS hm
                  FROM documents) d
                JOIN w USING (lang))
          SELECT doc_id, lang, unnest(range(0, copies)) AS copy
          FROM c WHERE copies > 0 ORDER BY doc_id, copy"""
    },

    "q84_upsample" ->
      s"""WITH c AS (SELECT doc_id, lang,
            (w // 1000000) + CASE WHEN hm < w % 1000000 THEN 1 ELSE 0 END
              AS copies
          FROM (SELECT doc_id, lang,
              CASE lang WHEN 'en' THEN 2500000 WHEN 'de' THEN 400000
                        WHEN 'zh' THEN 1000000 ELSE 0 END AS w,
              ${TextSql.hash48("'mix2' || CAST(doc_id AS VARCHAR)")} % 1000000
                AS hm
            FROM documents))
          SELECT doc_id, lang, unnest(range(0, copies)) AS copy
          FROM c WHERE copies > 0 ORDER BY doc_id, copy""",

    "q70_pack_shards" ->
      s"""SELECT doc_id, source, n_tokens,
            CAST((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
              // 2000 AS BIGINT) AS shard
          FROM (SELECT doc_id, source, CAST(len($toksSql) AS BIGINT) AS n_tokens
                FROM documents)
          ORDER BY doc_id""",

    "q71_quota_per_lang" ->
      s"""SELECT doc_id, lang FROM (
            SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
              ORDER BY ${TextSql.hash48("'cap1' || CAST(doc_id AS VARCHAR)")} ASC,
                doc_id ASC) AS rk
            FROM documents)
          WHERE rk <= 30 ORDER BY doc_id""",

    "q74_bm25" -> bm25OracleSql,

    // identity: index-served BM25 == the in-memory pass, one shared oracle
    "q77_bm25_index" -> bm25OracleSql,

    // the grown index's postings and stats equal a one-shot build's
    // (additive merge over disjoint halves), so the in-memory BM25 mirror
    // is exact for the append cycle too
    "q91_bm25_index_append" -> bm25OracleSql,

    // same mirror as q91: compaction must be invisible to ranked results
    "q93_bm25_compacted_serve" -> bm25OracleSql,
    "q97_bm25_delete" -> bm25DeleteOracleSql,

    // same corpus-level mirror: a shard merge must be invisible to
    // ranked results
    "q99_bm25_merge" -> bm25OracleSql,

    // same mirror again: the distributed-batch serve is bit-identical
    "q96_bm25_batch_serve" -> bm25OracleSql,

    "q75_pack_sequences" ->
      s"""WITH d AS (SELECT doc_id, source,
              CAST(len($toksSql) AS BIGINT) AS n FROM documents),
          o AS (SELECT doc_id, source, n,
              CAST(sum(n) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
                AS BIGINT) AS off
            FROM d),
          x AS (SELECT doc_id, source, n, off,
              unnest(generate_series(off // 128, (off + n - 1) // 128)) AS seq
            FROM o WHERE n > 0)
          SELECT doc_id, source, seq,
            greatest(seq * 128, off) - off AS tok_start,
            least((seq + 1) * 128, off + n) - greatest(seq * 128, off) AS tok_len
          FROM x ORDER BY doc_id, seq""",

    // Feature rows = unigrams UNION ALL bigrams, hashed and bucketed with
    // the engine's exact arithmetic. The per-bucket lambdas come from the
    // stash as literals (no ln in the cross-engine chain); the stashless
    // fallback recomputes them in SQL (two ln's, subtract, x1e6, round;
    // 512.0 = alpha * nBuckets) and is never reached in the Verify flow.
    "q79_dsir" -> {
      val lamCte = Option(dsirLamStash.get()).filter(_.nonEmpty) match {
        case Some(lam) =>
          val rows = lam.toSeq.sorted
            .map { case (b, v) => s"($b, CAST($v AS BIGINT))" }.mkString(", ")
          s"lam(b, lam) AS (VALUES $rows)"
        case None =>
          s"""stats AS (SELECT b, count(*) AS raw_n,
                      sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tgt_n
                    FROM f GROUP BY b),
          tot AS (SELECT sum(raw_n) AS rawT, sum(tgt_n) AS tgtT FROM stats),
          lam AS (SELECT b, CAST(round(1e6 *
                    (ln((tgt_n + 0.5) / (tgtT + 512.0)) -
                     ln((raw_n + 0.5) / (rawT + 512.0)))) AS BIGINT) AS lam
                  FROM stats, tot)"""
      }
      s"""WITH t AS (SELECT doc_id, lang = 'en' AS tgt, $toksSql AS tk
                     FROM documents),
          uni AS (SELECT doc_id, tgt, unnest(tk) AS s FROM t),
          big AS (SELECT doc_id, tgt, unnest(${TextSql.shingles("tk", 2)}) AS s
                  FROM t),
          f AS (SELECT doc_id, tgt, ${TextSql.hashMod("s")} % 1024 AS b
                FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
          $lamCte,
          per AS (SELECT doc_id, sum(lam) AS dsir_micro
                  FROM f JOIN lam USING (b) GROUP BY doc_id)
          SELECT d.doc_id, CAST(COALESCE(per.dsir_micro, 0) AS BIGINT) AS dsir_micro
          FROM documents d LEFT JOIN per USING (doc_id)
          ORDER BY doc_id"""
    },

    // Bigrams as zipped slice-unnests (tk[1:n-1] with tk[2:n]); the LM
    // tables and the float chain (one division or the backoff product,
    // one ln, x1e6, round) mirror the engine op-for-op.
    "q80_lm_score" ->
      s"""WITH $lmCtes
          SELECT doc_id, n_bigrams, lm_micro FROM lm ORDER BY doc_id""",

    // One ntile window over the SAME lm table: per-language thirds on the
    // exact integer per-bigram rate, bigramless docs sunk by the sentinel.
    "q87_ppl_buckets" ->
      s"""WITH $lmCtes,
          r AS (SELECT doc_id, lang, n_bigrams, lm_micro,
                CASE WHEN n_bigrams > 0 THEN (lm_micro * 1000) // n_bigrams
                     ELSE -1000000000000000000 END AS lm_rate_milli
              FROM lm)
          SELECT doc_id, lang, n_bigrams, lm_micro, lm_rate_milli,
            CAST(ntile(3) OVER (PARTITION BY lang
              ORDER BY lm_rate_milli DESC, doc_id) AS BIGINT) AS bucket
          FROM r ORDER BY doc_id""",

    "q73_pii_scrub" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val url = "https?://[A-Za-z0-9./_%-]+"
      val clean = s"regexp_replace(regexp_replace(t, '$email', '<EMAIL>', 'g'), '$url', '<URL>', 'g')"
      s"""WITH p AS (SELECT doc_id,
            text || CASE WHEN doc_id % 7 = 0
                THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                ELSE '' END
              || CASE WHEN doc_id % 11 = 0
                THEN ' see https://example.org/p/' || CAST(doc_id AS VARCHAR) || ' page'
                ELSE '' END AS t
            FROM documents)
          SELECT doc_id,
            CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_emails,
            CAST(len(regexp_extract_all(t, '$url')) AS BIGINT) AS n_urls,
            ${TextSql.hash48(clean)} AS clean_hash
          FROM p ORDER BY doc_id"""
    },

    "q81_bpe_pairs" ->
      s"""WITH w AS (SELECT unnest($toksSql) AS word FROM documents),
          f AS (SELECT word FROM w
                WHERE regexp_matches(word, '^[a-z0-9]+${"$"}')
                  AND length(word) >= 2),
          p AS (SELECT unnest(list_transform(range(1, length(word)), i ->
                  substring(word, CAST(i AS INTEGER), 1)
                    || substring(word, CAST(i + 1 AS INTEGER), 1))) AS pair
                FROM f)
          SELECT pair, CAST(count(*) AS BIGINT) AS cnt
          FROM p GROUP BY pair ORDER BY pair""",

    // The identical wrapped-symbol replace fold: regexp_replace wraps each
    // character " c ", then one literal replace per merge in rank order.
    "q81b_bpe_encode" -> {
      val folded = bpeFoldSql
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
          w AS (SELECT doc_id, unnest(tk) AS word,
                  unnest(generate_series(0, len(tk) - 1)) AS tok_pos FROM t),
          f AS (SELECT doc_id, tok_pos, word FROM w
                WHERE regexp_matches(word, '^[a-z0-9]+${"$"}')),
          e AS (SELECT doc_id, tok_pos,
                  string_split(trim($folded), '  ') AS pieces FROM f)
          SELECT doc_id, CAST(tok_pos AS BIGINT) AS tok_pos,
            CAST(pos AS BIGINT) AS piece_pos, piece
          FROM (SELECT doc_id, tok_pos, unnest(pieces) AS piece,
                  unnest(generate_series(0, len(pieces) - 1)) AS pos FROM e)
          ORDER BY doc_id, tok_pos, piece_pos"""
    },

    // The identical accent plant via chr() codepoints (encoding-proof in
    // the JSON round-trip): á=225 é=233, decomposed acute=769, ñ=241
    // ç=231 ü=252. nfc_normalize composes, strip_accents removes marks —
    // byte-equal to the engine's NFD→drop-Mn→NFC on this character set.
    // The identical piece-count fold summed per doc, packed with the q70
    // exclusive-prefix-sum window.
    "q88_bpe_budget_shards" ->
      s"""WITH t AS (SELECT doc_id, source, $toksSql AS tk FROM documents),
          w AS (SELECT doc_id, unnest(tk) AS word FROM t),
          f AS (SELECT doc_id, word FROM w
                WHERE regexp_matches(word, '^[a-z0-9]+${"$"}')),
          e AS (SELECT doc_id,
                  len(string_split(trim($bpeFoldSql), '  ')) AS np FROM f),
          p AS (SELECT doc_id, CAST(sum(np) AS BIGINT) AS n_pieces
                FROM e GROUP BY doc_id),
          d AS (SELECT t.doc_id, t.source,
                  COALESCE(p.n_pieces, 0) AS n_pieces
                FROM t LEFT JOIN p USING (doc_id))
          SELECT doc_id, source, n_pieces,
            CAST((sum(n_pieces) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_pieces)
              // 3000 AS BIGINT) AS shard
          FROM d ORDER BY doc_id""",

    "q83_normalize" ->
      s"""WITH a AS (SELECT doc_id,
            replace(replace(text, 'a', chr(225)), 'e', chr(233))
              || ' e' || chr(769) || ' ' || chr(241) || ' ' || chr(231)
              || ' ' || chr(252) AS acc FROM documents),
          n AS (SELECT doc_id, acc, nfc_normalize(acc) AS nf FROM a),
          m AS (SELECT doc_id, acc, nf, strip_accents(nf) AS norm FROM n)
          SELECT doc_id, ${TextSql.hash48("nf")} AS nfc_hash,
            ${TextSql.hash48("norm")} AS norm_hash,
            CAST(strlen(acc) - strlen(norm) AS BIGINT) AS byte_delta
          FROM m ORDER BY doc_id"""
  )
}
