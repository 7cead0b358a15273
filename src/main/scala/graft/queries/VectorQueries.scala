package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{Vec, VecSql}
import graft.operators.{Multimodal, Similarity}
import Common._

/** Similarity search over the embeddings table (brute-force cosine top-k
  * baseline, sign-LSH bucketing as the scale path, sampled near-dup pairs)
  * plus the multimodal binary-column pipeline.
  */
object VectorQueries {

  private val DIM = 64
  private val PLANES = 8

  val queries: Map[String, Q] = Map(
    // Brute-force ANN baseline: 8 broadcast queries x all candidates,
    // exact cosine, top-5 per query.
    "q55_ann_bruteforce" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      Similarity.bruteForceTopK(e.where(col("vec_id") < 8), e, 5)
        .select(col("q_id"), col("vec_id"), col("rank").cast("long").as("rank"),
          fp(col("cosine"), 6).as("cos_micro"))
        .orderBy("q_id", "rank")
    }),

    // Sign-LSH bucket histogram (the ANN scale path: deterministic
    // md5-derived hyperplanes; bucket becomes the shuffle/partition key).
    "q56_ann_lsh_buckets" -> ((s, dir) => {
      Similarity.withLshBucket(table(s, dir, "embeddings"), PLANES, DIM)
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }),

    // IVF ANN under a GENUINELY PRUNED probe (nProbe = 1 of 8 cells) with
    // a full hash oracle — the planted-cluster construction (the
    // q57b/q56c closed-form pattern, retiring the last rows-only row):
    // each query vector is planted back into the corpus as 5 exact copies
    // under fresh ids. Assignment and probe ranking use the SAME argmax
    // scoring function (Similarity.nearestCell / probeCellsOf, both
    // topCellsCol with zero bias), so a copy's cell == the query's top-1
    // probe cell for ANY centroid geometry the engine trains — the probed
    // cell provably contains all 5 copies, and since copies score cosine
    // 1.0 (no natural vector comes close at any SF), pruned-probe top-5
    // IS brute-force top-5 over the planted corpus: the q55-shaped SQL is
    // an exact oracle for the whole train -> assign -> prune -> in-cell
    // rank path. Ties among copies break on vec_id in both engines.
    // Natural-corpus recall at pruned probes stays asserted in
    // ScaleOpsSpec/AnnBench.
    "q56b_ann_ivf" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val qs = e.where(col("vec_id") < 8)
      val copies = qs.select(col("vec_id"), col("embedding"))
        .crossJoin(s.range(5).select(col("id").as("__j")))
        .select((lit(10000000L) + col("vec_id") * 10 + col("__j")).as("vec_id"),
          col("embedding"))
      val corpus = e.select(col("vec_id"), col("embedding")).unionByName(copies)
      Similarity.ivfTopK(qs, corpus, 5, 8, DIM, nProbe = 1)
        .select(col("q_id"), col("vec_id"), col("rank").cast("long").as("rank"),
          fp(col("cosine"), 6).as("cos_micro"))
        .orderBy("q_id", "rank")
    }),

    // IVF probe-all: nProbe = nCells visits every inverted list, so the
    // result is mathematically identical to brute force (each candidate
    // lives in exactly one cell) — no recall assumption, and the q55
    // brute-force SQL is an exact oracle for the whole IVF path
    // (build -> assign -> probe -> in-cell ranking).
    "q56c_ann_ivf_exact" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      Similarity.ivfTopK(e.where(col("vec_id") < 8), e, 5, 8, DIM, nProbe = 8)
        .select(col("q_id"), col("vec_id"), col("rank").cast("long").as("rank"),
          fp(col("cosine"), 6).as("cos_micro"))
        .orderBy("q_id", "rank")
    }),

    // PQ exact: an ADC shortlist spanning the whole corpus + exact rerank
    // is mathematically identical to brute force (every candidate reaches
    // the exact-cosine stage; ADC order is irrelevant to the final top-k),
    // so the q55 brute-force SQL oracle-checks the entire PQ path:
    // train -> encode -> ADC table -> compressed scan -> rerank.
    "q56d_ann_pq_exact" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      // iters = 1 exercises the full train path (assign -> means -> refresh)
      // once; the identity this query proves (shortlist-inf rerank == brute
      // force) holds for ANY codebook, so extra Lloyd rounds only add fixed
      // job cost without strengthening the check (AnnBench carries the
      // converged-codebook recall evidence)
      val cb = Similarity.trainPq(e, m = 8, ksub = 16, dim = DIM, iters = 1)
      Similarity.pqTopKRerank(e.where(col("vec_id") < 8), e, 5, cb,
        shortlist = Int.MaxValue)
        .select(col("q_id"), col("vec_id"), col("rank").cast("long").as("rank"),
          fp(col("cosine"), 6).as("cos_micro"))
        .orderBy("q_id", "rank")
    }),

    // Composite IVF-PQ exact: probe-ALL cells + unbounded ADC shortlist
    // means every candidate reaches the exact-cosine rerank, so the
    // composite (coarse argmax -> PQ codes in cell-partitioned lists ->
    // ADC scan -> rerank) is mathematically identical to brute force and
    // the q55 SQL oracle-checks the entire serve path end to end. iters=1
    // as in q56d: the identity holds for ANY codebook/centroids.
    "q56e_ann_ivfpq_exact" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val idx = Similarity.buildIvfPq(e, nCells = 8, dim = DIM, m = 8,
        ksub = 16, iters = 1)
      Similarity.probeIvfPq(idx, e.where(col("vec_id") < 8), e, 5,
        nProbe = 8, shortlist = Int.MaxValue)
        .select(col("q_id"), col("vec_id"), col("rank").cast("long").as("rank"),
          fp(col("cosine"), 6).as("cos_micro"))
        .orderBy("q_id", "rank")
    }),

    // Incremental index append under the oracle: build + persist the
    // composite index over HALF the corpus, append the other half against
    // the frozen centroids/codebooks (the daily-ingest maintenance path),
    // then probe-all + shortlist-inf over the LOADED grown index. Every
    // vector — built or appended — lives in exactly one cell and reaches
    // the exact rerank, so the result is brute force over the FULL corpus
    // bit-for-bit (any centroids/codebooks): a wrong or dropped append
    // row breaks the hash.
    "q56f_ann_append_exact" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val half = e.agg(expr("percentile(vec_id, 0.5)")).head().getDouble(0)
      val idx = Similarity.buildIvfPq(e.where(col("vec_id") <= half),
        nCells = 8, dim = DIM, m = 8, ksub = 16, iters = 1)
      val tmp = Common.tempDir("q56f_idx")
      Similarity.saveIvfPqIndex(idx, tmp)
      Similarity.appendToIvfPqIndex(s, tmp, e.where(col("vec_id") > half))
      Similarity.probeIvfPq(Similarity.loadIvfPqIndex(s, tmp),
        e.where(col("vec_id") < 8), e, 5, nProbe = 8,
        shortlist = Int.MaxValue)
        .select(col("q_id"), col("vec_id"), col("rank").cast("long").as("rank"),
          fp(col("cosine"), 6).as("cos_micro"))
        .orderBy("q_id", "rank")
    }),

    // Incremental embedding dedup against a PERSISTED ANN index — the q82
    // LSH-index recipe on the vector surface (Similarity
    // .dedupBatchAgainstIvfIndex, the ingestVectors serve path): index the
    // lower half, probe the upper half PLUS planted exact copies of eight
    // indexed vectors, keep the survivors. nProbe = nCells (probe-all)
    // makes the ANN top-1 the global max cosine, so the drop rule is
    // SQL-expressible exactly: a batch vector survives iff its max cosine
    // against the indexed half stays under the threshold. The planted
    // copies guarantee real drops at every SF; a lost index row, wrong
    // cell assignment, or broken threshold compare breaks the hash.
    "q90_vector_incremental" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      // planted ids offset by max(vec_id)+1: provably outside the real key
      // space at ANY scale (a fixed constant collided once the corpus —
      // e.g. a ScaleUp replica set — reached ids that large, and a
      // colliding planted id would hit the probe's self-match exclusion
      // while the oracle keeps the pair). One tiny scalar job, mirrored
      // verbatim in the oracle's SQL.
      val agg = e.agg(expr("percentile(vec_id, 0.5)"), max("vec_id")).head()
      val (half, offset) = (agg.getDouble(0), agg.getLong(1) + 1L)
      val idxSide = e.where(col("vec_id") <= half)
      val tmp = Common.tempDir("q90_idx")
      Similarity.saveIvfIndex(
        Similarity.buildIvfIndex(idxSide, nCells = 8, dim = DIM), tmp)
      val batch = e.where(col("vec_id") > half).unionByName(
        idxSide.where(col("vec_id") < 8)
          .withColumn("vec_id", col("vec_id") + lit(offset)))
      Similarity.dedupBatchAgainstIvfIndex(s, tmp, batch,
          cosineThreshold = 0.99, nProbe = 8)
        .select(col("vec_id")).orderBy("vec_id")
    }),

    // Full vector-index MAINTENANCE cycle under the oracle — the q93
    // recipe on the vector surface: build on the lower QUARTER, append
    // the second quarter (frozen saved centroids), COMPACT the inverted
    // lists (r13 zero-downtime versioned swap), then run the q90
    // incremental dedup against the grown+compacted index. The oracle is
    // the IDENTICAL q90 SQL — the indexed set is everything <= median
    // however it got there, so build/append split and compaction must
    // both be invisible to the survivor set.
    "q94_ivf_compacted_dedup" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val agg = e.agg(expr("percentile(vec_id, 0.25)"),
        expr("percentile(vec_id, 0.5)"), max("vec_id")).head()
      val (q25, half, offset) =
        (agg.getDouble(0), agg.getDouble(1), agg.getLong(2) + 1L)
      val idxSide = e.where(col("vec_id") <= half)
      val tmp = Common.tempDir("q94_idx")
      Similarity.saveIvfIndex(
        Similarity.buildIvfIndex(e.where(col("vec_id") <= q25),
          nCells = 8, dim = DIM), tmp)
      Similarity.appendToIvfIndex(s, tmp,
        idxSide.where(col("vec_id") > q25))
      Similarity.compactIvfIndex(s, tmp)
      val batch = e.where(col("vec_id") > half).unionByName(
        idxSide.where(col("vec_id") < 8)
          .withColumn("vec_id", col("vec_id") + lit(offset)))
      Similarity.dedupBatchAgainstIvfIndex(s, tmp, batch,
          cosineThreshold = 0.99, nProbe = 8)
        .select(col("vec_id")).orderBy("vec_id")
    }),

    // Takedown DELETE under the oracle ([[Similarity.deleteFromIvfIndex]]
    // — the right-to-be-forgotten maintenance path): build + persist the
    // IVF index over the FULL corpus, DELETE every vec_id % 5 == 3 (the
    // takedown set), then probe-all from the LOADED index with the
    // surviving queries. Survivors keep their cells (the quantizer is
    // untouched), so probe-all ≡ brute force over the corpus WITHOUT the
    // deleted rows — a vector that survives its deletion, a lost
    // survivor, or a stale pre-delete lists version breaks the hash.
    "q98_ivf_delete_exact" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val tmp = Common.tempDir("q98_idx")
      Similarity.saveIvfIndex(
        Similarity.buildIvfIndex(e, nCells = 8, dim = DIM), tmp)
      Similarity.deleteFromIvfIndex(s, tmp,
        e.where(pmod(col("vec_id"), lit(5L)) === 3L).select("vec_id"))
      Similarity.probeIvf(Similarity.loadIvfIndex(s, tmp),
          e.where(col("vec_id") < 8 && pmod(col("vec_id"), lit(5L)) =!= 3L),
          5, nProbe = 8)
        .select(col("q_id"), col("vec_id"), col("rank").cast("long").as("rank"),
          fp(col("cosine"), 6).as("cos_micro"))
        .orderBy("q_id", "rank")
    }),

    // Shard-union MERGE under the oracle (Similarity.mergeIvfIndexes):
    // build TWO independent IVF indexes — lower and upper vec_id halves,
    // each with its own quantizer trained on its own half (the
    // per-region sharding pattern; the quantizers genuinely differ) —
    // then merge the upper into the lower: its vectors are RE-ASSIGNED
    // under the host's live centroids and appended into the host's cell
    // partitions. Probe-all over the merged index must equal brute force
    // over the whole corpus (the q56c identity, quantizer-independent):
    // a lost vector, a double-assigned cell, or a foreign-quantizer
    // assignment leak breaks the hash.
    "q100_ivf_merge_exact" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val half = e.agg(expr("percentile(vec_id, 0.5)")).head().getDouble(0)
      val lo = Common.tempDir("q100_lo")
      val hi = Common.tempDir("q100_hi")
      Similarity.saveIvfIndex(
        Similarity.buildIvfIndex(e.where(col("vec_id") <= half),
          nCells = 8, dim = DIM), lo)
      Similarity.saveIvfIndex(
        Similarity.buildIvfIndex(e.where(col("vec_id") > half),
          nCells = 5, dim = DIM), hi)
      Similarity.mergeIvfIndexes(s, lo, hi)
      Similarity.probeIvf(Similarity.loadIvfIndex(s, lo),
          e.where(col("vec_id") < 8), 5, nProbe = 8)
        .select(col("q_id"), col("vec_id"),
          col("rank").cast("long").as("rank"),
          fp(col("cosine"), 6).as("cos_micro"))
        .orderBy("q_id", "rank")
    }),

    // Quantizer RE-TRAIN lifecycle under the oracle: build the lower
    // half (its centroids reflect only that half — the drift setup),
    // append the upper half under the frozen stale quantizer, RETRAIN
    // (centroids re-learned from the full contents and GROWN 8 -> 13
    // cells, atomically cut over with the re-assigned lists), then
    // probe-all. The mirror is the q56c brute-force identity — the
    // whole drift/rebalance lifecycle must be invisible to results.
    "q95_ivf_retrain_exact" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val half = e.agg(expr("percentile(vec_id, 0.5)")).head().getDouble(0)
      val tmp = Common.tempDir("q95_idx")
      Similarity.saveIvfIndex(
        Similarity.buildIvfIndex(e.where(col("vec_id") <= half),
          nCells = 8, dim = DIM), tmp)
      Similarity.appendToIvfIndex(s, tmp, e.where(col("vec_id") > half))
      Similarity.retrainIvfIndex(s, tmp, nCells = Some(13))
      Similarity.probeIvf(Similarity.loadIvfIndex(s, tmp),
          e.where(col("vec_id") < 8), 5, nProbe = 13)
        .select(col("q_id"), col("vec_id"),
          col("rank").cast("long").as("rank"),
          fp(col("cosine"), 6).as("cos_micro"))
        .orderBy("q_id", "rank")
    }),

    // Takedown DELETE on the COMPOSITE index under the oracle
    // (Similarity.deleteFromIvfPqIndex — q98's IVFADC twin): build +
    // persist IVF-PQ over the full corpus, delete every vec_id % 5 == 3,
    // then probe-all + shortlist-∞ from the LOADED index with the
    // surviving queries. Centroids/codebooks are frozen so survivors'
    // codes stay valid, and the q56e identity makes the result brute
    // force over the corpus WITHOUT the deleted rows — a code row that
    // outlives its takedown or a lost survivor breaks the hash.
    "q103_ivfpq_delete_exact" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val tmp = Common.tempDir("q103_idx")
      Similarity.saveIvfPqIndex(Similarity.buildIvfPq(e, nCells = 8,
        dim = DIM, m = 8, ksub = 16, iters = 1), tmp)
      Similarity.deleteFromIvfPqIndex(s, tmp,
        e.where(pmod(col("vec_id"), lit(5L)) === 3L).select("vec_id"))
      Similarity.probeIvfPq(Similarity.loadIvfPqIndex(s, tmp),
          e.where(col("vec_id") < 8 && pmod(col("vec_id"), lit(5L)) =!= 3L),
          e, 5, nProbe = 8, shortlist = Int.MaxValue)
        .select(col("q_id"), col("vec_id"),
          col("rank").cast("long").as("rank"),
          fp(col("cosine"), 6).as("cos_micro"))
        .orderBy("q_id", "rank")
    }),

    // Shard-union MERGE on the composite index under the oracle
    // (Similarity.mergeIvfPqIndexes — q100's IVFADC twin, under the
    // family's own contract): PQ codes only transfer under IDENTICAL
    // artifacts, so this is the documented shard-encode pattern — train
    // ONCE over the corpus, persist the same centroids/codebooks to two
    // shards holding the lower/upper vec_id halves' code lists, merge
    // the upper shard's lists into the host's cell partitions (the
    // equality requires pass by construction), then probe-all +
    // shortlist-∞. The q56e identity makes the merged index brute force
    // over the whole corpus: a lost, duplicated, or wrong-cell code row
    // breaks the hash.
    "q104_ivfpq_merge_exact" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val half = e.agg(expr("percentile(vec_id, 0.5)")).head().getDouble(0)
      val idx = Similarity.buildIvfPq(e, nCells = 8, dim = DIM, m = 8,
        ksub = 16, iters = 1)
      val lo = Common.tempDir("q104_lo")
      val hi = Common.tempDir("q104_hi")
      Similarity.saveIvfPqIndex(
        idx.copy(lists = idx.lists.where(col("vec_id") <= half)), lo)
      Similarity.saveIvfPqIndex(
        idx.copy(lists = idx.lists.where(col("vec_id") > half)), hi)
      Similarity.mergeIvfPqIndexes(s, lo, hi)
      Similarity.probeIvfPq(Similarity.loadIvfPqIndex(s, lo),
          e.where(col("vec_id") < 8), e, 5, nProbe = 8,
          shortlist = Int.MaxValue)
        .select(col("q_id"), col("vec_id"),
          col("rank").cast("long").as("rank"),
          fp(col("cosine"), 6).as("cos_micro"))
        .orderBy("q_id", "rank")
    }),

    // Embedding near-dup: sampled anchors (id % 5 == 0), blocked by label,
    // top-1 most-similar pair per label.
    "q57_embedding_neardup" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      Similarity.nearDupPairs(e.where(col("vec_id") % 5 === 0), "label")
        .select(col("grp").cast("long").as("label"), col("id_a"), col("id_b"),
          fp(col("cosine"), 6).as("cos_micro"))
        .orderBy("label")
    }),

    // Oversized-block near-dup — the split path of nearDupPairs under the
    // driver hash check: ONE blocking key carrying 200 copies of a single
    // embedding (a degenerate boilerplate-style mass, far over the cap)
    // plus a planted diverse near-dup pair. The mass collapses into one
    // over-cap sign-LSH sub-bucket and is dropped; the pair (2 rows <=
    // cap) survives sub-bucketing and is the ONLY output. Survival is
    // deterministic by construction — identical vectors agree on every
    // sign bit, and the pair's vector is a different corpus embedding than
    // the mass's (sub-bucket disjointness verified against all three SF
    // datasets) — so the oracle is the closed-form expected row: a full
    // hash check of the cap semantics, where mirroring the engine's plane
    // hashes in DuckDB would otherwise force a weaker rows-only check.
    // topPerGroup = 5 means any leaked mass pair (cosine 1.0, smaller
    // ids) would surface and break the hash.
    "q57b_neardup_oversized_block" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val massV = e.where(col("vec_id") === 0).select(col("embedding").as("mass_v"))
      val mass = e.where(col("vec_id") < 200).select(col("vec_id"))
        .crossJoin(broadcast(massV))
        .select(col("vec_id"), col("mass_v").as("embedding"))
      val pairV = e.where(col("vec_id") === 300).select(col("embedding").as("pair_v"))
      val pair = s.range(2).select((col("id") + 9001L).as("vec_id"))
        .crossJoin(broadcast(pairV))
        .select(col("vec_id"), col("pair_v").as("embedding"))
      val block = mass.unionByName(pair).withColumn("label", lit(0L))
      Similarity.nearDupPairs(block, "label", topPerGroup = 5,
          maxBlock = Some(50))
        .select(col("id_a"), col("id_b"), fp(col("cosine"), 6).as("cos_micro"))
        .orderBy("id_a", "id_b")
    }),

    // SemDeDup-style semantic dedup (Similarity.semanticDedup): the corpus
    // plus planted exact duplicates (every 50th vector re-appears under
    // id+100000 — the corpus has no natural near-dups at any SF, so the
    // plant guarantees the drop path runs); k=8 hash-chosen seed vectors,
    // argmax-cosine assignment, drop-above-0.95-to-a-smaller-id rule. The
    // oracle mirrors the WHOLE construction (plant, hash-ordered seeds,
    // assignment argmax, pair threshold), so kept set AND cluster ids
    // hash-check. maxCluster=None: the cap valve would need engine-
    // specific sub-bucket hashes in SQL — its semantics are q57b's job.
    "q76_semantic_dedup" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val planted = e.where(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      val corpus = e.select(col("vec_id"), col("embedding"))
        .unionByName(planted)
      Similarity.semanticDedup(corpus, k = 8, threshold = 0.95,
          salt = "sem1", maxCluster = None)
        .select(col("id").as("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),

    // Vector scalar functions: L2 norm and component mean per vector.
    "q58_vector_norms" -> ((s, dir) => {
      val v = Vec.asDouble(col("embedding"))
      table(s, dir, "embeddings")
        .select(col("vec_id"),
          fp(Vec.norm(v), 6).as("norm_micro"),
          fp(Vec.dot(v, transform(v, _ => lit(1.0))) / DIM, 6).as("mean_micro"))
        .orderBy("vec_id")
    }),

    // Multimodal: binary payload + typed metadata + batched partition-wise
    // stub decode (real codec slot), emitting typed feature columns.
    "q59_multimodal_decode" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      Multimodal.decode(Multimodal.attachPayload(docs, "doc_id", "text"))
        .select(col("doc_id"), col("n_bytes"), col("byte_sum"),
          col("width").cast("long").as("width"), col("height").cast("long").as("height"))
        .orderBy("doc_id")
    })
  )

  private val vSql = VecSql.asDouble("embedding")

  /** Shared q56c/q95 mirror: probe-all over the whole corpus ≡ brute
    * force, quantizer-independent (every vector lives in exactly one
    * cell, all cells visited).
    */
  private lazy val probeAllSql =
    s"""WITH q AS (SELECT vec_id AS q_id, $vSql AS qv FROM embeddings WHERE vec_id < 8),
        c AS (SELECT vec_id, $vSql AS cv FROM embeddings),
        scored AS (SELECT q_id, vec_id, ${VecSql.cosine("qv", "cv")} AS cosine
                   FROM c, q WHERE vec_id <> q_id),
        ranked AS (SELECT q_id, vec_id, cosine,
                     row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
                   FROM scored)
        SELECT q_id, vec_id, CAST(rank AS BIGINT) AS rank,
          ${sqlFp("cosine", 6)} AS cos_micro
        FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"""

  /** Shared q90/q94 mirror: batch survivors = rows whose max cosine
    * against the indexed half stays under the threshold (probe-all makes
    * the engine's ANN top-1 the global max, so the rule is exactly
    * SQL-expressible). The indexed set is defined by the MEDIAN split
    * alone — build/append split and compaction are engine-side detail the
    * identity requires to be invisible.
    */
  private lazy val incrementalDedupSql =
    s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
        h AS (SELECT quantile_cont(vec_id, 0.5) AS m FROM e),
        idx AS (SELECT vec_id, v FROM e, h WHERE vec_id <= m),
        batch AS (SELECT vec_id, v FROM e, h WHERE vec_id > m
                  UNION ALL
                  SELECT vec_id + (SELECT max(vec_id) + 1 FROM e), v
                  FROM idx WHERE vec_id < 8),
        mx AS (SELECT b.vec_id, max(${VecSql.cosine("b.v", "i.v")}) AS mc
               FROM batch b, idx i GROUP BY 1)
        SELECT vec_id FROM mx WHERE mc < 0.99 ORDER BY vec_id"""

  /** Shared q98/q103 mirror: probe-all over the corpus MINUS the
    * vec_id % 5 == 3 takedown set ≡ brute force over the survivors —
    * quantizer/codebook-independent for the same reason as
    * [[probeAllSql]].
    */
  private lazy val deleteProbeAllSql =
    s"""WITH q AS (SELECT vec_id AS q_id, $vSql AS qv FROM embeddings
                   WHERE vec_id < 8 AND vec_id % 5 <> 3),
        c AS (SELECT vec_id, $vSql AS cv FROM embeddings WHERE vec_id % 5 <> 3),
        scored AS (SELECT q_id, vec_id, ${VecSql.cosine("qv", "cv")} AS cosine
                   FROM c, q WHERE vec_id <> q_id),
        ranked AS (SELECT q_id, vec_id, cosine,
                     row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
                   FROM scored)
        SELECT q_id, vec_id, CAST(rank AS BIGINT) AS rank,
          ${sqlFp("cosine", 6)} AS cos_micro
        FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"""

  val oracle: Map[String, String] = Map(
    "q55_ann_bruteforce" ->
      s"""WITH q AS (SELECT vec_id AS q_id, $vSql AS qv FROM embeddings WHERE vec_id < 8),
          c AS (SELECT vec_id, $vSql AS cv FROM embeddings),
          scored AS (SELECT q_id, vec_id, ${VecSql.cosine("qv", "cv")} AS cosine
                     FROM c, q WHERE vec_id <> q_id),
          ranked AS (SELECT q_id, vec_id, cosine,
                       row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
                     FROM scored)
          SELECT q_id, vec_id, CAST(rank AS BIGINT) AS rank,
            ${sqlFp("cosine", 6)} AS cos_micro
          FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    // brute force over the PLANTED corpus (base + 5 copies of each query
    // vector): provably equal to the engine's nProbe=1 pruned probe — see
    // the query comment.
    "q56b_ann_ivf" ->
      s"""WITH base AS (SELECT vec_id, $vSql AS cv FROM embeddings),
          q AS (SELECT vec_id AS q_id, cv AS qv FROM base WHERE vec_id < 8),
          copies AS (SELECT 10000000 + q_id * 10 + j AS vec_id, qv AS cv
                     FROM q, (SELECT unnest(range(5)) AS j)),
          c AS (SELECT vec_id, cv FROM base
                UNION ALL SELECT vec_id, cv FROM copies),
          scored AS (SELECT q_id, vec_id, ${VecSql.cosine("qv", "cv")} AS cosine
                     FROM c, q WHERE vec_id <> q_id),
          ranked AS (SELECT q_id, vec_id, cosine,
                       row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
                     FROM scored)
          SELECT q_id, vec_id, CAST(rank AS BIGINT) AS rank,
            ${sqlFp("cosine", 6)} AS cos_micro
          FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    "q56c_ann_ivf_exact" -> probeAllSql,

    // same mirror: probe-all ≡ brute force holds for ANY quantizer, so a
    // build+append+retrain lifecycle must reproduce it bit-for-bit
    "q95_ivf_retrain_exact" -> probeAllSql,

    // the same probe-all ≡ brute-force mirror: a shard merge (foreign
    // quantizer discarded, vectors re-assigned) must be invisible
    "q100_ivf_merge_exact" -> probeAllSql,

    // probe-all + shortlist-∞ ≡ brute force holds for ANY shared
    // artifacts, so a shard-encode merge (code-lists union under equal
    // centroids/codebooks) must reproduce it bit-for-bit
    "q104_ivfpq_merge_exact" -> probeAllSql,

    // the probe-all mirror over the corpus MINUS the takedown set: the
    // engine's delete-rewrite must serve exactly as if the deleted rows
    // were never indexed
    "q98_ivf_delete_exact" -> deleteProbeAllSql,

    // identical mirror for the composite layout: frozen artifacts keep
    // survivors' codes valid, so delete + probe-all + shortlist-∞ is
    // brute force over the survivors
    "q103_ivfpq_delete_exact" -> deleteProbeAllSql,

    "q56_ann_lsh_buckets" ->
      s"""SELECT ${VecSql.lshBucket("v", Vec.planes(PLANES, DIM))} AS bucket, count(*) AS n
          FROM (SELECT $vSql AS v FROM embeddings)
          GROUP BY 1 ORDER BY bucket""",

    "q56d_ann_pq_exact" ->
      s"""WITH q AS (SELECT vec_id AS q_id, $vSql AS qv FROM embeddings WHERE vec_id < 8),
          c AS (SELECT vec_id, $vSql AS cv FROM embeddings),
          scored AS (SELECT q_id, vec_id, ${VecSql.cosine("qv", "cv")} AS cosine
                     FROM c, q WHERE vec_id <> q_id),
          ranked AS (SELECT q_id, vec_id, cosine,
                       row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
                     FROM scored)
          SELECT q_id, vec_id, CAST(rank AS BIGINT) AS rank,
            ${sqlFp("cosine", 6)} AS cos_micro
          FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    "q56e_ann_ivfpq_exact" ->
      s"""WITH q AS (SELECT vec_id AS q_id, $vSql AS qv FROM embeddings WHERE vec_id < 8),
          c AS (SELECT vec_id, $vSql AS cv FROM embeddings),
          scored AS (SELECT q_id, vec_id, ${VecSql.cosine("qv", "cv")} AS cosine
                     FROM c, q WHERE vec_id <> q_id),
          ranked AS (SELECT q_id, vec_id, cosine,
                       row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
                     FROM scored)
          SELECT q_id, vec_id, CAST(rank AS BIGINT) AS rank,
            ${sqlFp("cosine", 6)} AS cos_micro
          FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    // survivors = batch vectors whose max cosine against the indexed half
    // is under the threshold (probe-all top-1 == global max; identical
    // sequential-fold cosine chain, so the compare agrees bit-for-bit)
    "q90_vector_incremental" -> incrementalDedupSql,

    // identical mirror: the indexed set is everything <= median however
    // it was built (one-shot vs build+append+compact)
    "q94_ivf_compacted_dedup" -> incrementalDedupSql,

    "q56f_ann_append_exact" ->
      s"""WITH q AS (SELECT vec_id AS q_id, $vSql AS qv FROM embeddings WHERE vec_id < 8),
          c AS (SELECT vec_id, $vSql AS cv FROM embeddings),
          scored AS (SELECT q_id, vec_id, ${VecSql.cosine("qv", "cv")} AS cosine
                     FROM c, q WHERE vec_id <> q_id),
          ranked AS (SELECT q_id, vec_id, cosine,
                       row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
                     FROM scored)
          SELECT q_id, vec_id, CAST(rank AS BIGINT) AS rank,
            ${sqlFp("cosine", 6)} AS cos_micro
          FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    "q57_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, label, $vSql AS v FROM embeddings),
          pairs AS (SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
                      ${VecSql.cosine("a.v", "b.v")} AS cosine
                    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
                    WHERE a.vec_id % 5 = 0 AND b.vec_id % 5 = 0),
          ranked AS (SELECT *, row_number() OVER (PARTITION BY label
                       ORDER BY cosine DESC, id_a, id_b) AS rank FROM pairs)
          SELECT CAST(label AS BIGINT) AS label, id_a, id_b,
            ${sqlFp("cosine", 6)} AS cos_micro
          FROM ranked WHERE rank = 1 ORDER BY label""",

    // Closed-form expected output (see the query comment: survival is
    // deterministic by construction, cosine(v, v) rounds to exactly 1).
    "q57b_neardup_oversized_block" ->
      """SELECT CAST(9001 AS BIGINT) AS id_a, CAST(9002 AS BIGINT) AS id_b,
           CAST(1000000 AS BIGINT) AS cos_micro""",

    "q76_semantic_dedup" -> {
      import graft.functions.TextSql
      s"""WITH base AS (
            SELECT vec_id, $vSql AS v FROM embeddings
            UNION ALL
            SELECT vec_id + 100000, $vSql FROM embeddings WHERE vec_id % 50 = 0),
          sr AS (SELECT vec_id, v, row_number() OVER (ORDER BY
              ${TextSql.hash48("'sem1' || CAST(vec_id AS VARCHAR)")} ASC,
              vec_id ASC) AS rk FROM base),
          seeds AS (SELECT rk - 1 AS seed_j, v AS sv FROM sr WHERE rk <= 8),
          cosines AS (SELECT b.vec_id, s.seed_j,
              ${VecSql.cosine("b.v", "s.sv")} AS cos
            FROM base b CROSS JOIN seeds s),
          assigned AS (SELECT vec_id, seed_j AS cluster FROM (
              SELECT vec_id, seed_j, row_number() OVER (PARTITION BY vec_id
                ORDER BY cos DESC, seed_j ASC) AS r FROM cosines)
            WHERE r = 1),
          pairs AS (SELECT DISTINCT a2.vec_id AS dropped
            FROM assigned a1 JOIN assigned a2
              ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
            JOIN base b1 ON b1.vec_id = a1.vec_id
            JOIN base b2 ON b2.vec_id = a2.vec_id
            WHERE ${VecSql.cosine("b1.v", "b2.v")} >= 0.95)
          SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM assigned
          WHERE vec_id NOT IN (SELECT dropped FROM pairs)
          ORDER BY vec_id"""
    },

    "q58_vector_norms" ->
      s"""SELECT vec_id,
          ${sqlFp(VecSql.norm("v"), 6)} AS norm_micro,
          ${sqlFp(s"${VecSql.dot("v", s"list_transform(v, x -> 1.0)")} / $DIM", 6)} AS mean_micro
          FROM (SELECT vec_id, $vSql AS v FROM embeddings)
          ORDER BY vec_id""",

    "q59_multimodal_decode" ->
      """WITH b AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
            CAST(list_sum(list_transform(range(1, strlen(text) + 1),
              i -> ascii(substring(text, i, 1)))) AS BIGINT) AS byte_sum
          FROM documents)
          SELECT doc_id, n_bytes, byte_sum,
            16 + byte_sum % 16 AS width,
            16 + (byte_sum // 16) % 16 AS height
          FROM b ORDER BY doc_id"""
  )
}
