package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bpe, Dedup}

import scala.collection.mutable

/** BPE training property-locked against a from-scratch reference, and the
  * column encoder against its driver twin.
  */
class BpeSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference trainer: recounts EVERY pair from scratch each
    * iteration (no incremental index) with the same deterministic
    * selection rule — max count, lexicographically smallest (a, b).
    */
  private def naiveTrain(hist: Seq[(String, Long)],
      n: Int): Seq[(String, String)] = {
    var words: Seq[(List[String], Long)] =
      hist.map { case (w, c) => (w.toCharArray.map(_.toString).toList, c) }
    val out = mutable.ArrayBuffer.empty[(String, String)]
    var stop = false
    while (out.length < n && !stop) {
      val counts = mutable.Map.empty[(String, String), Long]
      words.foreach { case (s, c) =>
        s.zip(s.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty) stop = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (best._2 < 2) stop = true
        else {
          out += best._1
          val (a, b) = best._1
          words = words.map { case (s, c) =>
            val r = mutable.ListBuffer.empty[String]
            var i = 0
            val arr = s.toArray
            while (i < arr.length) {
              if (i < arr.length - 1 && arr(i) == a && arr(i + 1) == b) {
                r += (a + b); i += 2
              } else { r += arr(i); i += 1 }
            }
            (r.toList, c)
          }
        }
      }
    }
    out.toSeq
  }

  test("hand fixture: merges and tie-break follow the max-count/lex rule") {
    // (a,a)=25 first; then (aa,a)=10 ties (a,b)=10 and ("a","b") < ("aa","a");
    // then (aa,ab)=10 beats (aa,b)=5, which lands last
    val hist = Seq(("aaab", 10L), ("aab", 5L))
    val got = Bpe.trainFromHistogram(hist, 5)
    assert(got == Seq(("a", "a"), ("a", "b"), ("aa", "ab"), ("aa", "b")))
  }

  test("incremental trainer == from-scratch reference on seeded corpora") {
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val letters = "abc"
      val hist = (1 to 30).map { _ =>
        val w = (1 to (1 + rnd.nextInt(6)))
          .map(_ => letters(rnd.nextInt(letters.length))).mkString
        (w, 1L + rnd.nextInt(20))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
        .sortBy(_._1)
      val nMerges = 12
      assert(Bpe.trainFromHistogram(hist, nMerges) ==
        naiveTrain(hist, nMerges), s"seed $seed")
    }
  }

  test("column encoder == driver twin on trained merges; concat identity") {
    val docs = Seq(
      "the weather pattern gathered there then",
      "that feather gathers other weather data",
      "breathe the theme either way").toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val merges = Bpe.train(docs, "text", nMerges = 8)
    assert(merges.nonEmpty)
    val words = docs
      .select(explode(graft.functions.Text.tokens(col("text"))).as("word"))
      .distinct().as[String].collect().sorted
    val enc = docs.sparkSession.createDataset(words.toSeq).toDF("word")
      .select(col("word"), Bpe.encodeToken(col("word"), merges).as("pieces"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(enc(w) == Bpe.encodeWordDriver(w, merges), s"word $w")
      assert(enc(w).mkString == w, s"concat identity for $w")
    }
  }

  test("model save/load round-trips in learned order; truncation fails loudly") {
    val merges = Seq(("t", "h"), ("th", "e"), ("a", "n"), ("i", "s"))
    val dir = java.nio.file.Files.createTempDirectory("bpe_rt").toString
    Bpe.saveBpeModel(spark, merges, dir)
    assert(Bpe.loadBpeModel(spark, dir) == merges)
    // a gap in the rank sequence (truncated/partial model) must throw
    val bad = java.nio.file.Files.createTempDirectory("bpe_bad").toString
    Seq((0, "t", "h"), (2, "a", "n")).toDF("rank", "a", "b")
      .write.mode("overwrite").parquet(bad)
    val e = intercept[IllegalArgumentException](Bpe.loadBpeModel(spark, bad))
    assert(e.getMessage.contains("non-contiguous"))
  }

  test("encodeCorpus covers every token via the vocabulary join") {
    val docs = Seq((1L, "aa ab aa"), (2L, "ab ba")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("a", "b"))
    val got = Bpe.encodeCorpus(docs, "doc_id", "text", merges)
      .orderBy("doc_id", "tok_pos")
      .select("doc_id", "tok_pos", "word", "pieces")
      .as[(Long, Int, String, Seq[String])].collect()
    assert(got.length == 5) // every token occurrence present exactly once
    assert(got.map(_._4.mkString) sameElements got.map(_._3))
    assert(got.filter(_._3 == "aa").forall(_._4 == Seq("aa")))
    assert(got.filter(_._3 == "ba").forall(_._4 == Seq("b", "a")))
  }

  test("non-BMP text trains whole-code-point merges; encoders agree") {
    // U+1F600 GRINNING FACE is a surrogate pair in UTF-16. The regex wrap
    // splits code POINTS, so the driver twins must too — pre-r12 they
    // split code UNITS and trained lone-surrogate merges that lit()
    // corrupted, silently diverging encode from training.
    val smile = new String(Character.toChars(0x1F600))
    val docs = Seq((1L, s"$smile$smile a$smile $smile$smile"),
      (2L, s"a$smile $smile$smile b")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", nMerges = 4)
    assert(merges.nonEmpty)
    def wellFormed(s: String): Boolean = {
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (Character.isHighSurrogate(c)) {
          if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1)))
            return false
          i += 2
        } else if (Character.isLowSurrogate(c)) return false
        else i += 1
      }
      true
    }
    merges.foreach { case (a, b) =>
      Seq(a, b).foreach(s => assert(wellFormed(s),
        s"merge symbol ${s.map(_.toInt.toHexString).mkString(",")} holds a lone surrogate"))
    }
    // the dominant pair is (smile, smile)
    assert(merges.head == ((smile, smile)))
    val words = docs
      .select(explode(graft.functions.Text.tokens(col("text"))).as("word"))
      .distinct().as[String].collect().sorted
    val enc = docs.sparkSession.createDataset(words.toSeq).toDF("word")
      .select(col("word"), Bpe.encodeToken(col("word"), merges).as("pieces"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(enc(w) == Bpe.encodeWordDriver(w, merges), s"word $w")
      assert(enc(w).mkString == w, s"concat identity for $w")
    }
  }

  test("encodeCorpus JVM path (maxFoldMerges exceeded) == Catalyst fold") {
    val docs = Seq(
      (1L, "the weather pattern gathered there then"),
      (2L, "that feather gathers other weather data"),
      (3L, "breathe the theme either way")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", nMerges = 8)
    val key = (r: (Long, Int, String, Seq[String])) => (r._1, r._2)
    def run(maxFold: Int) =
      Bpe.encodeCorpus(docs, "doc_id", "text", merges, maxFoldMerges = maxFold)
        .select("doc_id", "tok_pos", "word", "pieces")
        .as[(Long, Int, String, Seq[String])].collect().sortBy(key)
    assert(run(512).toSeq == run(0).toSeq) // 0 forces the JVM vocab encoder
  }
}

/** Streaming ingest over the persisted LSH index: the foreachBatch loop
  * equals the sequential batch loop (same code, same micro-batches), and
  * the planted drops land exactly.
  */
class StreamingIngestSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._
  import graft.streaming.StreamingOps

  /** Disjoint-vocabulary docs: zero cross-doc shingle overlap except what
    * the fixture plants, so every drop below is a closed-form decision.
    */
  private def doc(seed: Long, n: Int = 30): String =
    (1 to n).map(j => s"w${seed}x$j").mkString(" ")

  /** One trailing-token mutation: 27 of 29 distinct shingles shared
    * (jaccard ≈ 0.93) — comfortably over the 0.7 threshold and a
    * near-certain band collision under the deterministic hash family.
    */
  private def nearDup(seed: Long): String =
    doc(seed).split(" ").dropRight(1).mkString(" ") + " zz"

  test("streamed ingest == sequential batch loop; planted drops land") {
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-").toString
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$root/in/$name")
    val batches = Seq(
      // b1: exact dup of seed 5 (dropped vs index) + two uniques
      Seq((100L, doc(5)), (101L, doc(300)), (102L, doc(301))),
      // b2: near-dup of b1's survivor 101 (dropped ONLY if b1's append
      // became visible — the cross-batch visibility proof) + a unique
      Seq((110L, nearDup(300)), (111L, doc(302))),
      // b3: within-batch exact pair (self-dedup keeps min id 120) +
      // exact dup of seed 7 + a unique
      Seq((120L, doc(400)), (121L, doc(400)), (122L, doc(7)),
        (123L, doc(303))))
    batches.zipWithIndex.foreach { case (b, i) => writeBatch(s"b${i + 1}", b) }
    val seed = (0L until 20L).map(i => (i, doc(i))).toDF("doc_id", "text")
    def freshIndex(tag: String): String = {
      val d = s"$root/$tag/index"
      Dedup.saveLshIndex(seed, "doc_id", "text", d)
      d
    }

    // sequential truth: the same ingestBatch body, explicit loop
    val loopIdx = freshIndex("loop")
    val loopCorpus = s"$root/loop/corpus"
    batches.foreach { b =>
      StreamingOps.ingestBatch(b.toDF("doc_id", "text"), loopIdx,
        loopCorpus, jaccardThreshold = 0.7)
    }
    val expect = spark.read.parquet(loopCorpus)
      .select("doc_id").as[Long].collect().toSet

    // the stream: one file per trigger, in write order
    val streamIdx = freshIndex("stream")
    val streamCorpus = s"$root/stream/corpus"
    val schema = spark.read.parquet(s"$root/in/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in/{b1,b2,b3}")
    val q = StreamingOps.ingestWithDedup(stream, streamIdx, streamCorpus,
        jaccardThreshold = 0.7)
      .option("checkpointLocation", s"$root/stream/ckpt").start()
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(streamCorpus)
      .select("doc_id").as[Long].collect().toSet

    assert(got == expect, "stream diverged from the sequential batch loop")
    assert(got == Set(100L, 101L, 102L, 110L, 111L, 120L, 121L, 122L, 123L)
      .diff(Set(100L, 110L, 121L, 122L)),
      s"planted drop set violated: $got")
    // the grown index carries seed + all survivors under one geometry:
    // re-probing any survivor's exact copy now drops it
    val reprobe = Dedup.dedupBatchAgainstLshIndex(spark, streamIdx,
      Seq((999L, doc(303))).toDF("doc_id", "text"),
      jaccardThreshold = 0.7)
    assert(reprobe.count() == 0L,
      "a survivor's exact copy must be dropped by the grown index")
  }

  test("a retrain cutover mid-stream aborts the micro-batch; the replay converges to exactly-once") {
    // the WriterLeaseSpec lease-abort replay, streamed, for the newest
    // verb: a RETRAIN cuts the index to a new geometry between a
    // micro-batch's shingle and band writes — the append aborts loudly
    // on the under-lease geometry re-check, the streaming query FAILS
    // before its checkpoint commits, and a restart from the same
    // checkpoint re-delivers the batch, which now lands under the new
    // geometry: exactly one corpus application, index ≡ one-shot
    import graft.operators.{FaultPoints, IndexFiles}
    val root = java.nio.file.Files
      .createTempDirectory("graft-retrain-race-").toString
    // one batch: an exact dup of seed 5 (dropped) + two uniques
    Seq((100L, doc(5)), (101L, doc(300)), (102L, doc(301)))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$root/in/b1")
    val idx = s"$root/index"; val corpus = s"$root/corpus"
    Dedup.saveLshIndex((0L until 20L).map(i => (i, doc(i)))
      .toDF("doc_id", "text"), "doc_id", "text", idx)
    val schema = spark.read.parquet(s"$root/in/b1").schema
    def startStream() = StreamingOps.ingestWithDedup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$root/in/*"),
      idx, corpus, jaccardThreshold = 0.7)
      .option("checkpointLocation", s"$root/ckpt").start()
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      FaultPoints.withHook((o, t) =>
        if (o == "lsh.append" && t == "shingles" &&
            fired.compareAndSet(false, true))
          Dedup.retrainLshIndex(spark, idx, k = 8, nBands = 4)) {
        val q = startStream()
        try q.processAllAvailable() finally q.stop()
      }
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).toSeq
    assert(chain.exists(_.contains("geometry changed")),
      s"the micro-batch must abort on the geometry re-check: $chain")
    assert(!new java.io.File(corpus).exists() ||
      spark.read.parquet(corpus).count() == 0L,
      "an aborted micro-batch must not have published corpus rows")
    // restart from the SAME checkpoint: the batch re-delivers under its
    // original batchId and now lands under the retrained geometry
    val q2 = startStream()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet == Set(101L, 102L),
      "the replay must apply the batch exactly once (dup dropped)")
    // the index serves ≡ a one-shot build at the NEW geometry over
    // seed ∪ survivors; the aborted attempt's duplicate shingle rows
    // are the documented residue, removed by the dedupe compact
    Dedup.compactLshIndex(spark, idx, dedupeRows = true)
    val one = s"$root/one"
    Dedup.saveLshIndex(
      ((0L until 20L).map(i => (i, doc(i))) ++
        Seq((101L, doc(300)), (102L, doc(301))))
        .toDF("doc_id", "text"),
      "doc_id", "text", one, k = 8, nBands = 4)
    def vetoes(d: String) = Dedup.dedupBatchAgainstLshIndex(spark, d,
      Seq((900L, doc(300)), (901L, doc(5)), (902L, doc(888)))
        .toDF("doc_id", "text"), jaccardThreshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(vetoes(idx) == Set(902L), "survivor + seed copies must veto")
    assert(vetoes(idx) == vetoes(one))
    def rows(d: String, sub: String) =
      spark.read.parquet(IndexFiles.tablePath(spark, d, sub)).count()
    assert(rows(idx, "shingles") == rows(one, "shingles"),
      "dedupe-compact must drop the aborted attempt's shingle rows")
    assert(rows(idx, "bands") == rows(one, "bands"),
      "band rows must carry no duplicates after the dedupe compact")
  }
}

/** Persisted LSH index: probe parity with the one-shot minhashLsh pairs,
  * append-vs-rebuild equality, and the index-bucket cap.
  */
class LshIndexSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** Seeded corpus with dup structure that CROSSES the %3 probe split: a
    * 41-word (prime > 40 ids) vocabulary makes every base doc unique;
    * ids ≡3 (mod 8) are exact copies of id-2 and ids ≡7 (mod 8) one-token
    * mutations of id-2 — id and id-2 always land in different %3 classes.
    */
  private def corpus(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 41).map(i => s"tok$i")
    def base(id: Long) = (1 to 12).map(j => vocab(((id * 7 + j) % 41).toInt))
    (0L until 40L).map { id =>
      val toks =
        if (id % 8 == 3) base(id - 2)
        else if (id % 8 == 7) base(id - 2).dropRight(1) :+ vocab(rnd.nextInt(41))
        else base(id)
      (id, toks.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("probe over saved+appended index == one-shot minhashLsh cross pairs") {
    (1 to 3).foreach { seed =>
      val docs = corpus(seed)
      val idxSide = docs.where(col("doc_id") % 3 =!= 0)
      val batch = docs.where(col("doc_id") % 3 === 0)
      val dir = tmpDir(s"lshidx$seed")
      Dedup.saveLshIndex(idxSide.where(col("doc_id") % 2 === 0),
        "doc_id", "text", dir)
      Dedup.appendToLshIndex(spark, dir,
        idxSide.where(col("doc_id") % 2 === 1))
      val got = Dedup.matchesAgainstLshIndex(spark, dir, batch,
          maxBucket = None)
        .select(col("batch_id"), col("dup_of"), round(col("jaccard") * 1000).cast("long"))
        .as[(Long, Long, Long)].collect().toSet
      val all = Dedup.minhashLsh(docs, "doc_id", "text", maxBucket = None)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard") * 1000).cast("long"))
        .as[(Long, Long, Long)].collect()
      val expected = all.flatMap { case (a, b, j) =>
        (a % 3, b % 3) match {
          case (0, x) if x != 0 => Some((a, b, j))
          case (x, 0) if x != 0 => Some((b, a, j))
          case _ => None
        }
      }.toSet
      assert(got == expected, s"seed $seed")
      assert(got.nonEmpty, s"seed $seed produced no cross pairs — weak fixture")
    }
  }

  test("probe and append honor the persisted shingle_n, not the default") {
    // 2-token docs shingle ONLY at width 2 — under the default width 3
    // they produce zero shingles and could never collide. A probe that
    // read meta but kept the default (the pre-r12 bug) would find nothing.
    val idx = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val batch = Seq((10L, "alpha beta"), (11L, "epsilon zeta"))
      .toDF("doc_id", "text")
    val dir = tmpDir("lshn2")
    Dedup.saveLshIndex(idx, "doc_id", "text", dir, shingleN = 2)
    val got = Dedup.matchesAgainstLshIndex(spark, dir, batch,
        maxBucket = None)
      .select("batch_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L)), s"got $got")
    // append under the frozen width-2 geometry: the appended copy collides
    Dedup.appendToLshIndex(spark, dir,
      Seq((3L, "epsilon zeta")).toDF("doc_id", "text"))
    val got2 = Dedup.matchesAgainstLshIndex(spark, dir, batch,
        maxBucket = None)
      .select("batch_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(got2 == Set((10L, 1L), (11L, 3L)), s"got $got2")
  }

  test("batch-side degenerate buckets are capped like index-side ones") {
    // 60 identical batch docs collide with one indexed copy in every band:
    // with maxBucket = 50 the BATCH bucket (60 > 50) must be dropped too,
    // while a distinct batch doc with a small bucket still matches.
    val idx = Seq((1L, "a b c d e f g h"), (2L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val dir = tmpDir("lshbcap")
    Dedup.saveLshIndex(idx, "doc_id", "text", dir)
    val batch = ((100L until 160L).map(i => (i, "a b c d e f g h")) :+
      (200L, "p q r s t u v w")).toDF("doc_id", "text")
    val got = Dedup.matchesAgainstLshIndex(spark, dir, batch,
        maxBucket = Some(50))
      .select("batch_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(got == Set((200L, 2L)), s"got $got")
  }

  test("compactLshIndex: fewer files, identical probes; replay repair") {
    val docs = corpus(42)
    val idxSide = docs.where(col("doc_id") % 3 =!= 0)
    val batch = docs.where(col("doc_id") % 3 === 0)
    val dir = tmpDir("lshcpt")
    Dedup.saveLshIndex(idxSide.where(col("doc_id") % 2 === 0),
      "doc_id", "text", dir)
    val appended = idxSide.where(col("doc_id") % 2 === 1)
    Dedup.appendToLshIndex(spark, dir, appended)
    def probe() = Dedup.matchesAgainstLshIndex(spark, dir, batch,
        maxBucket = None)
      .select(col("batch_id"), col("dup_of"),
        round(col("jaccard") * 1000).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    val before = probe()
    val filesBefore = graft.operators.IndexFiles.dataFileCount(spark, dir, "bands")
    Dedup.compactLshIndex(spark, dir)
    assert(graft.operators.IndexFiles.dataFileCount(spark, dir, "bands") < filesBefore,
      "compaction must shrink the bands file count")
    assert(probe() == before, "layout compaction changed probe results")
    // replay the appended half, repair with dedupeRows — probes identical
    Dedup.appendToLshIndex(spark, dir, appended)
    Dedup.compactLshIndex(spark, dir, dedupeRows = true)
    assert(probe() == before, "replay repair diverged")
  }

  test("dedupBatchAgainstLshIndex keeps exactly the unmatched batch docs") {
    val docs = corpus(99)
    val idxSide = docs.where(col("doc_id") % 3 =!= 0)
    val batch = docs.where(col("doc_id") % 3 === 0)
    val dir = tmpDir("lshsurv")
    Dedup.saveLshIndex(idxSide, "doc_id", "text", dir)
    val matched = Dedup.matchesAgainstLshIndex(spark, dir, batch,
        maxBucket = None)
      .where(col("jaccard") >= 0.5)
      .select("batch_id").as[Long].collect().toSet
    val survivors = Dedup.dedupBatchAgainstLshIndex(spark, dir, batch,
        jaccardThreshold = 0.5, maxBucket = None)
      .select("doc_id").as[Long].collect().toSet
    val batchIds = batch.select("doc_id").as[Long].collect().toSet
    assert(survivors == (batchIds -- matched))
    assert(matched.nonEmpty && survivors.nonEmpty)
  }

  test("maxBucket drops degenerate index buckets, None keeps them") {
    val boiler = (0L until 30L).map(i => (i, "same words all over again here please"))
      .toDF("doc_id", "text")
    val dir = tmpDir("lshcap")
    Dedup.saveLshIndex(boiler, "doc_id", "text", dir)
    val probe = Seq((1000L, "same words all over again here please"))
      .toDF("doc_id", "text")
    val capped = Dedup.matchesAgainstLshIndex(spark, dir, probe,
      maxBucket = Some(10)).count()
    val uncapped = Dedup.matchesAgainstLshIndex(spark, dir, probe,
      maxBucket = None).count()
    assert(capped == 0L)
    assert(uncapped == 30L)
  }
}
