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
