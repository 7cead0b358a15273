package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

import scala.collection.mutable

/** Byte-pair-encoding tokenizer training and encoding — the subword
  * tokenization pass a training-data pipeline runs to budget documents in
  * model tokens rather than words (Sennrich et al., ACL 2016: learn the
  * most frequent adjacent symbol pair, merge it everywhere, repeat).
  *
  * Scale shape, designed for the 100 TB corpus:
  *
  *  - STATISTICS are distributed: the word histogram is one
  *    tokenize+groupBy pass over the corpus (map-side combine; the result
  *    is bounded by the DISTINCT vocabulary, not the corpus), and the
  *    initial pair statistics explode over that bounded histogram — never
  *    over the corpus itself.
  *  - TRAINING runs on the driver over the collected top-`maxWords`
  *    histogram rows (the standard practice: subword learners operate on
  *    the word-frequency table, which is vocabulary-bounded — ~1M distinct
  *    words cover essentially all mass of a natural-language corpus; the
  *    bound is explicit and the selection deterministic: count desc, word
  *    asc). The merge loop is INCREMENTAL — a pair→words index means each
  *    merge touches only the words containing it, not the whole vocab.
  *  - ENCODING is distributed and amortized: each DISTINCT word is encoded
  *    once (the merge fold runs on the histogram frame), then a word→pieces
  *    join fans the pieces back onto corpus token occurrences — per-corpus
  *    cost is one explode + one join on `word`, with the vocabulary side
  *    small enough for AQE to broadcast.
  *
  * The encode itself is PURE Column algebra (no UDF): a word's symbol
  * sequence is carried as a string with every symbol wrapped in single
  * spaces (" t  h  e " — adjacent symbols read a double space), and one
  * merge (a, b) → ab is one literal `replace(" a  b ", " ab ")`: string
  * replace scans left-to-right and resumes AFTER the replacement, which is
  * exactly the greedy non-overlapping merge pass of BPE ("a a a" under
  * (a,a) → "aa a", not "aa aa"). Folding the ranked merge list gives the
  * original apply-merges-in-learned-order encoder, whole-stage-codegen'd,
  * and the identical fold is expressible verbatim in the DuckDB oracle
  * (`replace` has the same semantics there) — see
  * [[graft.queries.TextQueries]] q81/q81b.
  */
object Bpe {

  /** (word, cnt) over the corpus — one tokenize + one hash aggregate;
    * output size is the distinct vocabulary.
    */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Text.tokens(col(textCol))).as("word"))
      .where(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Adjacent character-pair counts weighted by word frequency — the
    * statistic BPE's first iteration maximizes, over a (word, cnt)
    * histogram (see [[wordHistogram]]; pre-filter the histogram to
    * restrict the vocabulary). The explode is over the bounded histogram.
    * Output: (pair, cnt).
    */
  def pairStatsFromHistogram(hist: DataFrame): DataFrame =
    hist.where(length(col("word")) >= 2)
      .select(explode(transform(
          sequence(lit(1), length(col("word")) - 1),
          i => concat(col("word").substr(i, lit(1)),
            col("word").substr(i + lit(1), lit(1))))).as("pair"),
        col("cnt"))
      .groupBy("pair").agg(sum("cnt").as("cnt"))

  /** [[pairStatsFromHistogram]] over the corpus' full histogram. */
  def pairStats(docs: DataFrame, textCol: String): DataFrame =
    pairStatsFromHistogram(wordHistogram(docs, textCol))

  /** Train `nMerges` BPE merges on the corpus. Distributed histogram,
    * driver merge loop over the top `maxWords` rows (count desc, word asc
    * — the explicit, deterministic driver bound). Pair selection is
    * max-count with lexicographic (a, b) tie-break; training stops early
    * when no pair occurs twice. Returns merges in learned order.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 1000000): Seq[(String, String)] = {
    val hist = wordHistogram(docs, textCol)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromHistogram(hist, nMerges)
  }

  /** Split a word into Unicode CODE POINTS (not UTF-16 code units): the
    * distributed wrap `regexp_replace(word, "(.)", ...)` matches `.`
    * against a full code point (Java regex and DuckDB's RE2 alike), so the
    * driver-side twins must split identically or supplementary-plane text
    * (emoji, rare CJK — routine in web corpora) trains merges containing
    * lone surrogates that `lit()` then corrupts, silently diverging encode
    * from training.
    */
  private[operators] def codePoints(w: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** The driver-side merge loop, exposed for property tests. Incremental:
    * `pairWords` indexes which words contain each pair, so one merge
    * rescans only those words' symbol lists.
    */
  def trainFromHistogram(hist: Seq[(String, Long)],
      nMerges: Int): Seq[(String, String)] = {
    val words: Array[Array[String]] =
      hist.map(h => codePoints(h._1)).toArray
    val counts: Array[Long] = hist.map(_._2).toArray
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]

    def indexWord(wi: Int): Unit = {
      val s = words(wi)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + counts(wi)
        pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
        i += 1
      }
    }

    (0 until words.length).foreach(indexWord)

    /** Greedy left-to-right merge of (a,b)→ab in one symbol list — resumes
      * after the merged symbol, matching string `replace` semantics.
      */
    def applyMerge(s: Array[String], a: String, b: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += s(i); i += 1 }
      }
      out.toArray
    }

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    while (step < nMerges && pairCounts.nonEmpty) {
      // deterministic regardless of map iteration order: max count, then
      // lexicographically smallest (a, b)
      val best = pairCounts.reduceLeft { (x, y) =>
        if (y._2 > x._2) y
        else if (y._2 == x._2 &&
          (y._1._1 < x._1._1 ||
            (y._1._1 == x._1._1 && y._1._2 < x._1._2))) y
        else x
      }
      if (best._2 < 2) return merges.toSeq // a pair seen once merges nothing useful
      val (a, b) = best._1
      merges += ((a, b))
      val touched = pairWords.getOrElse((a, b), mutable.Set.empty).toArray
      touched.foreach { wi =>
        val oldS = words(wi)
        // retract the old symbol list's pair contributions + memberships
        var i = 0
        while (i < oldS.length - 1) {
          val p = (oldS(i), oldS(i + 1))
          val c = pairCounts.getOrElse(p, 0L) - counts(wi)
          if (c == 0L) pairCounts.remove(p) else pairCounts(p) = c
          i += 1
        }
        val newS = applyMerge(oldS, a, b)
        words(wi) = newS
        val newPairs = (0 until newS.length - 1).map(j => (newS(j), newS(j + 1))).toSet
        // memberships: drop from pairs the word no longer contains, add new
        val oldPairs = (0 until oldS.length - 1).map(j => (oldS(j), oldS(j + 1))).toSet
        (oldPairs -- newPairs).foreach(p => pairWords.get(p).foreach(_ -= wi))
        i = 0
        while (i < newS.length - 1) {
          val p = (newS(i), newS(i + 1))
          val c = pairCounts.getOrElse(p, 0L) + counts(wi)
          if (c == 0L) pairCounts.remove(p) else pairCounts(p) = c
          pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
          i += 1
        }
      }
      pairCounts.remove((a, b))
      pairWords.remove((a, b))
      step += 1
    }
    merges.toSeq
  }

  /** Persist a trained merge list as a rank-ordered parquet table — the
    * train-once/encode-many artifact (the tokenizer model a 100 TB corpus
    * trains on one pass and every later ingest batch loads). Tiny by
    * construction (nMerges rows), one file.
    */
  def saveBpeModel(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], dir: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a persisted merge list in learned order. Ranks are `require`d
    * contiguous from 0 — a partially-written model must fail loudly, not
    * silently encode under a truncated merge table.
    */
  def loadBpeModel(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(String, String)] = {
    val rows = spark.read.parquet(dir).select("rank", "a", "b").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1)
    require(rows.map(_._1).sameElements(0 until rows.length),
      s"bpe model at $dir has non-contiguous merge ranks")
    rows.map(t => (t._2, t._3)).toSeq
  }

  /** The wrapped symbol-string form: every character becomes " c ", so a
    * symbol boundary reads "  " and the string starts/ends with one space.
    */
  private def wrapChars(word: Column): Column =
    regexp_replace(word, "(.)", " $1 ")

  /** Encode one word column under a ranked merge list: fold each merge as
    * one literal string replace over the wrapped form, then split the
    * surviving "  " boundaries. Returns array&lt;string&gt; of pieces whose
    * concatenation is the word. Pure codegen — no UDF.
    *
    * BOUND: the fold nests one `replace` call per merge, so the Catalyst
    * expression tree is O(nMerges) deep — fine for the few-hundred-merge
    * models the oracle queries train, but a realistic 10k-50k-merge
    * tokenizer would blow analysis/codegen. [[encodeCorpus]] switches to
    * the JVM-loop vocabulary encoder past `maxFoldMerges` for exactly
    * that reason; use that entry point for production-size models.
    */
  def encodeToken(word: Column, merges: Seq[(String, String)]): Column = {
    val folded = merges.foldLeft(wrapChars(word)) { case (s, (a, b)) =>
      call_function("replace", s, lit(s" $a  $b "), lit(s" ${a + b} "))
    }
    split(trim(folded), "  ")
  }

  /** Driver-side twin of [[encodeToken]] (fold merges in order, each a
    * greedy left-to-right pass) — for property tests and small batches.
    */
  def encodeWordDriver(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var syms: Array[String] = codePoints(word)
    merges.foreach { case (a, b) =>
      // a merge can only fire if its concatenation appears in the word
      // (adjacent symbols concatenate to a substring of the word), so an
      // indexOf prune makes the fold O(applicable merges), which is what
      // lets [[encodeCorpus]]'s JVM path carry realistic 10k-50k-merge
      // models the Catalyst fold cannot.
      if (word.contains(a + b)) {
        val out = mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
    }
    syms.toSeq
  }

  /** Distributed corpus encode, amortized over the vocabulary: encode each
    * DISTINCT word once (the merge fold runs |vocab| times, not |corpus|
    * times), then join pieces back onto exploded token occurrences. The
    * vocabulary side is histogram-bounded — AQE broadcasts it at runtime.
    * Output: (idCol, tok_pos, word, pieces, n_pieces).
    */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)],
      maxFoldMerges: Int = 512): DataFrame = {
    val hist = wordHistogram(docs, textCol)
    val vocabPieces =
      if (merges.size <= maxFoldMerges)
        hist.select(col("word"), encodeToken(col("word"), merges).as("pieces"))
      else {
        // Production-size models (10k-50k merges): the Catalyst replace
        // fold would nest one call per merge and blow analysis/codegen,
        // so run the IDENTICAL greedy fold as a JVM loop over the
        // vocabulary-bounded histogram instead — still one encode per
        // DISTINCT word, merges shipped once per task in the closure,
        // no-op merges pruned by substring containment.
        val spark = docs.sparkSession
        import spark.implicits._
        val ms = merges.toIndexedSeq
        hist.select(col("word")).as[String]
          .mapPartitions(_.map(w => (w, encodeWordDriver(w, ms))))
          .toDF("word", "pieces")
      }
    docs.select(col(idCol),
        posexplode(Text.tokens(col(textCol))).as(Seq("tok_pos", "word")))
      .where(length(col("word")) >= 1)
      .join(vocabPieces, "word")
      .select(col(idCol), col("tok_pos"), col("word"), col("pieces"),
        size(col("pieces")).cast("long").as("n_pieces"))
  }
}
