package graft.functions

/** DuckDB/ANSI SQL mirrors of [[Text]] — identical integer arithmetic, so
  * the driver's oracle matches the Spark results exactly. Each method emits
  * a SQL fragment over a column/expression name.
  */
object TextSql {
  import Text.P

  def tokens(text: String): String = s"string_split_regex($text, '\\s+')"

  def bpeTokens(text: String): String =
    s"regexp_extract_all($text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]')"

  def shingles(toks: String, n: Int = 3): String = {
    val concat = (0 until n).map(d => if (d == 0) s"$toks[i]" else s"$toks[i+$d]")
      .mkString(" || ' ' || ")
    s"(CASE WHEN len($toks) >= $n THEN list_transform(range(1, len($toks) - ${n - 2}), i -> $concat) ELSE [] END)"
  }

  def hash48(s: String): String =
    s"CAST(('0x' || substring(md5($s), 1, 12)) AS BIGINT)"

  def hashMod(s: String): String = s"(${hash48(s)} % $P)"

  def hashedArray(arr: String): String =
    s"list_transform($arr, s -> ${hashMod("s")})"

  def minhashSigExprs(hashed: String, k: Int): Seq[String] =
    Text.hashCoefs(k).map { case (a, b) =>
      s"list_min(list_transform($hashed, h -> (h * $a + $b) % $P))"
    }

  def simhash(hashed48: String, bits: Int): String =
    (0 until bits).map { k =>
      val s = s"list_sum(list_transform($hashed48, h -> ((h >> $k) & 1) * 2 - 1))"
      s"(CASE WHEN $s > 0 THEN CAST(${1L << k} AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")

  def fingerprint(toks: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(list_zip(${hashedArray(toks)}, range(1, len($toks) + 1)), " +
      s"p -> (p[1] % 1000003) * p[2])), (acc, x) -> (acc + x) % $P)"

  def vocabCount(toks: String, vocab: Seq[String]): String = {
    val lst = vocab.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($toks, t -> list_contains($lst, t)))"
  }

  def punctRatio(text: String): String =
    s"(CAST(length(regexp_replace($text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / CAST(length($text) AS DOUBLE))"

  def langId(toks: String): String = {
    val scores = Text.stopwords.map { case (lang, words) => lang -> vocabCount(toks, words) }
    val maxScore = scores.map(_._2).mkString("greatest(", ", ", ")")
    val chain = scores.reverse.foldLeft("'und'") { case (rest, (lang, sc)) =>
      s"CASE WHEN $sc = $maxScore THEN '$lang' ELSE $rest END"
    }
    s"(CASE WHEN $maxScore = 0 THEN 'und' ELSE $chain END)"
  }

  def qualityScore(text: String, toks: String): String = {
    val nTok = s"CAST(len($toks) AS DOUBLE)"
    val lenScore = s"least($nTok / 100.0, 1.0)"
    val punctScore = s"(1.0 - least(${punctRatio(text)} * 10.0, 1.0))"
    val stopRatio = s"(CAST(${vocabCount(toks, Text.stopwords.flatMap(_._2))} AS DOUBLE) / $nTok)"
    val meanLen = s"((CAST(length($text) AS DOUBLE) - $nTok + 1.0) / $nTok)"
    s"(0.3 * $lenScore + 0.3 * $punctScore + 0.2 * $stopRatio + 0.2 * least($meanLen / 8.0, 1.0))"
  }
}
