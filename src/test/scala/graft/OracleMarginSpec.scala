package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guard-band checks for the oracles that still integerize a float chain
  * inside the engine (the VERDICT r10 ask): every score must sit a safe
  * distance from its rounding boundary at every test SF, so an
  * engine-version 1-ulp drift in `ln` (~1e-10 at micro scale) cannot flip
  * any integerized value.
  *
  * What is NOT here, and why:
  *  - BM25 (q74/q77) and DSIR (q79): their transcendentals were hoisted
  *    to driver-side Scala literals in r11 — no float chain of theirs
  *    crosses engines at all.
  *  - q42 quality / every Common.fp consumer: writing this spec found a
  *    quality score landing EXACTLY on a .5 boundary at sf0.001 (margin
  *    0.0 — the hash survived only because both engines currently round
  *    half away from zero). Since those chains are pure IEEE basic ops
  *    (bit-identical across engines), the fix was to make the
  *    integerization itself exact: Common.fp/intSum/exactMeanMilli and
  *    their SQL mirrors now use floor(x + 0.5), which is deterministic
  *    for EVERY input including exact halves, so no margin is needed.
  *  - q87 derives from q80's lm_micro with pure integer ops.
  *
  * The LM chain (q80) keeps its ln in-plan because its input cardinality
  * (distinct bigrams) is unbounded — this spec asserts its margins
  * instead. Observed minima are recorded in BASELINE.md.
  */
class OracleMarginSpec extends AnyFunSuite {
  val spark = TestSpark.spark

  /** Distance of x to its nearest half-integer rounding boundary (where
    * floor(x + 0.5) flips). */
  private def boundaryDist(x: org.apache.spark.sql.Column) =
    abs(x - floor(x) - lit(0.5))

  private val Band = 1e-4
  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  // q89's mean chain no longer needs a margin guard: since round 13
  // mean_micro derives from verifyEnu's exact integer nano-sum
  // (integerize-before-sum, order-independent by construction), not from
  // fp(avg(__d), 6) over an order-dependent double sum.

  test("q80 LM per-occurrence micro scores stay clear of rounding boundaries") {
    for (sf <- sfs) {
      val docs = graft.queries.Common.table(spark, sf, "documents")
      val m = graft.operators.Corpus
        .lmOccurrenceScores(docs, "doc_id", "text", col("lang") === "en", 0.4)
        .agg(min(boundaryDist(col("__x"))).as("m")).head().getDouble(0)
      info(s"LM min boundary distance at $sf: $m")
      assert(m > Band, s"LM margin $m at $sf inside the $Band guard band")
    }
  }
}
