package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Text
import graft.plans.NativeNormalize

/** Unicode canonicalization: the static kernels against java.text
  * reference behavior, the ASCII fast path, and the Column forms through
  * codegen including null propagation.
  */
class NormalizeSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("nfc composes decomposed sequences; ASCII fast path returns input") {
    assert(NativeNormalize.nfc(u("é")).toString == "é")
    assert(NativeNormalize.nfc(u("café au lait")).toString ==
      "café au lait")
    val ascii = u("plain ascii only")
    assert(NativeNormalize.nfc(ascii) eq ascii) // no allocation on ASCII
    // already-NFC non-ASCII also returns the input object
    val nfc = u("café")
    assert(NativeNormalize.nfc(nfc) eq nfc)
  }

  test("stripAccents removes Mn marks over a character zoo") {
    val cases = Seq(
      "déjà vu" -> "deja vu",
      "élève" -> "eleve", // fully decomposed input
      "ñ ç ü Å" -> "n c u A",
      "São Paulo" -> "Sao Paulo",
      "naïve" -> "naive",
      "no accents here" -> "no accents here")
    cases.foreach { case (in, want) =>
      assert(NativeNormalize.stripAccents(u(in)).toString == want, in)
    }
    val ascii = u("untouched")
    assert(NativeNormalize.stripAccents(ascii) eq ascii)
  }

  test("Column forms run in codegen with null propagation") {
    val df = Seq(Some("résumé"), Some("plain"), None)
      .toDF("t")
      .select(Text.nfc(col("t")).as("nf"),
        Text.stripAccents(Text.nfc(col("t"))).as("norm"))
    val got = df.as[(Option[String], Option[String])].collect().toSet
    assert(got == Set(
      (Some("résumé"), Some("resume")),
      (Some("plain"), Some("plain")),
      (None, None)))
  }

  test("normalization closes the decomposed-vs-precomposed dedup hole") {
    // the motivating property: without nfc the two spellings hash apart
    val df = Seq((1L, "café"), (2L, "café")).toDF("id", "t")
    val raw = df.select(Text.hash48(col("t")).as("h"))
      .distinct().count()
    val norm = df.select(Text.hash48(Text.nfc(col("t"))).as("h"))
      .distinct().count()
    assert(raw == 2L && norm == 1L)
  }
}
