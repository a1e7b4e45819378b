package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MyanmarText

/** Myanmar i18n functions (functions/MyanmarFunctions.scala). The pinned
  * values are the reference's own test vectors
  * (presto-i18n-functions/.../TestMyanmarFunctions.java:41-59), spelled
  * as \u escapes so the exact codepoints are auditable, plus reordering
  * cases the rule set must handle (pre-base E vowel and medial RA). */
class MyanmarSpec extends AnyFunSuite {
  import TestSpark._

  // the reference's vectors, verbatim
  private val zgSample = "\u1021\u101E\u1004\u1039\u1038\u1019\u103D"
  private val zgSampleU = "\u1021\u101E\u1004\u103A\u1038\u1019\u103E"
  private val uniSample = "\u1000\u103B\u103D\u1014\u103A\u102F\u1015\u103A"

  private def one(expr: String): Any = {
    functions.GraftFunctions.register(spark)
    spark.sql(s"SELECT $expr AS v").collect()(0).get(0)
  }

  test("font encoding: the reference's pinned vectors") {
    assert(one("myanmar_font_encoding(CAST(NULL AS STRING))") == null)
    assert(one("myanmar_font_encoding('english string')") == "unicode")
    assert(one("myanmar_font_encoding('\u1095')") == "zawgyi")
    assert(one(s"myanmar_font_encoding('$zgSample')") == "zawgyi")
    assert(one(s"myanmar_font_encoding('$uniSample')") == "unicode")
  }

  test("normalize: the reference's pinned vectors (incl. per-line gate)") {
    assert(one("myanmar_normalize_unicode(CAST(NULL AS STRING))") == null)
    assert(one("myanmar_normalize_unicode('english string')") == "english string")
    assert(one(s"myanmar_normalize_unicode('$zgSample')") == zgSampleU)
    assert(one(s"myanmar_normalize_unicode('$uniSample')") == uniSample)
    // two lines: the unicode line passes through, the zawgyi line converts
    assert(one(s"myanmar_normalize_unicode('$uniSample\\n$zgSample')") ==
      s"$uniSample\n$zgSampleU")
  }

  test("pre-base reorderings: E vowel and medial RA move after the cluster") {
    // Zawgyi E+KA (ေက) → Unicode KA+E (ကေ)
    assert(MyanmarText.z2u("\u1031\u1000") == "\u1000\u1031")
    // Zawgyi E + medial-RA variant + MA (ေၾမ) → MA+RA+E
    assert(MyanmarText.z2u("\u1031\u107E\u1019") == "\u1019\u103C\u1031")
    // pre-base E + KA + Zawgyi medial-ya (် → ျ): medial stays
    // before the vowel: ေက် → ကျေ
    assert(MyanmarText.z2u("\u1031\u1000\u103A") == "\u1000\u103B\u1031")
    // detector: pre-base E at line start is a Zawgyi signal
    assert(MyanmarText.isZawgyi("\u1031\u1000"))
    assert(!MyanmarText.isZawgyi("\u1000\u1031"))
  }

  test("stacked consonant forms expand to stacker + consonant") {
    // Zawgyi ၠ (stacked KA) → ္က
    assert(MyanmarText.z2u("\u1000\u1060") == "\u1000\u1039\u1000")
    assert(MyanmarText.isZawgyi("\u1000\u1060"))
  }
}
