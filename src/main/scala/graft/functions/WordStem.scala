package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stemmer (Porter 1980, "An algorithm for suffix stripping" —
  * public-domain specification). The reference's word_stem
  * (MAIN/operator/scalar/WordStemFunction.java) delegates to Lucene's
  * Porter implementation; this is an independent implementation of the same
  * published algorithm. Lower-case ASCII words are stemmed; anything else
  * passes through unchanged (the reference's behavior for non-letter input).
  */
object PorterStemmer {

  private def isVowelAt(w: Array[Char], i: Int): Boolean = w(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowelAt(w, i - 1)
    case _ => false
  }

  /** measure m of w[0..end]: number of VC sequences in [C](VC)^m[V]. */
  private def measure(w: Array[Char], end: Int): Int = {
    var m = 0
    var i = 0
    // skip initial consonants
    while (i <= end && !isVowelAt(w, i)) i += 1
    while (i <= end) {
      // in vowel run
      while (i <= end && isVowelAt(w, i)) i += 1
      if (i <= end) {
        m += 1
        while (i <= end && !isVowelAt(w, i)) i += 1
      }
    }
    m
  }

  private def containsVowel(w: Array[Char], end: Int): Boolean =
    (0 to end).exists(isVowelAt(w, _))

  /** double consonant at end. */
  private def doubleC(w: Array[Char], end: Int): Boolean =
    end >= 1 && w(end) == w(end - 1) && !isVowelAt(w, end)

  /** cvc at end where the final c is not w, x or y. */
  private def cvc(w: Array[Char], end: Int): Boolean =
    end >= 2 && !isVowelAt(w, end - 2) && isVowelAt(w, end - 1) &&
      !isVowelAt(w, end) && w(end) != 'w' && w(end) != 'x' && w(end) != 'y'

  def stem(word: String): String = {
    if (word.length <= 2 || !word.forall(c => c >= 'a' && c <= 'z')) return word
    var w = word.toCharArray
    var end = w.length - 1 // index of last char

    def ends(s: String): Boolean = {
      val n = s.length
      end + 1 >= n && (0 until n).forall(i => w(end - n + 1 + i) == s.charAt(i))
    }
    def stemEnd(s: String): Int = end - s.length // end index of stem before suffix
    def setTo(suffix: String, repl: String): Unit = {
      val keep = end - suffix.length + 1
      val nw = new Array[Char](keep + repl.length)
      System.arraycopy(w, 0, nw, 0, keep)
      repl.copyToCharArray(nw, keep)
      w = nw
      end = nw.length - 1
    }
    def r(suffix: String, repl: String, minM: Int): Boolean =
      if (ends(suffix) && measure(w, stemEnd(suffix)) > minM - 1) {
        setTo(suffix, repl); true
      } else false

    // Step 1a
    if (ends("sses")) setTo("sses", "ss")
    else if (ends("ies")) setTo("ies", "i")
    else if (!ends("ss") && ends("s")) setTo("s", "")

    // Step 1b
    var fired = false
    if (ends("eed")) {
      if (measure(w, stemEnd("eed")) > 0) setTo("eed", "ee")
    } else if (ends("ed") && containsVowel(w, stemEnd("ed"))) {
      setTo("ed", ""); fired = true
    } else if (ends("ing") && containsVowel(w, stemEnd("ing"))) {
      setTo("ing", ""); fired = true
    }
    if (fired) {
      if (ends("at")) setTo("at", "ate")
      else if (ends("bl")) setTo("bl", "ble")
      else if (ends("iz")) setTo("iz", "ize")
      else if (doubleC(w, end) && !"lsz".contains(w(end))) end -= 1
      else if (measure(w, end) == 1 && cvc(w, end)) setTo("", "e")
      w = w.slice(0, end + 1)
    }

    // Step 1c
    if (ends("y") && containsVowel(w, end - 1)) w(end) = 'i'

    // Step 2 (m > 0)
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    step2.find(p => ends(p._1)).foreach { case (suf, rep) => r(suf, rep, 1) }

    // Step 3 (m > 0)
    val step3 = Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find(p => ends(p._1)).foreach { case (suf, rep) => r(suf, rep, 1) }

    // Step 4 (m > 1)
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous",
      "ive", "ize")
    step4.find(ends).foreach { suf =>
      val se = stemEnd(suf)
      val ok = measure(w, se) > 1 &&
        (suf != "ion" || (se >= 0 && (w(se) == 's' || w(se) == 't')))
      if (ok) setTo(suf, "")
    }

    // Step 5a
    if (ends("e")) {
      val m = measure(w, end - 1)
      if (m > 1 || (m == 1 && !cvc(w, end - 1))) setTo("e", "")
    }
    // Step 5b
    if (measure(w, end) > 1 && doubleC(w, end) && w(end) == 'l') end -= 1

    new String(w, 0, end + 1)
  }

  private implicit class CopyTo(private val s: String) extends AnyVal {
    def copyToCharArray(dst: Array[Char], at: Int): Unit = {
      var i = 0
      while (i < s.length) { dst(at + i) = s.charAt(i); i += 1 }
    }
  }

  /** UTF8String entry point for codegen. */
  def stemU(s: UTF8String): UTF8String = UTF8String.fromString(stem(s.toString))
}

/** word_stem(varchar) → varchar (reference WordStemFunction.java). */
case class WordStem(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_stem requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "word_stem"
  override protected def nullSafeEval(v: Any): Any =
    PorterStemmer.stemU(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PorterStemmer.stemU($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
