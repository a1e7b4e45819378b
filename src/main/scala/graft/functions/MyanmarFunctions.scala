package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Myanmar i18n functions — the reference's presto-i18n-functions plugin
  * (I18nMyanmarFunctions.java): `myanmar_font_encoding(s)` labels a string
  * 'zawgyi' or 'unicode', `myanmar_normalize_unicode(s)` transliterates
  * Zawgyi-encoded lines to standard Unicode (line-by-line on \n, each line
  * converted only when detected as Zawgyi — I18nMyanmarFunctions.java:63).
  *
  * Documented deviation: the reference delegates to Google myanmar-tools
  * (a trained Markov-model ZawgyiDetector + ICU transliteration rules);
  * this is an independent rule-based implementation of the same public
  * knowledge — Zawgyi's codepoint reuse of the U+1000 block is well
  * documented (Unicode TN 11; myanmar-tools' published mapping): the
  * detector keys on Zawgyi-exclusive codepoints and sequences that are
  * ill-formed in standard Unicode Myanmar, and the transliterator applies
  * the standard Z2U codepoint map plus the two famous reorderings
  * (pre-base E vowel U+1031 and pre-base medial RA move after their
  * consonant cluster).
  */
object MyanmarText {

  private def isMyanmarConsonant(c: Char): Boolean = c >= 0x1000 && c <= 0x1021

  /** Zawgyi-vs-Unicode classification of one string. */
  def isZawgyi(s: String): Boolean = {
    var i = 0
    val n = s.length
    var zawgyi = false
    while (i < n && !zawgyi) {
      val c = s.charAt(i)
      c match {
        // Zawgyi-exclusive codepoints (standard Unicode Myanmar leaves
        // these unassigned to text in this role: Zawgyi medials, stacked
        // consonant forms, dot-below variants, the 105A vowel sign)
        case x if x >= 0x1060 && x <= 0x1097 => zawgyi = true
        case 0x1033 | 0x1034 | 0x105A => zawgyi = true
        // Zawgyi asat: U+1039 not followed by a stackable consonant is
        // ill-formed in Unicode (where 1039 is the stacker and 103A asat)
        case 0x1039 =>
          if (i + 1 >= n || !isMyanmarConsonant(s.charAt(i + 1))) zawgyi = true
        // pre-base E vowel: in Unicode U+1031 always follows a consonant
        // or medial; Zawgyi stores it before the consonant
        case 0x1031 =>
          if (i == 0) zawgyi = true
          else {
            val p = s.charAt(i - 1)
            if (!isMyanmarConsonant(p) && !(p >= 0x103B && p <= 0x103E) &&
              p != 0x103F) zawgyi = true
          }
        case _ => ()
      }
      i += 1
    }
    zawgyi
  }

  def fontEncoding(s: String): String = if (isZawgyi(s)) "zawgyi" else "unicode"

  /** Zawgyi→Unicode single-codepoint substitutions (the standard public
    * Z2U table core: medial chain shift 103A..103D → 103B..103E, Zawgyi
    * asat 1039 → 103A, vowel signs 1033/1034, dot-below 1094/1095,
    * great SA 1086, NYA variants). */
  private val charMap: Map[Char, String] = Map(
    // vowel signs u/uu (Zawgyi tall forms)
    '\u1033' -> "\u102F", '\u1034' -> "\u1030",
    // asat + the medial chain shift (Zawgyi 1039/103A..103D are one off
    // from Unicode 103A/103B..103E)
    '\u1039' -> "\u103A", '\u103A' -> "\u103B",
    '\u103B' -> "\u103C", '\u103C' -> "\u103D", '\u103D' -> "\u103E",
    // dot below, great SA, NYA variants, -aa + asat, vowel -e variants
    '\u1094' -> "\u1037", '\u1095' -> "\u1037",
    '\u1086' -> "\u103F",
    '\u106A' -> "\u1009", '\u106B' -> "\u100A",
    '\u105A' -> "\u102B\u103A",
    // composed medial-ha clusters
    '\u1087' -> "\u103E", '\u1088' -> "\u103E\u102F",
    '\u1089' -> "\u103E\u1030", '\u108A' -> "\u103D\u103E",
    // kinzi + vowel composites (kinzi spelled base-first per Unicode)
    '\u1064' -> "\u1004\u103A\u1039",
    '\u108B' -> "\u1004\u103A\u1039\u102D",
    '\u108C' -> "\u1004\u103A\u1039\u102E",
    '\u108D' -> "\u1004\u103A\u1039\u1036",
    '\u108E' -> "\u102D\u1036",
    // Zawgyi medial-RA glyph variants — all pre-base, all → U+103C
    '\u107E' -> "\u103C", '\u107F' -> "\u103C", '\u1080' -> "\u103C",
    '\u1081' -> "\u103C", '\u1082' -> "\u103C", '\u1083' -> "\u103C",
    '\u1084' -> "\u103C",
    // tall/variant signs
    '\u1090' -> "\u101B", '\u1096' -> "\u1039\u1010\u103D",
    // stacked consonant forms → stacker (U+1039) + consonant
    '\u1060' -> "\u1039\u1000", '\u1061' -> "\u1039\u1001",
    '\u1062' -> "\u1039\u1002", '\u1063' -> "\u1039\u1003",
    '\u1065' -> "\u1039\u1005", '\u1066' -> "\u1039\u1006",
    '\u1067' -> "\u1039\u1006", '\u1068' -> "\u1039\u1007",
    '\u1069' -> "\u1039\u1008", '\u106C' -> "\u1039\u100B",
    '\u106D' -> "\u1039\u100C", '\u106E' -> "\u100D\u1039\u100D",
    '\u106F' -> "\u100D\u1039\u100E", '\u1070' -> "\u1039\u100F",
    '\u1071' -> "\u1039\u1010", '\u1072' -> "\u1039\u1010",
    '\u1073' -> "\u1039\u1011", '\u1074' -> "\u1039\u1011",
    '\u1075' -> "\u1039\u1012", '\u1076' -> "\u1039\u1013",
    '\u1077' -> "\u1039\u1014", '\u1078' -> "\u1039\u1015",
    '\u1079' -> "\u1039\u1016", '\u107A' -> "\u1039\u1017",
    '\u107B' -> "\u1039\u1018", '\u107C' -> "\u1039\u1019",
    '\u1085' -> "\u1039\u101C", '\u1093' -> "\u1039\u1018",
    '\u1091' -> "\u100F\u1039\u100D", '\u1092' -> "\u100B\u1039\u100C",
    '\u1097' -> "\u100B\u1039\u100B")

  /** Convert one Zawgyi line to Unicode: codepoint map, then the two
    * pre-base reorderings. */
  def z2u(line: String): String = {
    val mapped = new StringBuilder
    line.foreach(c => mapped.append(charMap.getOrElse(c, c.toString)))
    reorder(mapped.toString)
  }

  /** Move pre-base U+1031 (E vowel, possibly doubled) and pre-base
    * U+103C (medial RA after mapping) behind their consonant cluster:
    * Zawgyi visual order `[1031] [103C] C [medials]` → Unicode logical
    * order `C [103C] [medials] 1031`. */
  private def reorder(s: String): String = {
    val out = new StringBuilder
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == 0x1031 || c == 0x103C) {
        // collect the run of pre-base marks
        var eCount = 0
        var ra = false
        var j = i
        var run = true
        while (j < n && run) s.charAt(j) match {
          case 0x1031 => eCount += 1; j += 1
          case 0x103C => ra = true; j += 1
          case _ => run = false
        }
        if (j < n && isMyanmarConsonant(s.charAt(j))) {
          out.append(s.charAt(j)); j += 1
          if (ra) out.append('\u103C')
          // carry the consonant's other medials before the E vowel
          while (j < n && s.charAt(j) >= 0x103B && s.charAt(j) <= 0x103E) {
            out.append(s.charAt(j)); j += 1
          }
          out.append("\u1031" * eCount)
          i = j
        } else { // no consonant to attach to — emit as-is
          if (ra) out.append('\u103C')
          out.append("\u1031" * eCount)
          i = j
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Line-by-line normalization, converting only detected-Zawgyi lines
    * (the reference's per-line gate, I18nMyanmarFunctions.java:63-71). */
  def normalize(s: String): String =
    s.split("\n", -1).map(l => if (isZawgyi(l)) z2u(l) else l).mkString("\n")

  // UTF8String entry points for codegen
  def fontEncodingU(s: UTF8String): UTF8String =
    UTF8String.fromString(fontEncoding(s.toString))
  def normalizeU(s: UTF8String): UTF8String =
    UTF8String.fromString(normalize(s.toString))
}

/** myanmar_font_encoding(varchar) → 'zawgyi' | 'unicode'. */
case class MyanmarFontEncoding(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"myanmar_font_encoding requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "myanmar_font_encoding"
  override protected def nullSafeEval(v: Any): Any =
    MyanmarText.fontEncodingU(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MyanmarText.fontEncodingU($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** myanmar_normalize_unicode(varchar) → varchar. */
case class MyanmarNormalizeUnicode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"myanmar_normalize_unicode requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "myanmar_normalize_unicode"
  override protected def nullSafeEval(v: Any): Any =
    MyanmarText.normalizeU(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MyanmarText.normalizeU($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
