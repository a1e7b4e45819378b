package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** wordpiece_encode(text, vocab) — greedy longest-match subword
  * tokenization (the WordPiece/BPE-vocabulary APPLICATION step of a
  * training-data pipeline; the learning step is TextAnalysis.vocab's
  * induction). Reference seeds: the per-word scalar machinery of
  * word_stem (MAIN/operator/scalar/WordStemFunction.java) and ngrams
  * (ArrayNgramsFunction.java), generalized to a vocab-driven encoder.
  *
  * Contract: scan left to right; spaces (' ') separate tokens and emit
  * nothing; at each position the LONGEST vocab piece that prefixes the
  * remaining text wins; a position no piece covers emits that single
  * character (the UNK-as-char fallback), so encoding is total and
  * deterministic. detokenize(concat tokens) == strip-spaces(input) by
  * construction.
  *
  * Scale shape: the vocab is almost always a foldable literal (or a
  * small collected merge table) — it is indexed ONCE per executor into
  * a first-char bucketed longest-first table, and each row is a single
  * O(len × bucket) pass inside the projection. No shuffle, no UDF
  * serialization: at 100 TB tokenization runs at scan speed. */
case class WordPieceEncode(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, ArrayType(_: StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"wordpiece_encode requires (string, array<string>), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  private def index(a: ArrayData): Map[Char, Array[String]] = {
    val pieces = (0 until a.numElements())
      .filterNot(a.isNullAt)
      .map(i => a.getUTF8String(i).toString)
      .filter(_.nonEmpty).distinct
    pieces.groupBy(_.charAt(0))
      .map { case (c, ps) => c -> ps.sortBy(-_.length).toArray }
  }

  /** Foldable vocab (the common case): index once, not per row. */
  @transient private lazy val staticIndex: Option[Map[Char, Array[String]]] =
    if (right.foldable)
      Option(right.eval(null)).map(v => index(v.asInstanceOf[ArrayData]))
    else None

  override protected def nullSafeEval(t: Any, v: Any): Any = {
    val s = t.asInstanceOf[UTF8String].toString
    val idx = staticIndex.getOrElse(index(v.asInstanceOf[ArrayData]))
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    val n = s.length
    while (i < n) {
      val ch = s.charAt(i)
      if (ch == ' ') i += 1
      else {
        var matched: String = null
        val cands = idx.getOrElse(ch, null)
        if (cands != null) {
          var k = 0
          while (k < cands.length && matched == null) {
            val p = cands(k)
            if (i + p.length <= n && s.startsWith(p, i)) matched = p
            k += 1
          }
        }
        if (matched == null) {
          out += UTF8String.fromString(String.valueOf(ch))
          i += 1
        } else {
          out += UTF8String.fromString(matched)
          i += matched.length
        }
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordPieceEncode =
    copy(left = newLeft, right = newRight)
}
