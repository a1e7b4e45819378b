package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** bpe_encode(text, merges) — EXACT byte-pair-encoding application
  * (Sennrich et al. 2016): each space-separated word starts as its
  * character sequence; merges apply in RANK order (each merge is the
  * string "left right", rank = array position): repeatedly pick the
  * present adjacent pair with the lowest rank and fuse all its
  * occurrences leftmost-first, until no ranked pair remains. This is
  * the canonical algorithm (greedy-longest-match wordpiece_encode is
  * the faster approximation; this one reproduces a trained tokenizer
  * bit-for-bit). Pairs with TextAnalysis.bpeLearn, whose output rows
  * ARE this vocabulary.
  *
  * Scale: the merge table is a foldable literal (or a small collected
  * learn result) indexed ONCE per executor into a rank map; each row is
  * O(len × merges-applied) inside the projection — scan speed, no UDF. */
case class BpeEncode(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, ArrayType(_: StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode requires (string, array<string> of 'left right' " +
          s"merges), got ${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  private final case class MergeIndex(
      ranks: Map[(String, String), Int], pairs: Array[(String, String)])

  private def index(a: ArrayData): MergeIndex = {
    val pairs = (0 until a.numElements()).filterNot(a.isNullAt).map { i =>
      val m = a.getUTF8String(i).toString
      val sp = m.indexOf(' ')
      require(sp > 0 && sp < m.length - 1,
        s"bpe_encode: merge entries are 'left right', got '$m'")
      (m.substring(0, sp), m.substring(sp + 1))
    }.toArray
    MergeIndex(pairs.zipWithIndex.toMap, pairs)
  }

  @transient private lazy val staticIndex: Option[MergeIndex] =
    if (right.foldable)
      Option(right.eval(null)).map(v => index(v.asInstanceOf[ArrayData]))
    else None

  private def encodeWord(word: String, idx: MergeIndex,
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    val ranks = idx.ranks
    var sym = word.map(String.valueOf(_)).toBuffer
    var done = false
    while (!done && sym.length > 1) {
      // lowest-rank adjacent pair present
      var best = Int.MaxValue
      var i = 0
      while (i < sym.length - 1) {
        ranks.get((sym(i), sym(i + 1))).foreach(r => if (r < best) best = r)
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = idx.pairs(best)
        val next = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < sym.length) {
          if (j < sym.length - 1 && sym(j) == a && sym(j + 1) == b) {
            next += a + b
            j += 2
          } else {
            next += sym(j)
            j += 1
          }
        }
        sym = next
      }
    }
    sym.foreach(t => out += UTF8String.fromString(t))
  }

  override protected def nullSafeEval(t: Any, v: Any): Any = {
    val s = t.asInstanceOf[UTF8String].toString
    val idx = staticIndex.getOrElse(index(v.asInstanceOf[ArrayData]))
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) encodeWord(s.substring(start, i), idx, out)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)
}
