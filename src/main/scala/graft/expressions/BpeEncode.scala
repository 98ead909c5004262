package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `BpeEncode(text, merges)` — tokenize with a LEARNED BPE merge
  * table ([[graft.operators.Bpe]]): whitespace words (the caller
  * lower-cases — [[graft.operators.Bpe.encode]] does, matching the
  * fit's casing) → character symbols (end-of-word sentinel) → merges
  * applied in learned priority order. The merge table is expression state
  * (≤4096 pairs — task-serialized once per partition like any
  * literal), so the encode is one distributed projection with zero
  * shuffle and zero driver participation.
  *
  * Application order is the TRAINING order (each merge scanned
  * left-to-right, non-overlapping — [[graft.operators.Bpe.mergePair]]
  * is the shared kernel), so encoding a word the fit saw yields
  * exactly the segmentation the fit ended with — the determinism the
  * spec pins. NULL text → NULL. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bpe_encode needs a STRING input, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  // merge priority: pair -> rank; applied rank-ascending per word
  @transient private lazy val ranked: Array[(String, String)] = merges.toArray

  /** EXACTLY Java regex `\s` — the fit's splitter. (The previous
    * `Character.isWhitespace` also matched U+1680/U+2028/U+3000 etc.,
    * so text with Unicode spaces was one word at fit time but two at
    * encode time, breaking the determinism contract.) */
  private def isSplitWs(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new java.util.ArrayList[UTF8String]()
    var start = 0
    val n = text.length
    while (start < n) {
      while (start < n && isSplitWs(text.charAt(start))) start += 1
      var end = start
      // a CJK code point is a standalone word (the fit's cjkPreSplit
      // inserts spaces around each one); otherwise extend to the next
      // whitespace OR CJK boundary. Walk CODE POINTS: supplementary
      // ideographs (planes 2-3) are surrogate pairs a char-level walk
      // would split in half.
      if (end < n && graft.functions.Text.isCjk(text.codePointAt(end)))
        end += Character.charCount(text.codePointAt(end))
      else while (end < n && !isSplitWs(text.charAt(end)) &&
        !graft.functions.Text.isCjk(text.codePointAt(end)))
        end += Character.charCount(text.codePointAt(end))
      if (end > start) {
        var syms = graft.operators.Bpe.symbols(text.substring(start, end))
        var i = 0
        while (i < ranked.length && syms.length > 1) {
          syms = graft.operators.Bpe.mergePair(syms, ranked(i))
          i += 1
        }
        var j = 0
        while (j < syms.length) {
          out.add(UTF8String.fromString(syms(j))); j += 1
        }
      }
      start = end
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
