package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-group adjacent-pair statistics — the q04 kernel.
  *
  * Input: one order's line array `array<struct<ln:int, qc:long,
  * flag:string>>` (as built by the q04 projection). For every ordered
  * pair (a, b) with `b.ln == a.ln + 1` — the self-join predicate,
  * duplicates fanning out exactly like the join — accumulate per
  * `a.flag`: the pair count and the summed quantity-cents of both
  * sides. Output: `array<struct<flag, cnt, qc2>>`, one entry per
  * distinct left flag (≤ |flags|, tiny), ready for a final exact
  * aggregate.
  *
  * Replaces an explode back to line grain plus two higher-order
  * functions per line (boxed lambda calls over the array for every
  * row): one primitive O(n²)-per-order loop over bounded n (orders
  * have bounded line counts), emitting flag-grain rows instead of
  * line-grain rows — the downstream aggregate consumes ~4× fewer rows
  * and zero lambda calls.
  */
case class AdjacentPairStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("flag", StringType),
    StructField("cnt", LongType),
    StructField("qc2", LongType))), containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ln = new Array[Int](n)
    val qc = new Array[Long](n)
    val fl = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 3)
      ln(i) = r.getInt(0)
      qc(i) = r.getLong(1)
      // clone: the string must outlive the (possibly reused) input
      // buffer once it escapes into the output array
      fl(i) = r.getUTF8String(2).clone()
      i += 1
    }
    // accumulate per left flag; insertion-ordered, tiny domain
    val flags = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val cnt = scala.collection.mutable.ArrayBuffer.empty[Long]
    val qc2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    i = 0
    while (i < n) {
      var pc = 0L
      var pq = 0L
      var j = 0
      while (j < n) {
        if (ln(j) == ln(i) + 1) { pc += 1; pq += qc(i) + qc(j) }
        j += 1
      }
      if (pc > 0) {
        var k = 0
        var found = -1
        while (k < flags.length && found < 0) {
          if (flags(k) == fl(i)) found = k
          k += 1
        }
        if (found < 0) { flags += fl(i); cnt += pc; qc2 += pq }
        else { cnt(found) += pc; qc2(found) += pq }
      }
      i += 1
    }
    new GenericArrayData(Array.tabulate(flags.length) { k =>
      InternalRow(flags(k), cnt(k), qc2(k))
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AdjacentPairStats =
    copy(child = newChild)
  override def prettyName: String = "adjacent_pair_stats"
}

object AdjacentPairStats {
  def adjacentPairStats(lines: Column): Column =
    ColumnBridge.column(AdjacentPairStats(ColumnBridge.expression(lines)))
}
