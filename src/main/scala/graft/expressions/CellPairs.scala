package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Block-local all-pairs cosine scoring for semantic dedup — the
  * round-12 100× finding: materializing within-cell candidate pairs
  * and joining vectors back shuffles O(Σ cell²) rows each dragging a
  * dim×8-byte vector (~23 GB at the 100× fixture); collecting each
  * cell once and scoring pairs INSIDE the row shuffles the corpus
  * exactly once (~dim×8 bytes per member, ~100 MB there) and turns
  * scoring into a primitive loop.
  *
  * Input: one cell's members as array<struct<id: long,
  * v: array<float|double>, nrm: double>>; output: every pair with
  * id_a < id_b and cosine ≥ threshold as array<struct<id_a, id_b,
  * cos>>. Math is bit-identical to the join form the value oracle
  * hashes: dot = sequential left-to-right double fold over
  * min(dim) elements ([[ArrayDot]]'s contract), cos = 0.0 when
  * norm_a·norm_b == 0 else dot/(norm_a·norm_b), with the CALLER's
  * precomputed norms riding in. Members are sorted by id before
  * enumeration, so the pair SET is deterministic regardless of the
  * collect_list order the shuffle happened to produce.
  *
  * Memory envelope: one cell decoded = |cell|·(dim·8 + 16) bytes in
  * task memory — the balanced-cell contract (k ≈ √n in-query, ~100k
  * bounded cells at deploy) keeps this in the low MBs; a pathological
  * giant cell degrades to the same O(cell²) compute the join form
  * paid, concentrated on one task.
  */
case class CellPairs(child: Expression, threshold: Double)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)

  private def vecIsFloat: Boolean = child.dataType match {
    case ArrayType(StructType(fs), _) => fs(1).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val ids = new Array[Long](m)
    val vecs = new Array[Array[Double]](m)
    val nrms = new Array[Double](m)
    val isF = vecIsFloat
    var i = 0
    while (i < m) {
      val r = arr.getStruct(i, 3)
      ids(i) = r.getLong(0)
      val cv = r.getArray(1)
      vecs(i) =
        if (isF) {
          val a = cv.toFloatArray()
          val d = new Array[Double](a.length)
          var t = 0
          while (t < a.length) { d(t) = a(t).toDouble; t += 1 }
          d
        } else cv.toDoubleArray()
      nrms(i) = r.getDouble(2)
      i += 1
    }
    val order = Array.range(0, m).sortBy(ids(_))
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var a = 0
    while (a < m) {
      val ia = order(a)
      val va = vecs(ia)
      var b = a + 1
      while (b < m) {
        val ib = order(b)
        val vb = vecs(ib)
        val n = math.min(va.length, vb.length)
        var acc = 0.0
        var t = 0
        while (t < n) { acc += va(t) * vb(t); t += 1 }
        val p = nrms(ia) * nrms(ib)
        val cos = if (p == 0.0) 0.0 else acc / p
        if (cos >= threshold)
          out += new GenericInternalRow(Array[Any](ids(ia), ids(ib), cos))
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): CellPairs =
    copy(child = c)
  override def prettyName: String = "cell_pairs"
}

object CellPairs {
  def cellPairs(members: Column, threshold: Double): Column =
    ColumnBridge.column(CellPairs(ColumnBridge.expression(members), threshold))
}
