package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native coarse-quantizer assignment for IVF search.
  *
  * The centroid set is a model parameter carried in the expression
  * (not a join side): assignment is one primitive loop per row —
  * no cross join, no window, no shuffle, and none of the
  * codegen blow-up a 16×dim literal expression tree causes.
  * Returns centroid ids ordered by (L2 distance, id); callers take
  * element 1 (assignment) or the first nProbe (query probing).
  */
case class NearestCentroids(child: Expression, centIds: Array[Long],
                            cents: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val isF = childIsFloat
    val n = x.numElements()
    val dists = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val m = math.min(n, cv.length)
      var acc = 0.0
      var i = 0
      while (i < m) {
        val xv = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
        val d = xv - cv(i)
        acc += d * d
        i += 1
      }
      dists(c) = acc
      c += 1
    }
    val order = (0 until cents.length).sortBy(i => (dists(i), centIds(i)))
    new GenericArrayData(order.map(centIds(_)).toArray)
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroids =
    copy(child = c)
  override def prettyName: String = "nearest_centroids"
}

object CentroidOps {
  def nearestCentroids(v: Column, ids: Array[Long],
                       cents: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroids(ColumnBridge.expression(v), ids, cents))
}
