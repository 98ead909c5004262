package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product over two float/double array columns.
  *
  * Exactly the same math as the HOF formulation
  * (`aggregate(zip_with(a,b,*), 0.0, +)`): every element cast to double
  * first, accumulation strictly sequential left-to-right — so results
  * stay bit-identical to the DuckDB oracle's DOUBLE[] evaluation — but
  * as one primitive JVM loop instead of two boxed lambda calls per
  * element. Arrays of different lengths score only the common prefix
  * (HOF zip_with would null out; vectors in one table share a dim).
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  private def reader(e: Expression): (ArrayData, Int) => Double = e.dataType match {
    case ArrayType(FloatType, _)   => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _)  => (a, i) => a.getDouble(i)
    case ArrayType(ByteType, _)    => (a, i) => a.getByte(i).toDouble
    case ArrayType(ShortType, _)   => (a, i) => a.getShort(i).toDouble
    case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
    case ArrayType(LongType, _)    => (a, i) => a.getLong(i).toDouble
    case t => throw new IllegalArgumentException(s"array_dot: unsupported $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val rx = reader(left); val ry = reader(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += rx(x, i) * ry(y, i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
  override def prettyName: String = "array_dot"
}

object VectorOps {
  def arrayDot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
