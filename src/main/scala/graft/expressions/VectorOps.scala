package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
    extends BinaryExpression {
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

  /** Java element accessor for codegen, cast to double. */
  private def javaGet(e: Expression, arr: String, i: String): String = e.dataType match {
    case ArrayType(FloatType, _)   => s"(double) $arr.getFloat($i)"
    case ArrayType(DoubleType, _)  => s"$arr.getDouble($i)"
    case ArrayType(ByteType, _)    => s"(double) $arr.getByte($i)"
    case ArrayType(ShortType, _)   => s"(double) $arr.getShort($i)"
    case ArrayType(IntegerType, _) => s"(double) $arr.getInt($i)"
    case ArrayType(LongType, _)    => s"(double) $arr.getLong($i)"
    case t => throw new IllegalArgumentException(s"array_dot: unsupported $t")
  }

  /** Whole-stage-codegen body: a primitive fused multiply-add loop —
    * no virtual call per row, no boxing per element. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double $acc = 0.0;
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (${javaGet(left, x, i)}) * (${javaGet(right, y, i)});
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
  override def prettyName: String = "array_dot"
}

object VectorOps {
  def arrayDot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
