package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native sign-random-projection signatures: `bands` LSH band keys in
  * ONE traversal of the vector.
  *
  * Bit-identical to the HOF formulation ([[graft.functions.Vectors
  * .hofRpBucket]] with seed `seed + b` for band b — PropertySpec pins
  * the equality): plane weights are `pmod(xxhash64(seed+b, j, i),
  * 100000)/100000 - 0.5` and each plane's projection accumulates
  * x_i·w_i in ascending i, so every double add happens in the same
  * order. Where the HOF re-traverses the array once per plane with two
  * boxed lambda calls per element (24 traversals for 3 bands × 8
  * planes), this evaluates all `bands × planes` projections in a
  * single primitive loop — and the weights, which depend only on
  * (band, plane, index), are computed ONCE per executor instance and
  * cached, not re-hashed per row. At 100 TB the signature projection
  * is the dominant cost of vector LSH; this is the difference between
  * scanning the corpus once and scanning it 24 times.
  *
  * A null element anywhere nulls every plane's sum in the HOF form,
  * turning all band keys into 0 — replicated here.
  */
case class RpBands(child: Expression, numPlanes: Int, bands: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(numPlanes >= 1 && numPlanes <= 63, "band key fits in one long")
  require(bands >= 1, "need at least one band")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // lazy: the child's dataType only resolves during analysis — an
  // eager val here would see NullType on the unresolved column
  @transient private lazy val readAt: (ArrayData, Int) => Double = child.dataType match {
    case ArrayType(FloatType, _)   => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _)  => (a, i) => a.getDouble(i)
    case ArrayType(ByteType, _)    => (a, i) => a.getByte(i).toDouble
    case ArrayType(ShortType, _)   => (a, i) => a.getShort(i).toDouble
    case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
    case ArrayType(LongType, _)    => (a, i) => a.getLong(i).toDouble
    case t => throw new IllegalArgumentException(s"rp_bands: unsupported $t")
  }

  // weights laid out [i][band*planes+j] so the per-row inner loop walks
  // memory sequentially; rebuilt (same values, longer prefix) if a row
  // with a larger dim arrives. ONE volatile reference holding
  // (dim, array): tasks usually get their own deserialized expression
  // copy, but if an instance is ever shared across threads a torn
  // two-field publication could pair a new dim with a stale shorter
  // array; worst case under the single reference is a harmless rebuild.
  @transient @volatile private var cache: (Int, Array[Double]) = _

  private def weights(dim: Int): Array[Double] = {
    val c = cache
    if (c != null && c._1 >= dim) c._2
    else {
      val f = bands * numPlanes
      val w = new Array[Double](dim * f)
      var b = 0
      while (b < bands) {
        val h1 = XxHash64Function.hash(seed + b, LongType, 42L)
        var j = 0
        while (j < numPlanes) {
          val h2 = XxHash64Function.hash(j, IntegerType, h1)
          var i = 0
          while (i < dim) {
            val h3 = XxHash64Function.hash(i, IntegerType, h2)
            val p = ((h3 % 100000L) + 100000L) % 100000L
            w(i * f + b * numPlanes + j) = p.toDouble / 100000.0 - 0.5
            i += 1
          }
          j += 1
        }
        b += 1
      }
      cache = (dim, w)
      w
    }
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val f = bands * numPlanes
    val acc = new Array[Double](f)
    val w = weights(dim)
    var hasNull = false
    var i = 0
    while (i < dim && !hasNull) {
      if (arr.isNullAt(i)) hasNull = true
      else {
        val x = readAt(arr, i)
        val base = i * f
        var k = 0
        while (k < f) { acc(k) += x * w(base + k); k += 1 }
      }
      i += 1
    }
    val keys = new Array[Long](bands)
    if (!hasNull) {
      var b = 0
      while (b < bands) {
        var key = 0L
        var j = 0
        while (j < numPlanes) {
          if (acc(b * numPlanes + j) > 0) key |= (1L << j)
          j += 1
        }
        keys(b) = key
        b += 1
      }
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): RpBands =
    copy(child = newChild)
  override def prettyName: String = "rp_bands"
}

object RpBands {
  def rpBands(v: Column, numPlanes: Int, bands: Int, seed: Long = 42L): Column =
    ColumnBridge.column(RpBands(ColumnBridge.expression(v), numPlanes, bands, seed))
}
