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

/** [[NearestCentroids]] with the centroid set as a CHILD COLUMN of
  * type array<struct<cid: long, cv: array<double>>> instead of
  * driver-side literal arrays — the lake-scale form: the centroid
  * frame is packed into one row (sort_array(collect_list(...)) on
  * executors) and cross-joined broadcast onto the corpus, so no code
  * path ever `collect()`s k·dim doubles to the driver. Same math and
  * the same (L2 distance, id) ordering as the literal form —
  * spec-pinned identical assignments. */
case class NearestCentroidsCol(left: Expression, right: Expression,
                               assumeConstant: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def childIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def centIsFloat: Boolean = right.dataType match {
    case ArrayType(StructType(fs), _) => fs(1).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    case _ => false
  }

  // Per-task decode cache, ONLY under `assumeConstant` (set by the
  // operator doors that construct the 1-row broadcast pack themselves,
  // so the operand provably never varies within a task): decode the
  // ArrayData into primitive arrays once and reuse — struct/array
  // accessor indirection per (row × centroid) measured ~2× the
  // literal path's assignment cost at 100×. Without the guarantee
  // (the SQL-registered form, where a caller could feed a per-row
  // column) every row decodes fresh: slower, never stale. A
  // reference-equality key would be unsound here — vectorized readers
  // rewrite reused buffers in place, and fresh UnsafeArrayData
  // wrappers over the same broadcast bytes would defeat it anyway.
  @transient private var cachedIds: Array[Long] = _
  @transient private var cachedCents: Array[Array[Double]] = _

  private def decoded(cs: ArrayData): (Array[Long], Array[Array[Double]]) = {
    if (cachedCents == null || !assumeConstant) {
      val cIsF = centIsFloat
      val k = cs.numElements()
      val ids = new Array[Long](k)
      val cents = new Array[Array[Double]](k)
      var c = 0
      while (c < k) {
        val row = cs.getStruct(c, 2)
        ids(c) = row.getLong(0)
        val cv = row.getArray(1)
        cents(c) =
          if (cIsF) { val a = cv.toFloatArray(); val d = new Array[Double](a.length)
            var i = 0; while (i < a.length) { d(i) = a(i).toDouble; i += 1 }; d }
          else cv.toDoubleArray()
        c += 1
      }
      cachedIds = ids; cachedCents = cents
    }
    (cachedIds, cachedCents)
  }

  override def nullSafeEval(v: Any, cs: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val (ids, cents) = decoded(cs.asInstanceOf[ArrayData])
    val isF = childIsFloat
    val n = x.numElements()
    val k = cents.length
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
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
    val order = (0 until k).sortBy(i => (dists(i), ids(i)))
    new GenericArrayData(order.map(ids(_)).toArray)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): NearestCentroidsCol = copy(l, r)
  override def prettyName: String = "nearest_centroids_col"
}

object CentroidOps {

  /** Literal-regime guard: centroid sets are inlined into the plan and
    * (in [[NearestCentroids]]' construction path) collected on the
    * driver, so they must stay model-parameter sized. Beyond this the
    * caller must switch to the frame path ([[nearestCentroidsCol]] via
    * Similarity.assignCellsFrame / ingest-time assignment), which
    * never materializes centroids on the driver. 2^22 doubles = 32 MB. */
  val MaxLiteralCentroidDoubles: Long = 1L << 22

  private def checkLiteralBudget(ids: Array[Long],
                                 cents: Array[Array[Double]]): Unit = {
    val total = cents.iterator.map(_.length.toLong).sum
    require(total <= MaxLiteralCentroidDoubles,
      s"centroid set of ${ids.length} x ~${if (cents.isEmpty) 0 else cents.head.length} " +
        s"= $total doubles exceeds the literal/driver budget " +
        s"($MaxLiteralCentroidDoubles); use the broadcast-frame path " +
        "(Similarity.assignCellsFrame / Dedup.semanticDedupFrame) or " +
        "ingest-time cell assignment instead")
  }

  def nearestCentroids(v: Column, ids: Array[Long],
                       cents: Array[Array[Double]]): Column = {
    checkLiteralBudget(ids, cents)
    ColumnBridge.column(NearestCentroids(ColumnBridge.expression(v), ids, cents))
  }

  /** Frame form: `cents` is a column of array<struct<cid, cv>> (one
    * packed row cross-joined broadcast onto the corpus). Pass
    * `assumeConstant = true` ONLY when the cents operand is provably
    * the same value for every row (the broadcast-pack doors) — it
    * turns on the per-task decode cache. */
  def nearestCentroidsCol(v: Column, cents: Column,
                          assumeConstant: Boolean = false): Column =
    ColumnBridge.column(NearestCentroidsCol(
      ColumnBridge.expression(v), ColumnBridge.expression(cents),
      assumeConstant))
}
