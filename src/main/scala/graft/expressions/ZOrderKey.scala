package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{Block, CodegenContext, EmptyBlock, ExprCode, FalseLiteral}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Z-order (Morton) clustering key over N numeric columns.
  *
  * Each input value is first QUANTILE-BUCKETED against a per-column
  * sorted boundary array (computed once, driver-side, from
  * `approxQuantile` — see [[graft.storage.ZOrder]]), then the bucket
  * indices are bit-interleaved MSB-first into one long. Quantile
  * bucketing (rather than min/max linear scaling, the naive Morton
  * form) is what makes the key robust to skew: every bucket holds
  * ~1/2^bits of the rows of its dimension, so the interleaved space is
  * uniformly filled and range-binning it yields balanced shards even
  * when the raw values are Zipfian.
  *
  * Rows that sort near each other on the z-key are near each other in
  * EVERY interleaved dimension — the property that makes per-shard
  * min/max zone stats selective on each dimension independently (the
  * layout idea behind Delta's OPTIMIZE ZORDER and Iceberg's sort-order
  * z-curve transforms; public descriptions only, re-derived here).
  *
  * Semantics:
  *  - boundaries are upper-inclusive cut points: bucket(v) = number of
  *    boundaries strictly below v, with ties going RIGHT (v equal to a
  *    boundary lands in the higher bucket) — any fixed tie rule works,
  *    this one matches `java.util.Arrays.binarySearch` insertion
  *    points directly;
  *  - a NULL (or NaN) input buckets to 0 for its dimension instead of
  *    nulling the whole key: the key's job is placement, and "all the
  *    nulls cluster low in that dimension" is exactly the layout a
  *    reader filtering on the other dimensions wants. The expression
  *    is therefore total (never null).
  *
  * Scale: evaluation is a per-row binary search over a ≤(2^bits − 1)-
  * element double array per dimension plus a fixed bit loop — no state,
  * no allocation beyond one small scratch array, codegen'd into the
  * enclosing whole-stage loop. The boundary arrays ride the closure as
  * one broadcast-sized reference object (bits=8, 3 dims → 765 doubles).
  */
case class ZOrderKey(children: Seq[Expression],
                     boundaries: Seq[Array[Double]],
                     bitsPerDim: Int)
    extends Expression {

  require(children.nonEmpty, "zorder_key needs at least one column")
  require(children.size == boundaries.size,
    s"one boundary array per column: ${children.size} columns, " +
      s"${boundaries.size} boundary arrays")
  require(bitsPerDim >= 1 && bitsPerDim * children.size <= 48,
    s"bitsPerDim × dims must fit 48 bits (exact as double for the " +
      s"shard-binning quantile pass), got $bitsPerDim × ${children.size}")
  require(boundaries.forall(_.length < (1L << bitsPerDim)),
    s"bucket count (boundaries+1) must fit $bitsPerDim bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  // inputs are cast to double by the ZOrder helper; checked post-
  // resolution (a construction-time require would call dataType on
  // still-unresolved children during analysis)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"zorder_key inputs must be DoubleType (cast " +
        s"first); got ${children.map(_.dataType).mkString(", ")}")

  private lazy val bnds: Array[Array[Double]] = boundaries.toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.size
    val vs = new Array[Double](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      vs(i) = if (v == null) Double.NegativeInfinity
              else v.asInstanceOf[Double]
      i += 1
    }
    java.lang.Long.valueOf(ZOrderKey.zkey(bnds, bitsPerDim, vs))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("zorderBnds", bnds, "double[][]")
    val childCodes = children.map(_.genCode(ctx))
    val vals = ctx.freshName("zvals")
    val fill = children.zip(childCodes).zipWithIndex.map {
      case ((c, cc), i) =>
        val v = if (c.nullable)
          s"${cc.isNull} ? Double.NEGATIVE_INFINITY : ${cc.value}"
        else cc.value.toString
        s"$vals[$i] = $v;"
    }.mkString("\n")
    val childEval = childCodes.map(_.code)
      .foldLeft(EmptyBlock: Block)(_ + _)
    val body: String =
      s"""
         |double[] $vals = new double[${children.size}];
         |$fill
         |long ${ev.value} = graft.expressions.ZOrderKey.zkey(
         |  $ref, $bitsPerDim, $vals);
       """.stripMargin
    ev.copy(code = childEval + code"$body", isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKey =
    copy(children = newChildren)
  override def prettyName: String = "zorder_key"
}

object ZOrderKey {

  /** Bucket of `v` in the sorted cut-point array: #boundaries < v,
    * ties right. NaN/−∞ → 0. */
  def bucket(bnds: Array[Double], v: Double): Int = {
    if (java.lang.Double.isNaN(v)) return 0
    val r = java.util.Arrays.binarySearch(bnds, v)
    if (r >= 0) {
      // land RIGHT of the run of equal boundaries (binarySearch may
      // return any index in the run — normalize for determinism)
      var i = r
      while (i < bnds.length && bnds(i) == v) i += 1
      i
    } else -(r + 1)
  }

  /** MSB-first round-robin bit interleave of the per-dim buckets. */
  def zkey(bnds: Array[Array[Double]], bitsPerDim: Int,
           vs: Array[Double]): Long = {
    val n = vs.length
    val bk = new Array[Int](n)
    var d = 0
    while (d < n) { bk(d) = bucket(bnds(d), vs(d)); d += 1 }
    var out = 0L
    var b = bitsPerDim - 1
    while (b >= 0) {
      d = 0
      while (d < n) {
        out = (out << 1) | ((bk(d) >> b) & 1L)
        d += 1
      }
      b -= 1
    }
    out
  }

  def column(cols: Seq[Column], boundaries: Seq[Array[Double]],
             bitsPerDim: Int): Column =
    ColumnBridge.column(ZOrderKey(
      cols.map(c => ColumnBridge.expression(c.cast("double"))),
      boundaries, bitsPerDim))
}
