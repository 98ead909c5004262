package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Shared kernel for [[QuantileBin]]: interpreted eval and generated
  * code call ONE definition, so the two paths cannot drift. */
object QuantileBinOps {
  /** Count of cuts ≤ v over ASCENDING cuts — binary search, so a
    * 10^5-cut equi-depth layout pays ~17 comparisons per row instead
    * of a 10^5-term expression fold. NaN v matches nothing (`v >= c`
    * is false), NaN cuts sort last and are never counted: bit-for-bit
    * the arithmetic of the fold `Σ when(v >= c, 1)` this replaces. */
  def bin(cuts: Array[Double], v: Double): Long = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v >= cuts(mid)) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}

/** Equi-depth bin of a double against a sorted cut array: the row-side
  * kernel of [[graft.sinks.Sinks.rebinShardsByQuantiles]] and of every
  * later patch that must route rows into an existing quantile layout.
  * NULL input lands in bin 0 (deterministic — nulls have no rank), so
  * the expression itself is never null. Whole-stage codegen emits one
  * static binary-search call per row; the cuts ride the plan as a
  * reference object (8 B × cuts — a 10^5-shard layout's cut table is
  * under 1 MB). */
case class QuantileBin(child: Expression, cuts: Array[Double])
    extends UnaryExpression {
  require(cuts.nonEmpty, "quantile_bin needs at least one cut")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quantile_bin expects DOUBLE, got ${child.dataType.sql}")

  // eval overridden directly (not nullSafeEval): a null child must
  // yield bin 0, not null
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else QuantileBinOps.bin(cuts, v.asInstanceOf[Double])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("cuts", cuts, "double[]")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.expressions.QuantileBinOps.bin($cutsRef, ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : QuantileBin = copy(child = newChild)
}
