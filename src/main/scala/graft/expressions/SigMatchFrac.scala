package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Fraction of equal positions between two minhash signature arrays —
  * the LSH Jaccard estimator (`matches / numHashes`), as one primitive
  * loop instead of a `zip_with` + `aggregate` HOF pair that boxes every
  * element of every candidate pair. Runs once per candidate pair in the
  * band self-join, which is the hot tail of minHashLsh after blocking.
  * Same math as the HOF form (Dedup.hofEstJaccard — spec-pinned):
  * positions beyond the shorter array count as non-matches, and the
  * denominator is the declared signature width. */
case class SigMatchFrac(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {
  require(numHashes > 0)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var eq = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) eq += 1
      i += 1
    }
    java.lang.Double.valueOf(eq.toDouble / numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val eq = ctx.freshName("eq")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $eq = 0;
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.getLong($i) == $y.getLong($i)) $eq++;
         |}
         |${ev.value} = ((double) $eq) / ${numHashes}.0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigMatchFrac =
    copy(left = l, right = r)
  override def prettyName: String = "sig_match_frac"
}

object SigMatchFrac {
  def sigMatchFrac(a: Column, b: Column, numHashes: Int): Column =
    ColumnBridge.column(SigMatchFrac(
      ColumnBridge.expression(a), ColumnBridge.expression(b), numHashes))
}
