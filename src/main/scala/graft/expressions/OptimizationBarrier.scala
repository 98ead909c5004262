package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that DECLARES itself non-deterministic so the
  * optimizer treats the wrapped value as an opaque materialization
  * point: `PushDownPredicates` will not push a filter below a Project
  * containing it (all project fields must be deterministic), and
  * `CollapseProject` will not inline it into consumers.
  *
  * Used by [[CombineMarkerCounts]] to pin a hoisted one-pass
  * `marker_counts` below a rewritten Filter — without the pin, the
  * operator-optimization fixpoint (where injected rules run) would
  * push the filter back through the hoist Project and re-inline one
  * full text scan per call site. The wrapped expression IS
  * deterministic in truth; the flag only spends plan-shape freedom
  * the rewrite has already decided is not worth its cost.
  */
case class OptimizationBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "opt_barrier"
}
