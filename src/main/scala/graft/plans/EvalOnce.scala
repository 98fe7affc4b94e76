package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/** Identity wrapper that pins an EXPENSIVE child expression to a single
  * evaluation site (the repo's round-2 "expression-inlining discipline",
  * made structural).
  *
  * Why it exists: `withColumn("k", kernel).filter(col("k") >= t)` is the
  * natural way to verify candidates with an O(m·n) kernel, but
  * PushPredicateThroughNonJoin substitutes the alias — the kernel lands
  * in the join condition AND stays in the projection, evaluating twice
  * per surviving row (observed on the r7 q_dedup_lcs plan). Marking the
  * wrapper non-deterministic makes every alias-substituting rule
  * (predicate pushdown, CollapseProject, constant folding) leave the
  * projection intact: Catalyst may not duplicate, reorder past, or fold
  * a non-deterministic expression, so the child evaluates exactly once
  * where declared. The wrapper itself is pure passthrough — values,
  * nullability, and the oracle hash are unchanged.
  *
  * Use it ONLY on expensive kernels at their intended single site;
  * everything cheap should stay deterministic so Catalyst can optimize
  * freely.
  */
case class EvalOnceExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def prettyName: String = "eval_once"
  override protected def nullSafeEval(input: Any): Any = input

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EvalOnce {
  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(EvalOnceExpr(GraftColumnBridge.toExpression(c)))
}
