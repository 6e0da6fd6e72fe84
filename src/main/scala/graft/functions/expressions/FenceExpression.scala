package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity expression that fences its subtree off from the optimizer.
  *
  * The trap class this closes (the project's third encounter with it —
  * `InferFiltersFromGenerate` on q86, `InferFiltersFromConstraints` on
  * q38's cell key, then q136's classifier outputs at 10× cost): a
  * column defined by an EXPENSIVE expression (a broadcast-model score
  * fold, an argmax over per-label structs, a tokenizer) gets its
  * defining expression INLINED into filters the optimizer infers or
  * pushes — `PushPredicateThroughNonJoin` substitutes the definition
  * into each predicate that references the column, and
  * `InferFiltersFromConstraints` manufactures `isnotnull(col)`
  * predicates to push. Each inlined copy re-evaluates the whole
  * pipeline per row (measured 16 s vs 1.4 s on q136 at sf0.1).
  *
  * Reporting `deterministic = false` is the one public, version-stable
  * signal every relevant rule already honors: predicates are never
  * pushed through a non-deterministic projection, constraints are
  * never derived from one, and `CollapseProject` never duplicates one
  * into multiple references. Evaluation is the identity — interpreted
  * eval delegates, codegen emits the child's code verbatim, so the
  * fence costs NOTHING at runtime and keeps the column inside
  * whole-stage codegen (spec-asserted).
  *
  * Semantics are unchanged ONLY because the fenced expression really
  * is deterministic — the flag is a fence, not a fact. Apply it at
  * operator output boundaries (e.g. [[graft.operators.LangModel]]'s
  * score fold and argmax), where "compute once, then treat as data"
  * is the intended contract. Cheap derived columns (getFields over a
  * fenced struct) stay unfenced above it, so consumers' predicates
  * still settle directly on top of the fence — evaluated once per
  * row against the materialized column, never against a re-inlined
  * pipeline.
  */
case class OptimizerFence(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the whole point: no constraint inference, no predicate pushdown
  // through the defining Project, no CollapseProject duplication
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fence"
}
