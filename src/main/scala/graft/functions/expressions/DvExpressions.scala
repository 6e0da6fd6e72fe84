package graft.functions.expressions

import graft.io.RoaringBitmapArray
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Is row (`file`, `pos`) masked out by a deletion vector?
  *
  * The per-file bitmaps ride inside the expression (task-binary
  * broadcast: serialized ONCE per stage, O(total bitmap bytes) — the
  * same scale shape as delta-spark's broadcast DV map feeding its
  * per-task `__delta_internal_is_row_deleted` predicate). Lookup is a
  * hash probe on the file path + an O(log containers) bitmap probe —
  * no join, no shuffle, no positions-as-rows materialization anywhere.
  *
  * `doGenCode` calls [[deleted]] on a captured reference (no
  * CodegenFallback), so the DV mask stays inside the scan's
  * whole-stage-codegen span.
  */
case class DvDeletedExpr(file: Expression, pos: Expression,
                         masks: Map[String, RoaringBitmapArray])
    extends BinaryExpression {

  override def left: Expression = file
  override def right: Expression = pos
  override def dataType: DataType = BooleanType
  override def prettyName: String = "dv_deleted"

  // UTF8String-keyed twin of `masks`: probes take the scan's native
  // string representation, no per-row String decode
  @transient private lazy val lookup: java.util.HashMap[UTF8String, RoaringBitmapArray] = {
    val m = new java.util.HashMap[UTF8String, RoaringBitmapArray](masks.size * 2)
    masks.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }

  def deleted(f: UTF8String, p: Long): Boolean = {
    val bm = lookup.get(f)
    bm != null && bm.contains(p)
  }

  override protected def nullSafeEval(f: Any, p: Any): Any =
    deleted(f.asInstanceOf[UTF8String], p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvMask", this, classOf[DvDeletedExpr].getName)
    defineCodeGen(ctx, ev, (f, p) => s"$ref.deleted($f, $p)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(file = l, pos = r)
}
