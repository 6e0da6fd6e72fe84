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

/** `dv_bitmap(pos)` — aggregate row indexes into a serialized portable
  * RoaringBitmapArray ([[graft.io.DeletionVectors]] format), as a
  * TypedImperativeAggregate.
  *
  * This is the distributed half of DV AUTHORING
  * ([[graft.io.DeltaInterop.deleteWhereDV]]/`updateWhereDV`): grouped
  * by file, each task folds its deleted row indexes into a mutable
  * [[graft.io.RoaringBitmapBuilder]] (roaring-shaped memory, O(bitmap
  * bytes)); partial buffers serialize as the bitmap's own portable
  * bytes, so the exchange ships per-(file × map-partition) bitmaps —
  * KBs — never a `collect_list` of positions. ObjectHashAggregateExec
  * accepts the opaque buffer: hash aggregation both sides, no sort.
  * The final value is the portable serialization (BinaryType), which
  * downstream executor-side code merges with the file's OLD bitmap and
  * writes as a sidecar; only descriptors reach the driver.
  */
case class DvBitmapAgg(
    posExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[graft.io.RoaringBitmapBuilder] {

  override def children: Seq[Expression] = Seq(posExpr)
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "dv_bitmap"

  override def createAggregationBuffer(): graft.io.RoaringBitmapBuilder =
    new graft.io.RoaringBitmapBuilder

  override def update(buf: graft.io.RoaringBitmapBuilder,
                      input: org.apache.spark.sql.catalyst.InternalRow): graft.io.RoaringBitmapBuilder = {
    val p = posExpr.eval(input)
    if (p != null) buf.add(p.asInstanceOf[Long])
    buf
  }

  override def merge(buf: graft.io.RoaringBitmapBuilder,
                     other: graft.io.RoaringBitmapBuilder): graft.io.RoaringBitmapBuilder = {
    buf.merge(other)
    buf
  }

  override def eval(buf: graft.io.RoaringBitmapBuilder): Any = buf.result()._1

  override def serialize(buf: graft.io.RoaringBitmapBuilder): Array[Byte] =
    buf.result()._1

  override def deserialize(bytes: Array[Byte]): graft.io.RoaringBitmapBuilder =
    graft.io.RoaringBitmapBuilder.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): DvBitmapAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DvBitmapAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(posExpr = c(0))
}
