package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Mutable (ordering, value) pair tracked per group. `set` distinguishes
  * "no qualifying row yet" from a legitimately-null extremum value. */
final class ArgExtremumBuffer(var set: Boolean, var ord: Any, var value: Any)

/** `arg_max(value, ord)` / `arg_min(value, ord)` — the value of the row
  * whose `ord` is extremal, as a TypedImperativeAggregate.
  *
  * Spark's own `max_by`/`min_by` are declarative aggregates whose buffer
  * holds the ordering+value pair; with a non-primitive value (e.g. a whole
  * row packed in a struct) that buffer is immutable, HashAggregateExec
  * refuses it, and the plan degrades to SortAggregate — a per-partition
  * sort on the grouping key. This typed-imperative form keeps the pair as
  * an opaque JVM object, which ObjectHashAggregateExec accepts: hash-based
  * partial aggregation on both the map and reduce side, no sort anywhere.
  * That is the difference between O(n) and O(n log n) per partition for
  * latest-row-per-key dedup over 100 TB (see StarSchema.dedupKeyedAgg).
  *
  * Semantics match `max_by`/`min_by`: rows with NULL ordering are ignored;
  * ties keep an arbitrary qualifying row (make `ord` a total order for
  * determinism); the result is NULL only for groups with no qualifying row.
  */
case class ArgExtremum(
    valueExpr: Expression,
    ordExpr: Expression,
    findMax: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[ArgExtremumBuffer] {

  override def children: Seq[Expression] = Seq(valueExpr, ordExpr)
  override def dataType: DataType = valueExpr.dataType
  override def nullable: Boolean = true
  override def prettyName: String = if (findMax) "arg_max" else "arg_min"

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(ordExpr.dataType, prettyName)

  @transient private lazy val ordering: Ordering[Any] =
    PhysicalDataType.ordering(ordExpr.dataType).asInstanceOf[Ordering[Any]]

  override def createAggregationBuffer(): ArgExtremumBuffer =
    new ArgExtremumBuffer(false, null, null)

  private def better(candidate: Any, incumbent: Any): Boolean = {
    val c = ordering.compare(candidate, incumbent)
    if (findMax) c > 0 else c < 0
  }

  override def update(buf: ArgExtremumBuffer, input: InternalRow): ArgExtremumBuffer = {
    val ord = ordExpr.eval(input)
    if (ord != null && (!buf.set || better(ord, buf.ord))) {
      buf.set = true
      // inputs are backed by reused rows — copy before holding across rows
      buf.ord = InternalRow.copyValue(ord)
      buf.value = InternalRow.copyValue(valueExpr.eval(input))
    }
    buf
  }

  override def merge(buf: ArgExtremumBuffer, other: ArgExtremumBuffer): ArgExtremumBuffer = {
    if (other.set && (!buf.set || better(other.ord, buf.ord))) {
      buf.set = true
      buf.ord = other.ord
      buf.value = other.value
    }
    buf
  }

  override def eval(buf: ArgExtremumBuffer): Any = buf.value

  @transient private lazy val serProj =
    UnsafeProjection.create(Array(ordExpr.dataType, valueExpr.dataType))

  override def serialize(buf: ArgExtremumBuffer): Array[Byte] =
    if (!buf.set) Array.emptyByteArray
    else serProj(InternalRow(buf.ord, buf.value)).getBytes

  override def deserialize(bytes: Array[Byte]): ArgExtremumBuffer =
    if (bytes.isEmpty) createAggregationBuffer()
    else {
      val row = new UnsafeRow(2)
      row.pointTo(bytes, bytes.length)
      new ArgExtremumBuffer(true,
        InternalRow.copyValue(row.get(0, ordExpr.dataType)),
        InternalRow.copyValue(row.get(1, valueExpr.dataType)))
    }

  override def withNewMutableAggBufferOffset(offset: Int): ArgExtremum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ArgExtremum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(valueExpr = c(0), ordExpr = c(1))
}
