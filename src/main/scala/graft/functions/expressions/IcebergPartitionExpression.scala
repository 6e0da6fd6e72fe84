package graft.functions.expressions

import graft.io.IcebergTransforms
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Iceberg PARTITION-TRANSFORM value of a source column —
  * `bucket[N]` (the spec's murmur3_x86_32 over the spec's byte
  * encodings), `truncate[W]`, and the temporal ordinals
  * `year|month|day|hour` — computed DISTRIBUTEDLY at write staging so
  * [[graft.io.IcebergWrite.appendPartitioned]] can author
  * hidden-partitioned layouts whose manifest summaries prune through
  * the SAME math [[IcebergTransforms]] applies on the read side (one
  * shared implementation ⇒ write/read agreement is structural, not
  * coincidental). Session-timezone-independent by construction: dates
  * evaluate as epoch days and timestamps as epoch micros, the
  * internal representations Spark already stores.
  *
  * Codegen: `doGenCode` calls [[compute]] on a captured reference —
  * the expression stays inside whole-stage codegen (the MinHashSig
  * pattern), no UDF boundary. */
case class IcebergPartitionValue(child: Expression, transform: String)
    extends UnaryExpression {

  override def dataType: DataType =
    IcebergTransforms.resultType(transform, child.dataType).getOrElse(
      throw new IllegalArgumentException(
        s"Iceberg transform $transform does not apply to ${child.dataType}"))

  def compute(in: Any): Any =
    if (transform == "identity") in
    else {
      val norm: Any = (child.dataType, in) match {
        case (DateType, d: Int) => d.toLong          // epoch days
        case (IntegerType, i: Int) => i.toLong       // ints hash as longs
        case (StringType, s: UTF8String) => s.toString
        case (_, other) => other                     // long / micros
      }
      IcebergTransforms.eval(transform, child.dataType, norm) match {
        case Some(s: String) => UTF8String.fromString(s)
        case Some(v) => v
        case None => throw new IllegalArgumentException(
          s"Iceberg transform $transform inapplicable to $in of ${child.dataType}")
      }
    }

  override def nullSafeEval(in: Any): Any = compute(in)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("icePartVal", this,
      classOf[IcebergPartitionValue].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${CodeGenerator.boxedType(dataType)}) $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
