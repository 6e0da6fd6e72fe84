package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SimHash fingerprint of a token array as a single custom expression.
  *
  * Computes MD5 once per token and spreads its leading `nBits` bits into
  * the ±1 weight vector — the composable HOF formulation re-hashes every
  * token once per bit (60 md5 calls per token). Bit numbering matches the
  * portable hex-digit formula exactly (bit b = bit b of the digest read
  * MSB-first), so the DuckDB oracle and the HOF reference implementation
  * produce identical fingerprints.
  *
  * Per-row, no shuffle. `doGenCode` calls [[compute]] directly on a
  * captured reference (no CodegenFallback), keeping the whole-stage
  * consume loop free of the fallback's boxed per-row eval.
  */
case class SimHashExpr(child: Expression, nBits: Int = 60)
    extends UnaryExpression {

  require(nBits > 0 && nBits <= 60, "nBits must be in 1..60 to stay positive in a signed long")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash expects array<string>, got $other")
    }

  @transient private lazy val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** The fingerprint loop, shared verbatim by eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val weights = new Array[Int](nBits)
    val digestFn = md5.get()
    var t = 0
    while (t < n) {
      digestFn.reset()
      val digest = digestFn.digest(arr.getUTF8String(t).getBytes)
      var b = 0
      while (b < nBits) {
        // bit b of the digest, MSB-first — identical to the hex-digit formula
        val bit = (digest(b >> 3) >> (7 - (b & 7))) & 1
        weights(b) += (bit * 2 - 1)
        b += 1
      }
      t += 1
    }
    var packed = 0L
    var b = 0
    while (b < nBits) {
      packed = packed * 2 + (if (weights(b) > 0) 1L else 0L)
      b += 1
    }
    packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash", this, classOf[SimHashExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
