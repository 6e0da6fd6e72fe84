package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** k-permutation MinHash signature as one custom expression.
  *
  * Value-identical to the composable form
  * `transform(sequence(0,k-1), i -> array_min(transform(sh, s -> md5(i:s))))`
  * — same md5-hex strings, same lexicographic min (hex encoding preserves
  * unsigned byte order, so the min is tracked on raw digests and hexified
  * once at the end) — but runs as a tight JVM loop with a reused
  * MessageDigest instead of k·|shingles| Catalyst expression evaluations.
  *
  * Codegen: `doGenCode` emits a direct call to [[compute]] on a captured
  * reference (no CodegenFallback), so the expression stays inside the
  * whole-stage-codegen consume loop instead of forcing the fallback's
  * boxed `eval(InternalRow)` detour per row.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  // NULL for empty shingle sets (see nullSafeEval), independent of child nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got $other")
    }

  @transient private lazy val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // computed once per expression instance, not per row (hot loop)
  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => s"$i:".getBytes("UTF-8"))

  private val HexChars = "0123456789abcdef".toCharArray

  /** Unsigned lexicographic byte-array compare (== hex-string compare). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** The signature loop, shared verbatim by eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // Empty shingle set → NULL signature (not an array of nulls): downstream
    // band-key `transform` then yields NULL and `posexplode` emits no rows,
    // so empty documents drop out of LSH banding with no explicit filter.
    // (A filter on size(shingles) re-evaluates the whole shingle pipeline in
    // the pushed-down predicate — measured 30× slower than this.)
    if (n == 0) return null
    val digestFn = md5.get()
    val mins = new Array[Array[Byte]](k)
    var i = 0
    var t = 0
    while (t < n) {
      val sh = arr.getUTF8String(t).getBytes
      i = 0
      while (i < k) {
        digestFn.reset()
        digestFn.update(seedPrefixes(i))
        digestFn.update(sh)
        val d = digestFn.digest()
        if (mins(i) == null || less(d, mins(i))) mins(i) = d
        i += 1
      }
      t += 1
    }
    val out = new Array[Any](k)
    i = 0
    while (i < k) {
      if (mins(i) == null) out(i) = null // empty shingle set → null (matches array_min of empty)
      else {
        val hex = new Array[Char](32)
        var j = 0
        while (j < 16) {
          hex(j * 2) = HexChars((mins(i)(j) >> 4) & 0xf)
          hex(j * 2 + 1) = HexChars(mins(i)(j) & 0xf)
          j += 1
        }
        out(i) = UTF8String.fromString(new String(hex))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $ref.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
