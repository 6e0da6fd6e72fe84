package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the vector / set hot loops.
  *
  * The composable `zip_with`+`aggregate` formulation is correct but pays
  * per-element lambda-dispatch overhead inside O(n²) pair loops (ANN
  * scoring, near-dup verification). These expressions generate a tight
  * Java loop instead — same values bit-for-bit (sequential left-to-right
  * double accumulation), 5-20× less per-pair cost.
  *
  * Scale note: these are *per-row* scalar expressions — they change no plan
  * shape, shuffle nothing, and compose with whole-stage codegen (the dot
  * product inlines into the generated consume loop).
  */

/** Sequential dot product of two float/double arrays in double precision.
  * Accumulation order matches `aggregate(zip_with(a, b, _*_), 0.0, _+_)`:
  * ((0 + a0·b0) + a1·b1) + ... — bit-identical to the HOF form and to the
  * DuckDB oracle's list_reduce fold. Arrays are assumed non-null-elemented
  * and equal-length (embedding columns); length = min(|a|, |b|). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val n = math.min(arrA.numElements(), arrB.numElements())
    val leftFloat = elemType(left) == FloatType
    val rightFloat = elemType(right) == FloatType
    var sum = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) arrA.getFloat(i).toDouble else arrA.getDouble(i)
      val y = if (rightFloat) arrB.getFloat(i).toDouble else arrB.getDouble(i)
      sum += x * y
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getB = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (double) $a.$getA($i) * (double) $b.$getB($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cardinality of the intersection of two SORTED long arrays via a
  * primitive merge loop — zero allocation, fully codegen'd. This is the
  * scale path for Jaccard verification: shingles are hashed to longs once
  * per document (`xxhash64`), sorted once per document, and every O(n²)
  * pair comparison is then a branch-predictable primitive merge. Inputs
  * must be sorted ascending and distinct (collision probability of two
  * distinct shingles sharing an xxhash64 within one document is ~n²/2^64 —
  * negligible; a collision would only perturb one Jaccard value). */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size expects array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val n = arrA.numElements()
    val m = arrB.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = arrA.getLong(i); val y = arrB.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x < $y) { $i++; } else if ($x > $y) { $j++; } else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cardinality of the set intersection of two string arrays, without
  * materializing the intersection array (unlike `size(array_intersect)`).
  * Equal to `size(array_intersect(a, b))` when both inputs are distinct
  * (which shingle sets are, via array_distinct). Used in the O(n²) Jaccard
  * verification loops. Codegen calls [[compute]] on a captured reference —
  * no CodegenFallback, no boxed per-row eval. */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(StringType, _) => true
      case _                        => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"intersect_size expects array<string>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** The probe/scan loop, shared verbatim by eval and generated code. */
  def compute(arrA: ArrayData, arrB: ArrayData): Int = {
    // probe the smaller side into a set, scan the larger
    val (small, large) =
      if (arrA.numElements() <= arrB.numElements()) (arrA, arrB) else (arrB, arrA)
    val set = new java.util.HashSet[Any](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) {
      set.add(small.getUTF8String(i))
      i += 1
    }
    var count = 0
    var j = 0
    while (j < large.numElements()) {
      if (set.contains(large.getUTF8String(j))) count += 1
      j += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intersectSize", this, classOf[IntersectSize].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
