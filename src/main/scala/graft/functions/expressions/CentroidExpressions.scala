package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Broadcast-variable nearest-centroid assignment — the k·dim scale path
  * for IVF cell assignment and k-means training.
  *
  * The literal formulation in [[graft.operators.Similarity.assignCells]]
  * (an `array(struct(-cosine(vec, lit-array), cid) × k)` expression) is the
  * right plan at small k — constant-folded centroid norms, pure map-side —
  * but its CODEGEN size grows with k·dim: every centroid component is a
  * literal in the generated method, and at SemDeDup's k = ⌈√n⌉ (k ≈ 31.6k
  * at 10⁹ docs) the expression tree is hundreds of MB and blows the 64 KB
  * JVM method / codegen limits long before memory is a problem.
  *
  * These expressions keep the SAME math — sequential min-length double
  * dot fold ([[DotProduct]]'s order), `sqrt` norms, the zero-norm cosine
  * guard, argmin with Spark's NaN-safe double ordering and ties to the
  * lower centroid id — but ship the centroid matrix as a [[Broadcast]]
  * consumed through one `references[]` slot: codegen size is O(1) in k,
  * the matrix moves to each executor once (exactly the bytes the literal
  * tree re-shipped with every task), and the per-row loop is a tight
  * primitive scan. Bit-identical outputs are spec-asserted against the
  * literal path and oracle-gated (q132/q133 replay q38/q68's SQL through
  * this path with the threshold forced to 0).
  */

/** Centroid matrix in row-major flat layout. `ids` are the caller's
  * centroid ids sorted ascending (tie-break order); float inputs are
  * widened to double driver-side (exact). `useCosine` selects the metric:
  * argmax cosine (as argmin −cosine) vs argmin squared L2. */
final case class CentroidModel(
    ids: Array[Int],
    flat: Array[Double],
    dim: Int,
    useCosine: Boolean) {

  @inline private def k: Int = ids.length

  /** sqrt(Σ c_i²) per centroid — the same value the literal path's
    * constant-folded `norm(centArr)` produces. Lazily rebuilt after
    * deserialization on each executor (k doubles, trivial). */
  @transient private lazy val norms: Array[Double] = {
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      var s = 0.0
      var d = 0
      val off = j * dim
      while (d < dim) { val c = flat(off + d); s += c * c; d += 1 }
      out(j) = math.sqrt(s)
      j += 1
    }
    out
  }

  /** Spark's nanSafeCompareDoubles(x, best) < 0: NaN sorts greatest and
    * equals itself; −0.0 == 0.0. Ties keep the incumbent (lower id,
    * because ids iterate ascending) — exactly `array_min` over
    * (score, cid) structs. */
  @inline private def lessThan(x: Double, best: Double): Boolean =
    !java.lang.Double.isNaN(x) && (java.lang.Double.isNaN(best) || x < best)

  def nearest(arr: ArrayData, isFloat: Boolean): Int = {
    val n = arr.numElements()
    // vec self-norm: full-length fold, like norm(col("vec"))
    var na = 0.0
    if (useCosine) {
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        na += x * x
        i += 1
      }
      na = math.sqrt(na)
    }
    val m = math.min(n, dim) // DotProduct's min-length contract
    var best = ids(0)
    var bestScore = score(arr, isFloat, 0, m, na)
    var j = 1
    while (j < k) {
      val s = score(arr, isFloat, j, m, na)
      if (lessThan(s, bestScore)) { best = ids(j); bestScore = s }
      j += 1
    }
    best
  }

  @inline private def score(arr: ArrayData, isFloat: Boolean, j: Int, m: Int, na: Double): Double = {
    val off = j * dim
    if (useCosine) {
      var dot = 0.0
      var i = 0
      while (i < m) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * flat(off + i)
        i += 1
      }
      val nb = norms(j)
      if (na == 0.0 || nb == 0.0) -0.0 else -(dot / (na * nb))
    } else {
      var sum = 0.0
      var i = 0
      while (i < m) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val diff = x - flat(off + i)
        sum += diff * diff
        i += 1
      }
      sum
    }
  }
}

/** Nearest-centroid id for a vector column against a broadcast
  * [[CentroidModel]]. Null input → null (wrap in `coalesce(…, -1)` for the
  * non-nullable cell-key contract). Codegen resolves the broadcast once
  * per generated-class instance into mutable state — the per-row code is
  * a single virtual call into the tight model loop. */
case class NearestCentroid(child: Expression, bc: Broadcast[CentroidModel])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects array<float|double>, got $t")
    }

  override def nullSafeEval(a: Any): Any =
    bc.value.nearest(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelCls = classOf[CentroidModel].getName
    val bcCls = classOf[Broadcast[_]].getName
    val bcRef = ctx.addReferenceObj("centroidBc", bc, bcCls)
    val model = ctx.addMutableState(modelCls, "centroidModel",
      v => s"$v = ($modelCls) (($bcCls) $bcRef).value();")
    defineCodeGen(ctx, ev, a => s"$model.nearest($a, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-group nearest-centroid id: `grp` selects the group's model from a
  * broadcast map (the [[graft.operators.Similarity.kmeansFitGrouped]]
  * when-chain, without m·k·dim literals in codegen). Unknown group → −1,
  * matching the chain's `otherwise(lit(-1))`. */
case class NearestCentroidGrouped(
    left: Expression,
    right: Expression,
    bc: Broadcast[Map[Int, CentroidModel]])
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def isFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid_grouped expects (int, array<float|double>), got ($l, $r)")
    }

  override def nullSafeEval(g: Any, a: Any): Any =
    compute(g.asInstanceOf[Int], a.asInstanceOf[ArrayData])

  def compute(grp: Int, arr: ArrayData): Int =
    bc.value.get(grp) match {
      case Some(m) => m.nearest(arr, isFloat)
      case None    => -1
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestGrouped", this,
      classOf[NearestCentroidGrouped].getName)
    defineCodeGen(ctx, ev, (g, a) => s"$ref.compute($g, $a)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
