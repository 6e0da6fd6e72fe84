package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) column functions over `array<float>` / `array<double>`.
  *
  * Built on the higher-order builtins `zip_with` / `aggregate` so the dot
  * product stays inside whole-stage codegen — no UDF, no serialization
  * round-trip. Accumulation is sequential in double precision, which is
  * also what the DuckDB oracle does, so results compare bit-for-bit at
  * equal input.
  *
  * Scale: all per-row; a brute-force top-k over N×M pairs is the *caller's*
  * shuffle decision (see [[graft.operators.Similarity]] for the
  * broadcast/LSH strategies).
  */
object VectorFunctions {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Sequential-sum dot product in double precision, as a custom codegen'd
    * Catalyst expression (tight Java loop). Bit-identical to [[dotHof]]. */
  def dot(a: Column, b: Column): Column =
    column(graft.functions.expressions.DotProduct(expression(a), expression(b)))

  /** The composable higher-order-function formulation of [[dot]] — kept as
    * the reference implementation (tests assert both agree); ~10× slower
    * per pair due to lambda dispatch. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, 0 when either norm is 0. Computed exactly as
    * dot / (sqrt(dot(a,a)) * sqrt(dot(b,b))) — the oracle mirrors this
    * formula (not a builtin cosine) to keep fp-op order identical. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Symmetric int8 quantization scale: max(|x|)/127 in double precision.
    * 0.0 for all-zero vectors (the quantized form is then all zeros). */
  def quantScale(a: Column): Column =
    array_max(transform(a, x => abs(x.cast("double")))) / lit(127.0)

  /** Symmetric int8 quantization of a vector given its [[quantScale]]:
    * q_i = floor(x_i/scale + 0.5), i.e. round-half-up — written as a floor
    * so the DuckDB oracle (whose `round` is half-away-from-zero) can mirror
    * it exactly. Range is [-127, 127] by construction (|x| ≤ 127·scale).
    * 4× smaller than float32 at rest; the dequantized dot `scaleA·scaleB·
    * Σ qa_i·qb_i` runs in integer math — the standard trick for ANN scans
    * over quantized corpora. */
  def quantizeInt8(a: Column, scale: Column): Column =
    when(scale === 0.0, transform(a, _ => lit(0L)))
      .otherwise(transform(a, x => floor(x.cast("double") / scale + lit(0.5)).cast("long")))

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(
      aggregate(
        zip_with(a, b, (x, y) => {
          val diff = x.cast("double") - y.cast("double")
          diff * diff
        }),
        lit(0.0),
        (acc, v) => acc + v
      )
    )
}
