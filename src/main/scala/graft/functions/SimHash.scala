package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash (Charikar) fingerprints for near-duplicate detection.
  *
  * 60-bit fingerprint: for each bit b, sum over tokens of ±1 according to
  * bit b of md5(token); the fingerprint bit is 1 iff the sum is positive.
  * Bit b of a token's digest is extracted from the hex string arithmetically
  * (hex-digit value via position in "0123456789abcdef", then
  * floor(digit / 2^(3 - b mod 4)) mod 2), so the identical computation runs
  * in the DuckDB oracle — no engine-private hash anywhere. 60 bits (not 64)
  * keeps the packed value comfortably inside a signed long in every engine.
  *
  * Per-row `transform`/`aggregate` only — no UDF, no shuffle. Hamming
  * distance on the packed long uses the codegen'd `bit_count(a ^ b)`.
  */
object SimHash {

  private val HexDigits = "0123456789abcdef"

  /** Value (0-15) of hex char at 1-based position `pos` of digest `h`. */
  private def hexVal(h: Column, pos: Column): Column =
    (instr(lit(HexDigits), h.substr(pos, lit(1))) - 1).cast("long")

  /** 60-bit SimHash of a token array, packed into a long (MSB-first).
    * Custom expression: one MD5 per token (the HOF form re-hashes per bit —
    * 60× the digests). Values identical to [[simhashHof]]. */
  def simhash(tokens: Column, nBits: Int = 60): Column = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(graft.functions.expressions.SimHashExpr(expression(tokens), nBits))
  }

  /** Reference HOF implementation of [[simhash]] — kept for the equivalence
    * test; do not use on hot paths. */
  def simhashHof(tokens: Column, nBits: Int = 60): Column = {
    require(nBits > 0 && nBits <= 60, "nBits must be in 1..60 to stay positive in a signed long")
    val bitsArr = transform(
      sequence(lit(0), lit(nBits - 1)),
      b => {
        val weight = aggregate(
          tokens,
          lit(0L),
          (acc, t) => {
            val h = md5(t)
            val digit = hexVal(h, (b.cast("int").divide(lit(4)).cast("int")) + 1)
            // 2^(3 - b%4) ∈ {8,4,2,1}
            val power = element_at(
              array(lit(8L), lit(4L), lit(2L), lit(1L)),
              pmod(b.cast("int"), lit(4)) + 1
            )
            val bit = pmod(floor(digit / power).cast("long"), lit(2L))
            acc + (bit * 2 - 1)
          }
        )
        when(weight > 0, lit(1L)).otherwise(lit(0L))
      }
    )
    // pack MSB-first: fold(bits, 0, acc*2 + bit)
    aggregate(bitsArr, lit(0L), (acc, bit) => acc * 2 + bit)
  }

  /** Hamming distance between two packed simhash longs. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
