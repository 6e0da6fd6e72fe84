package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash signatures + LSH banding for near-duplicate detection.
  *
  * Hash family: `h_i(s) = md5(i || ":" || s)` compared lexicographically —
  * md5 is uniform enough that the min over a set behaves like a classic
  * integer MinHash, and (crucially) the exact same value is computable in
  * any engine with an md5 function, which makes the DuckDB oracle exact.
  *
  * Everything is per-row (`transform` over the shingle array): computing a
  * k-perm signature for a document never shuffles. The LSH join in
  * [[graft.operators.Dedup]] shuffles only (doc_id, band_hash) pairs —
  * k·|docs| tiny rows — never the documents themselves. That is the 100 TB
  * design: signatures are computed map-side in one pass over the corpus and
  * candidate generation touches only fixed-width digests.
  */
object MinHash {

  /** k-permutation MinHash signature of a shingle array: for each seed i,
    * min over shingles of md5(i:shingle). Returns array<string> length k. */
  def signature(shingles: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, s => md5(concat(i.cast("string"), lit(":"), s))))
    )

  /** LSH band keys: split the signature into `bands` bands of `rowsPerBand`
    * and hash each band (prefixed with its index, so keys from different
    * bands can never collide) to one digest. Two docs sharing any band key
    * are candidates. Returns array<string> length `bands`. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      j => md5(concat_ws(",", j.cast("string"), slice(sig, j * rowsPerBand + 1, lit(rowsPerBand))))
    )

  /** Exact Jaccard similarity of two (distinct-element) arrays, computed as
    * |∩| / (|a| + |b| - |∩|) — integer sizes, one double division, so the
    * value is engine-independent. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - size(array_intersect(a, b))
    when(union === 0, lit(0.0)).otherwise(inter / union.cast("double"))
  }
}
