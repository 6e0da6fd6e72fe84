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
    * min over shingles of md5(i:shingle). Returns array<string> length k.
    * Custom expression (one tight loop, reused digest) — value-identical to
    * [[signatureHof]]. */
  def signature(shingles: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(graft.functions.expressions.MinHashSig(expression(shingles), k))
  }

  /** Reference HOF implementation of [[signature]] (equivalence-tested). */
  def signatureHof(shingles: Column, k: Int): Column =
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

  /** Jaccard from precomputed sizes: |∩| / (|a| + |b| - |∩|) — integer
    * inputs, one double division, so the value is engine-independent.
    * `nInter` should be a materialized column when the pair relation is
    * large: inlining `array_intersect` here would evaluate it once per
    * reference (3×). */
  def jaccardFromSizes(nInter: Column, nA: Column, nB: Column): Column = {
    val union = nA + nB - nInter
    when(union === 0, lit(0.0)).otherwise(nInter.cast("double") / union.cast("double"))
  }

  /** Set-intersection cardinality without materializing the intersection
    * array (custom expression; equals size(array_intersect) on distinct
    * inputs like shingle sets). */
  def intersectSize(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(graft.functions.expressions.IntersectSize(expression(a), expression(b)))
  }

  /** Hash a (distinct) shingle array to a sorted long array — done once per
    * document so the O(n²) pair loops compare primitive longs instead of
    * strings. Pair with [[sortedIntersectSize]]. */
  def hashedShingles(shingles: Column): Column =
    array_sort(transform(shingles, s => xxhash64(s)))

  /** Merge-intersect cardinality over two sorted long arrays (codegen'd
    * primitive loop; see SortedLongIntersectSize for the collision note). */
  def sortedIntersectSize(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(graft.functions.expressions.SortedLongIntersectSize(expression(a), expression(b)))
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. Convenience
    * single-use form; for O(n²) pair loops materialize the intersection
    * size first and use [[jaccardFromSizes]]. */
  def jaccard(a: Column, b: Column): Column =
    jaccardFromSizes(intersectSize(a, b), size(a), size(b))
}
