package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while seventeen pelicans " +
      "watch from the harbor wall and the tide slowly turns past the old lighthouse"
  private val docs = Seq(
    (1L, base, "s1"),
    (2L, "THE  " + base.drop(4), "s1"), // case/whitespace variant → identical normalized
    (3L, base.replace("seventeen", "nineteen"), "s1"), // one-token change → near-dup
    (4L, "completely different content about spark catalyst optimizers here", "s1"),
    (5L, "another unrelated document mentioning shuffle partitions and joins", "s2"),
    (6L, "too short", "s1"), // < shingle size: must not pair with anything
    (7L, "tiny", "s1")
  ).toDF("doc_id", "text", "source")

  test("exact dedup: normalized variants collapse, lowest id survives") {
    val out = Dedup.exact(docs, "text", "doc_id")
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 4L, 5L, 6L, 7L)) // 2 is an exact dup of 1 after normalize
  }

  test("minhash near-dups find the planted near-duplicate pair") {
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical after normalization
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near-dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // sub-shingle-size docs never become candidates (null-signature guard)
    assert(!pairs.exists(p => p._1 >= 6L || p._2 >= 6L))
  }

  test("bucketSurvivors: one representative per near-dup group survives; pair count stays linear") {
    val out = Dedup.bucketSurvivors(docs, "text", "doc_id", threshold = 0.4)
    val ids = out.select("doc_id").as[Long].collect().toSet
    // 1/2/3 are a near-dup group: the min id (1) survives, 2 and 3 are
    // removed by verified pairing with their bucket representative
    assert(ids.contains(1L) && !ids.contains(2L) && !ids.contains(3L))
    // dissimilar and sub-shingle docs are untouched
    assert(Set(4L, 5L, 6L, 7L).subsetOf(ids))
    // output carries the input row shape unchanged
    assert(out.columns.toSeq == docs.columns.toSeq)
    // a 30-way duplicated clique produces at most bands·n candidate
    // pairs (here: exactly n-1 distinct ones), never C(n,2)
    val clique = (0 until 30).map(i => (i.toLong, base, "s1"))
      .toDF("doc_id", "text", "source")
    val survivors = Dedup.bucketSurvivors(clique, "text", "doc_id", threshold = 0.4)
    assert(survivors.select("doc_id").as[Long].collect().toSeq == Seq(0L))
  }

  test("ngram jaccard blocks by key: cross-block pairs never compared") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", "source", 3, 0.1)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L)) // s2 block has one doc
  }

  test("simhash near-dups: identical-after-normalize pair at distance 0") {
    val pairs = Dedup.simhashNearDups(docs, "text", "doc_id", maxDistance = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("brute-force top-k: correct neighbor order, self excluded") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", 2)
      .collect()
    assert(out.length == 2)
    assert(out.find(_.getAs[Int]("rank") == 1).get.getAs[Long]("corpus_id") == 1L)
    assert(!out.exists(_.getAs[Long]("corpus_id") == 0L))
  }

  test("embedding near-dups above threshold only") {
    val pairs = Dedup.embeddingNearDups(vecs, "embedding", "vec_id", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("group sketches merge: sketch(all) == element-wise min of the half sketches") {
    val whole = Dedup.groupSketches(docs.withColumn("g", lit("all")), "text", "g")
      .head().getSeq[String](1)
    val halves = Dedup.groupSketches(
      docs.withColumn("g", concat(lit("h"), pmod(col("doc_id"), lit(2)))), "text", "g")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val merged = halves("h0").zip(halves("h1")).map { case (a, b) => if (a <= b) a else b }
    assert(merged == whole) // min is associative → sketches fold across splits
  }

  test("clusters: min-label propagation closes chains transitively, isolates stay singleton") {
    val nodes = (1L to 7L).toDF("id")
    // chain 1-2-3-4 (no direct 1-4 edge) + pair 5-6; 7 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.clusters(nodes, pairs)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap
    assert((1L to 4L).forall(out(_) == 1L)) // transitive closure, min id wins
    assert(out(5L) == 5L && out(6L) == 5L)
    assert(out(7L) == 7L)
  }

  test("repeatedSpans: planted shared span inside otherwise-unique docs is extracted exactly") {
    val boiler = "this software is provided as is without warranty of any kind express or implied"
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon $boiler zeta eta theta iota kappa"),
      (2L, s"one two three four five six seven $boiler eight nine ten eleven twelve"),
      (3L, "completely unrelated text with no shared content at all whatsoever here")
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "doc_id", "text", k = 5, minSpanTokens = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // boiler = 14 tokens → gram positions 6..15 in doc 1 (5 unique tokens
    // before it), 8..17 in doc 2 (7 before); span covers exactly the
    // boilerplate: end_pos + k - 1 = last boiler token
    assert(spans.toSet == Set((1L, 6, 15, 14L), (2L, 8, 17, 14L)))

    val stripped = Dedup.stripRepeatedSpans(docs, "doc_id", "text", k = 5, minSpanTokens = 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(stripped(1L) == (("alpha beta gamma delta epsilon zeta eta theta iota kappa", 14L)))
    assert(stripped(2L) == (("one two three four five six seven eight nine ten eleven twelve", 14L)))
    assert(stripped(3L)._2 == 0L) // untouched doc: nothing removed
  }

  test("stripRepeatedSpans: fully-duplicated docs come back empty, still present") {
    val dup = "exact duplicate document body repeated verbatim across the corpus twice over"
    val docs = Seq((1L, dup), (2L, dup), (3L, "unique short text")).toDF("doc_id", "text")
    val out = Dedup.stripRepeatedSpans(docs, "doc_id", "text", k = 5, minSpanTokens = 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == (("", 11L)) && out(2L) == (("", 11L)))
    assert(out(3L) == (("unique short text", 0L)))
  }

  test("paragraphNearDups: the edited-intro case — shared paragraph found below doc level") {
    val shared = (1 to 16).map(i => s"shared$i").mkString(" ") // one full 16-token chunk
    val docs = Seq(
      (1L, s"intro one totally different opening lines here padding pad1 pad2 pad3 pad4 pad5 pad6 pad7 pad8 $shared"),
      (2L, s"another beginning entirely unlike the first version text padx pady padz padw padv padu padt pads $shared"),
      (3L, "unrelated third document with nothing shared at all in any chunk window here")
    ).toDF("doc_id", "text")
    // width 16 → each doc = [own intro chunk, shared chunk]
    val pairs = Dedup.paragraphNearDups(docs, "doc_id", "text", width = 16, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    assert(pairs.length == 1)
    val (da, ca, db, cb, j) = pairs.head
    assert(da == 1L && ca == 1 && db == 2L && cb == 1 && j == 1.0)
    // whole-document minhash at the same threshold misses it: the edits
    // dilute global similarity below 0.9
    val docLevel = Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.9)
    assert(docLevel.count() == 0)
  }

  test("clusters: a long chain (diameter >> 10) converges with bounded plan depth") {
    // path graph 0-1-2-...-30: min-label moves ONE hop per iteration, so
    // this runs ~30 iterations — without the periodic localCheckpoint the
    // logical plan would stack 30 joins deep (planner cost grows per
    // iteration; lineage recovery replays the whole chain)
    val n = 31
    val nodes = (0L until n.toLong).toDF("id")
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.clusters(nodes, pairs)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap
    assert(out.size == n && out.values.forall(_ == 0L))
  }

  test("kmeans: clusters converge to the planted groups, deterministic across runs") {
    // two tight planted clusters around (1,0,...) and (0,1,...)
    val vecs = ((0 until 10).map(i => (i.toLong, Array(1.0f + i * 0.001f, 0.0f, 0.1f))) ++
      (10 until 20).map(i => (i.toLong, Array(0.0f, 1.0f + i * 0.001f, 0.1f))))
      .toDF("vec_id", "embedding")
    val a = Similarity.kmeansAssign(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("cell")).toMap
    val b = Similarity.kmeansAssign(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("cell")).toMap
    assert(a == b) // no RNG anywhere → bit-stable
    val c0 = (0L until 10L).map(a)
    val c1 = (10L until 20L).map(a)
    assert(c0.toSet.size == 1 && c1.toSet.size == 1 && c0.head != c1.head)
  }

  test("ivf: cell assignment routes to nearest centroid; probe search finds neighbor") {
    val centroids = Seq((0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("centroid_id", "embedding")
    val cells = Similarity.assignCells(vecs, centroids, "vec_id", "embedding")
    val cellOf = cells.select("id", "cell").as[(Long, Long)].collect().toMap
    assert(cellOf(1L) == 0L && cellOf(2L) == 1L)
    val topk = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0), centroids,
      "vec_id", "embedding", k = 1, nprobe = 1).collect()
    assert(topk.head.getAs[Long]("corpus_id") == 1L)
  }

  test("ppjoin prefix postings return the same pairs as full-index candidates") {
    // identical result set as before the prefix optimization (tested
    // indirectly: planted pairs + oracle; here: same pairs on the fixture)
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", "source", 3, 0.1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
  }

  test("lsh-bucketed embedding near-dup finds identical-direction pairs") {
    val out = Dedup.embeddingNearDupsLsh(vecs, "embedding", "vec_id", 0.8, nPlanes = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 1L))) // same-direction vectors share all SRP signs
    // and never a pair below threshold
    assert(!out.contains((0L, 4L))) // opposite direction
  }

  test("semantic near-dup: a cell-pruned subset of all-pairs, same cosines") {
    val all = Dedup.embeddingNearDups(vecs, "embedding", "vec_id", 0.8)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val sem = Similarity.semanticNearDups(vecs, "vec_id", "embedding",
      k = 2, iters = 2, threshold = 0.8)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // pruning only removes pairs, never invents them; surviving pairs carry
    // the identical exact cosine (same fp tree as the brute-force verifier)
    assert(sem.keySet.subsetOf(all.keySet))
    sem.foreach { case (pair, c) => assert(all(pair) == c) }
    // same-direction planted pair lands in one cell and survives pruning
    assert(sem.contains((0L, 1L)))
  }

  test("semantic near-dup plan: no corpus re-join on id (vec rides through the assignment)") {
    val sem = Similarity.semanticNearDups(vecs, "vec_id", "embedding",
      k = 2, iters = 2, threshold = 0.8)
    val plan = sem.queryExecution.executedPlan.toString
    // cell assignment is map-side and keeps (id, vec, cell); the only
    // exchanges left are the self-join's hashpartitioning on cell — an
    // id-keyed exchange means the corpus got re-joined to its assignment
    assert(!plan.contains("hashpartitioning(id"),
      s"corpus re-join on id crept back into semanticNearDups:\n$plan")
  }

  test("srp lsh buckets: deterministic, identical vectors share a bucket") {
    val dup = Seq((10L, Array(1.0f, 0.0f, 0.0f)), (11L, Array(1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val b = Similarity.lshBuckets(dup, "vec_id", "embedding").select("id", "bucket")
      .as[(Long, Long)].collect().toMap
    assert(b(10L) == b(11L))
  }
}
