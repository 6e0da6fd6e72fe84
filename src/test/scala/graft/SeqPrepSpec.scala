package graft

import graft.functions.ZOrder
import graft.operators.{Chunker, CorpusStats, Packer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Training-sequence preparation operators: chunking, packing, winnowing,
  * unigram-LM scoring, z-order layout. Each is checked against a
  * hand-computed or brute-force reference; the DuckDB oracle gate
  * (q93–q97) re-verifies them end-to-end at sf0.01. */
class SeqPrepSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  // ───────────────────────── chunking ─────────────────────────

  test("chunk: window/stride arithmetic, tail chunk, empty doc") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "only three tokens"),
      (3L, "   ")                                      // no tokens at all
    ).toDF("doc_id", "text")
    val out = Chunker.chunk(docs, "doc_id", "text", width = 4, stride = 3)
      .orderBy("id", "chunk_idx").collect()
    // doc 1: starts 0,3,6,9 → sizes 4,4,4,1 ; doc 2: one chunk of 3
    val doc1 = out.filter(_.getLong(0) == 1L)
    assert(doc1.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(doc1.map(_.getInt(2)).toSeq == Seq(4, 4, 4, 1))
    assert(doc1(1).getString(3) == "t4 t5 t6 t7") // overlap: starts at token 4
    assert(doc1(3).getString(3) == "t10")
    val doc2 = out.filter(_.getLong(0) == 2L)
    assert(doc2.length == 1 && doc2(0).getString(3) == "only three tokens")
    assert(!out.exists(_.getLong(0) == 3L)) // empty doc emits nothing
  }

  test("chunk plan: no shuffle — pure per-row generate") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Chunker.chunk(docs, "doc_id", "text", 64, 48)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle:\n$plan")
  }

  // ───────────────────────── packing ─────────────────────────

  test("packGreedy: overflow starts a new pack; oversized doc owns one") {
    // single group so the greedy order is just id order
    val docs = Seq(
      (1L, 100), (2L, 250), (3L, 100), (4L, 500), (5L, 390), (6L, 10)
    ).toDF("doc_id", "n_toks")
    val out = Packer.packGreedy(docs, "doc_id", "n_toks", budget = 400, numGroups = 1)
      .orderBy("id").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getInt(4)))
    // 100+250 fit pack0; +100 → 450 overflows → pack1; 500 oversized → pack2
    // (occupies alone); 390 → pack3; +10 fits (400 exactly ≤ budget)
    assert(out.toSeq == Seq(
      (1L, 0L, 0), (2L, 0L, 1), (3L, 1L, 0), (4L, 2L, 0), (5L, 3L, 0), (6L, 3L, 1)))
  }

  test("packGreedy invariants on the real corpus: complete, deterministic, within budget") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), graft.functions.TextFunctions.tokenCount(col("text")).as("n_toks"))
    val packed = Packer.packGreedy(docs, "doc_id", "n_toks", budget = 400, numGroups = 4)
    val rows = packed.collect()
    assert(rows.length == docs.count()) // every doc exactly once
    // pack fill ≤ budget unless the pack is a single oversized doc
    val byPack = rows.groupBy(r => (r.getInt(0), r.getLong(3)))
    byPack.foreach { case ((g, p), members) =>
      val fill = members.map(_.getInt(2)).sum
      assert(fill <= 400 || members.length == 1,
        s"group $g pack $p overfull with ${members.length} docs ($fill tokens)")
    }
    // deterministic across runs
    val again = Packer.packGreedy(docs, "doc_id", "n_toks", budget = 400, numGroups = 4)
      .collect().map(_.toSeq).toSet
    assert(again == rows.map(_.toSeq).toSet)
  }

  // ───────────────────────── winnowing ─────────────────────────

  /** Plain-Scala reference: same normalization, k-grams, 32-bit md5 hash,
    * window minimum with rightmost tie, distinct selections. */
  private def winnowRef(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val toks = text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty)
    if (toks.length < k) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 to toks.length - k).map { i =>
      val hex = md.digest(toks.slice(i, i + k).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val nWin = math.max(hs.length - w + 1, 1)
    (1 to nWin).map { s =>
      val sl = hs.slice(s - 1, s - 1 + w)
      val minv = sl.min
      val rj = sl.lastIndexWhere(_ == minv) + 1
      (s - 1 + rj, minv)
    }.toSet
  }

  test("winnowFingerprints matches the brute-force reference") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "a completely different sentence that shares nothing with the others at all"),
      (3L, "tiny doc"),
      (4L, "word word word word word word word word word") // heavy ties
    )
    val out = CorpusStats.winnowFingerprints(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getLong(2))).toSet).toMap
    texts.foreach { case (id, t) =>
      assert(out.getOrElse(id, Set.empty) == winnowRef(t, 5, 4), s"doc $id")
    }
  }

  test("winnowing guarantee: a shared ≥ w+k−1 token run yields a shared fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 = w+k−1 tokens
    val docs = Seq(
      (1L, s"unrelated prefix words here $shared and some trailing material"),
      (2L, s"$shared with an entirely different continuation of the text")
    ).toDF("doc_id", "text")
    val fps = CorpusStats.winnowFingerprints(docs, "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty)
  }

  // ───────────────────────── unigram LM ─────────────────────────

  test("unigramLogProb: hand-computed add-one model") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = CorpusStats.unigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // counts: a=2 b=2 c=1, total=5, vocab=3 → denom 8
    val pa = math.log(3.0 / 8); val pb = math.log(3.0 / 8); val pc = math.log(2.0 / 8)
    def r2(x: Double) = math.round(x * 100) / 100.0
    assert(out(0).getLong(1) == 3 && out(0).getDouble(2) == r2((pa + pa + pb) / 3))
    assert(out(1).getLong(1) == 2 && out(1).getDouble(2) == r2((pb + pc) / 2))
  }

  // ───────────────────────── z-order ─────────────────────────

  test("zValue: bit interleave on known values") {
    // x=3 (11₂) even positions, y=1 (01₂) odd → 0111₂ = 7
    val out = Seq((3, 1)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 4).as("z")).head().getLong(0)
    assert(out == 7L)
    // full 16-bit round trip: interleave then de-interleave
    val vals = Seq((12345, 54321), (0, 65535), (65535, 0))
    vals.foreach { case (x, y) =>
      val z = Seq((x, y)).toDF("x", "y")
        .select(ZOrder.zValue(col("x"), col("y"), 16).as("z")).head().getLong(0)
      val xBack = (0 until 16).map(b => ((z >> (2 * b)) & 1L) << b).sum
      val yBack = (0 until 16).map(b => ((z >> (2 * b + 1)) & 1L) << b).sum
      assert(xBack == x && yBack == y)
    }
  }

  test("writeZOrdered: per-file bounding boxes shrink on BOTH dimensions") {
    // keys are SCALED into the shared bit range first (the zValue contract):
    // interleaving a 0–150 key with a 0–2500 key raw would let the wide
    // dimension's high bits own every split and degrade to a linear sort
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), to_date(lit("1992-01-01"))).as("d"))
    val (xMax, yMax) = {
      val r = raw.agg(max("o_custkey"), max("d")).head()
      (r.getLong(0).toDouble, r.getInt(1).toDouble)
    }
    val orders = raw
      .withColumn("o_custkey", floor(col("o_custkey") * 255 / xMax))
      .withColumn("d", floor(col("d") * 255 / yMax))
    val dir = Files.createTempDirectory("graft-zorder").toString
    ZOrder.writeZOrdered(orders, "o_custkey", "d", dir, numFiles = 8, bits = 8)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1)
    val global = orders.agg(
      (max("o_custkey") - min("o_custkey")).cast("double"),
      (max("d") - min("d")).cast("double")).head()
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath).agg(
        (max("o_custkey") - min("o_custkey")).cast("double"),
        (max("d") - min("d")).cast("double")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val meanX = spans.map(_._1).sum / spans.length
    val meanY = spans.map(_._2).sum / spans.length
    // a z-range of a uniform 2-D grid is a tile: BOTH dims narrow, unlike a
    // linear sort where the trailing dim keeps its full span in every file
    assert(meanX < 0.75 * global.getDouble(0), s"x span $meanX vs ${global.getDouble(0)}")
    assert(meanY < 0.75 * global.getDouble(1), s"y span $meanY vs ${global.getDouble(1)}")
    // and the layout loses no rows
    assert(spark.read.parquet(dir).count() == orders.count())
  }

  test("zValueN: 2-dim agrees with zValue; 3-dim round-trips") {
    val two = Seq((12345, 54321)).toDF("x", "y")
    val a = two.select(ZOrder.zValue(col("x"), col("y"), 16).as("z")).head().getLong(0)
    val b = two.select(ZOrder.zValueN(Seq(col("x"), col("y")), 16).as("z")).head().getLong(0)
    assert(a == b)
    val vals = Seq((123, 456, 789), (65535, 0, 32768))
    vals.foreach { case (x, y, z) =>
      val m = Seq((x, y, z)).toDF("x", "y", "z")
        .select(ZOrder.zValueN(Seq(col("x"), col("y"), col("z")), 16).as("m")).head().getLong(0)
      def back(i: Int) = (0 until 16).map(bb => ((m >> (bb * 3 + i)) & 1L) << bb).sum
      assert(back(0) == x && back(1) == y && back(2) == z)
    }
  }

  test("Packer.withOffsets: offsets are the running token sum within each pack") {
    import spark.implicits._
    val docs = Seq((1L, 100), (2L, 250), (3L, 100), (4L, 30)).toDF("doc_id", "n_toks")
    val out = graft.operators.Packer.withOffsets(
      graft.operators.Packer.packGreedy(docs, "doc_id", "n_toks", budget = 400, numGroups = 1))
      .orderBy("id").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getInt(5)))
    // pack0: [100, 250] -> offsets 0, 100 ; pack1: [100, 30] -> offsets 0, 100
    assert(out.toSeq == Seq((1L, 0L, 0), (2L, 0L, 100), (3L, 1L, 0), (4L, 1L, 100)))
  }
}
