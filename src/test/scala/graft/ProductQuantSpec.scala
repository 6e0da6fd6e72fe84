package graft

import graft.operators.ProductQuant
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization on the real embeddings table (sf0.001): encoding
  * shape/compression, training determinism, and ADC-with-rerank recall
  * against the exact brute force. */
class ProductQuantSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  // sf0.01: 500 vectors — enough to train a meaningful quantizer (PQ on a
  // 50-vector corpus is all noise; recall there says nothing)
  private lazy val corpus =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("codes have m entries in [0, k); training is deterministic") {
    val model = ProductQuant.train(corpus, "vec_id", "embedding", m = 8, k = 8, iters = 2)
    assert(model.codebooks.length == 8 && model.codebooks.forall(_.length == 8))
    assert(model.subDim == 8) // 64-dim embeddings
    val again = ProductQuant.train(corpus, "vec_id", "embedding", m = 8, k = 8, iters = 2)
    assert(again == model) // no RNG anywhere
    val enc = ProductQuant.encode(corpus, "vec_id", "embedding", model)
    val rows = enc.collect()
    assert(rows.length == corpus.count())
    rows.foreach { r =>
      val codes = r.getSeq[Int](r.fieldIndex("codes"))
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 8))
    }
  }

  test("IVF-PQ: probing a cell subset keeps recall while scoring a fraction") {
    val index = ProductQuant.buildIvfPq(corpus, "vec_id", "embedding",
      coarseK = 8, m = 8, k = 8, iters = 2)
    // routing really prunes: nprobe=2 of 8 cells scores a strict subset
    val probedRows = index.cells
      .groupBy("cell").count().orderBy(desc("count")).collect()
    assert(probedRows.length == 8) // all coarse cells populated
    val queries = corpus.orderBy("vec_id").limit(3)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val n = 5
    val recalls = queries.map { case (qid, qvec) =>
      val ids = ProductQuant.ivfPqTopK(index, corpus, "vec_id", "embedding",
        qvec, n, nprobe = 2, shortlist = 30)
        .select("id").collect().map(_.getLong(0))
      assert(ids.head == qid, s"query $qid not its own top-1") // self routes home
      val qArr = array(qvec.map(x => lit(x.toDouble)): _*)
      val exact = corpus
        .withColumn("cos", graft.functions.VectorFunctions.cosine(col("embedding"), qArr))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(n).select("vec_id").collect().map(_.getLong(0))
      ids.toSet.intersect(exact.toSet).size.toDouble / n
    }
    val mean = recalls.sum / recalls.length
    info(f"IVF-PQ mean recall@$n = $mean%.2f at nprobe=2/8 (per-query: ${recalls.mkString(", ")})")
    assert(mean >= 0.6, s"IVF-PQ recall too low: $mean")
  }

  test("ADC + exact re-rank: high recall vs brute force, self is top-1") {
    val model = ProductQuant.train(corpus, "vec_id", "embedding", m = 8, k = 8, iters = 2)
    val enc = ProductQuant.encode(corpus, "vec_id", "embedding", model).cache()
    val queries = corpus.orderBy("vec_id").limit(3)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)

    val n = 5
    val recalls = queries.map { case (qid, qvec) =>
      // 10% shortlist — the standard ADC-prune/exact-rerank operating point
      val approxIds = ProductQuant.adcTopK(enc, corpus, "vec_id", "embedding",
        model, qvec, n, shortlist = 50)
        .select("id").collect().map(_.getLong(0))
      // the query vector itself is in the corpus → must rank first
      assert(approxIds.head == qid, s"query $qid not its own top-1")
      val qArr = array(qvec.map(x => lit(x.toDouble)): _*)
      val exactIds = corpus
        .withColumn("cos", graft.functions.VectorFunctions.cosine(col("embedding"), qArr))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(n).select("vec_id").collect().map(_.getLong(0))
      approxIds.toSet.intersect(exactIds.toSet).size.toDouble / n
    }
    val mean = recalls.sum / recalls.length
    info(f"mean recall@$n = $mean%.2f (per-query: ${recalls.mkString(", ")})")
    assert(mean >= 0.7, s"mean recall@$n too low: $mean (${recalls.toSeq})")
  }

  test("residual IVF-PQ: deterministic build, codes in range, competitive recall") {
    val build = () => ProductQuant.buildIvfPqResidual(corpus, "vec_id", "embedding",
      coarseK = 4, m = 8, k = 8, iters = 2)
    val index = build()
    assert(index.model.codebooks.length == 8 && index.model.subDim == 8)
    val rows = index.encoded.collect()
    assert(rows.length == corpus.count())
    rows.foreach { r =>
      assert(r.getInt(r.fieldIndex("cell")) >= 0 && r.getInt(r.fieldIndex("cell")) < 4)
      val codes = r.getSeq[Int](r.fieldIndex("codes"))
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 8))
    }
    // no RNG anywhere: identical model + codes on rebuild
    val again = build()
    assert(again.model == index.model && again.centroids == index.centroids)

    val queries = corpus.orderBy("vec_id").limit(3)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val n = 5
    val recalls = queries.map { case (qid, qvec) =>
      val ids = ProductQuant.ivfPqResidualTopK(index, corpus, "vec_id", "embedding",
        qvec, n, nprobe = 2, shortlist = 50)
        .select("id").collect().map(_.getLong(0))
      assert(ids.head == qid, s"query $qid not its own top-1")
      val qArr = array(qvec.map(x => lit(x.toDouble)): _*)
      val exact = corpus
        .withColumn("cos", graft.functions.VectorFunctions.cosine(col("embedding"), qArr))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(n).select("vec_id").collect().map(_.getLong(0))
      ids.toSet.intersect(exact.toSet).size.toDouble / n
    }
    val mean = recalls.sum / recalls.length
    info(f"residual IVF-PQ mean recall@$n = $mean%.2f at nprobe=2/4")
    assert(mean >= 0.7, s"residual recall too low: $mean (${recalls.toSeq})")
  }

  test("saveResidualIndex: a concurrently-claimed version is skipped, never interleaved") {
    val index = ProductQuant.buildIvfPqResidual(corpus, "vec_id", "embedding",
      coarseK = 4, m = 4, k = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-claim").toString
    val v1 = ProductQuant.saveResidualIndex(spark, index, dir)
    assert(v1.endsWith("/v1"))
    // simulate a concurrent publisher that has already CLAIMED v2 (its
    // exclusive _CLAIM marker exists, its data is still in flight)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/v2/_CLAIM"), false).close()
    // our publish must NOT write into the claimed v2 — it lands v3
    val v3 = ProductQuant.saveResidualIndex(spark, index, dir)
    assert(v3.endsWith("/v3"), s"publisher reused a claimed version: $v3")
    assert(ProductQuant.currentVersion(spark, dir).contains(3))
    // v2 stays exactly as the other publisher left it (claim marker only)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/v2"))
      .map(_.getPath.getName).toSeq == Seq("_CLAIM"))
    // the published artifact round-trips from the pointer as usual
    val loaded = ProductQuant.loadResidualIndex(spark, dir)
    assert(loaded.model.m == 4 && loaded.encoded.count() == corpus.count())
  }
}
