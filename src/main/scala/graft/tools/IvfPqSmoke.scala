package graft.tools

import graft.operators.ProductQuant
import org.apache.spark.sql.functions._

/** Cross-JVM ANN-index persistence smoke, one phase per process — the
  * same two-lifetime proof shape as [[CatalogSmoke]] (the property under
  * test is that the index artifact outlives the training session).
  *
  * `IvfPqSmoke build <indexDir> <sfDir>`: train the residual IVF-PQ
  * index (q98's parameters), publish it with
  * [[ProductQuant.saveResidualIndex]], serve one query from the
  * just-built in-memory index, print `result=<rows>`.
  *
  * `IvfPqSmoke serve <indexDir> <sfDir>`: NEW JVM, load the published
  * index ([[ProductQuant.loadResidualIndex]] — no training code on this
  * path), serve the SAME query, print `result=<rows>`. The caller
  * asserts both lines identical: the artifact round-trips bit-exactly.
  */
object IvfPqSmoke {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: IvfPqSmoke build|serve <indexDir> <sfDir>")
    val Array(mode, indexDir, sfDir) = args
    val spark = graft.GraftSession.get(s"ivfpq-smoke-$mode")
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val index = mode match {
        case "build" =>
          val idx = ProductQuant.buildIvfPqResidual(
            emb, "vec_id", "embedding", coarseK = 4, m = 4, k = 8, iters = 2)
          val vdir = ProductQuant.saveResidualIndex(spark, idx, indexDir)
          println(s"published=$vdir")
          idx
        case "serve" => ProductQuant.loadResidualIndex(spark, indexDir)
        case other   => sys.error(s"unknown mode $other")
      }
      val qRow = emb.filter(col("vec_id") === 11).head()
      val query = qRow.getSeq[Float](qRow.fieldIndex("embedding")).toArray
      val t0 = System.nanoTime()
      val rows = ProductQuant.ivfPqResidualTopK(index, emb, "vec_id", "embedding",
          query, n = 10, nprobe = 2, shortlist = 40)
        .orderBy(col("cosine").desc, col("id").asc)
        .collect()
        .map(r => s"${r.getLong(0)}:${r.getDouble(1)}:${r.getDouble(2)}")
        .mkString(",")
      println(f"serve_s=${(System.nanoTime() - t0) / 1e9}%.2f")
      println(s"result=$rows")
    } finally spark.stop()
  }
}
