package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import graft.functions.{MinHash, TextFunctions}
import org.apache.spark.sql.functions._

/** Dev-only timing scratch. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-scratch", s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val (shingleSize, numHashes, bands) = (3, 16, 4)
    val rowsPerBand = numHashes / bands

    val banded = TextFunctions.withShingles(df, "text", "__sh", shingleSize)
      .withColumn("__sig", MinHash.signature(col("__sh"), numHashes))
      .select(col("doc_id").as("id"),
        posexplode(MinHash.bandKeys(col("__sig"), bands, rowsPerBand))
          .as(Seq("band_idx", "band_key")))
      .cache()
    t("banded cache build")(banded.count())

    val cands = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    t("candidate join")(cands.count())

    val shingled = TextFunctions.withShingles(df, "text", "__sh", shingleSize)
      .select(col("doc_id").as("id"), MinHash.hashedShingles(col("__sh")).as("shingles"))
      .cache()
    t("hashed shingles cache")(shingled.count())

    val verified = cands
      .join(shingled.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
      .join(shingled.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
      .withColumn("__ni", MinHash.sortedIntersectSize(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        MinHash.jaccardFromSizes(col("__ni"), size(col("sh_a")), size(col("sh_b"))))
      .filter(col("jaccard") >= 0.3)
    t("verification")(verified.count())

    t("q28 end-to-end (fresh plans, caches dropped)") {
      spark.catalog.clearCache()
      Dedup.minhashNearDups(df, "text", "doc_id", 0.3, 3, 16, 4).count()
    }
    t("q28 again (warm JIT, caches dropped)") {
      spark.catalog.clearCache()
      Dedup.minhashNearDups(df, "text", "doc_id", 0.3, 3, 16, 4).count()
    }
    spark.stop()
  }
}
