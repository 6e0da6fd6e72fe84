package graft

import graft.functions.{VectorFunctions => VF}
import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("redactPii masks emails, phones and IPv4s and counts each category") {
    val df = Seq(
      ("mail a.b+c@foo-bar.org then call +1-555-123 4567 from 192.168.0.1", 1),
      ("no pii here at all", 2)
    ).toDF("text", "id")
    val r = Curation.redactPii(df, "text").orderBy("id").collect()
    val hit = r(0)
    assert(hit.getAs[Int]("n_emails") == 1)
    assert(hit.getAs[Int]("n_phones") == 1)
    assert(hit.getAs[Int]("n_ips") == 1)
    val red = hit.getAs[String]("redacted")
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<IP>"))
    assert(!red.contains("@") && !red.contains("192.168"))
    val clean = r(1)
    assert(clean.getAs[Int]("n_emails") == 0 && clean.getAs[String]("redacted") == "no pii here at all")
  }

  test("hashSplit is deterministic, covers all rows, and roughly honors ratios") {
    val df = spark.range(1, 2001).toDF("id")
    val s1 = Curation.hashSplit(df, "id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = Curation.hashSplit(df, "id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2) // content-addressed: identical across runs
    assert(s1.values.sum == 2000)
    assert(s1("train") > 1400 && s1("train") < 1800) // ~80%
    assert(s1("val") > 100 && s1("val") < 300)       // ~10%
  }

  test("stratifiedSample keeps ~pct% in every stratum, stable across runs") {
    val df = spark.range(1, 4001).toDF("id")
      .withColumn("stratum", pmod(col("id"), lit(4)))
    val kept = Curation.stratifiedSample(df, "id", 25)
    val byStratum = kept.groupBy("stratum").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byStratum.size == 4)
    byStratum.values.foreach(n => assert(n > 150 && n < 350)) // ~250 each
    // sampling is a pure filter: sampled keys are a subset of input keys
    assert(kept.count() == byStratum.values.sum)
  }

  test("sampleByRates keeps per-stratum rates; unlisted strata drop entirely") {
    val df = spark.range(1, 3001).toDF("id")
      .withColumn("src", element_at(array(lit("wiki"), lit("crawl"), lit("junk")),
        (pmod(col("id"), lit(3)) + 1).cast("int")))
    val kept = Curation.sampleByRates(df, "src", "id", Map("wiki" -> 100, "crawl" -> 20))
    val counts = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("wiki") == 1000)                      // 100% kept
    assert(counts("crawl") > 120 && counts("crawl") < 280) // ~20%
    assert(!counts.contains("junk"))                    // unlisted → dropped
  }

  test("int8 quantization: |dequantized - original| <= scale/2, zero vector → zeros") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 127.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("id", "vec")
    val q = df
      .withColumn("scale", VF.quantScale(col("vec")))
      .withColumn("q", VF.quantizeInt8(col("vec"), col("scale")))
      .orderBy("id").collect()
    val r1 = q(0)
    val scale = r1.getAs[Double]("scale")
    val qs = r1.getSeq[Long](r1.fieldIndex("q"))
    val orig = r1.getSeq[Float](r1.fieldIndex("vec"))
    assert(qs.forall(v => v >= -127 && v <= 127))
    qs.zip(orig).foreach { case (qi, xi) =>
      assert(math.abs(qi * scale - xi) <= scale / 2 + 1e-12)
    }
    val r2 = q(1)
    assert(r2.getAs[Double]("scale") == 0.0)
    assert(r2.getSeq[Long](r2.fieldIndex("q")).forall(_ == 0L))
  }

  test("weightedSample: w=1 keeps all, w=0 keeps none, monotone in weight, deterministic") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, 0.3, 0.8)).toDF("k", "lo_w", "hi_w")
    assert(Curation.weightedSample(df.withColumn("w", lit(1.0)), "k", "w").count() == 2000)
    assert(Curation.weightedSample(df.withColumn("w", lit(0.0)), "k", "w").count() == 0)
    val lo = Curation.weightedSample(df, "k", "lo_w").select("k").collect().map(_.getLong(0)).toSet
    val hi = Curation.weightedSample(df, "k", "hi_w").select("k").collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi)) // per-key threshold is monotone in the weight
    // rates land near the weights (16-bit hash, 2000 keys)
    assert(math.abs(lo.size / 2000.0 - 0.3) < 0.05)
    assert(math.abs(hi.size / 2000.0 - 0.8) < 0.05)
    val again = Curation.weightedSample(df, "k", "lo_w").select("k").collect().map(_.getLong(0)).toSet
    assert(again == lo)
  }
}
