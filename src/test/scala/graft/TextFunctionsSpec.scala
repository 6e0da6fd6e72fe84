package graft

import graft.functions.{MinHash, SimHash, TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("v")).head().get(0)

  test("normalize + fingerprint stable under case/whitespace noise") {
    val a = one(TF.fingerprint(col("t")), "Hello   World")
    val b = one(TF.fingerprint(col("t")), "  hello world ")
    assert(a == b)
  }

  test("tokenCount: empty → 0, whitespace runs collapse") {
    assert(one(TF.tokenCount(col("t")), "") == 0)
    assert(one(TF.tokenCount(col("t")), "   ") == 0)
    assert(one(TF.tokenCount(col("t")), "a  b\tc") == 3)
  }

  test("subwordCount: letters/digits/punct regimes") {
    assert(one(TF.subwordCount(col("t")), "abc123!?") == 4) // abc, 123, !, ?
  }

  test("wordShingles: fewer tokens than n → empty; distinct applied") {
    assert(one(TF.wordShingles(col("t"), 3), "a b").asInstanceOf[scala.collection.Seq[_]].isEmpty)
    val sh = one(TF.wordShingles(col("t"), 2), "x y x y").asInstanceOf[scala.collection.Seq[_]]
    assert(sh.toSet == Set("x y", "y x")) // "x y" appears twice, deduped
  }

  test("langId picks dominant stopword language; zh wins ties by declaration order") {
    assert(one(TF.langId(col("t")), "the cat and the dog is that") == "en")
    assert(one(TF.langId(col("t")), "der hund und die katze ist nicht") == "de")
    assert(one(TF.langId(col("t")), "中文文本") == "zh")
    assert(one(TF.langId(col("t")), "nothing matches here at all") == "zh") // all-zero tie
  }

  test("rollingHash: deterministic, order-sensitive") {
    val a = one(TF.rollingHash(col("t")), "abc")
    val b = one(TF.rollingHash(col("t")), "abc")
    val c = one(TF.rollingHash(col("t")), "acb")
    assert(a == b && a != c)
  }

  test("minhash jaccard: identical=1, disjoint=0, bounds") {
    val df = Seq((Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("a"), Seq("b")), (Seq("a", "b"), Seq("b", "c"))).toDF("x", "y")
    val j = df.select(MinHash.jaccard(col("x"), col("y")).as("j")).collect().map(_.getDouble(0))
    assert(j(0) == 1.0 && j(1) == 0.0 && math.abs(j(2) - 1.0 / 3) < 1e-12)
  }

  test("minhash signature: similar sets agree on most permutations") {
    val df = Seq(
      (1, (1 to 50).map(i => s"sh$i")),
      (2, (1 to 50).map(i => s"sh$i")),           // identical
      (3, (1 to 50).map(i => s"other$i"))          // disjoint
    ).toDF("id", "sh")
    val sigs = df.select(col("id"), MinHash.signature(col("sh"), 16).as("sig"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(sigs(1) == sigs(2))
    assert(sigs(1) != sigs(3))
  }

  test("simhash: identical docs → distance 0; unrelated docs differ") {
    val df = Seq(
      (1, Seq("alpha", "beta", "gamma", "delta")),
      (2, Seq("alpha", "beta", "gamma", "delta")),
      (3, Seq("zv1", "zv2", "zv3", "zv4", "zv5", "zv6"))
    ).toDF("id", "toks")
    val fp = df.select(col("id"), SimHash.simhash(col("toks")).as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fp(1) == fp(2))
    assert(fp(1) != fp(3))
    val d = Seq((fp(1), fp(3))).toDF("a", "b")
      .select(SimHash.hamming(col("a"), col("b"))).head().getInt(0)
    assert(d > 0 && d <= 60)
  }
}
