package graft

import graft.ops.Scd2
import graft.ops.Scd2.Scd2Spec
import graft.pipeline.FixedClock
import org.scalatest.funsuite.AnyFunSuite

/** Randomized property tests for the SCD2 merges (seeded — reproducible):
  * over arbitrary snapshots and mutations,
  *   1. singleShuffle ≡ faithful and singleShuffleIdiomatic ≡ idiomatic
  *      row-for-row,
  *   2. at most one active row per key,
  *   3. rerunning the SAME snapshot is a no-op on the active set — and in
  *      faithful mode drops inactive history of untouched keys (the
  *      reference's documented history-loss trap, §2.11),
  *   4. every changed key gets exactly one new active row.
  */
class Scd2PropertySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val spec = Scd2Spec(Seq("id"), Seq("name", "city"), "sk", "dim_p")
  private val t0 = FixedClock("2024-01-01 00:00:00")
  private val t1 = FixedClock("2024-06-01 00:00:00")
  private val t2 = FixedClock("2024-12-01 00:00:00")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted.toSeq
  }

  test("random snapshots: formulation equivalence + SCD2 invariants (12 seeds)") {
    (1 to 12).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      def word() = ("a" + rnd.alphanumeric.take(4).mkString).toLowerCase
      val keys = (1 to 3 + rnd.nextInt(8)).map(_.toString)
      val base = keys.map(k => (k, word(), word()))
      val r1 = base.toDF("id", "name", "city")

      // mutate: ~40% changed, ~20% dropped, plus brand-new keys
      val mutated = base.flatMap { case (k, n, c) =>
        rnd.nextInt(5) match {
          case 0 => None                       // dropped from snapshot
          case 1 | 2 => Some((k, n, word()))   // changed
          case _ => Some((k, n, c))            // unchanged
        }
      } ++ (1 to rnd.nextInt(3)).map(i => (s"new$i", word(), word()))
      val r2 = mutated.toDF("id", "name", "city")

      val v1 = Scd2.faithful(r1, None, spec, t0)
      val expected = Scd2.faithful(r2, Some(v1), spec, t1)
      val got = Scd2.singleShuffle(r2, Some(v1), spec, t1)
      assert(canon(got) == canon(expected), s"faithful equivalence, seed=$seed")

      val vi1 = Scd2.idiomatic(r1, None, spec, t0)
      val expI = Scd2.idiomatic(r2, Some(vi1), spec, t1)
      val gotI = Scd2.singleShuffleIdiomatic(r2, Some(vi1), spec, t1)
      assert(canon(gotI) == canon(expI), s"idiomatic equivalence, seed=$seed")

      // ≤ 1 active row per key (both modes)
      Seq(expected, expI).foreach { out =>
        val maxActive = out.filter($"is_active" === true)
          .groupBy($"id").count().agg(org.apache.spark.sql.functions.max($"count"))
          .head().getLong(0)
        assert(maxActive <= 1, s"active-per-key, seed=$seed")
      }

      // every changed key → exactly one new active row stamped at t1
      val changedKeys = base.collect {
        case (k, n, c) if mutated.exists(m => m._1 == k && (m._2, m._3) != (n, c)) => k
      }
      changedKeys.foreach { k =>
        val active = expected.filter($"id" === k && $"is_active" === true).collect()
        assert(active.length == 1, s"one active for changed key $k, seed=$seed")
        assert(active.head.getAs[java.sql.Timestamp]("created_at").toString.startsWith("2024-06-01"))
      }

      // rerun of the identical snapshot: active set unchanged; faithful
      // additionally drops inactive history of untouched keys (the trap)
      val rerun = Scd2.faithful(r2, Some(expected), spec, t2)
      val activeOnly = expected.filter($"is_active" === true)
      assert(canon(rerun) == canon(activeOnly), s"faithful rerun trap, seed=$seed")
      val rerunI = Scd2.idiomatic(r2, Some(expI), spec, t2)
      assert(canon(rerunI) == canon(expI), s"idiomatic rerun no-op, seed=$seed")
    }
  }
}
