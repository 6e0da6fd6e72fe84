package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the query-group traits. */
private[graft] trait QueryBase {
  protected def T(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") graft.io.Readers.parquetNanos(s, s"$dir/events.parquet", Seq("ts"))
    else s.read.parquet(s"$dir/$name.parquet")

  /** Gate for in-query lifecycle ASSERTS that launch extra Spark
    * actions (count/agg/exceptAll probes whose only consumer is a
    * `require`). The asserted invariants are not the measured operator
    * (guide §1.4 — time the computation, not its audit), so the bench
    * and the oracle gate run with checks off; QueryChecksSpec replays
    * every gated query with checks ON so each invariant stays pinned
    * under test. The returned DataFrame is identical either way. */
  protected def checks: Boolean = QueryChecks.enabled
}

/** Test-only switch for the in-query invariant asserts (see
  * [[QueryBase.checks]]); flipped on by QueryChecksSpec, or by the
  * `SPARK_GRAFT_CHECKS=1` environment variable so the checks-on replay
  * can also run at the bench scale factor (e.g.
  * `SPARK_GRAFT_CHECKS=1 runMain graft.Verify /root/testdata/sf0.1 …`)
  * — scale-sensitive invariants (manifest counts, one-manifest probes)
  * are then verifiable at exactly the SF the bench runs, not only at
  * QueryChecksSpec's sf0.001. */
private[graft] object QueryChecks {
  @volatile var enabled: Boolean =
    sys.env.get("SPARK_GRAFT_CHECKS").exists(v => v == "1" || v == "true")
}
