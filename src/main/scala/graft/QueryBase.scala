package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the query-group traits. */
private[graft] trait QueryBase {
  protected def T(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") graft.io.Readers.parquetNanos(s, s"$dir/events.parquet", Seq("ts"))
    else s.read.parquet(s"$dir/$name.parquet")
}
