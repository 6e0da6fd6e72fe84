package graft.io

import org.apache.spark.sql.DataFrame

/** Partition-count floor for compute-heavy map-side pipelines.
  *
  * A small parquet input (one file, one row group — exactly what the bench
  * tables look like) scans as a single partition, so per-row crypto/hash
  * loops (MinHash's k·|shingles| md5 calls, SimHash, cosine verification)
  * run on one core of the whole machine. At cluster scale the inputs
  * already carry ≥ parallelism partitions and this helper is a no-op — it
  * only adds its round-robin shuffle when the input is narrower than the
  * session's default parallelism, and the rows it moves are exactly the
  * rows the expensive stage was about to process anyway (shuffle cost ≪
  * the compute it unlocks).
  */
object Parallelism {

  /** Repartition `df` up to the session default parallelism iff it has
    * fewer partitions; otherwise return it unchanged (no added shuffle). */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
