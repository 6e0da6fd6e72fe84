package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only timing scratch: run named queries N times each in one warm
  * session, dropping caches between runs.
  * Usage: runMain graft.tools.Scratch <sfDir> <q1,q2,...> [reps]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-scratch", s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (name <- names; i <- 1 to reps) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      System.err.println(f"[scratch] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
    }
    spark.stop()
  }
}
