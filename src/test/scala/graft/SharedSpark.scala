package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole forked test JVM. */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test", "local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
