package graft.tools
import graft.GraftSession
object SynProf {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-synprof", s"local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (i <- 1 to 2)
      System.err.println(f"[synprof] run $i: ${SyntheaBench.run(spark)}%.2fs")
    spark.stop()
  }
}
