package graft.tools
object SyntheaBenchMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("synthea-bench", s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val s = SyntheaBench.run(spark)
    println(f"SYNTHEA_E2E: $s%.2f s")
    val s2 = SyntheaBench.run(spark)
    println(f"SYNTHEA_E2E warm2: $s2%.2f s")
    spark.stop()
  }
}
