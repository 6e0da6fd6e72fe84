package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dump explain("formatted") for named queries into plans/r19/. Usage:
  * runMain graft.tools.PlanDumpR19 <suffix> <q1,q2,...> */
object PlanDumpR19 {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(',').toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("graft-plandump-r19").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r19"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val clean = plan.flatMap(c =>
        if (c >= ' ' || c == '\n') c.toString
        else "\\u%04x".format(c.toInt))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"plans/r19/${name}_$suffix.txt"),
        (s"// $name — explain(formatted) at $sfDir ($suffix)\n" + clean + "\n")
          .getBytes("UTF-8"))
      System.err.println(s"[plandump] $name -> plans/r19/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
