package graft.tools

import graft.GraftSession

/** Plan auditor: prints the formatted physical plan for selected queries and
  * greps it for the scale-critical properties (pushed filters, pruned scan
  * schemas, broadcast joins, whole-stage codegen coverage). Run manually:
  *   sbt "runMain graft.tools.ExplainAudit q04_star_join ..."
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q02_filter_project", "q04_star_join")
    val spark = GraftSession.builder("graft-explain", "local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, dir)
      // materialize first: AQE re-plans at runtime and only the FINAL plan
      // carries codegen ids / chosen join strategies worth auditing
      df.queryExecution.toRdd.foreachPartition(
        (_: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => ())
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(plan)
      val checks = Seq(
        "PushedFilters" -> plan.contains("PushedFilters: ["),
        "BroadcastHashJoin" -> plan.contains("BroadcastHashJoin"),
        // the pre-execution AQE formatted plan carries no codegen ids;
        // the executedPlan tree marks codegen stages with "*(n)"
        "WholeStageCodegen" -> df.queryExecution.executedPlan.toString.contains("*("),
        "AQE" -> plan.contains("AdaptiveSparkPlan")
      )
      println("CHECKS: " + checks.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    spark.stop()
  }
}
