package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Stage sequencing — the engine-side equivalent of the reference's
  * Lambda + Glue Workflow orchestration (SURVEY.md §3.1; reference:
  * Automation/Lambda:14-112).
  *
  * The reference crosses four process boundaries (S3 event → Lambda → Glue
  * job → Glue workflow → 3 more jobs) with S3 paths as the only shared
  * state. Here a pipeline is just an ordered list of named stages executed
  * in-process; the 18-file barrier becomes an explicit precondition.
  */
final case class Stage(name: String, run: SparkSession => Unit,
                       precondition: SparkSession => Boolean = _ => true)

final case class Pipeline(stages: Seq[Stage]) {

  /** Run stages in order; a failed precondition stops the pipeline (the
    * reference's behavior when fewer than 18 files have landed). Returns the
    * names of stages that ran. */
  def run(spark: SparkSession): Seq[String] = {
    val ran = Seq.newBuilder[String]
    val it = stages.iterator
    var continue = true
    while (continue && it.hasNext) {
      val s = it.next()
      if (s.precondition(spark)) { s.run(spark); ran += s.name }
      else continue = false
    }
    ran.result()
  }
}
