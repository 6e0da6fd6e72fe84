package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Measures what bucketing buys the fact-⋈-fact join (the ×100 smoke's
  * dominant cost): replicate lineitem/orders ×N, then time the
  * lineitem⋈orders join+agg (a) as a plain shuffle join and (b) between
  * co-bucketed tables (zero exchange at read time). The bucketed write is
  * timed too — it's the amortized cost, paid once for every subsequent
  * co-located join. Run: sbt "runMain graft.tools.BucketSmoke" (×10).
  */
object BucketSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("bucket-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val copies = sys.env.getOrElse("SMOKE_COPIES", "10").toInt
    val wh = graft.io.TempDirs.scratch("graft-bucketsmoke")

    def replicated(table: String, keyCols: Map[String, Long]) = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      base.crossJoin(spark.range(copies).withColumnRenamed("id", "__copy"))
        .select(base.columns.map { c =>
          keyCols.get(c).map(st => (col(c) + col("__copy") * st).as(c)).getOrElse(col(c))
        }.toIndexedSeq: _*)
    }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bucket-smoke] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    val li = replicated("lineitem", Map("l_orderkey" -> 10000000L))
    val ord = replicated("orders", Map("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L))
    li.write.mode("overwrite").parquet(s"$wh/li"); ord.write.mode("overwrite").parquet(s"$wh/ord")
    val liP = spark.read.parquet(s"$wh/li"); val ordP = spark.read.parquet(s"$wh/ord")
    println(s"[bucket-smoke] x$copies: ${liP.count()} lineitem, ${ordP.count()} orders")

    // force the shuffle path for a fair comparison (orders at x10 could broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def joinAgg(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q")).collect()

    t("plain shuffle join (SMJ, 2 exchanges)")(joinAgg(liP, ordP))

    t("bucketed write (amortized, paid once)") {
      graft.io.Writers.bucketedTable(liP, s"$wh/bli", "bs_li", Seq("l_orderkey"), 32)
      graft.io.Writers.bucketedTable(ordP, s"$wh/bord", "bs_ord", Seq("o_orderkey"), 32)
    }
    val plan = joinAggPlan(spark)
    require(!plan.contains("ShuffleExchange"), "bucketed join must not shuffle")
    t("bucketed join (zero exchanges)")(
      joinAgg(spark.table("bs_li"), spark.table("bs_ord")))

    spark.sql("DROP TABLE IF EXISTS bs_li"); spark.sql("DROP TABLE IF EXISTS bs_ord")
    spark.stop()
  }

  private def joinAggPlan(spark: org.apache.spark.sql.SparkSession): String =
    spark.table("bs_li").join(spark.table("bs_ord"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .queryExecution.executedPlan.toString
}
