package graft.tools

import graft.GraftSession
import graft.io.{IcebergInterop, IcebergWrite}
import org.apache.spark.sql.functions._

/** The streaming-dedup STATE-PROBE scale smoke: does per-batch probe
  * cost track the BATCH or the STATE?
  *
  * Builds a `bucket[256](band_key)` signature table at ×1 and ×100
  * state sizes (each in several ledgered commits, like the sink), then
  * times the per-batch collision probe — a fixed SMALL batch of band
  * keys, pruned through the manifest-level bucket skip — against the
  * full-scan probe the pre-round-16 sink paid. The honest claim (and
  * what this measures): probe I/O is (touched buckets)/N of the state,
  * and a steady-state micro-batch touches ≤ docs × bands buckets
  * REGARDLESS of state size, so the probe reads a fixed small fraction
  * where the full scan reads everything. Run:
  * sbt "runMain graft.tools.DedupProbeSmoke" (SMOKE_X100=1 for ×100). */
object DedupProbeSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("dedup-probe-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val buckets = 256
    val baseRows = 50000L
    val x = sys.env.getOrElse("SMOKE_X100", "1") match {
      case "0" => Seq(1L)
      case _ => Seq(1L, 100L)
    }
    // a fixed steady-state batch: 8 docs × 4 bands = 32 band keys, all
    // present in the state (ids 0..7 seed every state size)
    val batchKeys: Seq[String] =
      (0L until 8L).flatMap(d => (0 until 4).map(b => keyOf(d, b)))

    def keyOfCol(doc: org.apache.spark.sql.Column,
                 band: org.apache.spark.sql.Column) =
      md5(concat(lit("k-"), doc, lit(":"), band))

    x.foreach { mult =>
      val rows = baseRows * mult
      val dir = graft.io.TempDirs.scratch(s"graft-probe-x$mult") + "/sigs"
      // state: `rows` docs × 4 bands, written in 4 commits (the sink's
      // shape: several ledgered appends, several files per bucket)
      val t0 = System.nanoTime()
      (0 until 4).foreach { part =>
        val slice = spark.range(part * rows / 4, (part + 1) * rows / 4)
          .select(col("id").as("doc_id"))
          .crossJoin(spark.range(4).select(col("id").as("band")))
          .select(col("doc_id"), keyOfCol(col("doc_id"), col("band")).as("band_key"))
        IcebergWrite.appendPartitioned(slice, dir,
          Seq(("band_key", s"bucket[$buckets]")),
          txn = Some(("smoke", part.toLong)), clusterBySpec = true)
      }
      val wSec = (System.nanoTime() - t0) / 1e9
      val batch = batchKeys.toDF("band_key")
      def timed(what: String)(probe: () => Long): Double = {
        probe() // warm
        val t1 = System.nanoTime(); val n = probe()
        val sec = (System.nanoTime() - t1) / 1e9
        val (kept, _) = IcebergInterop.lastDataFileScan
        val (read, skipped) = IcebergInterop.lastManifestScan
        System.err.println(f"[probe-smoke] x$mult $what: $sec%.2fs " +
          f"(hits=$n, files=$kept, manifests=$read read/$skipped skipped)")
        sec
      }
      val pruned = timed("pruned")(() =>
        IcebergInterop.readIceberg(spark, dir,
            stringIn = Map("band_key" -> batchKeys.toSet))
          .join(batch, Seq("band_key"), "left_semi").count())
      val full = timed("full-scan")(() =>
        IcebergInterop.readIceberg(spark, dir)
          .join(batch, Seq("band_key"), "left_semi").count())
      println(s"""{"metric":"dedup_probe_x$mult","rows":${rows * 4},""" +
        f""""write_sec":$wSec%.2f,"pruned_sec":$pruned%.2f,"full_sec":$full%.2f}""")
    }
    spark.stop()
  }

  private def keyOf(doc: Long, band: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"k-$doc:$band".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }
}
