package graft

import java.nio.file.Files
import graft.io.{DeltaInterop, IcebergInterop, IcebergWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized LIFECYCLE walks over the native Iceberg write plane
  * (seeded — reproducible): a table takes a random sequence of
  * append / position-delete / DV-delete / equality-delete / update /
  * merge (with by-source clauses) / compact / expireSnapshots /
  * rollback operations, while an in-memory MODEL applies the same
  * semantics. After EVERY operation the masked read must equal the
  * model exactly — so any interaction bug between the row-delta
  * kinds, maintenance, and time travel (a delete that resurrects
  * after compaction, an update postimage double-applied across a
  * rollback, an expiry that reclaims a live file) fails the walk at
  * the op that introduced it, with the seed to replay. The DDL-walk
  * pattern that caught real parser bugs, now pointed at the write
  * plane. */
case class IceFuzzRow(id: Long, score: Long, tag: String)

class IcebergLifecycleFuzzSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private type R = IceFuzzRow
  private def R(id: Long, score: Long, tag: String) = IceFuzzRow(id, score, tag)

  test("lifecycle walks: row deltas + maintenance + rollback stay model-exact (6 seeds)") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919)
      val dir = Files.createTempDirectory(s"graft-ice-fuzz-$seed").toString
      var model = Vector.empty[R]
      var nextId = 0L
      def fresh(n: Int): Seq[R] = {
        val out = (nextId until nextId + n).map(i =>
          R(i, rnd.nextInt(1000).toLong, s"t$i"))
        nextId += n
        out
      }
      def df(rows: Seq[R]) = rows.toDF("id", "score", "tag")
      // snapshot id → the model at that snapshot (for rollback targets)
      var snapModels = Map.empty[Long, Vector[R]]
      def record(): Unit = {
        val cur = IcebergInterop.snapshots(spark, dir)
          .orderBy(desc("sequence_number")).head().getLong(0)
        snapModels += cur -> model
      }

      val r0 = fresh(20)
      IcebergWrite.append(df(r0), dir); model ++= r0; record()

      var lastOp = "append"
      (1 to 10).foreach { k =>
        rnd.nextInt(9) match {
          case 0 =>
            lastOp = "append"
            val r = fresh(1 + rnd.nextInt(8))
            IcebergWrite.append(df(r), dir); model ++= r
          case 1 =>
            lastOp = "deleteWhere"
            val m = 2 + rnd.nextInt(4); val c = rnd.nextInt(m)
            IcebergWrite.deleteWhere(spark, dir, col("id") % m === c)
            model = model.filterNot(_.id % m == c)
          case 2 =>
            lastOp = "deleteWhereDV"
            val m = 3 + rnd.nextInt(4); val c = rnd.nextInt(m)
            IcebergWrite.deleteWhereDV(spark, dir, col("id") % m === c)
            model = model.filterNot(_.id % m == c)
          case 3 =>
            lastOp = "equalityDelete"
            val keys = rnd.shuffle(model.map(_.id)).take(1 + rnd.nextInt(4)) :+
              (nextId + 100000L) // one never-present key
            IcebergWrite.equalityDelete(spark, dir, keys.toDF("id"))
            model = model.filterNot(r => keys.contains(r.id))
          case 4 =>
            val m = 2 + rnd.nextInt(4); val c = rnd.nextInt(m)
            val bump = 1000L + rnd.nextInt(9) * 1000L
            val pred = col("id") % m === c
            val sets = Map("score" -> (col("score") + bump),
              "tag" -> lit(s"u$k"))
            if (rnd.nextBoolean()) {
              lastOp = "updateWhere"
              IcebergWrite.updateWhere(spark, dir, pred, sets)
            } else {
              lastOp = "updateWhereDV"
              IcebergWrite.updateWhereDV(spark, dir, pred, sets)
            }
            model = model.map(r =>
              if (r.id % m == c) r.copy(score = r.score + bump, tag = s"u$k") else r)
          case 5 =>
            lastOp = "mergeInto"
            val matchedKeys = rnd.shuffle(model.map(_.id)).take(1 + rnd.nextInt(5))
            val ins = fresh(1 + rnd.nextInt(3))
            val src = matchedKeys.map(i => R(i, 7L, s"m$k")) ++ ins
            val useBySource = rnd.nextInt(3) == 0
            val bsCut = 100L + rnd.nextInt(900)
            IcebergWrite.mergeInto(spark, dir, df(src), Seq("id"),
              matched = Seq(
                DeltaInterop.MatchedClause(Some(col("t.score") % 2 === 0),
                  Map.empty, delete = true),
                DeltaInterop.MatchedClause(None,
                  Map("tag" -> col("s.tag")))),
              notMatched = Some((None, Map.empty)),
              notMatchedBySource =
                if (!useBySource) Nil
                else Seq(DeltaInterop.MatchedClause(
                  Some(col("t.score") > bsCut), Map("tag" -> lit(s"bs$k")))))
            model = model.flatMap { r =>
              if (matchedKeys.contains(r.id)) {
                if (r.score % 2 == 0) None
                else Some(r.copy(tag = s"m$k"))
              } else if (useBySource && r.score > bsCut) Some(r.copy(tag = s"bs$k"))
              else Some(r)
            } ++ ins
          case 6 =>
            lastOp = "compact"
            IcebergWrite.compact(spark, dir,
              smallFileBytes = if (rnd.nextBoolean()) 0L else 32L << 20)
          case 7 =>
            lastOp = "expire"
            Thread.sleep(3)
            IcebergWrite.expireSnapshots(spark, dir, 0L)
            // only the head survives — older rollback targets are gone
            val live = IcebergInterop.snapshots(spark, dir)
              .collect().map(_.getLong(0)).toSet
            snapModels = snapModels.filter { case (id, _) => live(id) }
          case _ =>
            lastOp = "rollback"
            val live = IcebergInterop.snapshots(spark, dir)
              .collect().map(_.getLong(0)).toSet
            val targets = snapModels.keys.filter(live).toVector
            if (targets.nonEmpty) {
              val tgt = targets(rnd.nextInt(targets.length))
              IcebergWrite.rollbackTo(spark, dir, tgt)
              model = snapModels(tgt)
            }
        }
        record()
        val got = IcebergInterop.readIceberg(spark, dir)
          .as[(Long, Long, String)].collect().map(t => R(t._1, t._2, t._3))
          .sortBy(_.id).toVector
        val want = model.sortBy(_.id)
        assert(got == want,
          s"seed=$seed diverged after op#$k ($lastOp): " +
          s"got ${got.size} rows, want ${want.size}; " +
          s"firstDiff=${got.zipAll(want, null, null).find(p => p._1 != p._2)}")
      }
    }
  }

  test("lineage walks: row identity + last-updated stay model-exact (3 seeds)") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed * 104729)
      val dir = Files.createTempDirectory(s"graft-ice-linfuzz-$seed").toString
      var model = Vector.empty[R]
      var nextId = 0L
      def fresh(n: Int): Seq[R] = {
        val out = (nextId until nextId + n).map(i =>
          R(i, rnd.nextInt(1000).toLong, s"t$i"))
        nextId += n
        out
      }
      def df(rows: Seq[R]) = rows.toDF("id", "score", "tag")
        .repartition(1).sortWithinPartitions("id")
      // id -> (_row_id, _last_updated_sequence_number), captured from
      // the table and asserted STABLE thereafter
      var lin = Map.empty[Long, (Long, Long)]
      var usedRids = Set.empty[Long]
      var snapModels = Map.empty[Long, (Vector[R], Map[Long, (Long, Long)])]
      def readLin(): Map[Long, (Long, Long)] =
        IcebergInterop.readIceberg(spark, dir, withLineage = true)
          .select("id", "_row_id", "_last_updated_sequence_number")
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      def record(): Unit = {
        val cur = IcebergInterop.snapshots(spark, dir)
          .orderBy(desc("sequence_number")).head().getLong(0)
        snapModels += cur -> ((model, lin))
      }
      val r0 = fresh(16)
      IcebergWrite.appendLineage(df(r0), dir); model ++= r0
      lin = readLin(); usedRids = lin.values.map(_._1).toSet
      record()

      var lastOp = "append"
      (1 to 8).foreach { k =>
        val before = model.map(r => r.id -> ((r.score, r.tag))).toMap
        var rolledBackTo: Option[Long] = None
        rnd.nextInt(8) match {
          case 0 =>
            lastOp = "append"
            val r = fresh(1 + rnd.nextInt(6))
            IcebergWrite.append(df(r), dir); model ++= r
          case 1 =>
            lastOp = "deleteWhereDV"
            val m = 3 + rnd.nextInt(4); val c = rnd.nextInt(m)
            IcebergWrite.deleteWhereDV(spark, dir, col("id") % m === c)
            model = model.filterNot(_.id % m == c)
          case 2 =>
            lastOp = "equalityDelete"
            val keys = rnd.shuffle(model.map(_.id)).take(1 + rnd.nextInt(3))
            if (keys.nonEmpty) {
              IcebergWrite.equalityDelete(spark, dir, keys.toDF("id"))
              model = model.filterNot(r => keys.contains(r.id))
            }
          case 3 =>
            lastOp = "updateWhereDV"
            val m = 2 + rnd.nextInt(4); val c = rnd.nextInt(m)
            val bump = 1000L + rnd.nextInt(9) * 1000L
            IcebergWrite.updateWhereDV(spark, dir, col("id") % m === c,
              Map("score" -> (col("score") + bump), "tag" -> lit(s"u$k")))
            model = model.map(r =>
              if (r.id % m == c) r.copy(score = r.score + bump, tag = s"u$k") else r)
          case 4 =>
            lastOp = "mergeInto"
            val matchedKeys = rnd.shuffle(model.map(_.id)).take(1 + rnd.nextInt(4))
            val ins = fresh(1 + rnd.nextInt(3))
            val src = matchedKeys.map(i => R(i, 7L, s"m$k")) ++ ins
            IcebergWrite.mergeInto(spark, dir, df(src), Seq("id"),
              matched = Seq(
                DeltaInterop.MatchedClause(Some(col("t.score") % 2 === 0),
                  Map.empty, delete = true),
                DeltaInterop.MatchedClause(None, Map("tag" -> col("s.tag")))),
              notMatched = Some((None, Map.empty)))
            model = model.flatMap { r =>
              if (matchedKeys.contains(r.id)) {
                if (r.score % 2 == 0) None else Some(r.copy(tag = s"m$k"))
              } else Some(r)
            } ++ ins
          case 5 =>
            lastOp = "compact"
            IcebergWrite.compact(spark, dir,
              smallFileBytes = if (rnd.nextBoolean()) 0L else 32L << 20)
          case 6 =>
            lastOp = "zorder"
            IcebergWrite.optimizeZOrder(spark, dir, Seq("id", "score"))
          case _ =>
            lastOp = "rollback"
            val live = IcebergInterop.snapshots(spark, dir)
              .collect().map(_.getLong(0)).toSet
            val targets = snapModels.keys.filter(live).toVector
            if (targets.nonEmpty) {
              val tgt = targets(rnd.nextInt(targets.length))
              IcebergWrite.rollbackTo(spark, dir, tgt)
              val (m0, l0) = snapModels(tgt)
              model = m0; rolledBackTo = Some(tgt); lin = l0
            }
        }
        val after = model.map(r => r.id -> ((r.score, r.tag))).toMap
        val got = IcebergInterop.readIceberg(spark, dir)
          .as[(Long, Long, String)].collect().map(t => R(t._1, t._2, t._3))
          .sortBy(_.id).toVector
        assert(got == model.sortBy(_.id),
          s"seed=$seed content diverged after op#$k ($lastOp)")
        val now = readLin()
        assert(now.keySet == after.keySet, s"seed=$seed lineage key set ($lastOp)")
        now.foreach { case (id, (rid, lus)) =>
          lin.get(id) match {
            case Some((rid0, lus0)) =>
              assert(rid == rid0,
                s"seed=$seed op#$k ($lastOp): id $id moved _row_id $rid0 -> $rid")
              if (rolledBackTo.isEmpty) {
                val changed = before.get(id) != after.get(id)
                if (changed) assert(lus > lus0,
                  s"seed=$seed op#$k ($lastOp): id $id changed but lus $lus0 -> $lus")
                else assert(lus == lus0,
                  s"seed=$seed op#$k ($lastOp): id $id untouched but lus moved $lus0 -> $lus")
              }
            case None => // a fresh row: its id must be globally new
              assert(!usedRids.contains(rid),
                s"seed=$seed op#$k ($lastOp): fresh row $id reused _row_id $rid")
          }
        }
        assert(now.values.map(_._1).toSeq.distinct.size == now.size,
          s"seed=$seed op#$k ($lastOp): duplicate _row_id")
        usedRids ++= now.values.map(_._1)
        lin = now
        // record AFTER lin caught up with this op's own rows — a
        // rollback target must restore the lineage AS OF its snapshot,
        // not one op stale (a stale map false-flags the snapshot's own
        // appended rows as fresh after a rollback to it)
        record()
      }
    }
  }
  test("branch walks: WAP staging + cherry-pick publish stay model-exact (4 seeds)") {
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed * 15013)
      val dir = Files.createTempDirectory(s"graft-ice-brfuzz-$seed").toString
      var mainModel = Vector.empty[R]
      // (branch view, set of PRE-FORK ids the branch deleted, staged rows)
      var branch: Option[(Vector[R], Set[Long], Vector[R])] = None
      var nextId = 0L
      def fresh(n: Int): Seq[R] = {
        val out = (nextId until nextId + n).map(i =>
          R(i, rnd.nextInt(1000).toLong, s"t$i"))
        nextId += n
        out
      }
      def df(rows: Seq[R]) = rows.toDF("id", "score", "tag")
      val r0 = fresh(12)
      IcebergWrite.append(df(r0), dir); mainModel ++= r0

      var lastOp = "seed"
      (1 to 8).foreach { k =>
        rnd.nextInt(6) match {
          case 0 => // main appends — the divergence cherry-pick exists for
            lastOp = "main-append"
            val r = fresh(1 + rnd.nextInt(5))
            IcebergWrite.append(df(r), dir); mainModel ++= r
          case 1 => // main DV-deletes some of its own rows
            lastOp = "main-dv-delete"
            if (mainModel.nonEmpty) {
              val m = 3 + rnd.nextInt(4); val c = rnd.nextInt(m)
              IcebergWrite.deleteWhereDV(spark, dir, col("id") % m === c)
              mainModel = mainModel.filterNot(_.id % m == c)
            }
          case 2 => // stage an append on the branch (fork implicitly)
            lastOp = "branch-append"
            val (bv, bd, st) = branch.getOrElse((mainModel, Set.empty[Long], Vector.empty[R]))
            val r = fresh(1 + rnd.nextInt(4))
            IcebergWrite.onBranch("audit") { IcebergWrite.append(df(r), dir) }
            branch = Some((bv ++ r, bd, st ++ r))
          case 3 => // stage a position delete over the BRANCH view
            lastOp = "branch-pos-delete"
            branch match {
              case Some((bv, bd, st)) if bv.nonEmpty =>
                val m = 2 + rnd.nextInt(4); val c = rnd.nextInt(m)
                IcebergWrite.onBranch("audit") {
                  IcebergWrite.deleteWhere(spark, dir, col("id") % m === c)
                }
                val hitStaged = st.filter(_.id % m == c).map(_.id).toSet
                val hitPre = bv.filter(r => r.id % m == c && !hitStaged(r.id)).map(_.id).toSet
                branch = Some((bv.filterNot(_.id % m == c), bd ++ hitPre,
                  st.filterNot(_.id % m == c)))
              case _ => lastOp = "noop"
            }
          case 4 => // publish: cherry-pick applies the staged DIFF to main
            lastOp = "publish"
            branch match {
              case Some((_, bd, st)) =>
                IcebergWrite.cherryPickPublish(spark, dir, "audit")
                IcebergWrite.dropRef(spark, dir, "audit")
                mainModel = mainModel.filterNot(r => bd(r.id)) ++ st
                branch = None
              case None => lastOp = "noop"
            }
          case _ => // expiry with everything pinned changes nothing
            lastOp = "expire"
            Thread.sleep(3)
            IcebergWrite.expireSnapshots(spark, dir, 0L)
        }
        val gotMain = IcebergInterop.readIceberg(spark, dir)
          .as[(Long, Long, String)].collect().map(t => R(t._1, t._2, t._3))
          .sortBy(_.id).toVector
        assert(gotMain == mainModel.sortBy(_.id),
          s"seed=$seed op#$k ($lastOp): MAIN diverged — got ${gotMain.size}, " +
          s"want ${mainModel.size}")
        branch.foreach { case (bv, _, _) =>
          val head = IcebergInterop.snapshotOfRef(spark, dir, "audit")
          val gotBr = IcebergInterop.readIceberg(spark, dir, Some(head))
            .as[(Long, Long, String)].collect().map(t => R(t._1, t._2, t._3))
            .sortBy(_.id).toVector
          assert(gotBr == bv.sortBy(_.id),
            s"seed=$seed op#$k ($lastOp): BRANCH diverged — got ${gotBr.size}, " +
            s"want ${bv.size}")
        }
      }
    }
  }

}
