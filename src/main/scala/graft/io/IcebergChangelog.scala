package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** INCREMENTAL CHANGELOG reads for Apache Iceberg tables — the
  * Iceberg twin of the Delta CDF surface (q160): "what changed
  * between snapshot A and B", with row-level deletes resolved to
  * PREIMAGE rows, derived entirely from snapshot diffs — the shape
  * Iceberg's own `create_changelog_view` exposes.
  *
  * Per tailed snapshot (ordered by sequence number), classified by
  * the content the snapshot ADDED (its own manifests, never the
  * carried ones):
  *   - added data files → `insert` rows (postimages of UPDATE/MERGE
  *     included — they are physically fresh appends);
  *   - added position-delete parquet → the referenced files' rows at
  *     those positions, emitted as `delete` (one distributed
  *     read + semi-join on (file, pos) — O(changed rows));
  *   - added DELETION VECTORS → the per-file diff `newDV ∖ priorDV`
  *     (the spec's superset-replacement rule makes the diff exactly
  *     the snapshot's new deletions), expanded to positions ON
  *     EXECUTORS from KB roaring blobs, then the same preimage join;
  *   - added EQUALITY deletes → the PARENT snapshot's live view
  *     semi-joined on the key columns (null-safe), the spec's
  *     strictly-older masking;
  *   - a TRUE overwrite (nothing carried, no row-delta content) →
  *     every parent-live row as `delete` plus the added files as
  *     `insert`;
  *   - `replace` snapshots (compaction, manifest merges) → NO rows:
  *     rewrites move bytes, not logical state.
  *
  * Every emitted row carries `_change_type` (insert|delete),
  * `_change_ordinal` (the snapshot's sequence number) and
  * `_commit_snapshot_id` — consumers reconstruct any state or feed a
  * downstream CDC sink. Scale shape: driver work is
  * manifest-count-bounded; row work is one pruned scan per snapshot
  * of exactly the CHANGED files, never the table. */
object IcebergChangelog {

  val ChangeType = "_change_type"
  val ChangeOrdinal = "_change_ordinal"
  val CommitSnapshotId = "_commit_snapshot_id"

  private def canon(p: String): String = IcebergInterop.canonPathStr(p)

  /** Telemetry of the LAST rollback diff: (common files between the
    * two states, files actually re-diffed through both views) —
    * single-threaded test introspection of the bounds pruning only. */
  @volatile private[graft] var lastRollbackReMask: (Set[String], Set[String]) =
    (Set.empty, Set.empty)

  private final case class SnapInfo(seq: Long, id: Long, parent: Option[Long],
                                    op: String, manifestList: String)

  private def snapshotsOf(spark: SparkSession, dir: String,
                          branch: Option[String] = None): Seq[SnapInfo] = {
    import scala.jdk.CollectionConverters._
    val meta = IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir))
    val all = meta.path("snapshots").elements().asScala.toSeq.map { s0 =>
      SnapInfo(s0.path("sequence-number").asLong(0L),
        s0.path("snapshot-id").asLong,
        Option(s0.path("parent-snapshot-id").asLong(-1L)).filter(_ > 0),
        s0.path("summary").path("operation").asText(""),
        s0.path("manifest-list").asText)
    }
    branch match {
      // branch-scoped changelog (auditing a staged branch): exactly
      // the branch head's ancestry, staged snapshots included
      case Some(b) =>
        val r = meta.path("refs").path(b)
        require(!r.isMissingNode && !r.isNull, s"no ref $b at $dir")
        require(r.path("type").asText("branch") == "branch",
          s"ref $b is a ${r.path("type").asText} — only branches have changelogs")
        val anc = IcebergInterop.ancestryOf(meta,
          r.path("snapshot-id").asLong(-1L))
        all.filter(s1 => anc.contains(s1.id)).sortBy(_.seq)
      case None =>
        // un-published write-audit-publish branch snapshots share the
        // snapshots array but are not main history — a changelog consumer
        // must never receive staged rows; they enter the stream when
        // fastForward moves the head ([[IcebergInterop.branchOnlyIds]])
        val excluded = IcebergInterop.branchOnlyIds(meta)
        all.filterNot(s1 => excluded.contains(s1.id)).sortBy(_.seq)
    }
  }

  /** What snapshot `s` ADDED: its own manifests' status-1 entries,
    * split by content kind; plus whether any manifest was carried
    * forward (a true overwrite carries none). */
  private final case class Added(dataFiles: Seq[String],
      posDeletes: Seq[String],
      dvAdds: Seq[(String, String, Long, Long)], // (refFile, puffin, off, size)
      eqDeletes: Seq[(String, Seq[Int])],        // (keys parquet, equality ids)
      carriedAny: Boolean)

  private def addedOf(spark: SparkSession, s: SnapInfo): Added = {
    import scala.jdk.CollectionConverters._
    def gi(r: org.apache.avro.generic.GenericRecord, n: String, d: Int): Int =
      Option(r.getSchema.getField(n)).flatMap(_ => Option(r.get(n)))
        .map(_.asInstanceOf[Number].intValue).getOrElse(d)
    def gl(r: org.apache.avro.generic.GenericRecord, n: String): Option[Long] =
      Option(r.getSchema.getField(n)).flatMap(_ => Option(r.get(n)))
        .map(_.asInstanceOf[Number].longValue)
    val data = Seq.newBuilder[String]
    val pos = Seq.newBuilder[String]
    val dvs = Seq.newBuilder[(String, String, Long, Long)]
    val eqs = Seq.newBuilder[(String, Seq[Int])]
    var carried = false
    IcebergInterop.avroRecords(spark,
      new Path(IcebergInterop.resolve(s.manifestList))).foreach { m =>
      if (gl(m, "added_snapshot_id").contains(s.id)) {
        IcebergInterop.avroRecords(spark,
          new Path(IcebergInterop.resolve(m.get("manifest_path").toString)))
          .filter(e => gi(e, "status", 0) == 1).foreach { e =>
            val df = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
            val path = IcebergInterop.resolve(df.get("file_path").toString)
            (gi(df, "content", 0), gl(df, "content_offset")) match {
              case (0, _) => data += path
              case (1, Some(off)) =>
                dvs += ((canon(IcebergInterop.resolve(
                  df.get("referenced_data_file").toString)), path, off,
                  gl(df, "content_size_in_bytes").getOrElse(0L)))
              case (1, None) => pos += path
              case (_, _) =>
                val ids = Option(df.getSchema.getField("equality_ids"))
                  .flatMap(_ => Option(df.get("equality_ids")))
                  .map(_.asInstanceOf[java.util.List[_]].asScala
                    .map(_.asInstanceOf[Number].intValue).toSeq).getOrElse(Nil)
                eqs += ((path, ids))
            }
          }
      } else carried = true
    }
    Added(data.result(), pos.result(), dvs.result(), eqs.result(), carried)
  }

  /** One snapshot's change rows (None = a rewrite snapshot with no
    * logical changes). `schema` pins the read (field-id resolution).
    * With `withLineage`, every emitted row carries its stable
    * `_row_id` (materialized column when a rewrite stamped it, else
    * the file's first_row_id + position) — an UPDATE's delete/insert
    * pair shares one id, which is what makes the changelog consumable
    * as KEYED CDC without a natural key. */
  private[graft] def changesForSnapshot(spark: SparkSession, dir: String,
      snap: Long, schema: StructType,
      withLineage: Boolean = false,
      branch: Option[String] = None): Option[DataFrame] = {
    import org.apache.spark.sql.functions._
    val allSnaps = snapshotsOf(spark, dir, branch)
    val s = allSnaps.find(_.id == snap).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot $snap not found at $dir — expired before the changelog read?"))
    if (s.op == "rollback") return rollbackChanges(spark, dir, s, allSnaps,
      schema, withLineage)
    if (s.op == "replace") return None
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val a = addedOf(spark, s)
    // v3 initial-default support for the changelog's RAW file reads
    // (inserts + delete preimages): per-file applicability through the
    // snapshot's manifest entries — EVERYTHING here is lazy, so a
    // schema without defaults pays zero extra metadata reads
    lazy val meta = IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir))
    lazy val fileSnapAll: Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      def gn(r: org.apache.avro.generic.GenericRecord, n: String): Option[Long] =
        Option(r.getSchema.getField(n)).flatMap(_ => Option(r.get(n)))
          .map(_.asInstanceOf[Number].longValue)
      graft.pipeline.Par.map(IcebergInterop.avroRecords(spark,
          new Path(IcebergInterop.resolve(s.manifestList)))
          .filter(m => Option(m.get("content")).forall(
            _.asInstanceOf[Number].intValue == 0))
          .map(m => (m.get("manifest_path").toString,
            gn(m, "added_snapshot_id").getOrElse(-1L),
            gn(m, "sequence_number").getOrElse(0L)))) {
        case (mp, mSnap, mSeq) =>
          IcebergInterop.avroRecords(spark, new Path(IcebergInterop.resolve(mp)))
            .filter(e => Option(e.get("status")).forall(
              _.asInstanceOf[Number].intValue != 2))
            .map { e =>
              val df = e.get("data_file")
                .asInstanceOf[org.apache.avro.generic.GenericRecord]
              canon(IcebergInterop.resolve(df.get("file_path").toString)) ->
                ((gn(e, "snapshot_id").getOrElse(mSnap),
                  gn(e, "sequence_number").getOrElse(mSeq)))
            }
      }.flatten.toMap
    }
    def withDefaults(raw: DataFrame): DataFrame =
      IcebergInterop.applyInitialDefaults(spark, meta, raw, schema, fileSnapAll,
        Some(s.manifestList))
    // lineage: (canon path -> first_row_id) over the snapshot's FULL
    // manifest set (preimages may live in carried manifests), and a
    // read schema requesting the materialized reserved column. Small
    // tables broadcast a driver map; past the manifest-count gate the
    // map builds DISTRIBUTED (manifests parse on executors, the
    // attach becomes a plain join) so the driver never materializes
    // every live file path of a huge table ([[ridSourceFor]]).
    lazy val ridSrc = ridSourceFor(spark, s.manifestList)
    val readSchema = if (!withLineage) schema else lineageReadSchema(schema)
    def withRid(raw: DataFrame): DataFrame =
      if (!withLineage) raw else attachRidEither(spark, raw, ridSrc)
    val outNames = schema.fieldNames.toSeq ++
      (if (withLineage) Seq("_row_id") else Nil)
    def tagged(df: DataFrame, tpe: String): DataFrame =
      df.select(outNames.map(col): _*)
        .withColumn(ChangeType, lit(tpe))
        .withColumn(ChangeOrdinal, lit(s.seq))
        .withColumn(CommitSnapshotId, lit(s.id))
    def parentLineage(p: Option[Long]): DataFrame = {
      val v = IcebergInterop.readIceberg(spark, dir, p, withLineage = withLineage)
      if (withLineage) v.drop("_last_updated_sequence_number") else v
    }
    val frames = Seq.newBuilder[DataFrame]
    // a TRUE overwrite replaced the whole table: parent-live = deletes
    val rowDelta = a.posDeletes.nonEmpty || a.dvAdds.nonEmpty || a.eqDeletes.nonEmpty
    if (s.op == "overwrite" && !a.carriedAny && !rowDelta && s.parent.isDefined)
      frames += tagged(parentLineage(s.parent), "delete")
    if (a.dataFiles.nonEmpty)
      frames += tagged(withRid(withDefaults(
        spark.read.schema(readSchema).parquet(a.dataFiles: _*))), "insert")
    // position deletes + DV diffs → (file, pos) pairs → preimage join
    val pairFrames = Seq.newBuilder[DataFrame]
    if (a.posDeletes.nonEmpty)
      pairFrames += spark.read.parquet(a.posDeletes: _*)
        .select(regexp_replace(col("file_path"), "^file:/+", "/").as("_cf"),
          col("pos").cast("long").as("_cp"))
    if (a.dvAdds.nonEmpty) {
      val conf = spark.sparkContext.hadoopConfiguration
      val prior = s.parent.map { p =>
        // an EXPIRED parent cannot anchor the DV diff — emitting the
        // whole superset as fresh deletions would hand a keyed-CDC
        // consumer phantom deletes at the wrong ordinal
        require(allSnaps.exists(_.id == p),
          s"parent snapshot $p of $snap expired — the DV diff cannot be " +
          "reconstructed; read the changelog from a later snapshot")
        IcebergInterop.liveDvs(spark, dir, Some(p))
      }.getOrElse(Map.empty[String, (String, Long, Long)])
      // ship KB roaring blobs; positions expand ON EXECUTORS
      val blobs: Seq[(String, Array[Byte], Array[Byte])] =
        a.dvAdds.map { case (rf, puffin, off, size) =>
          val nb = IcebergFormat.readPuffinDvBytes(conf, new Path(puffin), off, size)
          val pb = prior.get(rf).map { case (pp, po, ps) =>
            IcebergFormat.readPuffinDvBytes(conf, new Path(pp), po, ps) }.orNull
          (rf, nb, pb)
        }
      import spark.implicits._
      pairFrames += spark.createDataset(blobs)
        .repartition(math.min(blobs.size, 64))
        .flatMap { case (f, nb, pb) =>
          val nd = DeletionVectors.parse(nb)
          val pd = Option(pb).map(DeletionVectors.parse)
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
          nd.foreach(p => if (!pd.exists(_.contains(p))) out += ((f, p)))
          out
        }.toDF("_cf", "_cp")
    }
    pairFrames.result().reduceOption(_ unionByName _).foreach { pairs0 =>
      val pairs = pairs0.localCheckpoint(false)
      val refFiles = pairs.select("_cf").distinct()
        .collect().map(_.getString(0)) // file-count bounded
      if (refFiles.nonEmpty) {
        val raw = withRid(withDefaults(
          spark.read.schema(readSchema).parquet(refFiles.toSeq: _*)))
          .withColumn("_cf",
            regexp_replace(col("_metadata.file_path"), "^file:/+", "/"))
          .withColumn("_cp", col("_metadata.row_index"))
        frames += tagged(raw.join(pairs, Seq("_cf", "_cp"), "leftsemi"), "delete")
      }
    }
    // equality deletes: the parent's live view semi-joined on the keys
    if (a.eqDeletes.nonEmpty && s.parent.isDefined) {
      a.eqDeletes.groupBy(_._2).foreach { case (ids, dels) =>
        val keys = spark.read.parquet(dels.map(_._1): _*)
        val idToName = schema.fields.flatMap(f =>
          if (f.metadata.contains("parquet.field.id"))
            Some(f.metadata.getLong("parquet.field.id").toInt -> f.name)
          else None).toMap
        val keyCols = ids.flatMap(idToName.get) match {
          case ks if ks.size == ids.size => ks
          case _ => keys.columns.toSeq // fallback: the delete file's columns
        }
        val parentView = parentLineage(s.parent)
        val cond = keyCols.map(c => parentView(c) <=> keys(c)).reduce(_ && _)
        frames += tagged(parentView.join(keys, cond, "left_semi"), "delete")
      }
    }
    frames.result().reduceOption(_ unionByName _)
  }

  /** A ROLLBACK snapshot's change rows: the NET state diff between
    * the parent (what the table held) and the rollback target (what
    * it holds now) — rows live before but not after emit as `delete`,
    * rows live after but not before (a rollback can UNDELETE) emit as
    * `insert`, ordinal = the rollback snapshot's own sequence. A CDC
    * consumer that folds the stream therefore survives an operator's
    * restore. Work is proportional to the SYMMETRIC DIFFERENCE:
    * untouched files (same path, same DV) are never scanned; only
    * files added/removed/re-masked between the two states read, with
    * (file, position) row identity arbitrating re-masked files. */
  private def rollbackChanges(spark: SparkSession, dir: String, s: SnapInfo,
      allSnaps: Seq[SnapInfo], schema: StructType,
      withLineage: Boolean): Option[DataFrame] = {
    import org.apache.spark.sql.functions._
    val parent = s.parent.getOrElse(throw new IllegalArgumentException(
      s"rollback snapshot ${s.id} of $dir has no parent — cannot diff"))
    require(allSnaps.exists(_.id == parent),
      s"parent snapshot $parent of rollback ${s.id} expired — the net " +
      "diff cannot be reconstructed; read the changelog from a later snapshot")
    // ONE inventory walk per side (data, DVs, pos deletes, eq deletes)
    val before = IcebergInterop.liveStateOf(spark, dir, parent)
    val after = IcebergInterop.liveStateOf(spark, dir, s.id)
    val (beforeFiles, afterFiles) = (before.files, after.files)
    val removed = beforeFiles -- afterFiles
    val added = afterFiles -- beforeFiles
    val common = beforeFiles & afterFiles
    // masking can change WITHOUT data files moving — three sources:
    //   - a file's live DV address differs either way;
    //   - a position-delete parquet appears/disappears: its referenced
    //     files re-diff (one read of the CHANGED delete files only);
    //   - an equality-delete file appears/disappears: its masking is
    //     predicate-shaped, so re-diff the common files the CHANGED
    //     delete could possibly hit — sequence-admitted (data written
    //     strictly before the delete) AND key-bounds-overlapping on
    //     every equality id (disjoint on ANY id ⇒ no tuple matches;
    //     absent bounds ⇒ assume overlap). At 100 TB this keeps a
    //     restore across one GDPR delete from re-scanning the table:
    //     the re-diff tracks the delete's key band, not table size.
    val dvChanged = common.filter(p => before.dvs.get(p) != after.dvs.get(p))
    val posChanged = ((before.posDeletes.toSet | after.posDeletes.toSet) --
      (before.posDeletes.toSet & after.posDeletes.toSet)).toSeq
    val posTouched: Set[String] =
      if (posChanged.isEmpty) Set.empty
      else spark.read.parquet(posChanged: _*)
        .select(regexp_replace(col("file_path"), "^file:/+", "/").as("f"))
        .distinct().collect().map(_.getString(0)).toSet
    val eqChanged: Seq[IcebergInterop.EqDeleteFile] = {
      val (pb, pa) = (before.eqDeletes.map(_.path).toSet,
        after.eqDeletes.map(_.path).toSet)
      (before.eqDeletes.filterNot(d => pa(d.path)) ++
        after.eqDeletes.filterNot(d => pb(d.path)))
    }
    val eqTouched: Set[String] =
      if (eqChanged.isEmpty) Set.empty
      else {
        val dtOfId: Map[Int, org.apache.spark.sql.types.DataType] =
          schema.fields.flatMap(f =>
            if (f.metadata.contains("parquet.field.id"))
              Some(f.metadata.getLong("parquet.field.id").toInt -> f.dataType)
            else None).toMap
        common.filter { p =>
          // the file's identity (seq, bounds) is commit-fixed: either
          // side's inventory carries the same values for a common path
          val (dataSeq, lo, hi) =
            before.dataInfo.getOrElse(p, after.dataInfo(p))
          eqChanged.exists { d =>
            dataSeq < d.seq && d.ids.forall { id =>
              (lo.get(id), hi.get(id), d.lower.get(id), d.upper.get(id),
                dtOfId.get(id)) match {
                case (Some(dLo), Some(dHi), Some(kLo), Some(kHi), Some(dt)) =>
                  IcebergWrite.cmpBound(dt, dLo, kHi) <= 0 &&
                    IcebergWrite.cmpBound(dt, kLo, dHi) <= 0
                case _ => true // no bounds / unknown id: assume overlap
              }
            }
          }
        }
      }
    val reMasked = dvChanged ++ (posTouched & common) ++ eqTouched
    lastRollbackReMask = (common, reMasked)
    if (removed.isEmpty && added.isEmpty && reMasked.isEmpty) return None
    def view(snapId: Long, only: Set[String]): DataFrame = {
      val v = IcebergInterop.readIceberg(spark, dir, Some(snapId),
        withLineage = withLineage, withProvenance = true,
        onlyDataFiles = Some(only))
      if (withLineage) v.drop("_last_updated_sequence_number") else v
    }
    val outNames = schema.fieldNames.toSeq ++
      (if (withLineage) Seq("_row_id") else Nil)
    def tag(df: DataFrame, tpe: String): DataFrame =
      df.select(outNames.map(col): _*)
        .withColumn(ChangeType, lit(tpe))
        .withColumn(ChangeOrdinal, lit(s.seq))
        .withColumn(CommitSnapshotId, lit(s.id))
    val frames = Seq.newBuilder[DataFrame]
    if (removed.nonEmpty || reMasked.nonEmpty) {
      val gone = view(parent, removed ++ reMasked)
      val del = if (reMasked.isEmpty) gone
        else gone.join(view(s.id, reMasked),
          Seq("_graft_file", "_graft_pos"), "left_anti")
      frames += tag(del, "delete")
    }
    if (added.nonEmpty || reMasked.nonEmpty) {
      val fresh = view(s.id, added ++ reMasked)
      val ins = if (reMasked.isEmpty) fresh
        else fresh.join(view(parent, reMasked),
          Seq("_graft_file", "_graft_pos"), "left_anti")
      frames += tag(ins, "insert")
    }
    frames.result().reduceOption(_ unionByName _)
  }

  /** Changes between two snapshots: everything committed STRICTLY
    * AFTER `fromSnapshot` (None = from the first snapshot, inclusive)
    * up to and including `toSnapshot` (None = the current head), in
    * commit order. The first snapshot itself, when included, emits as
    * pure inserts of its added files. */
  def readChangesBetween(spark: SparkSession, dir: String,
                         fromSnapshot: Option[Long] = None,
                         toSnapshot: Option[Long] = None,
                         // emit each row's stable `_row_id` (v3 row
                         // lineage) — an update's delete/insert pair
                         // shares one id: keyed CDC without a natural key
                         withLineage: Boolean = false,
                         // audit a STAGED branch's commits (the branch
                         // head's ancestry; staged snapshots visible
                         // here, still invisible to main consumers)
                         branch: Option[String] = None): DataFrame = {
    val snaps = snapshotsOf(spark, dir, branch)
    require(snaps.nonEmpty, s"$dir has no snapshots")
    def seqOf(id: Long): Long = snaps.find(_.id == id).map(_.seq).getOrElse(
      throw new IllegalArgumentException(s"snapshot $id not found at $dir"))
    val loExcl = fromSnapshot.map(seqOf).getOrElse(snaps.head.seq - 1)
    val hiIncl = toSnapshot.map(seqOf).getOrElse(snaps.last.seq)
    require(loExcl <= hiIncl, s"empty snapshot range ($loExcl, $hiIncl]")
    // refuse loudly rather than emit null ids for a non-lineage table
    if (withLineage) require(isLineageTable(spark, dir),
      s"withLineage: $dir is not a v3 row-lineage table " +
      "(enableRowLineage / appendLineage first)")
    val schema = currentSchema(spark, dir)
    val frames = snaps.filter(t => t.seq > loExcl && t.seq <= hiIncl)
      .flatMap(t => changesForSnapshot(spark, dir, t.id, schema, withLineage,
        branch))
    frames.reduceOption(_ unionByName _).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        changeSchema(schema, withLineage)))
  }

  private[graft] def currentSchema(spark: SparkSession, dir: String): StructType =
    IcebergInterop.streamHead(spark, dir)._2

  /** The change-read OUTPUT schema: base fields (+ `_row_id` in
    * lineage mode) + the three change-marker columns — ONE
    * construction shared by the batch reader, the streaming source,
    * and the provider's pre-start schema. */
  private[graft] def changeSchema(base: StructType,
                                  withLineage: Boolean): StructType =
    StructType(base.fields ++
      (if (withLineage) Seq(StructField("_row_id", LongType)) else Nil) ++ Seq(
      StructField(ChangeType, StringType),
      StructField(ChangeOrdinal, LongType, nullable = false),
      StructField(CommitSnapshotId, LongType, nullable = false)))

  /** Whether `dir` is a v3 row-lineage table (metadata tracks
    * `next-row-id`). */
  private[graft] def isLineageTable(spark: SparkSession, dir: String): Boolean =
    IcebergInterop.readJson(spark,
      IcebergInterop.currentMetadataPath(spark, dir)).has("next-row-id")

  /** (canon data-file path -> first_row_id) over a manifest LIST —
    * the lineage derivation base shared by the batch changelog and
    * the streaming source's origin backfill. */
  private[graft] def firstRowIdsOf(spark: SparkSession,
                                   manifestList: String): Map[String, Long] =
    graft.pipeline.Par.map(IcebergInterop.avroRecords(spark,
        new Path(IcebergInterop.resolve(manifestList)))
        .filter(m => Option(m.get("content")).forall(
          _.asInstanceOf[Number].intValue == 0))
        .map(_.get("manifest_path").toString)) { mp =>
      IcebergInterop.avroRecords(spark, new Path(IcebergInterop.resolve(mp)))
        .filter(e => Option(e.get("status")).forall(
          _.asInstanceOf[Number].intValue != 2))
        .map { e =>
          val df = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
          val path = IcebergInterop.resolve(df.get("file_path").toString)
          // STRICT: a live data file without a first_row_id range means
          // this snapshot predates row lineage — null ids downstream
          // would collapse a keyed-CDC consumer onto one key, so refuse
          canon(path) -> Option(df.getSchema.getField("first_row_id"))
            .flatMap(_ => Option(df.get("first_row_id")))
            .map(_.asInstanceOf[Number].longValue)
            .getOrElse(throw new IllegalArgumentException(
              s"data file $path lacks first_row_id — this snapshot " +
              "predates row lineage; start the lineage changelog from a " +
              "post-enableRowLineage snapshot"))
        }
    }.flatten.toMap

  /** Above this many DATA MANIFESTS, the lineage path map builds as a
    * DISTRIBUTED manifest-entries DataFrame (manifests parse on
    * executors, the id attach becomes a plain join) instead of a
    * driver map broadcast — at millions-of-files scale the driver
    * never materializes every live path. Settable (0 forces the
    * distributed path — the spec's equivalence pin). */
  val LineageDriverManifestsConf = "spark.graft.iceberg.lineageDriverManifests"
  private[graft] def lineageDriverManifests(spark: SparkSession): Long =
    spark.conf.getOption(LineageDriverManifestsConf).map(_.toLong).getOrElse(1000L)

  /** The DATA-manifest paths of one manifest list (driver-side,
    * manifest-count bounded). */
  private def dataManifestPaths(spark: SparkSession,
                                manifestList: String): Seq[String] =
    IcebergInterop.avroRecords(spark,
        new Path(IcebergInterop.resolve(manifestList)))
      .filter(m => Option(m.get("content")).forall(
        _.asInstanceOf[Number].intValue == 0))
      .map(m => IcebergInterop.resolve(m.get("manifest_path").toString))

  /** (canon path, first_row_id) as a DISTRIBUTED DataFrame: the
    * manifest paths parallelize, each manifest's Avro parses on an
    * EXECUTOR, and the strict no-first_row_id refusal fires there too.
    * The driver holds manifest paths, never file paths. */
  private[graft] def firstRowIdsDF(spark: SparkSession,
                                   manifestList: String): DataFrame = {
    import spark.implicits._
    val mans = dataManifestPaths(spark, manifestList)
    val sconf = org.apache.spark.sql.GraftBridge.serializableConf(spark)
    spark.sparkContext
      .parallelize(mans, math.max(1, math.min(mans.size, 256)))
      .flatMap { mp =>
        IcebergFormat.readAvro(sconf.value, new Path(mp))
          .filter(e => Option(e.get("status")).forall(
            _.asInstanceOf[Number].intValue != 2))
          .map { e =>
            val df = e.get("data_file")
              .asInstanceOf[org.apache.avro.generic.GenericRecord]
            val path = IcebergInterop.resolve(df.get("file_path").toString)
            IcebergInterop.canonPathStr(path) ->
              Option(df.getSchema.getField("first_row_id"))
                .flatMap(_ => Option(df.get("first_row_id")))
                .map(_.asInstanceOf[Number].longValue)
                .getOrElse(throw new IllegalArgumentException(
                  s"data file $path lacks first_row_id — this snapshot " +
                  "predates row lineage; start the lineage changelog from " +
                  "a post-enableRowLineage snapshot"))
          }
      }.toDF("_lf", "_lfirst")
  }

  /** Gate-aware lineage-map source for one manifest list: a driver
    * map (Left) under the manifest-count gate, the distributed
    * DataFrame (Right, pinned for reuse) above it. */
  private[graft] def ridSourceFor(spark: SparkSession, manifestList: String)
      : Either[Map[String, Long], DataFrame] =
    if (dataManifestPaths(spark, manifestList).size <=
        lineageDriverManifests(spark))
      Left(firstRowIdsOf(spark, manifestList))
    else Right(firstRowIdsDF(spark, manifestList).localCheckpoint(false))

  /** Attach rids from whichever side [[ridSourceFor]] produced. */
  private[graft] def attachRidEither(spark: SparkSession, raw: DataFrame,
      src: Either[Map[String, Long], DataFrame]): DataFrame = src match {
    case Left(m) => attachRid(spark, raw, m)
    case Right(df) => attachRidDf(raw, df)
  }

  /** [[attachRid]] with the path map as a DataFrame — a plain join the
    * planner sizes itself (broadcast when small, shuffle when the map
    * outgrew the driver). */
  private[graft] def attachRidDf(raw: DataFrame, frDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw.withColumn("_lp",
        regexp_replace(col("_metadata.file_path"), "^file:/+", "/"))
      .withColumn("_lpos", col("_metadata.row_index"))
      .join(frDf, col("_lp") === col("_lf"), "left")
      .withColumn("_row_id",
        coalesce(col("_row_id"), col("_lfirst") + col("_lpos")))
      .drop("_lp", "_lpos", "_lf", "_lfirst")
  }

  /** `schema` + the reserved materialized `_row_id` column (field-id
    * pinned, so files that stamped it resolve by id). */
  private[graft] def lineageReadSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("_row_id", LongType,
      nullable = true, new MetadataBuilder()
        .putLong("parquet.field.id", IcebergFormat.RowIdFieldId).build()))

  /** Derive each raw row's stable id: the materialized column wins,
    * else the file's first_row_id + position (broadcast path map). */
  private[graft] def attachRid(spark: SparkSession, raw: DataFrame,
                               firstOf: Map[String, Long]): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val frDf = broadcast(firstOf.toSeq.toDF("_lf", "_lfirst"))
    raw.withColumn("_lp",
        regexp_replace(col("_metadata.file_path"), "^file:/+", "/"))
      .withColumn("_lpos", col("_metadata.row_index"))
      .join(frDf, col("_lp") === col("_lf"), "left")
      .withColumn("_row_id",
        coalesce(col("_row_id"), col("_lfirst") + col("_lpos")))
      .drop("_lp", "_lpos", "_lf", "_lfirst")
  }
}
