package graft.io

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.generic.GenericRecord
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** NATIVE Iceberg writes (iceberg.apache.org/spec/): `append` and
  * `overwrite` author spec-shaped v2 snapshots — data parquet with
  * `parquet.field.id` stamped, an Avro manifest with per-file record
  * counts and column bounds from ONE grouped stats job, an Avro
  * manifest list, and a `v<N>.metadata.json` committed by OPTIMISTIC
  * put-if-absent swap (the HadoopTables file-system-catalog protocol:
  * whoever creates `v<N+1>.metadata.json` first wins; the loser
  * re-reads the head and rebases). This closes the round-12 read-only
  * asymmetry: a warehouse whose tables are Iceberg-first can now be
  * WRITTEN by graft, and everything graft writes reads back through
  * [[IcebergInterop]] — same field-id resolution, same bound-based
  * file skipping, same snapshot time travel.
  *
  * Scale shape: the data write is one distributed parquet job; stats
  * come from one grouped aggregation keyed by `_metadata.file_path`
  * (never a per-file job); manifests/metadata are
  * file-count-bounded driver work, exactly like the Delta commit
  * path. Appends REBASE on version races (the staged files and
  * manifest stay valid; only the metadata JSON re-derives), bounded
  * by `MaxCommitRetries`; `overwrite` refuses to rebase across a
  * concurrent commit — replacing state someone else just changed is
  * a genuine conflict, delta-spark's own choice.
  *
  * Scope (loud): unpartitioned v2 appends/overwrites of flat schemas.
  * Partitioned/hidden-transform writes stay with the mirror path
  * ([[IcebergUniform]]) and the read side ([[IcebergTransforms]]);
  * row-level deletes on native Iceberg tables are out of scope (the
  * Delta plane owns mutation). */
object IcebergWrite {

  private val M = new ObjectMapper()

  /** Version races to absorb before giving up (append only). */
  val MaxCommitRetries = 5

  /** Test hook: runs between staging and each commit attempt, letting
    * a spec inject a deterministic version race. No-op in production. */
  private[graft] var onBeforeCommit: () => Unit = () => ()

  /** One freshly-authored manifest for a commit: its partition spec id,
    * (for partitioned manifests) the identity field-summary bytes the
    * manifest list carries for manifest-level skipping, and its content
    * kind (0 = data, 1 = deletes). */
  private final case class NewManifest(path: Path, specId: Int,
      summary: Option[(Array[Byte], Array[Byte])], content: Int = 0)

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def canonPath(p: String): String = p.replaceFirst("^file:/+", "/")

  /** Current metadata version: `version-hint.text` when present, else
    * the highest `v<N>.metadata.json` (hint is advisory in the spec's
    * FS-catalog convention; the listing is ground truth). 0 = no table. */
  private def currentVersion(f: FileSystem, root: Path): Int = {
    val meta = new Path(root, "metadata")
    if (!f.exists(meta)) return 0
    val listed = f.listStatus(meta).map(_.getPath.getName)
      .flatMap("""^v(\d+)\.metadata\.json$""".r.findFirstMatchIn(_))
      .map(_.group(1).toInt)
    if (listed.isEmpty) 0 else listed.max
  }

  private def readMeta(f: FileSystem, root: Path, v: Int): Option[JsonNode] =
    if (v == 0) None
    else {
      val in = f.open(new Path(root, s"metadata/v$v.metadata.json"))
      try Some(M.readTree(in)) finally in.close()
    }

  private def currentSchemaNode(m: JsonNode): JsonNode = {
    import scala.jdk.CollectionConverters._
    val cur = m.path("current-schema-id").asInt(0)
    m.path("schemas").elements().asScala
      .find(_.path("schema-id").asInt(-1) == cur)
      .getOrElse(throw new IllegalArgumentException(s"schema-id $cur missing"))
  }

  private def currentFieldIds(m: JsonNode): Seq[(String, Int)] = {
    import scala.jdk.CollectionConverters._
    currentSchemaNode(m).path("fields").elements().asScala
      .map(fd => fd.path("name").asText -> fd.path("id").asInt).toSeq
  }

  /** Stamp `parquet.field.id` so written files resolve by FIELD ID —
    * the invariant every real Iceberg writer upholds and the reader's
    * schema-evolution support depends on. */
  private def withFieldIds(df: DataFrame, idsByName: Map[String, Int]): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.sparkSession.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    df.select(df.schema.fields.map { fd =>
      col(fd.name).as(fd.name, new MetadataBuilder()
        .putLong("parquet.field.id", idsByName(fd.name).toLong).build())
    }.toSeq: _*)
  }

  /** Per-file (record count, bound bytes) in ONE grouped aggregation
    * keyed by `_metadata.file_path` — never a job per file. */
  private def allFileStats(spark: SparkSession, paths: Seq[String],
      idsByName: Map[String, Int]): Map[String, (Long, Map[Int, (Array[Byte], Array[Byte])])] = {
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    val df = spark.read.parquet(paths: _*)
    val statCols = df.schema.fields.filter(f => f.dataType match {
      case IntegerType | LongType | FloatType | DoubleType | DateType
           | StringType | TimestampType | TimestampNTZType => true
      case _ => false
    }).map(_.name).filter(idsByName.contains).toSeq
    val aggs = count(lit(1)).as("_n") +:
      statCols.flatMap(c => Seq(min(col(c)), max(col(c))))
    df.groupBy(col("_metadata.file_path").as("_p"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        val bounds = statCols.zipWithIndex.flatMap { case (c, i) =>
          val dt = df.schema(c).dataType
          for {
            lo <- IcebergFormat.serializeBound(dt, r.get(2 + 2 * i))
            hi <- IcebergFormat.serializeBound(dt, r.get(2 + 2 * i + 1))
          } yield idsByName(c) -> ((lo, hi))
        }.toMap
        canonPath(r.getString(0)) -> ((r.getLong(1), bounds))
      }.toMap
  }

  /** ADD a nullable column to a native Iceberg table — METADATA-ONLY
    * (zero file work): a new schema entry with a FRESH field id past
    * `last-column-id`, `current-schema-id` bumped, snapshots and specs
    * untouched. Old files surface NULL for the column through the
    * reader's field-id resolution; the next append must carry it. */
  def addColumn(spark: SparkSession, dir: String, name: String,
                dataType: DataType): Long =
    evolveSchema(spark, dir, s"ADD COLUMN $name") { (fields, lastId) =>
      import scala.jdk.CollectionConverters._
      require(!fields.asScala.exists(_.path("name").asText == name),
        s"column $name already exists at $dir")
      val fn = M.createObjectNode()
      fn.put("id", lastId + 1); fn.put("name", name)
      fn.put("required", false)
      fn.put("type", IcebergFormat.icebergType(dataType))
      (fields.asScala.toSeq :+ (fn: JsonNode), lastId + 1)
    }

  /** RENAME a column — metadata-only: the field keeps its ID (ids are
    * how evolved tables keep reading their old files), only the name
    * in the new schema entry changes. */
  def renameColumn(spark: SparkSession, dir: String, from: String,
                   to: String): Long =
    evolveSchema(spark, dir, s"RENAME COLUMN $from") { (fields, lastId) =>
      import scala.jdk.CollectionConverters._
      require(fields.asScala.exists(_.path("name").asText == from),
        s"no column $from at $dir")
      require(!fields.asScala.exists(_.path("name").asText == to),
        s"column $to already exists at $dir")
      val out = fields.asScala.toSeq.map { fd =>
        if (fd.path("name").asText != from) fd
        else {
          val c = fd.deepCopy[JsonNode]()
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          c.put("name", to); (c: JsonNode)
        }
      }
      (out, lastId)
    }

  /** Shared metadata-only schema evolution: deep-copy the previous
    * metadata, append a new schema (schema-id = max + 1) derived by
    * `evolve(currentFields, lastColumnId)`, bump current-schema-id /
    * last-column-id, and commit by the same put-if-absent version
    * swap appends use. Snapshots, specs, and every data file are
    * untouched — old snapshots keep their pinned schema-ids for time
    * travel. Returns the new metadata version. */
  private def evolveSchema(spark: SparkSession, dir: String, what: String)(
      evolve: (com.fasterxml.jackson.databind.node.ArrayNode, Int) =>
        (Seq[JsonNode], Int)): Long = {
    import scala.jdk.CollectionConverters._
    val f = fs(spark, dir)
    val root = new Path(dir)
    var attempt = 0
    while (true) {
      val base = currentVersion(f, root)
      val m = readMeta(f, root, base).getOrElse(throw new IllegalArgumentException(
        s"$dir has no Iceberg metadata — nothing to evolve"))
      val n = m.deepCopy[JsonNode]()
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val cur = currentSchemaNode(m)
      val lastId = m.path("last-column-id").asInt(
        currentFieldIds(m).map(_._2).maxOption.getOrElse(0))
      val (newFields, newLastId) = evolve(
        cur.path("fields").deepCopy[JsonNode]()
          .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode], lastId)
      val newSchemaId = m.path("schemas").elements().asScala
        .map(_.path("schema-id").asInt(0)).maxOption.getOrElse(0) + 1
      val sc = n.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("schemas")
        .addObject()
      sc.put("schema-id", newSchemaId); sc.put("type", "struct")
      val arr = sc.putArray("fields")
      newFields.foreach(arr.add)
      n.put("current-schema-id", newSchemaId)
      n.put("last-column-id", newLastId)
      n.put("last-updated-ms", System.currentTimeMillis())
      val target = new Path(root, s"metadata/v${base + 1}.metadata.json")
      val tmp = new Path(root,
        s"metadata/.tmp-v${base + 1}-${java.util.UUID.randomUUID().toString.take(8)}.json")
      val out = f.create(tmp, false)
      try out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(n))
      finally out.close()
      if (!f.exists(target) && f.rename(tmp, target)) {
        val hint = f.create(new Path(root, "metadata/version-hint.text"), true)
        try hint.write(String.valueOf(base + 1).getBytes) finally hint.close()
        return (base + 1).toLong
      }
      f.delete(tmp, false)
      attempt += 1
      require(attempt < MaxCommitRetries,
        s"$what on $dir lost $MaxCommitRetries version races")
    }
    -1L // unreachable
  }

  /** Append `df` as a new snapshot (creating the table on first call).
    * Returns the committed snapshot id. */
  def append(df: DataFrame, dir: String): Long =
    write(df, dir, replace = false)

  /** Replace the table's contents with `df` in one new snapshot
    * (`operation=overwrite`); prior snapshots stay time-travelable.
    * Refuses on a concurrent commit (no rebase across an overwrite). */
  def overwrite(df: DataFrame, dir: String): Long =
    write(df, dir, replace = true)

  /** Append `df` as a new snapshot PARTITIONED on `partCol` (identity
    * transform — one manifest per partition value, each manifest-list
    * entry carrying the spec's field_summary), creating the table on
    * first call. The manifest-level skipping [[IcebergInterop]] does
    * for foreign partitioned tables works identically on tables graft
    * writes: a single-value read opens only that value's manifests.
    * Write shape: ONE hive-partitioned staging job + ONE grouped stats
    * job regardless of the partition-value count; the source column
    * stays a REAL column in the data files (a duplicate throwaway
    * column drives the directory split), so reads need no
    * partition-tuple reconstruction. Hidden transforms (day/bucket/
    * truncate) stay read-side — the mirror and fixture author them. */
  def appendPartitioned(df: DataFrame, dir: String, partCol: String): Long = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val root = new Path(dir)
    f.mkdirs(new Path(root, "metadata")); f.mkdirs(new Path(root, "data"))
    require(df.columns.contains(partCol), s"no partition column $partCol")
    val srcDt = df.schema(partCol).dataType
    require(srcDt == IntegerType || srcDt == LongType || srcDt == StringType,
      s"identity partitioning supports int/long/string columns, got $srcDt")
    val v0 = currentVersion(f, root)
    val idsByName: Map[String, Int] = readMeta(f, root, v0) match {
      case Some(m) =>
        val cur = currentFieldIds(m)
        require(df.columns.toSet == cur.map(_._1).toSet,
          s"write columns ${df.columns.toSeq.sorted} must match current " +
          s"schema ${cur.map(_._1).sorted} (evolve the schema first)")
        cur.toMap
      case None =>
        df.schema.fieldNames.zipWithIndex.map { case (n0, i) => n0 -> (i + 1) }.toMap
    }
    import org.apache.spark.sql.functions.col
    val staging = new Path(root, s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    withFieldIds(df, idsByName).withColumn("_graft_p", col(partCol))
      .write.partitionBy("_graft_p").parquet(staging.toString)
    def decode(dirName: String): Any = {
      val raw = java.net.URLDecoder.decode(dirName.stripPrefix("_graft_p="), "UTF-8")
      srcDt match {
        case IntegerType => raw.toInt
        case LongType => raw.toLong
        case _ => raw
      }
    }
    val filesOfValue: Seq[(Any, Seq[(Path, Long)])] = f.listStatus(staging)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_graft_p="))
      .sortBy(_.getPath.getName)
      .map { d =>
        val files = f.listStatus(d.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map { st =>
            val dst = new Path(root, s"data/${java.util.UUID.randomUUID()}.parquet")
            require(f.rename(st.getPath, dst), s"rename ${st.getPath} failed")
            (dst, f.getFileStatus(dst).getLen)
          }.toSeq
        (decode(d.getPath.getName), files)
      }.toSeq
    f.delete(staging, true)
    val allPaths = filesOfValue.flatMap(_._2.map(_._1.toString))
    val stats =
      if (allPaths.isEmpty) Map.empty[String, (Long, Map[Int, (Array[Byte], Array[Byte])])]
      else allFileStats(spark, allPaths, idsByName)

    var attempt = 0
    var base = v0
    while (true) {
      val snapshotId = freshSnapshotId(f, root, base)
      val seqNo = readMeta(f, root, base)
        .map(_.path("last-sequence-number").asLong(0L)).getOrElse(0L) + 1L
      val mans = filesOfValue.zipWithIndex.flatMap { case ((v, files), i) =>
        val entries = files.flatMap { case (pp, size) =>
          stats.get(canonPath(pp.toString)).map { case (rows, bounds) =>
            IcebergFormat.entry(0, pp.toString, rows, size, snapshotId, seqNo,
              bounds = bounds)
          } // zero-record staged file: skip (deleted below)
        }
        if (entries.isEmpty) None
        else {
          val mp = new Path(root,
            s"metadata/manifest-$snapshotId-$i-${java.util.UUID.randomUUID().toString.take(8)}.avro")
          IcebergFormat.writeAvro(f, mp, IcebergFormat.EntrySchema, entries)
          Some(NewManifest(mp, 1,
            IcebergFormat.serializeBound(srcDt, v).map(b => (b, b))))
        }
      }
      filesOfValue.flatMap(_._2).foreach { case (pp, _) =>
        if (!stats.contains(canonPath(pp.toString))) f.delete(pp, false)
      }
      try {
        onBeforeCommit()
        return commitMeta(spark, f, root, base, df.schema, snapshotId, seqNo,
          mans, replace = false, partSpec = Some((partCol, idsByName(partCol))))
      } catch {
        case _: java.util.ConcurrentModificationException =>
          mans.foreach(nm => f.delete(nm.path, false))
          attempt += 1
          require(attempt < MaxCommitRetries,
            s"append to $dir lost $MaxCommitRetries version races")
          base = currentVersion(f, root)
      }
    }
    -1L // unreachable
  }

  /** MERGE-ON-READ DELETE for native Iceberg tables: rows where
    * `predicate` is TRUE are masked by a POSITION-DELETE snapshot —
    * spec-shaped `file_path`/`pos` parquet (the spec's reserved field
    * ids 2147483546/2147483545 stamped) referenced by a content=1
    * delete manifest. NO data file rewrites: work is O(deleted rows),
    * the 100 TB low-selectivity path, and the result reads back
    * through [[IcebergInterop]]'s existing in-plan position-delete
    * anti-join (deletes COMPOSE — the hits scan runs on the already-
    * masked view, so re-deleting is structurally impossible). `ranges`
    * prunes the candidate scan through the manifest bounds, the same
    * hint contract as [[DeltaInterop.deleteWhere]].
    * Returns (snapshotId, rowsDeleted) — or (currentSnapshot, 0) when
    * nothing matches. Caveat (documented parity with Iceberg's own
    * streaming): the graft-iceberg streaming SOURCE refuses delete
    * snapshots — raw-file replay cannot honor masks. */
  def deleteWhere(spark: SparkSession, dir: String,
                  predicate: org.apache.spark.sql.Column,
                  ranges: Map[String, (Double, Double)] = Map.empty): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    val f = fs(spark, dir)
    val root = new Path(dir)
    val v0 = currentVersion(f, root)
    require(v0 > 0, s"$dir has no snapshots to delete from")
    def currentSnap(): Long = readMeta(f, root, currentVersion(f, root))
      .map(_.path("current-snapshot-id").asLong(-1L)).getOrElse(-1L)
    val hits = IcebergInterop.readIceberg(spark, dir, ranges = ranges,
        withProvenance = true)
      .filter(predicate)
      .select(
        col("_graft_file").as("file_path", new MetadataBuilder()
          .putLong("parquet.field.id", 2147483546L).build()),
        col("_graft_pos").cast(LongType).as("pos", new MetadataBuilder()
          .putLong("parquet.field.id", 2147483545L).build()))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val staging = new Path(root, s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    hits.write.parquet(staging.toString)
    val staged = f.listStatus(staging).filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val dst = new Path(root, s"data/delete-${java.util.UUID.randomUUID()}.parquet")
        require(f.rename(st.getPath, dst), s"rename ${st.getPath} failed")
        (dst, f.getFileStatus(dst).getLen)
      }.toSeq
    f.delete(staging, true)
    // per-file row counts in one grouped job; zero-record files drop
    val counts: Map[String, Long] =
      if (staged.isEmpty) Map.empty
      else {
        import org.apache.spark.sql.functions.{count, lit}
        spark.read.parquet(staged.map(_._1.toString): _*)
          .groupBy(col("_metadata.file_path").as("_p"))
          .agg(count(lit(1)).as("_n"))
          .collect().map(r => canonPath(r.getString(0)) -> r.getLong(1)).toMap
      }
    val (delFiles, empties) =
      staged.partition(p => counts.contains(canonPath(p._1.toString)))
    empties.foreach { case (p, _) => f.delete(p, false) }
    if (delFiles.isEmpty) return (currentSnap(), 0L)
    val deleted = counts.values.sum

    var attempt = 0
    var base = v0
    while (true) {
      val snapshotId = freshSnapshotId(f, root, base)
      val seqNo = readMeta(f, root, base)
        .map(_.path("last-sequence-number").asLong(0L)).getOrElse(0L) + 1L
      val entries = delFiles.map { case (p, size) =>
        IcebergFormat.entry(1, p.toString,
          counts(canonPath(p.toString)), size, snapshotId, seqNo)
      }
      val mp = new Path(root,
        s"metadata/delete-manifest-$snapshotId-${java.util.UUID.randomUUID().toString.take(8)}.avro")
      IcebergFormat.writeAvro(f, mp, IcebergFormat.EntrySchema, entries)
      try {
        onBeforeCommit()
        val dummySchema = StructType(Nil) // schemas carry forward past v1
        return (commitMeta(spark, f, root, base, dummySchema, snapshotId,
          seqNo, Seq(NewManifest(mp, 0, None, content = 1)),
          replace = false, operation = Some("delete")), deleted)
      } catch {
        case _: java.util.ConcurrentModificationException =>
          f.delete(mp, false)
          attempt += 1
          require(attempt < MaxCommitRetries,
            s"delete on $dir lost $MaxCommitRetries version races")
          base = currentVersion(f, root)
      }
    }
    (-1L, -1L) // unreachable
  }

  /** Exactly-once streaming append: the (appId, txnVersion) ledger
    * rides the SNAPSHOT SUMMARY (`graft-app-id` / `graft-txn` keys —
    * Iceberg's spec-blessed operation metadata), so a batch replayed
    * after a crash-between-table-commit-and-offset-commit is
    * recognized and writes nothing — [[DeltaInterop.appendOnce]]'s
    * contract on the Iceberg plane. The ledger check is one metadata
    * read (max txn over the lineage's summaries); keep snapshots
    * retained at least as long as the stream's restart horizon, the
    * same rule Delta's txn actions get from checkpoints. */
  def appendOnce(df: DataFrame, dir: String, appId: String,
                 txnVersion: Long): Long =
    write(df, dir, replace = false, txn = Some((appId, txnVersion)))

  /** Highest `graft-txn` any snapshot's summary records for `appId`
    * (-1 when none) — the replay watermark. */
  private def committedTxn(spark: SparkSession, f: FileSystem, root: Path,
                           appId: String): Long = {
    import scala.jdk.CollectionConverters._
    readMeta(f, root, currentVersion(f, root)).toSeq.flatMap(
      _.path("snapshots").elements().asScala.flatMap { s0 =>
        val sum = s0.path("summary")
        if (sum.path("graft-app-id").asText("") == appId)
          Some(sum.path("graft-txn").asLong(-1L))
        else None
      }).maxOption.getOrElse(-1L)
  }

  private def write(df: DataFrame, dir: String, replace: Boolean,
                    txn: Option[(String, Long)] = None): Long = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val root = new Path(dir)
    f.mkdirs(new Path(root, "metadata")); f.mkdirs(new Path(root, "data"))
    // replayed batch: the ledger already covers this txn — nothing
    // staged, nothing written
    txn.foreach { case (appId, tv) =>
      if (committedTxn(spark, f, root, appId) >= tv)
        return readMeta(f, root, currentVersion(f, root))
          .map(_.path("current-snapshot-id").asLong(-1L)).getOrElse(-1L)
    }
    val v0 = currentVersion(f, root)
    val meta0 = readMeta(f, root, v0)

    // field ids from the CURRENT schema (stable across evolution); a
    // brand-new table assigns 1..n positionally
    val idsByName: Map[String, Int] = meta0 match {
      case Some(m) =>
        val cur = currentFieldIds(m)
        require(df.columns.toSet == cur.map(_._1).toSet,
          s"write columns ${df.columns.toSeq.sorted} must match current " +
          s"schema ${cur.map(_._1).sorted} (evolve the schema first)")
        cur.toMap
      case None =>
        df.schema.fieldNames.zipWithIndex.map { case (n0, i) => n0 -> (i + 1) }.toMap
    }

    // distributed staging: write under a hidden dir, RENAME into data/
    // under fresh unique names — invisible until the metadata commit
    // references them, reclaimable if the commit never lands
    val staging = new Path(root, s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    withFieldIds(df, idsByName).write.parquet(staging.toString)
    val staged = f.listStatus(staging).filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val dst = new Path(root, s"data/${java.util.UUID.randomUUID()}.parquet")
        require(f.rename(st.getPath, dst), s"rename ${st.getPath} failed")
        (dst, f.getFileStatus(dst).getLen)
      }.toSeq
    f.delete(staging, true)
    val stats =
      if (staged.isEmpty) Map.empty[String, (Long, Map[Int, (Array[Byte], Array[Byte])])]
      else allFileStats(spark, staged.map(_._1.toString), idsByName)
    // a ZERO-record staged file (empty write partition) has no stats
    // group — never manifest it; delete it like the Delta stageData
    // path does
    val (dataFiles, empties) =
      staged.partition(p => stats.contains(canonPath(p._1.toString)))
    empties.foreach { case (p, _) => f.delete(p, false) }

    var attempt = 0
    var base = v0
    while (true) {
      val snapshotId = freshSnapshotId(f, root, base)
      val seqNo = readMeta(f, root, base)
        .map(_.path("last-sequence-number").asLong(0L)).getOrElse(0L) + 1L
      val entries = dataFiles.map { case (p, size) =>
        val (rows, bounds) = stats.getOrElse(canonPath(p.toString),
          throw new IllegalStateException(s"no stats row for $p"))
        IcebergFormat.entry(0, p.toString, rows, size, snapshotId, seqNo,
          bounds = bounds)
      }
      val manifestP = new Path(root,
        s"metadata/manifest-$snapshotId-${java.util.UUID.randomUUID().toString.take(8)}.avro")
      IcebergFormat.writeAvro(f, manifestP, IcebergFormat.EntrySchema, entries)
      try {
        onBeforeCommit()
        return commitMeta(spark, f, root, base, df.schema, snapshotId, seqNo,
          Seq(NewManifest(manifestP, 0, None)), replace, txn)
      }
      catch {
        case _: java.util.ConcurrentModificationException =>
          f.delete(manifestP, false) // re-authored next attempt (new ids)
          // a DUPLICATE same-batch writer may have won the race: if the
          // ledger now covers this txn, drop our staged files and defer
          txn.foreach { case (appId, tv) =>
            if (committedTxn(spark, f, root, appId) >= tv) {
              dataFiles.foreach { case (pp, _) => f.delete(pp, false) }
              return readMeta(f, root, currentVersion(f, root))
                .map(_.path("current-snapshot-id").asLong(-1L)).getOrElse(-1L)
            }
          }
          require(!replace,
            s"overwrite of $dir lost the version race to a concurrent " +
            "commit — replacing state that just changed is a conflict, not a rebase")
          attempt += 1
          require(attempt < MaxCommitRetries,
            s"append to $dir lost $MaxCommitRetries version races")
          base = currentVersion(f, root)
      }
    }
    -1L // unreachable
  }

  /** A snapshot id no prior snapshot used (random, positive — the spec
    * requires uniqueness, not ordering). */
  private def freshSnapshotId(f: FileSystem, root: Path, v: Int): Long = {
    import scala.jdk.CollectionConverters._
    val prior: Set[Long] = readMeta(f, root, v).toSet[JsonNode].flatMap(
      _.path("snapshots").elements().asScala.map(_.path("snapshot-id").asLong))
    var id = math.abs(java.util.UUID.randomUUID().getMostSignificantBits)
    while (prior.contains(id) || id <= 0) id += 1
    id
  }

  /** Author `v<base+1>.metadata.json` + the snapshot's manifest list and
    * commit by put-if-absent create; throws FileAlreadyExists on a lost
    * race. Prior manifests carry forward from the current snapshot's
    * manifest list on append; an overwrite starts from just the new
    * manifest (older files stay reachable through older snapshots). */
  private def commitMeta(spark: SparkSession, f: FileSystem, root: Path,
                         base: Int, schema: StructType, snapshotId: Long,
                         seqNo: Long, newManifests: Seq[NewManifest],
                         replace: Boolean,
                         txn: Option[(String, Long)] = None,
                         // (partition column name, source field id):
                         // registers the identity spec 1 on first use
                         partSpec: Option[(String, Int)] = None,
                         operation: Option[String] = None): Long = {
    import scala.jdk.CollectionConverters._
    val prevMeta = readMeta(f, root, base)
    val MFS = IcebergFormat.ManifestFileSchema

    // prior manifests carry forward VERBATIM — especially their
    // original added_snapshot_id and sequence_number: incremental
    // consumers (the graft-iceberg streaming tailer) resolve "files
    // added by snapshot S" through added_snapshot_id, so stamping the
    // new id on carried-forward manifests would re-attribute old data
    // (path, len, content, seq, specId, addedBy, partitions-raw) — the
    // raw field-summary object carries forward VERBATIM so a table's
    // manifest-level skipping survives later commits
    val prior: Seq[(String, Long, Int, Long, Int, Long, AnyRef)] =
      if (replace) Nil
      else prevMeta.toSeq.flatMap { m =>
        val cur = m.path("current-snapshot-id").asLong(-1L)
        m.path("snapshots").elements().asScala
          .find(_.path("snapshot-id").asLong == cur).toSeq
          .flatMap { s0 =>
            IcebergFormat.readAvro(spark.sparkContext.hadoopConfiguration,
              new Path(new java.net.URI(s0.path("manifest-list").asText).getPath))
              .map { r =>
                (r.get("manifest_path").toString,
                  r.get("manifest_length").asInstanceOf[Number].longValue,
                  r.get("content").asInstanceOf[Number].intValue,
                  Option(r.get("sequence_number"))
                    .map(_.asInstanceOf[Number].longValue).getOrElse(0L),
                  Option(r.getSchema.getField("partition_spec_id"))
                    .flatMap(_ => Option(r.get("partition_spec_id")))
                    .map(_.asInstanceOf[Number].intValue).getOrElse(0),
                  Option(r.get("added_snapshot_id"))
                    .map(_.asInstanceOf[Number].longValue).getOrElse(snapshotId),
                  Option(r.getSchema.getField("partitions"))
                    .flatMap(_ => Option(r.get("partitions"))).orNull)
              }
          }
      }
    val FS = MFS.getField("partitions").schema().getTypes.get(1)
    val fresh: Seq[(String, Long, Int, Long, Int, Long, AnyRef)] =
      newManifests.map { nm =>
        val parts: AnyRef = nm.summary.map { case (lo, hi) =>
          val fsRec = new org.apache.avro.generic.GenericData.Record(
            FS.getElementType)
          fsRec.put("contains_null", false)
          fsRec.put("lower_bound", java.nio.ByteBuffer.wrap(lo))
          fsRec.put("upper_bound", java.nio.ByteBuffer.wrap(hi))
          val arr = new org.apache.avro.generic.GenericData.Array[GenericRecord](1, FS)
          arr.add(fsRec); arr
        }.orNull
        (nm.path.toString, f.getFileStatus(nm.path).getLen, nm.content,
          seqNo, nm.specId, snapshotId, parts)
      }
    val listRecords: Seq[GenericRecord] =
      (prior ++ fresh).map {
        case (mp, len, content, mseq, specId, addedBy, parts) =>
        val r = new org.apache.avro.generic.GenericData.Record(MFS)
        r.put("manifest_path", mp)
        r.put("manifest_length", len)
        r.put("partition_spec_id", specId)
        r.put("content", content)
        r.put("sequence_number", mseq)
        r.put("added_snapshot_id", addedBy)
        if (parts != null) r.put("partitions", parts)
        r
      }
    val listP = new Path(root,
      s"metadata/snap-$snapshotId-${java.util.UUID.randomUUID().toString.take(8)}.avro")
    IcebergFormat.writeAvro(f, listP, MFS, listRecords)

    val n = M.createObjectNode()
    n.put("format-version",
      prevMeta.map(_.path("format-version").asInt(2)).getOrElse(2))
    n.put("table-uuid", prevMeta.map(_.path("table-uuid").asText)
      .getOrElse(java.util.UUID.randomUUID().toString))
    n.put("location", root.toString)
    n.put("last-sequence-number", seqNo)
    n.put("last-updated-ms", System.currentTimeMillis())
    // schemas carry FORWARD (field ids must stay stable); only table
    // creation derives one from the DataFrame, ids 1..n
    val curSchemaId = prevMeta match {
      case Some(m) =>
        n.set[JsonNode]("schemas", m.path("schemas").deepCopy[JsonNode]())
        n.put("last-column-id", m.path("last-column-id").asInt(
          currentFieldIds(m).map(_._2).maxOption.getOrElse(0)))
        m.path("current-schema-id").asInt(0)
      case None =>
        val schemas = n.putArray("schemas")
        val sc = schemas.addObject()
        sc.put("schema-id", 0); sc.put("type", "struct")
        val fields = sc.putArray("fields")
        schema.fields.zipWithIndex.foreach { case (fd, i) =>
          val fn = fields.addObject()
          fn.put("id", i + 1); fn.put("name", fd.name)
          fn.put("required", !fd.nullable)
          fn.put("type", IcebergFormat.icebergType(fd.dataType))
        }
        n.put("last-column-id", schema.fields.length)
        0
    }
    n.put("current-schema-id", curSchemaId)
    val specs = n.putArray("partition-specs")
    // STRICT copy of every prior spec — a lazy iterator short-circuited
    // by an exists/contains would silently drop the specs after the
    // first hit, and a manifest referencing a dropped spec loses its
    // manifest-level skipping
    val copied = prevMeta.toSeq.flatMap(
      _.path("partition-specs").elements().asScala.toList)
    copied.foreach(s0 => specs.add(s0.deepCopy[JsonNode]()))
    if (!copied.exists(_.path("spec-id").asInt(-1) == 0)) {
      val sp = specs.addObject(); sp.put("spec-id", 0); sp.putArray("fields")
    }
    partSpec.filterNot(_ =>
      copied.exists(_.path("spec-id").asInt(-1) == 1)).foreach {
      case (fieldName, srcId) =>
        val sp = specs.addObject(); sp.put("spec-id", 1)
        val fields = sp.putArray("fields")
        val fd = fields.addObject()
        fd.put("name", fieldName); fd.put("transform", "identity")
        fd.put("source-id", srcId); fd.put("field-id", 1000)
    }
    n.put("default-spec-id", 0)
    n.put("current-snapshot-id", snapshotId)
    val snaps = n.putArray("snapshots")
    prevMeta.foreach(_.path("snapshots").elements().asScala.foreach(snaps.add))
    val s0 = snaps.addObject()
    s0.put("snapshot-id", snapshotId)
    s0.put("sequence-number", seqNo)
    s0.put("timestamp-ms", System.currentTimeMillis())
    s0.put("manifest-list", listP.toString)
    s0.put("schema-id", curSchemaId)
    val sum = s0.putObject("summary")
    sum.put("operation",
      operation.getOrElse(if (replace) "overwrite" else "append"))
    txn.foreach { case (appId, tv) =>
      sum.put("graft-app-id", appId); sum.put("graft-txn", tv)
    }

    // THE COMMIT: full write to a hidden temp, then RENAME without
    // overwrite into the next metadata version — a reader never sees
    // partial bytes, and the rename fails (never truncates) when a
    // concurrent writer got there first (DeltaInterop.commit's shape)
    val target = new Path(root, s"metadata/v${base + 1}.metadata.json")
    val tmp = new Path(root,
      s"metadata/.tmp-v${base + 1}-${java.util.UUID.randomUUID().toString.take(8)}.json")
    val out = f.create(tmp, false)
    try out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(n))
    finally out.close()
    val won = !f.exists(target) && f.rename(tmp, target)
    if (!won) {
      f.delete(tmp, false); f.delete(listP, false)
      throw new java.util.ConcurrentModificationException(
        s"version ${base + 1} of $root was committed concurrently")
    }
    // hint is advisory (readers fall back to the listing); last wins
    val hint = f.create(new Path(root, "metadata/version-hint.text"), true)
    try hint.write(String.valueOf(base + 1).getBytes) finally hint.close()
    snapshotId
  }
}
