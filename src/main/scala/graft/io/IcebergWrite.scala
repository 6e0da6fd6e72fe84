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
  * Scope: v2 appends/overwrites of flat schemas, partitioned writes
  * (identity and hidden transforms — `year/month/day/hour`,
  * `bucket[N]`, `truncate[W]`), merge-on-read row-level DELETE /
  * UPDATE / MERGE (position deletes + postimage appends in one
  * snapshot), equality-delete authoring, metadata-only schema
  * evolution (add/rename), and table maintenance ([[compact]] folds
  * deletes into rewritten files; [[expireSnapshots]] bounds
  * `metadata/` and reclaims unreferenced files). The UniForm mirror
  * path stays with [[IcebergUniform]].
  *
  * Foreign-table fidelity: commits start from a DEEP COPY of the
  * previous `v<N>.metadata.json` and mutate only the keys the commit
  * changes — a foreign table's properties, refs (branches/tags),
  * sort-orders, default-sort-order-id, last-partition-id and
  * snapshot-log/metadata-log all carry forward verbatim, and table
  * creation emits the full v2-required field set, so graft-written
  * metadata parses in any spec-conformant Iceberg client. */
object IcebergWrite {

  private val M = new ObjectMapper()
  private type ObjNode = com.fasterxml.jackson.databind.node.ObjectNode

  /** Version races to absorb before giving up (append only). */
  val MaxCommitRetries = 5

  /** Test hook: runs between staging and each commit attempt, letting
    * a spec inject a deterministic version race. No-op in production. */
  private[graft] var onBeforeCommit: () => Unit = () => ()

  /** Test hook: force the grouped-aggregation stats job even when the
    * footers qualify, so IcebergFooterStatsSpec can prove both paths
    * author identical manifests. Never set in production. */
  private[graft] var disableFooterStats: Boolean = false

  /** Test introspection: (footer fast-path commits, job fallbacks)
    * since JVM start — lets the spec prove the fast path actually
    * fires rather than silently falling back every time. */
  @volatile private[graft] var footerStatsHits: Long = 0L
  @volatile private[graft] var footerStatsMisses: Long = 0L

  /** A partition-spec request for one commit: ORDERED partition
    * fields `transform(srcColumn)` — one or many (the standard event
    * layout is `(day(ts), bucket(id))`). [[commitMeta]] resolves it to
    * an existing spec with the same ordered (source-id, transform)
    * list or registers a fresh one (spec-id = max + 1, field-ids
    * allocated past last-partition-id, never reused). */
  private final case class SpecReq(fields: Seq[(String, Int, String)])

  /** A partitioned manifest's per-field summary for the manifest
    * list: whether the partition holds nulls, and the (lo, hi) bound
    * bytes (absent for the null partition — no bounds without
    * evidence). */
  private final case class Summary(containsNull: Boolean,
      bounds: Option[(Array[Byte], Array[Byte])])

  /** One freshly-authored manifest for a commit: `partitioned`
    * manifests take the commit's resolved spec id and carry one
    * `summary` PER SPEC FIELD (in spec order) for manifest-level
    * skipping; content kind 0 = data, 1 = deletes. */
  private final case class NewManifest(path: Path, partitioned: Boolean,
      summary: Option[Seq[Summary]], content: Int = 0,
      // the manifest's just-authored entries, kept IN MEMORY so the
      // commit's summary counting never re-reads the file it wrote
      entries: Seq[GenericRecord] = Nil)

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def canonPath(p: String): String = p.replaceFirst("^file:/+", "/")

  /** Hive/Spark `unescapePathName` semantics for staged partition
    * directory names: ONLY `%XX` escapes decode. Spark's
    * escapePathName never escapes `+`, so a literal `+` in a string
    * partition value must survive — `java.net.URLDecoder` would turn
    * it into a space, corrupting the manifest field summary and
    * letting manifest-level skipping prune the manifest that actually
    * holds the rows. */
  private def unescapePathName(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val code =
          try Integer.parseInt(s.substring(i + 1, i + 3), 16)
          catch { case _: NumberFormatException => -1 }
        if (code >= 0) { sb.append(code.toChar); i += 3 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Decode one staged `<prefix>=<v>` directory name to its typed
    * transformed partition value; None = the null partition (Spark's
    * default-partition sentinel). Shared by [[appendPartitioned]] and
    * [[compact]]'s partition-preserving rewrite. */
  private def decodePartValue(dirName: String, prefix: String,
                              resultDt: DataType): Option[Any] = {
    val raw = unescapePathName(dirName.stripPrefix(s"$prefix="))
    if (raw == "__HIVE_DEFAULT_PARTITION__") None
    else Some(resultDt match {
      case IntegerType => raw.toInt
      case LongType => raw.toLong
      case _ => raw
    })
  }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncRe = """truncate\[(\d+)\]""".r

  /** Validate a (transform, source type) combination and return the
    * transform's RESULT type (what partition directories and field
    * summaries carry). */
  private def transformResultType(transform: String, srcDt: DataType): DataType = {
    val ok = (transform, srcDt) match {
      case ("identity", IntegerType | LongType | StringType) => true
      case ("year" | "month" | "day",
            DateType | TimestampType | TimestampNTZType) => true
      case ("hour", TimestampType | TimestampNTZType) => true
      case (BucketRe(_), IntegerType | LongType | StringType | DateType
            | TimestampType | TimestampNTZType) => true
      case (TruncRe(_), IntegerType | LongType | StringType) => true
      case _ => false
    }
    require(ok, s"partition transform $transform does not apply to a $srcDt column")
    IcebergTransforms.resultType(transform, srcDt).get
  }

  /** The spec field NAME a transform gets (Iceberg's convention:
    * identity keeps the column name; transforms suffix it). */
  private def specFieldName(c: String, transform: String): String =
    transform match {
      case "identity" => c
      case BucketRe(_) => s"${c}_bucket"
      case TruncRe(_) => s"${c}_trunc"
      case t => s"${c}_$t"
    }

  /** Stage `df` hive-partitioned on its TRANSFORMED partition-value
    * columns (`_graft_p0..k`, computed by the codegen
    * [[graft.functions.expressions.IcebergPartitionValue]]), rename
    * every leaf into `data/` under fresh unique names, and return one
    * row per partition-value TUPLE (decoded per field; None = the
    * null partition) with its files — ONE distributed write job
    * regardless of how many partition values exist. */
  private def stagePartitioned(spark: SparkSession, f: FileSystem, root: Path,
      dfWithIds: DataFrame, parts: Seq[(String, String)],
      resultDts: Seq[DataType],
      clusterBySpec: Boolean = false): Seq[(Seq[Option[Any]], Seq[(Path, Long)])] = {
    import org.apache.spark.sql.functions.col
    val staging = new Path(root,
      s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    val pNames = parts.indices.map(i => s"_graft_p$i")
    val staged0 = parts.zipWithIndex.foldLeft(dfWithIds) {
      case (d, ((c, transform), i)) =>
        val pCol =
          if (transform == "identity") col(c)
          else org.apache.spark.sql.GraftBridge.column(
            graft.functions.expressions.IcebergPartitionValue(
              org.apache.spark.sql.GraftBridge.expression(col(c)), transform))
        d.withColumn(pNames(i), pCol)
    }
    // clusterBySpec: one shuffle co-locating each partition TUPLE into
    // one task, so the staged layout is ONE file per tuple per batch
    // instead of tasks × tuples tiny files — the many-small-partitions
    // shape (a streaming state table's per-batch appends). Large
    // scans-worth of rows per tuple should NOT cluster (it would
    // serialize each tuple's write into a single task).
    val staged = if (clusterBySpec) staged0.repartition(pNames.map(col): _*)
      else staged0
    staged.write.partitionBy(pNames: _*).parquet(staging.toString)
    def walk(d: Path, level: Int, acc: Seq[Option[Any]])
        : Seq[(Seq[Option[Any]], Seq[(Path, Long)])] =
      if (level == parts.size) {
        val files = f.listStatus(d)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map { st =>
            val dst = new Path(root, s"data/${java.util.UUID.randomUUID()}.parquet")
            require(f.rename(st.getPath, dst), s"rename ${st.getPath} failed")
            (dst, f.getFileStatus(dst).getLen)
          }.toSeq
        Seq((acc, files))
      } else f.listStatus(d)
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith(s"${pNames(level)}="))
        .sortBy(_.getPath.getName)
        .flatMap(sub => walk(sub.getPath, level + 1, acc :+
          decodePartValue(sub.getPath.getName, pNames(level), resultDts(level))))
        .toSeq
    val out = walk(staging, 0, Nil)
    f.delete(staging, true)
    out
  }

  /** The per-field manifest-list summary of one partition-value
    * tuple: a null value ⇒ contains_null with no bounds; otherwise a
    * single-value (lo = hi) bound. */
  private def summariesOf(vals: Seq[Option[Any]],
                          resultDts: Seq[DataType]): Seq[Summary] =
    vals.zip(resultDts).map {
      case (None, _) => Summary(containsNull = true, None)
      case (Some(v), dt) => Summary(containsNull = false,
        IcebergFormat.serializeBound(dt, v).map(b => (b, b)))
    }

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

  /** v3 ROW LINEAGE: the table's fresh-row-id watermark (`next-row-id`)
    * — present exactly when lineage is on. Every commit that adds data
    * files assigns each new file's `first_row_id` from here and
    * advances it by the file's record count (iceberg.apache.org/spec/
    * "Row Lineage"). */
  private def nextRowIdOf(m: Option[JsonNode]): Option[Long] =
    m.flatMap(mm => Option(mm.get("next-row-id")).map(_.asLong))

  /** Field ids for the reserved lineage columns a rewrite materializes
    * — appended to the schema map so [[withFieldIds]] stamps them. */
  private def lineageIds(df: DataFrame): Map[String, Int] =
    Seq(IcebergFormat.RowIdCol -> IcebergFormat.RowIdFieldId.toInt,
        IcebergFormat.LastUpdatedSeqCol ->
          IcebergFormat.LastUpdatedSeqFieldId.toInt)
      .filter { case (c, _) => df.columns.contains(c) }.toMap

  /** Per-file row counts straight from the parquet FOOTERS — zero
    * Spark jobs. A staged file was just written by this driver, so a
    * footer read is local metadata I/O; every count-only read-back in
    * the commit funnel goes through here (the min/max-bound sites
    * still run the one grouped [[allFileStats]] job — footer string
    * stats may be truncated, bounds must be exact). Files with zero
    * rows are OMITTED, mirroring the grouped-aggregation shape. */
  private def footerRowCounts(spark: SparkSession,
                              paths: Seq[String]): Map[String, Long] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    paths.flatMap { p =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(p), conf))
      val n = try r.getRecordCount finally r.close()
      if (n > 0) Some(canonPath(p) -> n) else None
    }.toMap
  }

  /** Per-file (record count, bound bytes) — FOOTER-FIRST: the staged
    * parquet was just written by this driver, so its footers hold the
    * exact column-chunk statistics the grouped aggregation would
    * recompute by re-scanning the data. Reading them is local metadata
    * I/O and zero Spark jobs — one fewer job (and its driver-side
    * plan/schedule gap) per commit, across every append / MoR delete /
    * update / merge / compact in the engine (guide §1.2: remove
    * passes). Falls back to the one grouped aggregation job whenever
    * any footer stat is not PROVABLY identical to what the job would
    * compute ([[footerFileStats]] documents the exactness rules). */
  private def allFileStats(spark: SparkSession, paths: Seq[String],
      idsByName: Map[String, Int]): Map[String, (Long, Map[Int, (Array[Byte], Array[Byte])])] =
    (if (disableFooterStats) None else footerFileStats(spark, paths, idsByName)) match {
      case Some(st) => footerStatsHits += 1; st
      case None =>
        if (!disableFooterStats) footerStatsMisses += 1
        allFileStatsJob(spark, paths, idsByName)
    }

  /** [[allFileStats]] from the parquet footers alone, or None when any
    * column chunk lacks stats this path can prove exact:
    *   - INT32 / INT64 / FLOAT / DOUBLE / DATE / TIMESTAMP(micros)
    *     chunk stats are the exact min/max parquet-mr computed while
    *     this driver wrote the rows (same values the Spark min/max
    *     aggregation would return — for floats both sides order by
    *     `Double.compare`); INT96 timestamps have no usable stats and
    *     fall back.
    *   - BINARY(STRING) bounds are exact for ANY content: Spark's
    *     min/max orders by UTF8String.compareTo, which under the
    *     default UTF8_BINARY collation is unsigned byte order over the
    *     UTF-8 encoding — exactly parquet's BinaryStatistics
    *     comparator, so both sides pick the same winner byte for byte
    *     (spec-pinned with a fixture where UTF-16 and UTF-8 orders
    *     disagree). The [[IcebergFormat.serializeBound]] 32-byte
    *     cutoff applies after, exactly as on the job path (truncated
    *     footer stats are > 32 bytes, so a kept bound is always the
    *     exact full value).
    *   - all-null chunks contribute no bound (the job's min = null);
    *     zero-row files are omitted (the grouped-agg shape).
    * Any other shape — missing stats, non-ASCII strings, NaN bounds,
    * unexpected physical/logical type — returns None and the job runs. */
  private def footerFileStats(spark: SparkSession, paths: Seq[String],
      idsByName: Map[String, Int])
      : Option[Map[String, (Long, Map[Int, (Array[Byte], Array[Byte])])]] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import java.nio.{ByteBuffer, ByteOrder}
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    def le(n: Int): ByteBuffer = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    // footer reads are independent I/O — overlap them on a bounded
    // pool (a 120-tuple partitioned commit stages 120 files)
    val perFile = graft.pipeline.Par.map(paths) { p =>
      footerStatsOfFile(p, conf, idsByName, le)
    }
    if (perFile.contains(None)) None
    else Some(perFile.flatten.flatten.toMap)
  }

  /** One file's footer stats: Some(None) = zero-row file (omitted),
    * Some(Some(path -> stats)) = usable, None = fall back. */
  private def footerStatsOfFile(p: String,
      conf: org.apache.hadoop.conf.Configuration,
      idsByName: Map[String, Int],
      le: Int => java.nio.ByteBuffer)
      : Option[Option[(String, (Long, Map[Int, (Array[Byte], Array[Byte])]))]] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import scala.jdk.CollectionConverters._
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(p), conf))
    try {
        val footer = reader.getFooter
        val md = footer.getFileMetaData
        val blocks = footer.getBlocks.asScala.toSeq
        val nRows = blocks.map(_.getRowCount).sum
        if (nRows == 0) Some(None)
        else {
          val schema = md.getSchema
          // Classify every top-level primitive column in the current
          // schema against [[allFileStatsJob]]'s DataType whitelist —
          // the footer path must be BYTE-IDENTICAL to the job:
          //   BOUND — annotation maps to a whitelisted Spark type whose
          //     footer stats are provably the job's answer (plain/
          //     signed-32 int and date INT32; plain/signed-64 int and
          //     MICROS-timestamp INT64; FLOAT/DOUBLE; string BINARY);
          //   SKIP — the job itself never bounds the Spark type this
          //     annotation decodes to (DecimalType on INT32/INT64,
          //     int8/int16 → Byte/Short, uint64 → Decimal(20,0),
          //     TIME, plain BINARY, nested/other physical types) — the
          //     footer path must also emit no bound, NOT fall back;
          //   FALLBACK — the job WOULD bound the decoded Spark type but
          //     footer bytes are not provably its answer (INT96 and
          //     non-MICROS INT64 timestamps → TimestampType; unsigned
          //     ≤32-bit ints → Integer/LongType read widened). Any
          //     annotation not classified lands here: falling back is
          //     always correct, just slower.
          sealed trait Cls
          object Bound extends Cls; object Skip extends Cls; object Fallback extends Cls
          def classify(f: org.apache.parquet.schema.PrimitiveType): Cls = {
            import LogicalTypeAnnotation._
            (f.getPrimitiveTypeName, f.getLogicalTypeAnnotation) match {
              case (INT32, null) => Bound
              case (INT32, i: IntLogicalTypeAnnotation) =>
                if (!i.isSigned) Fallback            // uint8/16/32 read widened
                else if (i.getBitWidth == 32) Bound
                else Skip                            // int8/16 → Byte/Short
              case (INT32, _: DateLogicalTypeAnnotation) => Bound
              case (INT32, _: DecimalLogicalTypeAnnotation) => Skip
              case (INT64, null) => Bound
              case (INT64, i: IntLogicalTypeAnnotation) =>
                if (i.isSigned) Bound else Skip      // uint64 → Decimal(20,0)
              case (INT64, ts: TimestampLogicalTypeAnnotation) =>
                if (ts.getUnit == TimeUnit.MICROS) Bound else Fallback
              case (INT64, _: DecimalLogicalTypeAnnotation) => Skip
              case (FLOAT, _) | (DOUBLE, _) => Bound
              case (BINARY, _: StringLogicalTypeAnnotation) => Bound
              case (BINARY, null) => Skip            // BinaryType: job skips
              case (BINARY, _) => Fallback           // ENUM/JSON → StringType
              case (INT96, _) => Fallback            // no usable stats
              case ((INT32 | INT64), _) => Fallback  // TIME, unknown: be safe
              case _ => Skip                         // FIXED_LEN_BYTE_ARRAY etc.
            }
          }
          val classified = schema.getFields.asScala.filter(_.isPrimitive)
            .map(_.asPrimitiveType())
            .filter(f => idsByName.contains(f.getName))
            .map(f => f -> classify(f)).toSeq
          if (classified.exists(_._2 == Fallback)) return None
          val statCols = classified.collect { case (f, Bound) => f }
          val bounds = scala.collection.mutable.Map.empty[Int, (Array[Byte], Array[Byte])]
          for (c <- statCols) {
            val colPath = org.apache.parquet.hadoop.metadata.ColumnPath.get(c.getName)
            val chunks = blocks.flatMap(_.getColumns.asScala.find(_.getPath == colPath))
            if (chunks.size != blocks.size) return None
            var merged: org.apache.parquet.column.statistics.Statistics[_] = null
            for (ch <- chunks) {
              val st = ch.getStatistics
              if (st == null || (st.isEmpty && ch.getValueCount > 0)) return None
              if (st.hasNonNullValue) {
                if (merged == null)
                  merged = org.apache.parquet.column.statistics.Statistics
                    .getBuilderForReading(c).build()
                    .asInstanceOf[org.apache.parquet.column.statistics.Statistics[_]]
                merged.mergeStatistics(st)
              } else if (!st.isNumNullsSet || st.getNumNulls != ch.getValueCount) {
                // neither a recorded all-null chunk nor usable bounds
                return None
              }
            }
            if (merged != null && merged.hasNonNullValue) {
              val lohi: Option[(Array[Byte], Array[Byte])] =
                (c.getPrimitiveTypeName, merged) match {
                  case (INT32, s: org.apache.parquet.column.statistics.IntStatistics) =>
                    Some((le(4).putInt(s.getMin).array(), le(4).putInt(s.getMax).array()))
                  case (INT64, s: org.apache.parquet.column.statistics.LongStatistics) =>
                    Some((le(8).putLong(s.getMin).array(), le(8).putLong(s.getMax).array()))
                  case (FLOAT, s: org.apache.parquet.column.statistics.FloatStatistics) =>
                    if (s.getMin.isNaN || s.getMax.isNaN) return None
                    else Some((le(4).putFloat(s.getMin).array(), le(4).putFloat(s.getMax).array()))
                  case (DOUBLE, s: org.apache.parquet.column.statistics.DoubleStatistics) =>
                    if (s.getMin.isNaN || s.getMax.isNaN) return None
                    else Some((le(8).putDouble(s.getMin).array(), le(8).putDouble(s.getMax).array()))
                  case (BINARY, s: org.apache.parquet.column.statistics.BinaryStatistics) =>
                    val (lo, hi) = (s.getMin.getBytes, s.getMax.getBytes)
                    // the job path's serializeBound drops > 32-byte
                    // string bounds (whatever their content — a
                    // truncated footer stat is always > 32 bytes, so
                    // it can only land here, never in a kept bound);
                    // mirror it so manifests are byte-identical.
                    // ANY UTF-8 content is exact, not just ASCII: the
                    // job's min/max orders by UTF8String.compareTo —
                    // under the default UTF8_BINARY collation that is
                    // unsigned byte order over the UTF-8 encoding,
                    // which is EXACTLY parquet's BinaryStatistics
                    // comparator, so both sides pick the same winner
                    // byte for byte (IcebergFooterStatsSpec pins this
                    // with a fixture where UTF-16 and UTF-8 orders
                    // disagree — a supplementary-plane code point vs
                    // U+FF61 — so a collation regression would fail
                    // the byte-identity assertion, not silently skew
                    // manifests).
                    if (lo.length > 32 || hi.length > 32) None
                    else Some((lo, hi))
                  case _ => return None
                }
              lohi.foreach(b => bounds(idsByName(c.getName)) = b)
            }
          }
          Some(Some(canonPath(p) -> ((nRows, bounds.toMap))))
        }
    } finally reader.close()
  }

  /** Per-file (record count, bound bytes) in ONE grouped aggregation
    * keyed by `_metadata.file_path` — never a job per file. The
    * fallback half of [[allFileStats]]. */
  private def allFileStatsJob(spark: SparkSession, paths: Seq[String],
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
    * reader's field-id resolution; the next append must carry it.
    *
    * `default` (v3 "Default values"): stamps the value as BOTH
    * `initial-default` (rows written before the add read it instead
    * of null) and `write-default` (writes may omit the column), in
    * the spec's JSON single-value serialization; implies
    * format-version 3. */
  def addColumn(spark: SparkSession, dir: String, name: String,
                dataType: DataType, default: Option[Any] = None): Long =
    evolveSchema(spark, dir, s"ADD COLUMN $name",
        minFormatVersion = if (default.isDefined) 3 else 0,
        // survive snapshot expiry: when a live file's ADDING snapshot
        // is no longer in metadata, initial-default applicability
        // falls back to "data sequence ≤ the sequence at add time"
        stampAddedSeqForNewFields = default.isDefined) { (fields, lastId) =>
      import scala.jdk.CollectionConverters._
      require(!fields.asScala.exists(_.path("name").asText == name),
        s"column $name already exists at $dir")
      val fn = M.createObjectNode()
      fn.put("id", lastId + 1); fn.put("name", name)
      fn.put("required", false)
      fn.put("type", IcebergFormat.icebergType(dataType))
      default.foreach { v =>
        val jn = defaultJsonNode(dataType, v)
        fn.set[JsonNode]("initial-default", jn)
        fn.set[JsonNode]("write-default", jn)
      }
      (fields.asScala.toSeq :+ (fn: JsonNode), lastId + 1)
    }

  /** The spec's JSON single-value serialization of a default value,
    * typed by the column. Unsupported (type, value) pairs refuse by
    * name — a misdeclared default would poison every future read. */
  private def defaultJsonNode(dt: DataType, v: Any): JsonNode = (dt, v) match {
    case (BooleanType, b: Boolean) => M.getNodeFactory.booleanNode(b)
    case (IntegerType, i: Int) => M.getNodeFactory.numberNode(i)
    case (LongType, l: Long) => M.getNodeFactory.numberNode(l)
    case (FloatType, f: Float) => M.getNodeFactory.numberNode(f)
    case (DoubleType, d: Double) => M.getNodeFactory.numberNode(d)
    case (StringType, s: String) => M.getNodeFactory.textNode(s)
    case (DateType, d: java.sql.Date) => M.getNodeFactory.textNode(d.toString)
    case (DateType, d: java.time.LocalDate) =>
      M.getNodeFactory.textNode(d.toString)
    case (_: DecimalType, d: java.math.BigDecimal) =>
      M.getNodeFactory.textNode(d.toPlainString)
    case (t, other) => throw new IllegalArgumentException(
      s"default value $other is not supported for Iceberg type $t")
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
  private def evolveSchema(spark: SparkSession, dir: String, what: String,
      minFormatVersion: Int = 0,
      // stamp `graft.field-added-seq.<fid>` = the table's current
      // last-sequence-number for every NEW field id this evolution
      // assigns — the expiry-safe fallback for initial-default
      // applicability (files whose data sequence ≤ it predate the add)
      stampAddedSeqForNewFields: Boolean = false)(
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
      if (minFormatVersion > n.path("format-version").asInt(2))
        n.put("format-version", minFormatVersion) // one-way upgrade
      if (stampAddedSeqForNewFields && newLastId > lastId) {
        val props =
          if (n.path("properties").isObject)
            n.path("properties").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          else n.putObject("properties")
        val seqNow = m.path("last-sequence-number").asLong(0L)
        (lastId + 1 to newLastId).foreach(fid =>
          props.put(s"graft.field-added-seq.$fid", seqNow.toString))
      }
      val prevUpdated = m.path("last-updated-ms").asLong(System.currentTimeMillis())
      n.put("last-updated-ms", System.currentTimeMillis())
      // metadata-log: record the version this evolution supersedes
      val ml = n.withArray[com.fasterxml.jackson.databind.node.ArrayNode](
        "metadata-log").addObject()
      ml.put("timestamp-ms", prevUpdated)
      ml.put("metadata-file",
        new Path(root, s"metadata/v$base.metadata.json").toString)
      val target = new Path(root, s"metadata/v${base + 1}.metadata.json")
      val tmp = new Path(root,
        s"metadata/.tmp-v${base + 1}-${java.util.UUID.randomUUID().toString.take(8)}.json")
      val out = f.create(tmp, false)
      try out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(n))
      finally out.close()
      if (putIfAbsent(f, tmp, target)) {
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

  /** Whether `dir` holds a committed graft/foreign Iceberg table
    * (any metadata version present). */
  def tableExists(spark: SparkSession, dir: String): Boolean = {
    val root = new Path(dir)
    val f = fs(spark, dir)
    f.exists(new Path(root, "metadata")) && currentVersion(f, root) > 0
  }

  /** Append `df` as a new snapshot (creating the table on first call).
    * Returns the committed snapshot id. */
  def append(df: DataFrame, dir: String): Long =
    write(df, dir, replace = false)

  /** [[append]] CREATING a v3 ROW-LINEAGE table (iceberg.apache.org/
    * spec/ "Row Lineage"): table metadata carries the `next-row-id`
    * watermark, every data file's manifest entry gets a `first_row_id`
    * range, and a row's stable `_row_id` is first_row_id + its
    * position ([[IcebergInterop.readIceberg]] `withLineage = true`).
    * Lineage-ness lives in the TABLE metadata, not the call — once on,
    * every later append / MoR update / merge / compaction maintains
    * the watermark and materializes `_row_id` (and
    * `_last_updated_sequence_number`) whenever a rewrite moves rows,
    * so ids survive compaction and updates keep their identity.
    * On an existing table use [[enableRowLineage]] instead. */
  def appendLineage(df: DataFrame, dir: String): Long =
    write(df, dir, replace = false, lineage = true)

  /** Replace the table's contents with `df` in one new snapshot
    * (`operation=overwrite`); prior snapshots stay time-travelable.
    * Refuses on a concurrent commit (no rebase across an overwrite). */
  def overwrite(df: DataFrame, dir: String): Long =
    write(df, dir, replace = true)

  /** Append `df` as a new snapshot PARTITIONED on
    * `transform(partCol)` — identity (default) or a HIDDEN transform:
    * `year|month|day|hour` over date/timestamp columns, `bucket[N]`
    * (the spec's murmur3, computed by the codegen
    * [[graft.functions.expressions.IcebergPartitionValue]] at
    * staging), `truncate[W]` — one manifest per partition VALUE, each
    * manifest-list entry carrying the spec's field_summary over the
    * TRANSFORMED values, creating the table on first call. The
    * manifest-level skipping [[IcebergInterop]] does for foreign
    * hidden-partitioned tables works identically on tables graft
    * writes (write and read share [[IcebergTransforms]], so the
    * bucket/temporal math agrees structurally): a point read of a
    * bucket table opens exactly one bucket's manifests. NULL source
    * values land in a contains_null manifest with no bounds.
    * Write shape: ONE hive-partitioned staging job + ONE grouped stats
    * job regardless of the partition-value count; the source column
    * stays a REAL column in the data files (a throwaway transformed
    * column drives the directory split), so reads need no
    * partition-tuple reconstruction — hidden partitioning exactly as
    * the spec intends. */
  def appendPartitioned(df: DataFrame, dir: String, partCol: String,
                        transform: String = "identity"): Long =
    appendPartitioned(df, dir, Seq((partCol, transform)), txn = None,
      clusterBySpec = false)

  def appendPartitioned(df: DataFrame, dir: String,
                        parts: Seq[(String, String)]): Long =
    appendPartitioned(df, dir, parts, txn = None, clusterBySpec = false)

  /** MULTI-FIELD partitioned append — the standard event-table layout
    * `(day(ts), bucket(id))` and any other ordered combination of the
    * supported transforms: one manifest per partition-value TUPLE,
    * each manifest-list entry carrying one field summary PER spec
    * field (in spec order), so two-dimensional manifest skipping
    * (temporal range × bucket point) works exactly as the read side
    * already does for foreign multi-field tables. NULL source values
    * land in contains_null summaries with no bounds. Still ONE
    * hive-partitioned staging job + ONE grouped stats job regardless
    * of the partition-value count. */
  def appendPartitioned(df: DataFrame, dir: String,
                        parts: Seq[(String, String)],
                        // (appId, txnVersion): the [[appendOnce]]
                        // exactly-once ledger on the partitioned path —
                        // a replayed batch is recognized and writes
                        // nothing (the streaming dedup state sink).
                        // No default: only ONE overload may carry them.
                        txn: Option[(String, Long)],
                        // co-locate each partition tuple into one task
                        // before staging (small-batch state appends)
                        clusterBySpec: Boolean): Long = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val root = new Path(dir)
    f.mkdirs(new Path(root, "metadata")); f.mkdirs(new Path(root, "data"))
    txn.foreach { case (appId, tv) =>
      if (committedTxn(spark, f, root, appId) >= tv)
        return readMeta(f, root, currentVersion(f, root))
          .map(_.path("current-snapshot-id").asLong(-1L)).getOrElse(-1L)
    }
    require(parts.nonEmpty, "at least one partition field is required")
    require(parts.map(_._1).distinct.size == parts.size,
      s"duplicate partition source column in ${parts.map(_._1).mkString(",")}")
    parts.foreach { case (c, _) =>
      require(df.columns.contains(c), s"no partition column $c") }
    val resultDts = parts.map { case (c, t) =>
      transformResultType(t, df.schema(c).dataType) }
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
    // NULL partition values stage under Spark's default-partition
    // sentinel — decoded to None (summary: contains_null=true, no
    // bounds). Directory names carry the TRANSFORMED values, typed by
    // each transform's result type.
    val filesOfValue: Seq[(Seq[Option[Any]], Seq[(Path, Long)])] =
      stagePartitioned(spark, f, root, withFieldIds(df, idsByName),
        parts, resultDts, clusterBySpec)
    val allPaths = filesOfValue.flatMap(_._2.map(_._1.toString))
    val stats =
      if (allPaths.isEmpty) Map.empty[String, (Long, Map[Int, (Array[Byte], Array[Byte])])]
      else allFileStats(spark, allPaths, idsByName)

    var attempt = 0
    var base = v0
    while (true) {
      val snapshotId = freshSnapshotId(f, root, base)
      val baseMeta = readMeta(f, root, base)
      val seqNo = baseMeta
        .map(_.path("last-sequence-number").asLong(0L)).getOrElse(0L) + 1L
      // v3 ROW LINEAGE: one running watermark across every manifest's
      // entries, re-derived per attempt from the base version
      val lin0 = nextRowIdOf(baseMeta)
      var rowIdW = lin0.getOrElse(0L)
      // entry assembly stays SEQUENTIAL (the row-id watermark assigns
      // ranges in tuple order); the per-tuple Avro manifest writes are
      // independent file I/O and overlap on a bounded pool — a
      // 120-tuple commit otherwise pays 120 serial create/write/close
      // round-trips on the driver (measured ~1.4 s of q204's commit)
      val manSpecs = filesOfValue.zipWithIndex.flatMap { case ((vals, files), i) =>
        val entries = files.flatMap { case (pp, size) =>
          stats.get(canonPath(pp.toString)).map { case (rows, bounds) =>
            val fr = lin0.map { _ => val v = rowIdW; rowIdW += rows; v }
            IcebergFormat.entry(0, pp.toString, rows, size, snapshotId, seqNo,
              bounds = bounds, firstRowId = fr)
          } // zero-record staged file: skip (deleted below)
        }
        if (entries.isEmpty) None else Some((vals, i, entries))
      }
      val mans = graft.pipeline.Par.map(manSpecs) { case (vals, i, entries) =>
        val mp = new Path(root,
          s"metadata/manifest-$snapshotId-$i-${java.util.UUID.randomUUID().toString.take(8)}.avro")
        IcebergFormat.writeAvro(f, mp, IcebergFormat.EntrySchema, entries)
        NewManifest(mp, partitioned = true,
          Some(summariesOf(vals, resultDts)), entries = entries)
      }
      filesOfValue.flatMap(_._2).foreach { case (pp, _) =>
        if (!stats.contains(canonPath(pp.toString))) f.delete(pp, false)
      }
      try {
        onBeforeCommit()
        return commitMeta(spark, f, root, base, df.schema, snapshotId, seqNo,
          mans, replace = false, txn = txn,
          partSpec = Some(SpecReq(parts.map { case (c, t) =>
            (specFieldName(c, t), idsByName(c), t) })),
          nextRowId = lin0.map(_ => rowIdW))
      } catch {
        case _: java.util.ConcurrentModificationException =>
          mans.foreach(nm => f.delete(nm.path, false))
          // a DUPLICATE same-batch writer may have won the race: if the
          // ledger now covers this txn, drop our staged files and defer
          txn.foreach { case (appId, tv) =>
            if (committedTxn(spark, f, root, appId) >= tv) {
              filesOfValue.flatMap(_._2).foreach { case (pp, _) =>
                f.delete(pp, false) }
              return readMeta(f, root, currentVersion(f, root))
                .map(_.path("current-snapshot-id").asLong(-1L)).getOrElse(-1L)
            }
          }
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
      .map(headIdOf).getOrElse(-1L)
    val hits = IcebergInterop.readIceberg(spark, dir,
        snapshotId = readSnapAt(f, root), ranges = ranges,
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
    // per-file row counts from the footers (no job); zero-record files drop
    val counts: Map[String, Long] =
      footerRowCounts(spark, staged.map(_._1.toString))
    val (delFiles, empties) =
      staged.partition(p => counts.contains(canonPath(p._1.toString)))
    empties.foreach { case (p, _) => f.delete(p, false) }
    if (delFiles.isEmpty) return (currentSnap(), 0L)
    val deleted = counts.values.sum
    // the data files these position deletes reference (file-count
    // bounded) — rebase validation needs them if a race hits
    lazy val referenced: Set[String] = {
      import org.apache.spark.sql.functions.col
      spark.read.parquet(delFiles.map(_._1.toString): _*)
        .select(col("file_path")).distinct()
        .collect().map(r => canonPath(r.getString(0))).toSet
    }

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
          seqNo, Seq(NewManifest(mp, partitioned = false, None, content = 1,
            entries = entries)),
          replace = false, operation = Some("delete")), deleted)
      } catch {
        case _: java.util.ConcurrentModificationException =>
          f.delete(mp, false)
          attempt += 1
          require(attempt < MaxCommitRetries,
            s"delete on $dir lost $MaxCommitRetries version races")
          base = currentVersion(f, root)
          // validateDataFilesExist: the position-delete files were
          // computed against the PRE-race snapshot — rebasing is only
          // sound if every data file they reference is still live in
          // the new head. A concurrent overwrite/compaction replaced
          // them ⇒ the delete would mask nothing while reporting
          // rowsDeleted>0 (a silently lost delete) — fail loudly
          // instead, like overwrite does.
          val live = IcebergInterop.liveDataPaths(spark, dir,
            readSnapAt(f, root)).toSet
          val gone = referenced.filterNot(live)
          if (gone.nonEmpty) {
            delFiles.foreach { case (p, _) => f.delete(p, false) }
            throw new IllegalStateException(
              s"delete on $dir raced a concurrent commit that replaced " +
              s"${gone.size} referenced data file(s) (e.g. ${gone.head}) — " +
              "the staged position deletes no longer apply; re-run the " +
              "delete against the new snapshot")
          }
      }
    }
    (-1L, -1L) // unreachable
  }

  /** MERGE-ON-READ UPDATE for native Iceberg tables: rows where
    * `predicate` is TRUE are masked by position deletes and their
    * POSTIMAGES (with `set` assignments applied) append — both in ONE
    * atomic snapshot, so no reader ever sees the row absent or
    * doubled. No untouched data file rewrites: work is O(updated
    * rows), the [[DeltaInterop.updateWhereDV]] contract on the Iceberg
    * plane. `ranges` prunes the candidate scan through manifest
    * bounds. Returns (snapshotId, rowsUpdated). */
  def updateWhere(spark: SparkSession, dir: String,
                  predicate: org.apache.spark.sql.Column,
                  set: Map[String, org.apache.spark.sql.Column],
                  ranges: Map[String, (Double, Double)] = Map.empty): (Long, Long) =
    updateImpl(spark, dir, predicate, set, ranges, asDv = false)

  /** [[updateWhere]] masking the preimages with v3 DELETION VECTORS
    * instead of parquet position deletes — Puffin bitmap + postimage
    * append in ONE snapshot, format-version upgraded to 3. The update
    * path for a v3-first warehouse ([[deleteWhereDV]]'s twin, and
    * [[DeltaInterop.updateWhereDV]]'s contract on this plane). */
  def updateWhereDV(spark: SparkSession, dir: String,
                    predicate: org.apache.spark.sql.Column,
                    set: Map[String, org.apache.spark.sql.Column],
                    ranges: Map[String, (Double, Double)] = Map.empty): (Long, Long) =
    updateImpl(spark, dir, predicate, set, ranges, asDv = true)

  private def updateImpl(spark: SparkSession, dir: String,
                         predicate: org.apache.spark.sql.Column,
                         set: Map[String, org.apache.spark.sql.Column],
                         ranges: Map[String, (Double, Double)],
                         asDv: Boolean): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    val f = fs(spark, dir)
    val root = new Path(dir)
    val v0 = currentVersion(f, root)
    require(v0 > 0, s"$dir has no snapshots to update")
    val m0 = readMeta(f, root, v0).get
    val idsByName = currentFieldIds(m0).toMap
    val schemaNames = currentFieldIds(m0).map(_._1)
    set.keys.foreach(k => require(idsByName.contains(k),
      s"UPDATE assigns unknown column $k (table has ${schemaNames.mkString(",")})"))
    // lineage tables read their hits WITH `_row_id` so postimages
    // materialize it — an updated row keeps its identity, while its
    // `_last_updated_sequence_number` inherits the new file's sequence
    // (exactly "updated at this commit")
    val lineageOn = nextRowIdOf(Some(m0)).isDefined
    val hits = IcebergInterop.readIceberg(spark, dir,
        snapshotId = readSnapAt(f, root), ranges = ranges,
        withProvenance = true, withLineage = lineageOn)
      .filter(predicate)
      .localCheckpoint(false) // two consumers below — pin one scan
    val post0 = set.foldLeft(hits) { case (d, (k, v)) => d.withColumn(k, v) }
    val postimage = post0.select(schemaNames.map(c =>
      col(c).cast(hits.schema(c).dataType).as(c)) ++
      (if (lineageOn) Seq(col(IcebergFormat.RowIdCol)) else Nil): _*)
    val (snap, deleted, _) = commitRowDelta(spark, dir,
      positionsOf(hits), Some(postimage), "overwrite",
      what = "update", asDv = asDv)
    (snap, deleted)
  }

  /** MERGE-ON-READ MERGE for native Iceberg tables — delta-spark's
    * clause surface ([[DeltaInterop.MatchedClause]]: ordered `WHEN
    * MATCHED [AND cond] THEN UPDATE SET ...|DELETE`, first firing
    * clause wins; optional `WHEN NOT MATCHED [AND cond] THEN INSERT`
    * with assignments, empty map = INSERT *). Clause-fired target rows
    * position-delete in place, postimages and inserts append — ONE
    * atomic snapshot, zero data-file rewrites. The probe scan prunes
    * through manifest bounds by the source's key min/max (a 100 TB
    * table pays for files overlapping the merge's key range).
    * Returns (snapshotId, rowsDeletedOrUpdated, rowsInserted). */
  def mergeInto(spark: SparkSession, dir: String,
                source: DataFrame, keyCols: Seq[String],
                matched: Seq[DeltaInterop.MatchedClause],
                notMatched: Option[(Option[org.apache.spark.sql.Column],
                  Map[String, org.apache.spark.sql.Column])],
                // `WHEN NOT MATCHED BY SOURCE` clauses: target rows with
                // no source match — conditions/assignments reference
                // TARGET columns only (source columns are definitionally
                // absent). Scanned UNPRUNED: a by-source row is exactly
                // one that may lie outside the source's key range.
                notMatchedBySource: Seq[DeltaInterop.MatchedClause] = Nil,
                // exactly-once ledger: a (appId, txn) the summary
                // ledger already covers REPLAYS AS A NO-OP — the
                // streaming upsert sink's crash-window contract
                txn: Option[(String, Long)] = None,
                // caller vouches the source has unique keys (e.g. the
                // upsert sink's row_number arbitration) — skips the
                // per-merge duplicate-verification job on hot paths
                sourceDistinctKeys: Boolean = false)
      : (Long, Long, Long) = {
    import org.apache.spark.sql.functions._
    val f = fs(spark, dir)
    val root = new Path(dir)
    val v0 = currentVersion(f, root)
    require(v0 > 0, s"$dir has no snapshots to merge into")
    txn.foreach { case (appId, tv) =>
      if (committedTxn(spark, f, root, appId) >= tv)
        return (readMeta(f, root, currentVersion(f, root))
          .map(_.path("current-snapshot-id").asLong(-1L)).getOrElse(-1L), 0L, 0L)
    }
    val m0 = readMeta(f, root, v0).get
    val fieldIds = currentFieldIds(m0)
    val schemaNames = fieldIds.map(_._1)
    require(keyCols.nonEmpty && keyCols.forall(schemaNames.contains),
      s"unknown key column(s) ${keyCols.filterNot(schemaNames.contains).mkString(",")}")
    require(keyCols.forall(source.columns.contains),
      "merge source must carry every key column")
    val srcAligned = source.localCheckpoint(false)
    if (!sourceDistinctKeys) {
      val dup = srcAligned.groupBy(keyCols.map(col): _*).count()
        .filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"merge source has duplicate keys (e.g. ${dup.headOption.mkString})")
    }

    // stats-pruned probe: a single numeric non-null key maps the
    // source's min/max into a manifest/file bound range
    val ranges: Map[String, (Double, Double)] = keyCols match {
      case Seq(k) if srcAligned.schema(k).dataType.isInstanceOf[
          org.apache.spark.sql.types.NumericType] =>
        val mm = srcAligned.agg(min(col(k)), max(col(k)),
          sum(when(col(k).isNull, 1L).otherwise(0L))).head()
        if (mm.isNullAt(0) || mm.getLong(2) > 0L) Map.empty
        else Map(k -> ((mm.get(0).asInstanceOf[Number].doubleValue,
          mm.get(1).asInstanceOf[Number].doubleValue)))
      case _ => Map.empty
    }
    // lineage tables carry `_row_id` through the merge: clause-fired
    // postimages keep their target row's id, inserted rows land with a
    // NULL materialized id and derive fresh ids from their file's
    // first_row_id range
    val lineageOn = nextRowIdOf(Some(m0)).isDefined
    val linSel: Seq[org.apache.spark.sql.Column] =
      if (lineageOn) Seq(col(s"t.${IcebergFormat.RowIdCol}")
        .as(IcebergFormat.RowIdCol)) else Nil
    val linNames = if (lineageOn) Seq(IcebergFormat.RowIdCol) else Nil
    val t = IcebergInterop.readIceberg(spark, dir,
      snapshotId = readSnapAt(f, root), ranges = ranges,
      withProvenance = true, withLineage = lineageOn)
    val typed = StructType(schemaNames.map(nm =>
      StructField(nm, t.schema(nm).dataType)))
    val keyEq = keyCols.map(c => col(s"t.$c") <=> col(s"s.$c")).reduce(_ && _)
    // first firing clause wins (delta-spark's arbitration): -1 = no
    // clause claimed the row, it stays untouched. Everything that
    // references the t./s. qualifiers resolves in THIS projection —
    // the checkpoint below flattens qualifiers away.
    val firedCol = matched.zipWithIndex.foldRight(lit(-1)) {
      case ((cl, i), acc) =>
        when(cl.condition.getOrElse(lit(true)), lit(i)).otherwise(acc)
    }
    val postCols = typed.fields.map { fd =>
      matched.zipWithIndex.foldRight(col(s"t.${fd.name}")) {
        case ((cl, i), acc) =>
          if (cl.delete || !cl.set.contains(fd.name)) acc
          else when(col("_fired") === i, cl.set(fd.name)).otherwise(acc)
      }.cast(fd.dataType).as(fd.name)
    }.toSeq
    val hits = t.as("t").join(srcAligned.as("s"), keyEq, "inner")
      .withColumn("_fired", firedCol)
      .filter(col("_fired") >= 0)
      .select(col("t._graft_file").as("_graft_file") +:
        col("t._graft_pos").as("_graft_pos") +: col("_fired") +:
        (postCols ++ linSel): _*)
      .localCheckpoint(false) // positions + postimages read it below
    val updateIdx = matched.zipWithIndex.collect {
      case (cl, i) if !cl.delete => i
    }
    val postimage =
      if (updateIdx.isEmpty) None
      else Some(hits.filter(col("_fired").isin(updateIdx: _*))
        .select((schemaNames ++ linNames).map(col): _*))
    val inserts = notMatched.map { case (cond, assign) =>
      val unmatched0 = srcAligned.as("s").join(t.as("t"), keyEq, "left_anti")
      val unmatched = cond.map(unmatched0.filter).getOrElse(unmatched0)
      unmatched.select(typed.fields.map { fd =>
        (if (assign.nonEmpty) assign.getOrElse(fd.name, lit(null))
         else if (srcAligned.columns.contains(fd.name)) col(s"s.${fd.name}")
         else lit(null)).cast(fd.dataType).as(fd.name)
      }.toSeq ++ linNames.map(c => lit(null).cast("long").as(c)): _*)
    }
    // by-source rows come from an UNPRUNED scan — they are exactly the
    // rows a source-key range prune would drop
    val bsHits = if (notMatchedBySource.isEmpty) None else {
      val tFull =
        if (ranges.isEmpty) t
        else IcebergInterop.readIceberg(spark, dir,
          snapshotId = readSnapAt(f, root), withProvenance = true,
          withLineage = lineageOn)
      val firedB = notMatchedBySource.zipWithIndex.foldRight(lit(-1)) {
        case ((cl, i), acc) =>
          when(cl.condition.getOrElse(lit(true)), lit(i)).otherwise(acc)
      }
      val postColsB = typed.fields.map { fd =>
        notMatchedBySource.zipWithIndex.foldRight(col(s"t.${fd.name}")) {
          case ((cl, i), acc) =>
            if (cl.delete || !cl.set.contains(fd.name)) acc
            else when(col("_fired") === i, cl.set(fd.name)).otherwise(acc)
        }.cast(fd.dataType).as(fd.name)
      }.toSeq
      Some(tFull.as("t").join(srcAligned.as("s"), keyEq, "left_anti")
        .withColumn("_fired", firedB)
        .filter(col("_fired") >= 0)
        .select(col("t._graft_file").as("_graft_file") +:
          col("t._graft_pos").as("_graft_pos") +: col("_fired") +:
          (postColsB ++ linSel): _*)
        .localCheckpoint(false))
    }
    val bsUpdateIdx = notMatchedBySource.zipWithIndex.collect {
      case (cl, i) if !cl.delete => i
    }
    val bsPostimage = bsHits.filter(_ => bsUpdateIdx.nonEmpty).map(
      _.filter(col("_fired").isin(bsUpdateIdx: _*))
        .select((schemaNames ++ linNames).map(col): _*))
    val positions = bsHits.map(b => positionsOf(hits).unionByName(positionsOf(b)))
      .getOrElse(positionsOf(hits))
    val appendRows = (postimage.toSeq ++ bsPostimage.toSeq ++ inserts) match {
      case Nil => None
      case xs => Some(xs.reduce(_ unionByName _))
    }
    val (snap, deleted, inserted0) = commitRowDelta(spark, dir,
      positions, appendRows, "overwrite", what = "merge", txn = txn)
    // inserted = appended − postimages (postimages replace masked rows)
    val nPost = (if (updateIdx.isEmpty) 0L
      else hits.filter(col("_fired").isin(updateIdx: _*)).count()) +
      bsPostimage.map(_.count()).getOrElse(0L)
    (snap, deleted, inserted0 - nPost)
  }

  /** The spec-shaped position-delete projection of a provenance scan:
    * (`file_path`, `pos`) with the reserved field ids stamped. */
  private def positionsOf(hits: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    hits.select(
      col("_graft_file").as("file_path", new MetadataBuilder()
        .putLong("parquet.field.id", 2147483546L).build()),
      col("_graft_pos").cast(LongType).as("pos", new MetadataBuilder()
        .putLong("parquet.field.id", 2147483545L).build()))
  }

  /** Shared ROW-DELTA commit: stage position deletes (spec parquet, or
    * v3 Puffin DELETION VECTORS when `asDv` — one blob per touched
    * file, format-version upgraded to 3) + optional append rows, then
    * commit both as ONE snapshot (a content=1 delete manifest plus a
    * data manifest). Rebases version races only after validating the
    * referenced data files are still live in the new head
    * (validateDataFilesExist) — a concurrent overwrite/compaction
    * fails the delta loudly instead of masking nothing. Returns
    * (snapshotId, rowsDeleted, rowsAppended); commits NOTHING when the
    * delta is empty. */
  private def commitRowDelta(spark: SparkSession, dir: String,
                             positions: DataFrame, appendDf: Option[DataFrame],
                             operation: String, what: String,
                             asDv: Boolean = false,
                             // exactly-once ledger stamp ((appId, txn)
                             // in the snapshot summary) — the
                             // [[appendOnce]] contract for row deltas
                             txn: Option[(String, Long)] = None)
      : (Long, Long, Long) = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val f = fs(spark, dir)
    val root = new Path(dir)
    val v0 = currentVersion(f, root)
    val m0 = readMeta(f, root, v0).get
    val idsByName = currentFieldIds(m0).toMap
    def currentSnap(): Long = readMeta(f, root, currentVersion(f, root))
      .map(headIdOf).getOrElse(-1L)
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")

    def stage(df: DataFrame, prefix: String): Seq[(Path, Long)] = {
      val staging = new Path(root,
        s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
      df.write.parquet(staging.toString)
      val out = f.listStatus(staging).filter(_.getPath.getName.endsWith(".parquet"))
        .map { st =>
          val dst = new Path(root, s"data/$prefix${java.util.UUID.randomUUID()}.parquet")
          require(f.rename(st.getPath, dst), s"rename ${st.getPath} failed")
          (dst, f.getFileStatus(dst).getLen)
        }.toSeq
      f.delete(staging, true)
      out
    }
    // the delete side: parquet position-delete files, or one Puffin of
    // per-file DV blobs. The distributed bitmap fold runs ONCE; the
    // puffin itself (our positions unioned with the head's live DVs)
    // REBUILDS on every rebase, so the spec's superset-replacement
    // rule holds against whatever a concurrent writer just committed —
    // a stale pre-race union would silently drop the racer's DV and
    // resurrect its deleted rows.
    val dvPerFile: Seq[(String, Array[Byte])] =
      if (!asDv) Nil
      else {
        import org.apache.spark.sql.GraftBridge.{column, expression}
        import spark.implicits._
        val bm = column(graft.functions.expressions.DvBitmapAgg(
          expression(col("pos"))).toAggregateExpression())
        positions.groupBy(col("file_path")).agg(bm.as("bm"))
          .as[(String, Array[Byte])].collect().toSeq
      }
    var dvDeleted = 0L
    // (puffin path, puffin length, per-blob (ref, off, size, cardinality))
    def buildDvSide(): Option[(Path, Long, Seq[(String, Long, Long, Long)])] =
      if (dvPerFile.isEmpty) None
      else {
        val conf = spark.sparkContext.hadoopConfiguration
        val prior = IcebergInterop.liveDvs(spark, dir, readSnapAt(f, root))
        dvDeleted = 0L
        val blobs = dvPerFile.map { case (file, bytes) =>
          prior.get(canonPath(file)) match {
            case None =>
              val card = DeletionVectors.parse(bytes).cardinality
              dvDeleted += card
              (file, bytes, card)
            case Some((puffin, off, size)) =>
              val priorBm = IcebergFormat.readPuffinDv(conf, new Path(puffin), off, size)
              val b = RoaringBitmapBuilder.fromBytes(bytes)
              b.or(priorBm)
              val (merged, card) = b.result()
              // merged − prior, not |our positions|: a racer may have
              // deleted overlapping rows since our hits scan
              dvDeleted += card - priorBm.cardinality
              (file, merged, card)
          }
        }
        val puffinP = new Path(root, s"data/dv-${java.util.UUID.randomUUID()}.puffin")
        val refs = IcebergFormat.writePuffinDvBlobs(f, puffinP, blobs)
        val cardOf = blobs.map(b => (b._1, b._3)).toMap
        Some((puffinP, f.getFileStatus(puffinP).getLen,
          refs.map { case (rf, off, size) => (rf, off, size, cardOf(rf)) }))
      }
    var dvSide = buildDvSide()
    def stageAppSide(): Seq[(Path, Long)] = appendDf.toSeq.flatMap { df =>
      // a lineage table's postimages carry the reserved `_row_id`
      // (/ `_last_updated_sequence_number`) columns MATERIALIZED so
      // updated rows keep their identity — everything else must match
      // the schema exactly
      val linCols = lineageIds(df)
      require((df.columns.toSet -- linCols.keySet) == idsByName.keySet,
        s"$what postimage columns ${df.columns.sorted.toSeq} must match " +
        s"current schema ${idsByName.keys.toSeq.sorted}")
      stage(withFieldIds(df, idsByName ++ linCols), "")
    }
    // the delete side and the append side are INDEPENDENT staging
    // writes into distinct hidden dirs (both read the checkpointed
    // hits) — overlap them on two driver threads (guide §2.6) instead
    // of paying two full job latencies back to back per merge/update
    var stagedDel: Seq[(Path, Long)] = Nil
    var stagedApp: Seq[(Path, Long)] = Nil
    if (!asDv && appendDf.isDefined)
      graft.pipeline.Par.foreach(Seq(true, false), 2) {
        case true  => stagedDel = stage(positions, "delete-")
        case false => stagedApp = stageAppSide()
      }
    else {
      stagedDel = if (asDv) Nil else stage(positions, "delete-")
      stagedApp = stageAppSide()
    }
    val delCounts: Map[String, Long] =
      footerRowCounts(spark, stagedDel.map(_._1.toString))
    val (delFiles, delEmpties) =
      stagedDel.partition(p => delCounts.contains(canonPath(p._1.toString)))
    delEmpties.foreach { case (p, _) => f.delete(p, false) }
    val appStats =
      if (stagedApp.isEmpty) Map.empty[String, (Long, Map[Int, (Array[Byte], Array[Byte])])]
      else allFileStats(spark, stagedApp.map(_._1.toString), idsByName)
    val (appFiles, appEmpties) =
      stagedApp.partition(p => appStats.contains(canonPath(p._1.toString)))
    appEmpties.foreach { case (p, _) => f.delete(p, false) }

    if (delFiles.isEmpty && dvSide.isEmpty && appFiles.isEmpty)
      return (currentSnap(), 0L, 0L)
    def deleted = delCounts.values.sum + dvDeleted // dvDeleted moves on rebase
    val appended = appStats.values.map(_._1).sum
    lazy val referenced: Set[String] =
      (if (delFiles.isEmpty) Set.empty[String]
       else spark.read.parquet(delFiles.map(_._1.toString): _*)
         .select(col("file_path")).distinct()
         .collect().map(r => canonPath(r.getString(0))).toSet) ++
      dvPerFile.map(p => canonPath(p._1))

    var attempt = 0
    var base = v0
    while (true) {
      val snapshotId = freshSnapshotId(f, root, base)
      val baseMetaA = readMeta(f, root, base)
      val seqNo = baseMetaA
        .map(_.path("last-sequence-number").asLong(0L)).getOrElse(0L) + 1L
      // v3 ROW LINEAGE: appended postimage/insert files get fresh
      // first_row_id ranges (materialized _row_id values win at read;
      // null slots — a merge's inserted rows — derive fresh ids)
      val lin0 = nextRowIdOf(baseMetaA)
      var rowIdW = lin0.getOrElse(0L)
      val mans = Seq.newBuilder[NewManifest]
      if (delFiles.nonEmpty || dvSide.isDefined) {
        val entries = delFiles.map { case (p, size) =>
          IcebergFormat.entry(1, p.toString,
            delCounts(canonPath(p.toString)), size, snapshotId, seqNo)
        } ++ dvSide.toSeq.flatMap { case (puffinP, puffinLen, refs) =>
          refs.map { case (rf, off, size, card) =>
            IcebergFormat.entry(1, puffinP.toString, card, puffinLen,
              snapshotId, seqNo, fileFormat = "PUFFIN",
              dvRef = Some((rf, off, size)))
          }
        }
        val mp = new Path(root,
          s"metadata/delete-manifest-$snapshotId-${java.util.UUID.randomUUID().toString.take(8)}.avro")
        IcebergFormat.writeAvro(f, mp, IcebergFormat.EntrySchema, entries)
        mans += NewManifest(mp, partitioned = false, None, content = 1,
          entries = entries)
      }
      if (appFiles.nonEmpty) {
        val entries = appFiles.map { case (p, size) =>
          val (rows, bounds) = appStats(canonPath(p.toString))
          val fr = lin0.map { _ => val v = rowIdW; rowIdW += rows; v }
          IcebergFormat.entry(0, p.toString, rows, size, snapshotId, seqNo,
            bounds = bounds, firstRowId = fr)
        }
        val mp = new Path(root,
          s"metadata/manifest-$snapshotId-${java.util.UUID.randomUUID().toString.take(8)}.avro")
        IcebergFormat.writeAvro(f, mp, IcebergFormat.EntrySchema, entries)
        mans += NewManifest(mp, partitioned = false, None, entries = entries)
      }
      val built = mans.result()
      try {
        onBeforeCommit()
        val snap = commitMeta(spark, f, root, base, StructType(Nil), snapshotId,
          seqNo, built, replace = false, operation = Some(operation),
          txn = txn, minFormatVersion = if (asDv) 3 else 0,
          nextRowId = lin0.map(_ => rowIdW))
        return (snap, deleted, appended)
      } catch {
        case _: java.util.ConcurrentModificationException =>
          built.foreach(nm => f.delete(nm.path, false))
          // a DUPLICATE same-batch writer may have won the race: if the
          // ledger now covers this txn, drop our staged files and defer
          txn.foreach { case (appId, tv) =>
            if (committedTxn(spark, f, root, appId) >= tv) {
              (delFiles ++ appFiles).foreach { case (p, _) => f.delete(p, false) }
              dvSide.foreach { case (p, _, _) => f.delete(p, false) }
              return (currentSnap(), 0L, 0L)
            }
          }
          attempt += 1
          require(attempt < MaxCommitRetries,
            s"$what on $dir lost $MaxCommitRetries version races")
          base = currentVersion(f, root)
          val live = IcebergInterop.liveDataPaths(spark, dir,
            readSnapAt(f, root)).toSet
          val gone = referenced.filterNot(live)
          if (gone.nonEmpty) {
            (delFiles ++ appFiles).foreach { case (p, _) => f.delete(p, false) }
            dvSide.foreach { case (p, _, _) => f.delete(p, false) }
            throw new IllegalStateException(
              s"$what on $dir raced a concurrent commit that replaced " +
              s"${gone.size} referenced data file(s) (e.g. ${gone.head}) — " +
              s"the staged position deletes no longer apply; re-run the $what " +
              "against the new snapshot")
          }
          // superset rule on rebase: the racer may have committed a DV
          // for one of our files — rebuild the union against the NEW
          // head's live DVs (the stale pre-race union would replace,
          // and so drop, the racer's deletions)
          dvSide.foreach { case (p, _, _) =>
            f.delete(p, false)
            dvSide = buildDvSide()
          }
      }
    }
    (-1L, -1L, -1L) // unreachable
  }

  /** MERGE-ON-READ DELETE via v3 DELETION VECTORS: predicate rows mask
    * as Puffin `deletion-vector-v1` blobs — the SAME portable roaring
    * bitmaps Delta DVs use — one blob per touched data file in ONE
    * Puffin file, referenced by `content_offset`/`content_size` delete
    * manifest entries, with the table's format-version upgraded to 3
    * (one-way). Positions fold DISTRIBUTED into per-file bitmaps
    * ([[graft.functions.expressions.DvBitmapAgg]] — partial buffers
    * ARE roaring bytes, the driver sees one KB-sized blob per touched
    * file, never a position). A replacement DV unions the file's
    * previous one (the spec's superset rule; the hits scan runs on the
    * masked view so the sets are disjoint by construction). Work is
    * O(deleted rows); reads apply the mask with the codegen
    * broadcast-bitmap filter — no anti-join, positions never become
    * rows. Returns (snapshotId, rowsDeleted). */
  def deleteWhereDV(spark: SparkSession, dir: String,
                    predicate: org.apache.spark.sql.Column,
                    ranges: Map[String, (Double, Double)] = Map.empty): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.GraftBridge.{column, expression}
    val f = fs(spark, dir)
    val root = new Path(dir)
    val v0 = currentVersion(f, root)
    require(v0 > 0, s"$dir has no snapshots to delete from")
    def currentSnap(): Long = readMeta(f, root, currentVersion(f, root))
      .map(headIdOf).getOrElse(-1L)
    val hits = IcebergInterop.readIceberg(spark, dir,
        snapshotId = readSnapAt(f, root), ranges = ranges,
        withProvenance = true)
      .filter(predicate)
    // DISTRIBUTED bitmap fold: one (file, roaring bytes) row per
    // touched file comes back — KB-sized blobs, never positions
    val bm = column(graft.functions.expressions.DvBitmapAgg(
      expression(col("_graft_pos"))).toAggregateExpression())
    import spark.implicits._
    val perFile: Seq[(String, Array[Byte])] = hits
      .groupBy(col("_graft_file")).agg(bm.as("bm"))
      .as[(String, Array[Byte])].collect().toSeq
    if (perFile.isEmpty) return (currentSnap(), 0L)
    val conf = spark.sparkContext.hadoopConfiguration
    val referenced = perFile.map(p => canonPath(p._1)).toSet
    var deleted = 0L
    // the puffin (our positions ∪ the head's live DVs) rebuilds on
    // every rebase — the superset-replacement rule must hold against
    // whatever a concurrent writer just committed, and a stale
    // pre-race union would drop the racer's DV and resurrect its rows
    def buildPuffin(): (Path, Long, Seq[(String, Long, Long)], Map[String, Long]) = {
      val prior = IcebergInterop.liveDvs(spark, dir, readSnapAt(f, root))
      deleted = 0L
      val blobs: Seq[(String, Array[Byte], Long)] = perFile.map { case (file, bytes) =>
        prior.get(canonPath(file)) match {
          case None =>
            val card = DeletionVectors.parse(bytes).cardinality
            deleted += card
            (file, bytes, card)
          case Some((puffin, off, size)) =>
            // replacement rule: the new DV must CONTAIN the one it replaces
            val priorBm = IcebergFormat.readPuffinDv(conf, new Path(puffin), off, size)
            val b = RoaringBitmapBuilder.fromBytes(bytes)
            b.or(priorBm)
            val (merged, card) = b.result()
            // merged − prior: honest count even when a racer already
            // deleted some of the same rows
            deleted += card - priorBm.cardinality
            (file, merged, card)
        }
      }
      val puffinP = new Path(root,
        s"data/dv-${java.util.UUID.randomUUID()}.puffin")
      val refs = IcebergFormat.writePuffinDvBlobs(f, puffinP, blobs)
      (puffinP, f.getFileStatus(puffinP).getLen, refs,
        blobs.map(b => (b._1, b._3)).toMap)
    }
    var (puffinP, puffinLen, refs, cardOf) = buildPuffin()

    var attempt = 0
    var base = v0
    while (true) {
      val snapshotId = freshSnapshotId(f, root, base)
      val seqNo = readMeta(f, root, base)
        .map(_.path("last-sequence-number").asLong(0L)).getOrElse(0L) + 1L
      val entries = refs.map { case (refFile, off, size) =>
        IcebergFormat.entry(1, puffinP.toString, cardOf(refFile), puffinLen,
          snapshotId, seqNo, fileFormat = "PUFFIN",
          dvRef = Some((refFile, off, size)))
      }
      val mp = new Path(root,
        s"metadata/delete-manifest-$snapshotId-${java.util.UUID.randomUUID().toString.take(8)}.avro")
      IcebergFormat.writeAvro(f, mp, IcebergFormat.EntrySchema, entries)
      try {
        onBeforeCommit()
        return (commitMeta(spark, f, root, base, StructType(Nil), snapshotId,
          seqNo, Seq(NewManifest(mp, partitioned = false, None, content = 1,
            entries = entries)),
          replace = false, operation = Some("delete"),
          minFormatVersion = 3), deleted)
      } catch {
        case _: java.util.ConcurrentModificationException =>
          f.delete(mp, false)
          attempt += 1
          require(attempt < MaxCommitRetries,
            s"DV delete on $dir lost $MaxCommitRetries version races")
          base = currentVersion(f, root)
          val live = IcebergInterop.liveDataPaths(spark, dir,
            readSnapAt(f, root)).toSet
          val gone = referenced.filterNot(live)
          if (gone.nonEmpty) {
            f.delete(puffinP, false)
            throw new IllegalStateException(
              s"DV delete on $dir raced a concurrent commit that replaced " +
              s"${gone.size} referenced data file(s) (e.g. ${gone.head}) — " +
              "re-run the delete against the new snapshot")
          }
          // the racer may have committed a DV for one of our files —
          // rebuild the union against the NEW head's live DVs
          f.delete(puffinP, false)
          val rebuilt = buildPuffin()
          puffinP = rebuilt._1; puffinLen = rebuilt._2
          refs = rebuilt._3; cardOf = rebuilt._4
      }
    }
    (-1L, -1L) // unreachable
  }

  /** EQUALITY DELETE for native Iceberg tables: every row whose
    * `keyCols` tuple appears in `keys` masks — but only in data files
    * whose sequence number is STRICTLY BELOW the delete's (the spec's
    * ordering rule), so re-appending the same keys later survives.
    * This is the O(|keys|) GDPR path: NO table scan at all — the
    * spec-shaped delete file (keys parquet + `equality_ids` manifest
    * entry) IS the predicate, applied in-plan by every spec reader
    * ([[IcebergInterop]]'s null-safe anti-join included). Version
    * races REBASE freely — an equality delete references key VALUES,
    * not data files, so no liveness validation is needed.
    * Returns (snapshotId, keyRowCount). */
  def equalityDelete(spark: SparkSession, dir: String,
                     keys: DataFrame): (Long, Long) = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val f = fs(spark, dir)
    val root = new Path(dir)
    val v0 = currentVersion(f, root)
    require(v0 > 0, s"$dir has no snapshots to delete from")
    val m0 = readMeta(f, root, v0).get
    val idsByName = currentFieldIds(m0).toMap
    val missing = keys.columns.filterNot(idsByName.contains)
    require(missing.isEmpty,
      s"equality-delete key column(s) ${missing.mkString(",")} not in the " +
      s"table schema ${idsByName.keys.toSeq.sorted.mkString(",")}")
    val equalityIds = keys.columns.map(idsByName).toSeq
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val staging = new Path(root,
      s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    withFieldIds(keys, idsByName.view.filterKeys(keys.columns.contains).toMap)
      .write.parquet(staging.toString)
    val staged = f.listStatus(staging).filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val dst = new Path(root, s"data/eqdelete-${java.util.UUID.randomUUID()}.parquet")
        require(f.rename(st.getPath, dst), s"rename ${st.getPath} failed")
        (dst, f.getFileStatus(dst).getLen)
      }.toSeq
    f.delete(staging, true)
    // counts AND key-column bounds in one grouped job: the bounds let
    // compact (and bound-aware readers) prune data files whose key
    // ranges provably exclude every deleted tuple
    val keyIds = idsByName.view.filterKeys(keys.columns.contains).toMap
    val stats: Map[String, (Long, Map[Int, (Array[Byte], Array[Byte])])] =
      if (staged.isEmpty) Map.empty
      else allFileStats(spark, staged.map(_._1.toString), keyIds)
    val (delFiles, empties) =
      staged.partition(p => stats.contains(canonPath(p._1.toString)))
    empties.foreach { case (p, _) => f.delete(p, false) }
    if (delFiles.isEmpty)
      return (readMeta(f, root, currentVersion(f, root))
        .map(_.path("current-snapshot-id").asLong(-1L)).getOrElse(-1L), 0L)
    val nKeys = stats.values.map(_._1).sum

    var attempt = 0
    var base = v0
    while (true) {
      val snapshotId = freshSnapshotId(f, root, base)
      val seqNo = readMeta(f, root, base)
        .map(_.path("last-sequence-number").asLong(0L)).getOrElse(0L) + 1L
      val entries = delFiles.map { case (p, size) =>
        val (n, bounds) = stats(canonPath(p.toString))
        IcebergFormat.entry(2, p.toString, n, size, snapshotId, seqNo,
          equalityIds = equalityIds, bounds = bounds)
      }
      val mp = new Path(root,
        s"metadata/delete-manifest-$snapshotId-${java.util.UUID.randomUUID().toString.take(8)}.avro")
      IcebergFormat.writeAvro(f, mp, IcebergFormat.EntrySchema, entries)
      try {
        onBeforeCommit()
        return (commitMeta(spark, f, root, base, StructType(Nil), snapshotId,
          seqNo, Seq(NewManifest(mp, partitioned = false, None, content = 1,
            entries = entries)),
          replace = false, operation = Some("delete")), nKeys)
      } catch {
        case _: java.util.ConcurrentModificationException =>
          f.delete(mp, false)
          attempt += 1
          require(attempt < MaxCommitRetries,
            s"equality delete on $dir lost $MaxCommitRetries version races")
          base = currentVersion(f, root)
      }
    }
    (-1L, -1L) // unreachable
  }

  /** ROLL BACK the table to `snapshotId` — Iceberg's
    * `rollback_to_snapshot`: a NEW snapshot whose manifest list is the
    * target's, committed on top of the lineage (operation=`rollback`),
    * so nothing is lost — the rolled-past snapshots stay
    * time-travelable until [[expireSnapshots]] ages them out, and the
    * rollback itself is one more auditable commit. Metadata-only:
    * zero file work. Returns the new snapshot id. */
  def rollbackTo(spark: SparkSession, dir: String, snapshotId: Long): Long = {
    import scala.jdk.CollectionConverters._
    val f = fs(spark, dir)
    val root = new Path(dir)
    val v0 = currentVersion(f, root)
    require(v0 > 0, s"$dir has no snapshots to roll back")
    val m0 = readMeta(f, root, v0).get
    val target = m0.path("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong(-2L) == snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $snapshotId not found at $dir — expired?"))
    // carry the TARGET's manifest list verbatim as the new snapshot's
    val conf = spark.sparkContext.hadoopConfiguration
    val carried = IcebergFormat.readAvro(conf,
      new Path(resolveU(target.path("manifest-list").asText))).map { r =>
      (gStr(r, "manifest_path"), gLong(r, "manifest_length", 0L),
        gInt(r, "content", 0), gLong(r, "sequence_number", 0L),
        gInt(r, "partition_spec_id", 0), gLong(r, "added_snapshot_id", snapshotId),
        Option(r.getSchema.getField("partitions"))
          .flatMap(_ => Option(r.get("partitions"))).orNull)
    }
    val newId = freshSnapshotId(f, root, v0)
    val seqNo = m0.path("last-sequence-number").asLong(0L) + 1L
    try {
      onBeforeCommit()
      commitMeta(spark, f, root, v0, StructType(Nil), newId, seqNo, Nil,
        replace = false, operation = Some("rollback"),
        priorOverride = Some(carried))
    } catch {
      case _: java.util.ConcurrentModificationException =>
        throw new IllegalStateException(
          s"rollback of $dir raced a concurrent commit — re-run against " +
          "the new head")
    }
  }

  // ─────────────────── refs (branches / tags) ───────────────────

  /** Pin `snapshotId` (default: the current snapshot) under a TAG ref —
    * a named, expiry-proof time-travel point ([[expireSnapshots]] never
    * ages out a ref-pinned snapshot, unless the ref declares
    * `maxRefAgeMs` and outlives it). Metadata-only commit. */
  def createTag(spark: SparkSession, dir: String, name: String,
                snapshotId: Option[Long] = None,
                maxRefAgeMs: Option[Long] = None): Unit =
    setRef(spark, dir, name, snapshotId, "tag", maxRefAgeMs)

  /** Create or move a BRANCH ref to `snapshotId` (default: current).
    * The `main` branch is managed by commits and refuses manual moves.
    * Optional retention (the spec's snapshot-reference fields):
    * `maxRefAgeMs` ages the REF itself out of [[expireSnapshots]];
    * `minSnapshotsToKeep`/`maxSnapshotAgeMs` bound how much of the
    * branch's staged tail expiry keeps pinned. */
  def createBranch(spark: SparkSession, dir: String, name: String,
                   snapshotId: Option[Long] = None,
                   maxRefAgeMs: Option[Long] = None,
                   minSnapshotsToKeep: Option[Int] = None,
                   maxSnapshotAgeMs: Option[Long] = None): Unit =
    setRef(spark, dir, name, snapshotId, "branch", maxRefAgeMs,
      minSnapshotsToKeep, maxSnapshotAgeMs)

  // ───────────── branch writes (write-audit-publish) ─────────────

  /** Scoped BRANCH context: every commit inside `onBranch(b){...}`
    * targets ref `b` — parentage off the BRANCH head, `refs.b`
    * advances, `main`/`current-snapshot-id` untouched — the Iceberg
    * write-audit-publish staging pattern. A branch's FIRST commit
    * forks implicitly from the main head (createBranch beforehand
    * works too). Reads inside the scope (a branch delete's hits scan,
    * a merge's target view) resolve against the branch head. Publish
    * with [[fastForward]]; audit with a plain
    * `readIceberg(snapshotId = snapshotOfRef(...))`. Thread-scoped
    * (DynamicVariable) — safe under concurrent writers on different
    * threads. Caveat (documented): branch reads pin the branch-head
    * snapshot's schema-id, so a metadata-only schema evolution
    * mid-WAP surfaces on the branch only after its next commit (or
    * after publish) — evolve before staging. */
  def onBranch[T](branch: String)(body: => T): T = {
    require(branch.nonEmpty && branch != "main",
      "onBranch targets a named non-main branch")
    branchCtx.withValue(Some(branch))(body)
  }

  private val branchCtx =
    new scala.util.DynamicVariable[Option[String]](None)

  /** The head the active context commits against: the branch ref when
    * set (falling back to main for the branch's first commit), else
    * `current-snapshot-id`. Refuses tags — they are immutable. */
  private def headIdOf(m: JsonNode): Long = branchCtx.value match {
    case Some(b) =>
      val r = m.path("refs").path(b)
      if (r.isMissingNode || r.isNull)
        m.path("current-snapshot-id").asLong(-1L)
      else {
        require(r.path("type").asText("branch") == "branch",
          s"ref $b is a ${r.path("type").asText} — tags are immutable")
        r.path("snapshot-id").asLong(-1L)
      }
    case None => m.path("current-snapshot-id").asLong(-1L)
  }

  /** The snapshot the active context READS (None = the main head —
    * the plain current-shape read). Distinct from main only after the
    * branch's first commit, so an untouched branch reads exactly like
    * the table. */
  private def readSnapOf(m: JsonNode): Option[Long] =
    branchCtx.value.flatMap { _ =>
      val h = headIdOf(m)
      if (h == m.path("current-snapshot-id").asLong(-1L) || h <= 0) None
      else Some(h)
    }

  private def readSnapAt(f: FileSystem, root: Path): Option[Long] =
    if (branchCtx.value.isEmpty) None
    else readMeta(f, root, currentVersion(f, root)).flatMap(readSnapOf)

  /** PUBLISH (the write-audit-publish closing step): fast-forward
    * `main` to `branch`'s head. Requires main's current head to be an
    * ANCESTOR of the branch head (pure fast-forward; a diverged main
    * refuses — rebase the branch by hand). The branch ref survives
    * (drop it with [[dropRef]]). Metadata-only, put-if-absent commit.
    * Returns the published snapshot id. */
  def fastForward(spark: SparkSession, dir: String, branch: String): Long = {
    import scala.jdk.CollectionConverters._
    require(branch != "main", "fastForward publishes a non-main branch to main")
    val f = fs(spark, dir)
    val root = new Path(dir)
    val v0 = currentVersion(f, root)
    val m0 = readMeta(f, root, v0).getOrElse(throw new IllegalArgumentException(
      s"$dir has no Iceberg metadata"))
    val br = m0.path("refs").path(branch)
    require(!br.isMissingNode && !br.isNull, s"no ref $branch at $dir")
    require(br.path("type").asText("branch") == "branch",
      s"ref $branch is a ${br.path("type").asText} — cannot publish a tag")
    val target = br.path("snapshot-id").asLong(-1L)
    val mainHead = m0.path("current-snapshot-id").asLong(-1L)
    if (target == mainHead) return target // nothing staged
    // ancestry walk: main's head must be on the branch head's parent
    // chain, or the publish would silently drop main-only commits
    val parentOf: Map[Long, Long] = m0.path("snapshots").elements().asScala
      .map(s0 => s0.path("snapshot-id").asLong(-1L) ->
        s0.path("parent-snapshot-id").asLong(-1L)).toMap
    var cur = target
    var isAncestor = mainHead <= 0 // an empty main fast-forwards to anything
    while (!isAncestor && cur > 0) {
      cur = parentOf.getOrElse(cur, -1L)
      if (cur == mainHead) isAncestor = true
    }
    require(isAncestor,
      s"main ($mainHead) is not an ancestor of $branch ($target) — " +
      "main advanced since the branch forked; not a fast-forward")
    val n = m0.deepCopy[JsonNode]().asInstanceOf[ObjNode]
    n.put("current-snapshot-id", target)
    val refs = n.path("refs").asInstanceOf[ObjNode]
    val mr = refs.putObject("main")
    mr.put("snapshot-id", target); mr.put("type", "branch")
    // main's history advances — the published snapshots enter the log
    val sl = n.withArray[com.fasterxml.jackson.databind.node.ArrayNode](
      "snapshot-log").addObject()
    sl.put("timestamp-ms", System.currentTimeMillis())
    sl.put("snapshot-id", target)
    commitMetadataOnly(f, root, v0, m0, n, "fastForward")
    target
  }

  /** PUBLISH past a diverged main (the cherry-pick half of
    * write-audit-publish): when main advanced while the audit ran —
    * the normal state of a high-ingest table — [[fastForward]]
    * refuses, and this re-commits the branch's staged file diffs onto
    * the NEW main head as one snapshot, after conflict validation:
    *
    *   - append diffs replay verbatim (the staged manifests join
    *     main's manifest list, re-attributed to the publish commit —
    *     metadata-only, zero data movement);
    *   - staged position deletes / DVs require every referenced data
    *     file to still be LIVE on main (main compacting or deleting
    *     one refuses with the file named — the spec's
    *     validateDataFilesExist);
    *   - staged equality deletes refuse when any file main ADDED
    *     since the fork overlaps the delete's key bounds (the replay
    *     would mask rows the audit never saw);
    *   - symmetrically, staged data files refuse when main committed
    *     an overlapping equality delete since the fork (the staged
    *     rows would escape it);
    *   - a branch that rewrote pre-fork manifests (maintenance ran on
    *     the branch) refuses — its diff is no longer append-shaped.
    *
    * Fast-forwards trivially when main never diverged. The branch ref
    * survives (drop it with [[dropRef]]). Returns the published
    * snapshot id. */
  def cherryPickPublish(spark: SparkSession, dir: String, branch: String): Long = {
    import scala.jdk.CollectionConverters._
    require(branch != "main", "cherryPickPublish publishes a non-main branch")
    val f = fs(spark, dir)
    val root = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val v0 = currentVersion(f, root)
    val m0 = readMeta(f, root, v0).getOrElse(throw new IllegalArgumentException(
      s"$dir has no Iceberg metadata"))
    val br = m0.path("refs").path(branch)
    require(!br.isMissingNode && !br.isNull, s"no ref $branch at $dir")
    require(br.path("type").asText("branch") == "branch",
      s"ref $branch is a ${br.path("type").asText} — cannot publish a tag")
    val target = br.path("snapshot-id").asLong(-1L)
    val mainHead = m0.path("current-snapshot-id").asLong(-1L)
    if (target == mainHead) return target
    val parentOf: Map[Long, Long] = m0.path("snapshots").elements().asScala
      .map(s0 => s0.path("snapshot-id").asLong(-1L) ->
        s0.path("parent-snapshot-id").asLong(-1L)).toMap
    // pure fast-forward when main never advanced past the fork
    var cur = target
    var ff = mainHead <= 0
    while (!ff && cur > 0) {
      cur = parentOf.getOrElse(cur, -1L)
      if (cur == mainHead) ff = true
    }
    if (ff) return fastForward(spark, dir, branch)
    val mainAnc = scala.collection.mutable.Set.empty[Long]
    var c2 = mainHead
    while (c2 > 0) { mainAnc += c2; c2 = parentOf.getOrElse(c2, -1L) }
    var fork = target
    while (fork > 0 && !mainAnc(fork)) fork = parentOf.getOrElse(fork, -1L)
    require(fork > 0,
      s"$branch shares no ancestor with main at $dir — cannot cherry-pick")

    def listOf(snapId: Long): Seq[(String, Long, Int, Long, Int, Long, AnyRef)] =
      m0.path("snapshots").elements().asScala
        .find(_.path("snapshot-id").asLong(-2L) == snapId)
        .map { s0 =>
          IcebergFormat.readAvro(conf,
            new Path(resolveU(s0.path("manifest-list").asText))).map { r =>
            (gStr(r, "manifest_path"), gLong(r, "manifest_length", 0L),
              gInt(r, "content", 0), gLong(r, "sequence_number", 0L),
              gInt(r, "partition_spec_id", 0),
              gLong(r, "added_snapshot_id", snapId),
              Option(r.getSchema.getField("partitions"))
                .flatMap(_ => Option(r.get("partitions"))).orNull)
          }
        }.getOrElse(throw new IllegalArgumentException(
          s"snapshot $snapId expired at $dir — cannot cherry-pick"))
    val forkList = listOf(fork)
    val branchList = listOf(target)
    val mainList = listOf(mainHead)
    val forkPaths = forkList.map(_._1).toSet
    val rewroteAway = forkPaths -- branchList.map(_._1).toSet
    require(rewroteAway.isEmpty,
      s"$branch rewrote ${rewroteAway.size} pre-fork manifest(s) (e.g. " +
      s"${rewroteAway.head}) — the staged diff is not append-shaped; " +
      "rebase the branch by hand")
    // manifests main ALREADY carries never replay (a second publish of
    // the same branch is a no-op, not a row duplication)
    val mainPaths = mainList.map(_._1).toSet
    val staged = branchList.filterNot(t => forkPaths(t._1) || mainPaths(t._1))
    if (staged.isEmpty) return mainHead // nothing staged beyond the fork

    // parse the staged manifests once, live entries only
    val stagedMans: Seq[((String, Long, Int, Long, Int, Long, AnyRef),
      Seq[GenericRecord])] = graft.pipeline.Par.map(staged) { t =>
      (t, IcebergFormat.readAvro(conf, new Path(resolveU(t._1))))
    }
    stagedMans.foreach { case (t, entries) =>
      require(!entries.exists(e => gInt(e, "status", 0) == 2),
        s"staged manifest ${t._1} carries removal entries — the diff is " +
        "not append-shaped; rebase the branch by hand")
    }
    // what main changed since the fork, for conflict validation
    val forkLive = IcebergInterop.liveStateOf(spark, dir, fork)
    val mainLive = IcebergInterop.liveStateOf(spark, dir, mainHead)
    // a staged delete may legitimately mask the branch's OWN staged
    // files — they publish together
    val stagedDataPaths: Set[String] = stagedMans.flatMap { case (_, entries) =>
      entries.filter(e => gInt(e, "status", 0) != 2).flatMap { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        if (gInt(df, "content", 0) == 0)
          Some(canonPath(resolveU(gStr(df, "file_path")))) else None
      }
    }.toSet
    val mainNewData = mainLive.dataInfo -- forkLive.files
    // equality deletes main committed since the fork, BY HISTORY (each
    // post-fork main snapshot's own added delete manifests) — not the
    // live diff: a compaction may have FOLDED the delete into rewritten
    // data, and staged rows carrying a folded-away key would silently
    // escape the deletion's intent. (ids, key bounds) per delete file.
    val mainNewEq: Seq[(Seq[Int], Map[Int, (Array[Byte], Array[Byte])])] = {
      val sinceFork = {
        val b = Seq.newBuilder[Long]
        var c3 = mainHead
        while (c3 > 0 && c3 != fork) { b += c3; c3 = parentOf.getOrElse(c3, -1L) }
        b.result()
      }
      sinceFork.flatMap { sid =>
        m0.path("snapshots").elements().asScala
          .find(_.path("snapshot-id").asLong(-2L) == sid).toSeq.flatMap { s0 =>
            IcebergFormat.readAvro(conf,
              new Path(resolveU(s0.path("manifest-list").asText)))
              .filter(r => gLong(r, "added_snapshot_id", -1L) == sid &&
                gInt(r, "content", 0) != 0)
              .flatMap(r => IcebergFormat.readAvro(conf,
                new Path(resolveU(gStr(r, "manifest_path"))))
                .filter(e => gInt(e, "status", 0) == 1)
                .flatMap { e =>
                  val df0 = e.get("data_file").asInstanceOf[GenericRecord]
                  if (gInt(df0, "content", 0) != 2) None
                  else Some((
                    Option(df0.getSchema.getField("equality_ids"))
                      .flatMap(_ => Option(df0.get("equality_ids")))
                      .map(_.asInstanceOf[java.util.List[_]].asScala
                        .map(_.asInstanceOf[Number].intValue).toSeq)
                      .getOrElse(Nil),
                    entryBounds(df0)))
                })
          }
      }
    }
    val dtOfId: Map[Int, DataType] = currentSchemaNode(m0).path("fields")
      .elements().asScala.flatMap(fd =>
        resultTypeOfName(fd.path("type").asText)
          .map(fd.path("id").asInt -> _)).toMap
    // bounds overlap on EVERY equality id; absent bounds assume overlap
    def mayOverlap(ids: Seq[Int],
                   a: (Map[Int, Array[Byte]], Map[Int, Array[Byte]]),
                   b: (Map[Int, Array[Byte]], Map[Int, Array[Byte]])): Boolean =
      ids.isEmpty || ids.forall { id =>
        (a._1.get(id), a._2.get(id), b._1.get(id), b._2.get(id),
          dtOfId.get(id)) match {
          case (Some(aLo), Some(aHi), Some(bLo), Some(bHi), Some(dt)) =>
            cmpBound(dt, aLo, bHi) <= 0 && cmpBound(dt, bLo, aHi) <= 0
          case _ => true
        }
      }
    // ONE read for every staged position-delete parquet's referenced
    // paths (never a job per delete file)
    val stagedPosPaths: Seq[String] = stagedMans.flatMap { case (_, entries) =>
      entries.filter(e => gInt(e, "status", 0) != 2).flatMap { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        val isDv = gStr(df, "file_format").equalsIgnoreCase("puffin") ||
          Option(df.getSchema.getField("content_offset"))
            .flatMap(_ => Option(df.get("content_offset"))).isDefined
        if (gInt(df, "content", 0) == 1 && !isDv)
          Some(resolveU(gStr(df, "file_path"))) else None
      }
    }
    val posRefsByFile: Map[String, Seq[String]] =
      if (stagedPosPaths.isEmpty) Map.empty
      else spark.read.parquet(stagedPosPaths: _*)
        .select(org.apache.spark.sql.functions.col("_metadata.file_path")
          .as("_src"), org.apache.spark.sql.functions.col("file_path"))
        .distinct().collect()
        .groupBy(r => canonPath(r.getString(0)))
        .map { case (src, rows) =>
          src -> rows.map(r => resolveU(r.getString(1))).toSeq
        }
    stagedMans.foreach { case (_, entries) =>
      entries.filter(e => gInt(e, "status", 0) != 2).foreach { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        val path = resolveU(gStr(df, "file_path"))
        val isDv = gStr(df, "file_format").equalsIgnoreCase("puffin") ||
          Option(df.getSchema.getField("content_offset"))
            .flatMap(_ => Option(df.get("content_offset"))).isDefined
        gInt(df, "content", 0) match {
          case 0 =>
            val b = entryBounds(df)
            mainNewEq.foreach { case (ids, kb) =>
              require(!mayOverlap(ids, (b.map { case (k, v) => k -> v._1 },
                  b.map { case (k, v) => k -> v._2 }),
                  (kb.map { case (k, v) => k -> v._1 },
                    kb.map { case (k, v) => k -> v._2 })),
                s"cherry-pick conflict: staged data file $path may hold keys " +
                "masked by an equality delete main committed since the " +
                "fork — rebase the branch by hand")
            }
          case 1 =>
            val refs: Seq[String] =
              if (isDv) Option(df.getSchema.getField("referenced_data_file"))
                .flatMap(_ => Option(df.get("referenced_data_file")))
                .map(p => Seq(resolveU(p.toString))).getOrElse(Nil)
              else posRefsByFile.getOrElse(canonPath(path), Nil)
            refs.foreach(r => require(
              mainLive.files.contains(canonPath(r)) ||
                stagedDataPaths.contains(canonPath(r)),
              s"cherry-pick conflict: staged delete $path references $r, " +
              "which main no longer carries (deleted or rewritten since " +
              "the fork) — rebase the branch by hand"))
            // a DV REPLACES the file's prior vector (highest sequence
            // wins) — if main also re-vectored the same file since the
            // fork, whichever side loses the sequence race silently
            // loses its deletions: refuse, like the spec's
            // validateNoNewDeletesForDataFiles
            if (isDv) refs.foreach { r =>
              val cr = canonPath(r)
              require(stagedDataPaths.contains(cr) ||
                  forkLive.dvs.get(cr) == mainLive.dvs.get(cr),
                s"cherry-pick conflict: staged deletion vector $path and a " +
                s"deletion vector main committed since the fork both mask " +
                s"$r — one would silently replace the other; rebase the " +
                "branch by hand")
            }
          case 2 =>
            val ids = Option(df.getSchema.getField("equality_ids"))
              .flatMap(_ => Option(df.get("equality_ids")))
              .map(_.asInstanceOf[java.util.List[_]].asScala
                .map(_.asInstanceOf[Number].intValue).toSeq).getOrElse(Nil)
            val kb = entryBounds(df)
            mainNewData.foreach { case (p, (_, lo, hi)) =>
              require(!mayOverlap(ids, (kb.map { case (k, v) => k -> v._1 },
                  kb.map { case (k, v) => k -> v._2 }), (lo, hi)),
                s"cherry-pick conflict: staged equality delete $path " +
                s"overlaps $p, which main added since the fork — the " +
                "replay would mask rows the audit never saw; rebase")
            }
          case other => throw new IllegalArgumentException(
            s"unknown content=$other in staged manifest entry $path")
        }
      }
    }
    // ONE commit on main: carried = main's manifests verbatim, plus the
    // staged manifests re-attributed to the publish snapshot (their
    // original sequence numbers ride along — the conflict gates above
    // make cross-lineage sequence interleaving safe)
    val newId = freshSnapshotId(f, root, v0)
    val seqNo = m0.path("last-sequence-number").asLong(0L) + 1L
    val anyDelete = staged.exists(_._3 != 0)
    val carried = mainList ++ staged.map(t => t.copy(_6 = newId))
    try {
      onBeforeCommit()
      commitMeta(spark, f, root, v0, StructType(Nil), newId, seqNo, Nil,
        replace = false,
        operation = Some(if (anyDelete) "overwrite" else "append"),
        priorOverride = Some(carried))
    } catch {
      case _: java.util.ConcurrentModificationException =>
        throw new IllegalStateException(
          s"cherry-pick publish of $branch at $dir raced a concurrent " +
          "commit — re-run against the new head")
    }
  }

  /** Remove a tag/branch ref (its snapshot becomes expirable again).
    * `main` refuses. */
  def dropRef(spark: SparkSession, dir: String, name: String): Unit = {
    require(name != "main", "the main branch is managed by commits")
    val f = fs(spark, dir)
    val root = new Path(dir)
    val v0 = currentVersion(f, root)
    val m0 = readMeta(f, root, v0).getOrElse(
      throw new IllegalArgumentException(s"$dir has no Iceberg metadata"))
    require(m0.path("refs").has(name), s"no ref $name at $dir")
    val n = m0.deepCopy[JsonNode]().asInstanceOf[ObjNode]
    n.path("refs").asInstanceOf[ObjNode].remove(name)
    commitMetadataOnly(f, root, v0, m0, n, s"DROP REF $name")
  }

  private def setRef(spark: SparkSession, dir: String, name: String,
                     snapshotId: Option[Long], kind: String,
                     maxRefAgeMs: Option[Long] = None,
                     minSnapshotsToKeep: Option[Int] = None,
                     maxSnapshotAgeMs: Option[Long] = None): Unit = {
    import scala.jdk.CollectionConverters._
    require(name != "main", "the main branch is managed by commits")
    val f = fs(spark, dir)
    val root = new Path(dir)
    val v0 = currentVersion(f, root)
    val m0 = readMeta(f, root, v0).getOrElse(
      throw new IllegalArgumentException(s"$dir has no Iceberg metadata"))
    val target = snapshotId.getOrElse(m0.path("current-snapshot-id").asLong(-1L))
    require(m0.path("snapshots").elements().asScala
      .exists(_.path("snapshot-id").asLong(-2L) == target),
      s"snapshot $target not found at $dir — refs must pin a live snapshot")
    val n = m0.deepCopy[JsonNode]().asInstanceOf[ObjNode]
    val refs =
      if (n.path("refs").isObject) n.path("refs").asInstanceOf[ObjNode]
      else n.putObject("refs")
    val r = refs.putObject(name)
    r.put("snapshot-id", target); r.put("type", kind)
    maxRefAgeMs.foreach(r.put("max-ref-age-ms", _))
    if (kind == "branch") {
      minSnapshotsToKeep.foreach(r.put("min-snapshots-to-keep", _))
      maxSnapshotAgeMs.foreach(r.put("max-snapshot-age-ms", _))
    }
    commitMetadataOnly(f, root, v0, m0, n, s"SET REF $name")
  }

  /** A metadata-only version bump (refs, future table-property edits):
    * last-updated-ms + metadata-log maintained, committed by the same
    * put-if-absent rename every commit uses; a lost race refuses. */
  private def commitMetadataOnly(f: FileSystem, root: Path, base: Int,
                                 prev: JsonNode, n: ObjNode,
                                 what: String): Unit = {
    val nowMs = System.currentTimeMillis()
    val prevUpdated = prev.path("last-updated-ms").asLong(nowMs)
    n.put("last-updated-ms", nowMs)
    val ml = n.withArray[com.fasterxml.jackson.databind.node.ArrayNode](
      "metadata-log").addObject()
    ml.put("timestamp-ms", prevUpdated)
    ml.put("metadata-file", new Path(root, s"metadata/v$base.metadata.json").toString)
    val target = new Path(root, s"metadata/v${base + 1}.metadata.json")
    val tmp = new Path(root,
      s"metadata/.tmp-v${base + 1}-${java.util.UUID.randomUUID().toString.take(8)}.json")
    val out = f.create(tmp, false)
    try out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(n))
    finally out.close()
    if (!putIfAbsent(f, tmp, target)) {
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"$what on $root raced a concurrent commit — re-run")
    }
    val hint = f.create(new Path(root, "metadata/version-hint.text"), true)
    try hint.write(String.valueOf(base + 1).getBytes) finally hint.close()
  }

  // ─────────────────── table maintenance ───────────────────

  private def gStr(r: GenericRecord, n: String): String = r.get(n).toString
  private def gInt(r: GenericRecord, n: String, d: Int): Int =
    Option(r.getSchema.getField(n)).flatMap(_ => Option(r.get(n)))
      .map(_.asInstanceOf[Number].intValue).getOrElse(d)
  private def gLong(r: GenericRecord, n: String, d: Long): Long =
    Option(r.getSchema.getField(n)).flatMap(_ => Option(r.get(n)))
      .map(_.asInstanceOf[Number].longValue).getOrElse(d)
  private def resolveU(uri: String): String =
    if (uri.startsWith("file:")) new java.net.URI(uri).getPath else uri
  private def entryBounds(df: GenericRecord): Map[Int, (Array[Byte], Array[Byte])] = {
    import scala.jdk.CollectionConverters._
    def side(field: String): Map[Int, Array[Byte]] =
      Option(df.getSchema.getField(field)).flatMap(_ => Option(df.get(field))).map {
        _.asInstanceOf[java.util.List[_]].asScala.map { kv0 =>
          val kv = kv0.asInstanceOf[GenericRecord]
          val bb = kv.get("value").asInstanceOf[java.nio.ByteBuffer].duplicate()
          val b = new Array[Byte](bb.remaining()); bb.get(b)
          kv.get("key").asInstanceOf[Number].intValue -> b
        }.toMap
      }.getOrElse(Map.empty)
    val lo = side("lower_bounds"); val hi = side("upper_bounds")
    lo.keySet.intersect(hi.keySet).map(k => k -> ((lo(k), hi(k)))).toMap
  }

  /** BIN-PACK COMPACTION of a native Iceberg table — the Iceberg twin
    * of Delta's `OPTIMIZE` + `REORG PURGE`: files carrying row-level
    * deletes (position / equality / DV) and files below
    * `smallFileBytes` REWRITE — their MASKED rows bin-pack into
    * ~`targetFileSizeBytes` files, folding every delete away — while
    * untouched manifests carry forward VERBATIM (zero work) and
    * partially-dirty manifests rewrite metadata-only as EXISTING
    * (status 0) entries that keep their original sequence numbers.
    * Delete manifests drop from the new snapshot (their masks are now
    * physical); prior snapshots stay time-travelable until
    * [[expireSnapshots]]. Committed as ONE `replace` snapshot.
    *
    * Scale shape: the only data-sized work is ONE masked scan of the
    * dirty files + one stats job over the rewrites; clean data never
    * moves. A version race REFUSES (like overwrite) — the carried
    * manifest set was computed against the pre-race head.
    * Returns (snapshotId, filesRewritten, deleteFilesFolded) —
    * (currentSnapshot, 0, 0) when the table is already compact. */
  def compact(spark: SparkSession, dir: String,
              targetFileSizeBytes: Long = 128L << 20,
              smallFileBytes: Long = 32L << 20): (Long, Int, Int) = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.col
    val f = fs(spark, dir)
    val root = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val v0 = currentVersion(f, root)
    require(v0 > 0, s"$dir has no snapshots to compact")
    val m0 = readMeta(f, root, v0).get
    val curId = m0.path("current-snapshot-id").asLong(-1L)
    val snapNode = m0.path("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong(-2L) == curId)
      .getOrElse(return (curId, 0, 0))
    val listRecs = IcebergFormat.readAvro(conf,
      new Path(resolveU(snapNode.path("manifest-list").asText)))
    final case class Man(rec: GenericRecord, content: Int,
                         entries: Seq[GenericRecord])
    // bounded-parallel manifest parse: each Avro is independent and the
    // loop is I/O-latency-bound — on a manifest-heavy table the driver
    // planning cost is the slowest few reads, not the sum
    val mans = graft.pipeline.Par.map(listRecs) { r =>
      Man(r, gInt(r, "content", 0),
        IcebergFormat.readAvro(conf, new Path(resolveU(gStr(r, "manifest_path")))))
    }
    val (delMans, dataMans) = mans.partition(_.content != 0)
    def liveEntries(m: Man): Seq[GenericRecord] =
      m.entries.filter(e => gInt(e, "status", 0) != 2)
    // the live delete inventory decides which data files are dirty
    val delEntryRecs: Seq[(GenericRecord, GenericRecord, Long)] =
      delMans.flatMap { m =>
        val mseq = gLong(m.rec, "sequence_number", 0L)
        liveEntries(m).map(e =>
          (e, e.get("data_file").asInstanceOf[GenericRecord], mseq))
      }
    val delEntries = delEntryRecs.map(_._2)
    val posParquets = delEntries.filter { df =>
      gInt(df, "content", 0) == 1 &&
        gStr(df, "file_format").equalsIgnoreCase("parquet") &&
        Option(df.getSchema.getField("content_offset"))
          .flatMap(_ => Option(df.get("content_offset"))).isEmpty
    }.map(df => resolveU(gStr(df, "file_path")))
    val dvRefs: Set[String] = delEntries.filter { df =>
      gInt(df, "content", 0) == 1 &&
        (gStr(df, "file_format").equalsIgnoreCase("puffin") ||
          Option(df.getSchema.getField("content_offset"))
            .flatMap(_ => Option(df.get("content_offset"))).isDefined)
    }.flatMap(df => Option(df.getSchema.getField("referenced_data_file"))
      .flatMap(_ => Option(df.get("referenced_data_file"))).map(
        p => canonPath(resolveU(p.toString)))).toSet
    // live EQUALITY deletes: (delete sequence, equality ids, key bounds)
    // — a data file is dirty from one only when its sequence number
    // ADMITS the delete (strictly below, the spec's ordering rule) AND
    // its column bounds on every equality-id column OVERLAP the delete
    // file's key bounds (disjoint on ANY key column ⇒ no tuple can
    // match). Absent bounds on either side ⇒ assume overlap. At 100 TB
    // this keeps one GDPR equality delete from turning the next
    // compaction into a full-table rewrite.
    val eqDeletes: Seq[(Long, Seq[Int], Map[Int, (Array[Byte], Array[Byte])])] =
      delEntryRecs.filter(t => gInt(t._2, "content", 0) == 2).map {
        case (e, df, mseq) =>
          val ids = Option(df.getSchema.getField("equality_ids"))
            .flatMap(_ => Option(df.get("equality_ids")))
            .map(_.asInstanceOf[java.util.List[_]].asScala
              .map(_.asInstanceOf[Number].intValue).toSeq).getOrElse(Nil)
          (gLong(e, "sequence_number", mseq), ids, entryBounds(df))
      }
    val dtOfId: Map[Int, DataType] = currentSchemaNode(m0).path("fields")
      .elements().asScala.flatMap(fd =>
        resultTypeOfName(fd.path("type").asText)
          .map(fd.path("id").asInt -> _)).toMap
    def eqAdmits(dataSeq: Long,
                 dataBounds: Map[Int, (Array[Byte], Array[Byte])]): Boolean =
      eqDeletes.exists { case (delSeq, ids, delBounds) =>
        dataSeq < delSeq && (ids.isEmpty || ids.forall { id =>
          (dataBounds.get(id), delBounds.get(id), dtOfId.get(id)) match {
            case (Some((dLo, dHi)), Some((kLo, kHi)), Some(dt)) =>
              cmpBound(dt, dLo, kHi) <= 0 && cmpBound(dt, kLo, dHi) <= 0
            case _ => true // no bounds / undecodable type: assume overlap
          }
        })
      }
    val posRefs: Set[String] =
      if (posParquets.isEmpty) Set.empty
      else spark.read.parquet(posParquets: _*)
        .select(col("file_path")).distinct()
        .collect().map(r => canonPath(r.getString(0))).toSet
    def isDirty(e: GenericRecord, manSeq: Long): Boolean = {
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      val path = resolveU(gStr(df, "file_path"))
      posRefs(canonPath(path)) || dvRefs(canonPath(path)) ||
        gLong(df, "file_size_in_bytes", 0L) < smallFileBytes ||
        (eqDeletes.nonEmpty &&
          eqAdmits(gLong(e, "sequence_number", manSeq), entryBounds(df)))
    }
    val dirtyFiles: Seq[(String, Long)] = dataMans.flatMap { m =>
      val mseq = gLong(m.rec, "sequence_number", 0L)
      liveEntries(m).filter(isDirty(_, mseq)).map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        (resolveU(gStr(df, "file_path")), gLong(df, "file_size_in_bytes", 0L))
      }
    }
    // already compact: no deletes to fold and at most one small file
    if (delMans.isEmpty && dirtyFiles.lengthCompare(1) <= 0)
      return (curId, 0, 0)
    val deleteFilesFolded = delEntries.length

    val idsByName = currentFieldIds(m0).toMap
    val dirtySet = dirtyFiles.map(p => canonPath(p._1)).toSet
    // lineage tables rewrite with `_row_id` AND
    // `_last_updated_sequence_number` MATERIALIZED: the rewritten
    // files get a NEW sequence number, so both values must ride the
    // rows physically or compaction would reassign identities /
    // misreport update recency (the spec's materialize-on-rewrite rule)
    val lineageOn = nextRowIdOf(Some(m0)).isDefined
    val rows = IcebergInterop.readIceberg(spark, dir,
      onlyDataFiles = Some(dirtySet), withLineage = lineageOn)
    // PARTITION-PRESERVING rewrite: when the dirty manifests all use
    // ONE spec whose every field's transform this writer supports (and
    // whose source columns still exist), the rewrite stages through
    // the same per-value-tuple split appendPartitioned uses — single-
    // OR multi-field — so the compacted files keep their manifest-
    // level skipping instead of collapsing into one unpartitioned
    // manifest
    val nameOfId = currentFieldIds(m0).map(_.swap).toMap
    val rewriteSpec: Option[Seq[(String, String)]] = { // (source column, transform)*
      val dirtySpecIds = dataMans.filter(m =>
        liveEntries(m).exists(isDirty(_, gLong(m.rec, "sequence_number", 0L)))
      ).map(m => gInt(m.rec, "partition_spec_id", 0)).distinct
      dirtySpecIds match {
        case Seq(sid) if sid != 0 =>
          m0.path("partition-specs").elements().asScala
            .find(_.path("spec-id").asInt(-1) == sid)
            .map(_.path("fields")).filter(_.size >= 1)
            .flatMap { fs0 =>
              val fields = (0 until fs0.size).map { i =>
                val srcId = fs0.get(i).path("source-id").asInt
                val transform = fs0.get(i).path("transform").asText
                nameOfId.get(srcId).filter(rows.columns.contains)
                  .filter(c => IcebergTransforms.resultType(transform,
                    rows.schema(c).dataType).isDefined)
                  .map(c => (c, transform))
              }
              if (fields.forall(_.isDefined)) Some(fields.map(_.get))
              else None
            }
        case _ => None
      }
    }
    val nOut = math.max(1,
      math.ceil(dirtyFiles.map(_._2).sum.toDouble / targetFileSizeBytes).toInt)
    val rewriteResultDts: Seq[DataType] = rewriteSpec.toSeq.flatten.map {
      case (c, t) => IcebergTransforms.resultType(t, rows.schema(c).dataType).get
    }
    // files-of-partition-value-tuple staging (None key = unpartitioned)
    val stagedByValue: Seq[(Option[Seq[Option[Any]]], Seq[(Path, Long)])] =
      rewriteSpec match {
        case None =>
          val staging = new Path(root,
            s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
          withFieldIds(rows, idsByName ++ lineageIds(rows)).repartition(nOut)
            .write.parquet(staging.toString)
          val files = f.listStatus(staging)
            .filter(_.getPath.getName.endsWith(".parquet"))
            .map { st =>
              val dst = new Path(root, s"data/${java.util.UUID.randomUUID()}.parquet")
              require(f.rename(st.getPath, dst), s"rename ${st.getPath} failed")
              (dst, f.getFileStatus(dst).getLen)
            }.toSeq
          f.delete(staging, true)
          Seq((None, files))
        case Some(fields) =>
          stagePartitioned(spark, f, root,
            withFieldIds(rows, idsByName ++ lineageIds(rows)),
            fields, rewriteResultDts)
            .map { case (vals, files) =>
              (Some(vals): Option[Seq[Option[Any]]], files) }
      }
    val staged = stagedByValue.flatMap(_._2)
    val stats =
      if (staged.isEmpty) Map.empty[String, (Long, Map[Int, (Array[Byte], Array[Byte])])]
      else allFileStats(spark, staged.map(_._1.toString), idsByName)
    stagedByValue.flatMap(_._2).foreach { case (p, _) =>
      if (!stats.contains(canonPath(p.toString))) f.delete(p, false)
    }

    val snapshotId = freshSnapshotId(f, root, v0)
    val seqNo = m0.path("last-sequence-number").asLong(0L) + 1L
    // lineage: rewritten files still get fresh first_row_id ranges
    // (cheap, keeps the every-file-has-a-range invariant); their
    // MATERIALIZED _row_id values win at read, so identities hold
    val lin0 = nextRowIdOf(Some(m0))
    var rowIdW = lin0.getOrElse(0L)
    // carried list: clean manifests verbatim; partially-dirty ones
    // swap to an EXISTING-entry replacement keeping original seqs +
    // the original summary bytes (over-approximate bounds stay SAFE
    // for pruning — false positives only)
    val carried = Seq.newBuilder[(String, Long, Int, Long, Int, Long, AnyRef)]
    val freshManifests = Seq.newBuilder[NewManifest]
    def manTuple(r: GenericRecord, path: String, len: Long):
        (String, Long, Int, Long, Int, Long, AnyRef) =
      (path, len, gInt(r, "content", 0), gLong(r, "sequence_number", 0L),
        gInt(r, "partition_spec_id", 0), gLong(r, "added_snapshot_id", curId),
        Option(r.getSchema.getField("partitions"))
          .flatMap(_ => Option(r.get("partitions"))).orNull)
    dataMans.foreach { man =>
      val live = liveEntries(man)
      val (dirtyE, cleanE) =
        live.partition(isDirty(_, gLong(man.rec, "sequence_number", 0L)))
      if (dirtyE.isEmpty)
        carried += manTuple(man.rec, gStr(man.rec, "manifest_path"),
          gLong(man.rec, "manifest_length", 0L))
      else if (cleanE.nonEmpty) {
        val manSeq = gLong(man.rec, "sequence_number", 0L)
        val entries = cleanE.map { e =>
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          IcebergFormat.entry(0, gStr(df, "file_path"),
            gLong(df, "record_count", 0L), gLong(df, "file_size_in_bytes", 0L),
            gLong(e, "snapshot_id", curId), gLong(e, "sequence_number", manSeq),
            bounds = entryBounds(df), status = 0,
            sortOrderId = Option(df.getSchema.getField("sort_order_id"))
              .flatMap(_ => Option(df.get("sort_order_id")))
              .map(_.asInstanceOf[Number].intValue),
            // lineage: a clean file's id range carries VERBATIM
            firstRowId = Option(df.getSchema.getField("first_row_id"))
              .flatMap(_ => Option(df.get("first_row_id")))
              .map(_.asInstanceOf[Number].longValue))
        }
        val mp = new Path(root,
          s"metadata/manifest-$snapshotId-x${java.util.UUID.randomUUID().toString.take(8)}.avro")
        IcebergFormat.writeAvro(f, mp, IcebergFormat.EntrySchema, entries)
        carried += ((mp.toString, f.getFileStatus(mp).getLen, 0, manSeq,
          gInt(man.rec, "partition_spec_id", 0), snapshotId,
          Option(man.rec.getSchema.getField("partitions"))
            .flatMap(_ => Option(man.rec.get("partitions"))).orNull))
      } // fully-dirty manifest: drops (its rows live in the rewrite)
    }
    val newFiles = staged.filter(p => stats.contains(canonPath(p._1.toString)))
    stagedByValue.zipWithIndex.foreach { case ((valueOpt, files), i) =>
      val live = files.filter(p => stats.contains(canonPath(p._1.toString)))
      if (live.nonEmpty) {
        val entries = live.map { case (p, size) =>
          val (nRows, bounds) = stats(canonPath(p.toString))
          val fr = lin0.map { _ => val v = rowIdW; rowIdW += nRows; v }
          IcebergFormat.entry(0, p.toString, nRows, size, snapshotId, seqNo,
            bounds = bounds, firstRowId = fr)
        }
        val mp = new Path(root,
          s"metadata/manifest-$snapshotId-$i-${java.util.UUID.randomUUID().toString.take(8)}.avro")
        IcebergFormat.writeAvro(f, mp, IcebergFormat.EntrySchema, entries)
        freshManifests += (valueOpt match {
          case None => NewManifest(mp, partitioned = false, None,
            entries = entries)
          case Some(vals) => NewManifest(mp, partitioned = true,
            Some(summariesOf(vals, rewriteResultDts)), entries = entries)
        })
      }
    }
    try {
      onBeforeCommit()
      val snap = commitMeta(spark, f, root, v0, StructType(Nil), snapshotId,
        seqNo, freshManifests.result(), replace = false,
        operation = Some("replace"), priorOverride = Some(carried.result()),
        partSpec = rewriteSpec.map(fields => SpecReq(fields.map {
          case (c, t) => (specFieldName(c, t), idsByName(c), t) })),
        nextRowId = lin0.map(_ => rowIdW))
      (snap, dirtyFiles.length, deleteFilesFolded)
    } catch {
      case _: java.util.ConcurrentModificationException =>
        newFiles.foreach { case (p, _) => f.delete(p, false) }
        throw new IllegalStateException(
          s"compaction of $dir raced a concurrent commit — its carried " +
          "manifest set no longer reflects the head; re-run the compaction")
    }
  }

  /** Z-ORDER rewrite for native Iceberg tables — the Iceberg twin of
    * [[DeltaInterop.optimizeZOrder]] (SQL: `OPTIMIZE iceberg.`p``
    * ZORDER BY (c, ...)`): the ENTIRE live row set rewrites clustered
    * by the interleaved rank key ([[graft.functions.ZOrder.layoutKey]]
    * — ONE range exchange + in-partition sort, the same single shuffle
    * a linear re-sort pays), folding every live delete file / DV in
    * the same pass, committed as ONE `replace` snapshot. File min/max
    * bounds land TIGHT on every z dimension, so range reads on ANY
    * clustered column prune through the existing manifest-bound
    * skipping — the multi-dimensional layout a linear sort only gives
    * its leading column. Unpartitioned tables only (a partitioned
    * table's coarse layout belongs to its spec; z-order within
    * partitions would recluster per partition). Lineage tables
    * rewrite with both lineage columns materialized (the [[compact]]
    * contract). Returns (snapshotId, filesRewritten, filesWritten). */
  def optimizeZOrder(spark: SparkSession, dir: String, zCols: Seq[String],
                     targetFileSizeBytes: Long = 128L << 20): (Long, Int, Int) = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.col
    require(zCols.nonEmpty, "zCols must be non-empty")
    val f = fs(spark, dir)
    val root = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val v0 = currentVersion(f, root)
    require(v0 > 0, s"$dir has no snapshots to z-order")
    val m0 = readMeta(f, root, v0).get
    val curId = m0.path("current-snapshot-id").asLong(-1L)
    val snapNode = m0.path("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong(-2L) == curId)
      .getOrElse(return (curId, 0, 0))
    val listRecs = IcebergFormat.readAvro(conf,
      new Path(resolveU(snapNode.path("manifest-list").asText)))
    require(listRecs.forall(r => gInt(r, "partition_spec_id", 0) == 0),
      s"optimizeZOrder of the PARTITIONED table at $dir is not supported " +
      "(the partition spec owns the coarse layout)")
    val liveData: Seq[(String, Long)] = graft.pipeline.Par.map(
      listRecs.filter(r => gInt(r, "content", 0) == 0)) { r =>
        IcebergFormat.readAvro(conf, new Path(resolveU(gStr(r, "manifest_path"))))
          .filter(e => gInt(e, "status", 0) != 2)
          .map { e =>
            val df = e.get("data_file").asInstanceOf[GenericRecord]
            (resolveU(gStr(df, "file_path")), gLong(df, "file_size_in_bytes", 0L))
          }
      }.flatten
    if (liveData.isEmpty) return (curId, 0, 0)
    val idsByName = currentFieldIds(m0).toMap
    zCols.foreach(c => require(idsByName.contains(c),
      s"unknown zorder column $c (table has ${idsByName.keys.mkString(",")})"))
    val lineageOn = nextRowIdOf(Some(m0)).isDefined
    val rows = IcebergInterop.readIceberg(spark, dir, withLineage = lineageOn)
    val zKey = graft.functions.ZOrder.layoutKey(rows, zCols)
    val nOut = math.max(1,
      math.ceil(liveData.map(_._2).sum.toDouble / targetFileSizeBytes).toInt)
    val clustered = rows.withColumn("_graft_z", zKey)
      .repartitionByRange(nOut, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
    val staging = new Path(root,
      s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    withFieldIds(clustered, idsByName ++ lineageIds(rows))
      .write.parquet(staging.toString)
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
    val live = staged.filter(p => stats.contains(canonPath(p._1.toString)))
    staged.filterNot(p => stats.contains(canonPath(p._1.toString)))
      .foreach { case (p, _) => f.delete(p, false) }
    val snapshotId = freshSnapshotId(f, root, v0)
    val seqNo = m0.path("last-sequence-number").asLong(0L) + 1L
    val lin0 = nextRowIdOf(Some(m0))
    var rowIdW = lin0.getOrElse(0L)
    val entries = live.map { case (p, size) =>
      val (nRows, bounds) = stats(canonPath(p.toString))
      val fr = lin0.map { _ => val v = rowIdW; rowIdW += nRows; v }
      IcebergFormat.entry(0, p.toString, nRows, size, snapshotId, seqNo,
        bounds = bounds, firstRowId = fr)
    }
    val mp = new Path(root,
      s"metadata/manifest-$snapshotId-z${java.util.UUID.randomUUID().toString.take(8)}.avro")
    IcebergFormat.writeAvro(f, mp, IcebergFormat.EntrySchema, entries)
    try {
      onBeforeCommit()
      val snap = commitMeta(spark, f, root, v0, StructType(Nil), snapshotId,
        seqNo, Seq(NewManifest(mp, partitioned = false, None,
          entries = entries)),
        replace = false, operation = Some("replace"),
        priorOverride = Some(Nil), // every prior manifest folds away
        nextRowId = lin0.map(_ => rowIdW))
      (snap, liveData.length, live.length)
    } catch {
      case _: java.util.ConcurrentModificationException =>
        (live.map(_._1) :+ mp).foreach(p => f.delete(p, false))
        throw new IllegalStateException(
          s"optimizeZOrder on $dir raced a concurrent commit — re-run")
    }
  }

  /** Iceberg primitive name → the Spark type of a partition-field
    * RESULT (the types field summaries serialize) — None for anything
    * we will not byte-decode (no merge rather than a wrong merge). */
  private def resultTypeOfName(name: String): Option[DataType] = name match {
    case "int" | "date" => Some(IntegerType)
    case "long" => Some(LongType)
    case "string" => Some(StringType)
    case "timestamp" => Some(TimestampNTZType)
    case "timestamptz" => Some(TimestampType)
    case _ => None
  }

  /** The RESULT types of `specId`'s partition fields (year/month/day/
    * hour/bucket → int; identity/truncate → the source column's type,
    * resolved by field id across every schema). None when any field's
    * type cannot be resolved — callers skip the summary merge. */
  private def specResultTypes(m: JsonNode, specId: Int): Option[Seq[DataType]] = {
    import scala.jdk.CollectionConverters._
    val typeOfId: Map[Int, String] =
      (if (m.has("schemas")) m.path("schemas").elements().asScala.toSeq
       else Seq(m.path("schema")))
        .flatMap(_.path("fields").elements().asScala.map(fd =>
          fd.path("id").asInt -> fd.path("type").asText)).toMap
    m.path("partition-specs").elements().asScala
      .find(_.path("spec-id").asInt(-1) == specId)
      .map { s0 =>
        s0.path("fields").elements().asScala.toSeq.map { fd =>
          val transform = fd.path("transform").asText
          for {
            srcName <- typeOfId.get(fd.path("source-id").asInt)
            srcDt <- resultTypeOfName(srcName)
            dt <- IcebergTransforms.resultType(transform, srcDt)
          } yield dt
        }
      }
      .filter(_.forall(_.isDefined)).map(_.map(_.get))
  }

  /** Spec single-value bound comparison by result type (little-endian
    * ints/longs; UTF-8 strings lexically). */
  private[io] def cmpBound(dt: DataType, a: Array[Byte], b: Array[Byte]): Int = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(x: Array[Byte]) = ByteBuffer.wrap(x).order(ByteOrder.LITTLE_ENDIAN)
    dt match {
      case IntegerType | DateType => Integer.compare(le(a).getInt, le(b).getInt)
      case LongType | TimestampType | TimestampNTZType =>
        java.lang.Long.compare(le(a).getLong, le(b).getLong)
      case FloatType => java.lang.Float.compare(le(a).getFloat, le(b).getFloat)
      case DoubleType => java.lang.Double.compare(le(a).getDouble, le(b).getDouble)
      // strings/binary: UNSIGNED UTF-8 byte order — the order the
      // bounds were min/max'd in (UTF8String) and the order the read
      // side prunes with (Arrays.compareUnsigned); String.compareTo
      // would invert supplementary characters against U+FFFF
      case _ => java.util.Arrays.compareUnsigned(a, b)
    }
  }

  /** MANIFEST-MERGE maintenance — Iceberg's `rewrite_manifests`: the
    * missing half of keeping an append-heavy table's METADATA bounded.
    * Every [[appendOnce]] micro-batch adds one manifest to the current
    * snapshot's manifest list; [[compact]] rewrites small/deleted DATA
    * but carries clean manifests verbatim, so a sink whose files are
    * already target-sized grows its manifest list without bound — and
    * every read's planning walk grows with it. This bin-packs the
    * LIST: manifests of the same content kind and partition spec merge
    * into consolidated manifests of ~`targetEntriesPerManifest` live
    * entries, committed as ONE metadata-only snapshot
    * (operation=`replace`, ZERO data-file work).
    *
    * Invariants: merged entries become EXISTING (status 0) keeping
    * their original per-entry `snapshot_id` and `sequence_number`
    * VERBATIM (the incremental-tailer contract — "files added by
    * snapshot S" resolves through S's own manifest list, which this
    * commit never touches, and the rewrite snapshot itself adds only
    * status-0 entries, which tailers skip); partitioned manifests get
    * a MERGED field summary (contains_null ORs, bounds min/max by the
    * spec's typed byte comparison) so manifest-level skipping
    * survives, and groups whose summary types cannot be decoded carry
    * verbatim rather than merge wrong. Delete manifests merge within
    * their own kind; per-field foreign stats outside graft's manifest
    * schema (value_counts etc.) do not survive a merge, so foreign
    * manifests carrying them merge at the cost of those extra stats —
    * bounds, equality ids, and DV refs all carry.
    * Returns (snapshotId, manifestsMergedAway, manifestsAfter) —
    * (currentSnapshot, 0, n) when the list is already packed. */
  def rewriteManifests(spark: SparkSession, dir: String,
                       targetEntriesPerManifest: Int = 2048): (Long, Int, Int) = {
    import scala.jdk.CollectionConverters._
    require(targetEntriesPerManifest > 0, "targetEntriesPerManifest must be positive")
    val f = fs(spark, dir)
    val root = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val v0 = currentVersion(f, root)
    require(v0 > 0, s"$dir has no snapshots to rewrite manifests for")
    val m0 = readMeta(f, root, v0).get
    val curId = m0.path("current-snapshot-id").asLong(-1L)
    val snapNode = m0.path("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong(-2L) == curId)
      .getOrElse(return (curId, 0, 0))
    val listRecs = IcebergFormat.readAvro(conf,
      new Path(resolveU(snapNode.path("manifest-list").asText)))
    if (listRecs.lengthCompare(2) < 0) return (curId, 0, listRecs.length)
    final case class Man(rec: GenericRecord, content: Int, specId: Int,
                         entries: Seq[GenericRecord])
    val mans = graft.pipeline.Par.map(listRecs) { r =>
      Man(r, gInt(r, "content", 0), gInt(r, "partition_spec_id", 0),
        IcebergFormat.readAvro(conf, new Path(resolveU(gStr(r, "manifest_path")))))
    }
    def liveOf(m: Man): Seq[GenericRecord] =
      m.entries.filter(e => gInt(e, "status", 0) != 2)

    val snapshotId = freshSnapshotId(f, root, v0)
    // metadata-only: the sequence number does NOT advance (no data
    // changed) — Iceberg stamps rewrites with a fresh sequence too,
    // but entries keep their own, which is all the read side uses
    val seqNo = m0.path("last-sequence-number").asLong(0L) + 1L
    val FS = IcebergFormat.ManifestFileSchema
      .getField("partitions").schema().getTypes.get(1)

    var mergedAway = 0
    val outList = Seq.newBuilder[(String, Long, Int, Long, Int, Long, AnyRef)]
    def verbatim(m: Man): Unit =
      outList += ((gStr(m.rec, "manifest_path"),
        gLong(m.rec, "manifest_length", 0L), m.content,
        gLong(m.rec, "sequence_number", 0L), m.specId,
        gLong(m.rec, "added_snapshot_id", curId),
        Option(m.rec.getSchema.getField("partitions"))
          .flatMap(_ => Option(m.rec.get("partitions"))).orNull))

    // stable grouping: (content kind, spec id) — merging across specs
    // would need partition-tuple re-derivation; across kinds is invalid
    val groups = mans.zipWithIndex.groupBy { case (m, _) => (m.content, m.specId) }
      .toSeq.sortBy(_._2.head._2)
    groups.foreach { case ((content, specId), members0) =>
      val members = members0.map(_._1)
      // bin-pack in list order; a bin of ONE carries verbatim
      val bins = Seq.newBuilder[Seq[Man]]
      var bin = Seq.newBuilder[Man]; var n = 0; var binSize = 0
      members.foreach { m =>
        val live = liveOf(m).length
        if (binSize > 0 && n + live > targetEntriesPerManifest) {
          bins += bin.result(); bin = Seq.newBuilder[Man]; n = 0; binSize = 0
        }
        bin += m; n += live; binSize += 1
      }
      if (binSize > 0) bins += bin.result()
      // summary-merge types (None ⇒ partitioned group merges lose no
      // skipping because we refuse to merge it at all)
      val sumTypes: Option[Seq[DataType]] =
        if (specId == 0) Some(Nil) else specResultTypes(m0, specId)
      bins.result().foreach { b =>
        if (b.lengthCompare(1) <= 0 || (specId != 0 && sumTypes.isEmpty)) {
          b.foreach(verbatim)
        } else {
          mergedAway += b.length - 1
          val entries = b.flatMap { m =>
            val manSeq = gLong(m.rec, "sequence_number", 0L)
            val manSnap = gLong(m.rec, "added_snapshot_id", curId)
            liveOf(m).map { e =>
              val df = e.get("data_file").asInstanceOf[GenericRecord]
              val off = Option(df.getSchema.getField("content_offset"))
                .flatMap(_ => Option(df.get("content_offset")))
                .map(_.asInstanceOf[Number].longValue)
              val refFile = Option(df.getSchema.getField("referenced_data_file"))
                .flatMap(_ => Option(df.get("referenced_data_file"))).map(_.toString)
              IcebergFormat.entry(
                gInt(df, "content", 0), gStr(df, "file_path"),
                gLong(df, "record_count", 0L), gLong(df, "file_size_in_bytes", 0L),
                gLong(e, "snapshot_id", manSnap),      // ORIGINAL snapshot
                gLong(e, "sequence_number", manSeq),    // ORIGINAL sequence
                equalityIds = Option(df.getSchema.getField("equality_ids"))
                  .flatMap(_ => Option(df.get("equality_ids")))
                  .map(_.asInstanceOf[java.util.List[_]].asScala
                    .map(_.asInstanceOf[Number].intValue).toSeq).getOrElse(Nil),
                bounds = entryBounds(df),
                fileFormat = gStr(df, "file_format"),
                dvRef = off.map(o => (refFile.get, o,
                  gLong(df, "content_size_in_bytes", 0L))),
                referencedDataFile = if (off.isEmpty) refFile else None,
                firstRowId = Option(df.getSchema.getField("first_row_id"))
                  .flatMap(_ => Option(df.get("first_row_id")))
                  .map(_.asInstanceOf[Number].longValue),
                status = 0,
                sortOrderId = Option(df.getSchema.getField("sort_order_id"))
                  .flatMap(_ => Option(df.get("sort_order_id")))
                  .map(_.asInstanceOf[Number].intValue))
            }
          }
          val mp = new Path(root,
            s"metadata/manifest-$snapshotId-m${java.util.UUID.randomUUID().toString.take(8)}.avro")
          IcebergFormat.writeAvro(f, mp, IcebergFormat.EntrySchema, entries)
          // merged field summary: element-wise contains_null OR,
          // lower min / upper max by typed byte comparison; a member
          // without bounds (null partition) contributes no bounds
          val parts: AnyRef =
            if (specId == 0) null
            else {
              val types = sumTypes.get
              // None = the member carries NO field summary at all
              // (spec-optional): its files could hold ANY value, so
              // the merged field must emit NO bounds (and a
              // conservative contains_null) or pruning would wrongly
              // drop the merged manifest
              val perMan: Seq[Option[Seq[(Boolean, Option[Array[Byte]], Option[Array[Byte]])]]] =
                b.map { m =>
                  Option(m.rec.getSchema.getField("partitions"))
                    .flatMap(_ => Option(m.rec.get("partitions"))).map {
                      _.asInstanceOf[java.util.List[_]].asScala.map { s0 =>
                        val r = s0.asInstanceOf[GenericRecord]
                        def byteOf(fd: String): Option[Array[Byte]] =
                          Option(r.get(fd)).map { bb0 =>
                            val bb = bb0.asInstanceOf[java.nio.ByteBuffer].duplicate()
                            val out = new Array[Byte](bb.remaining()); bb.get(out); out
                          }
                        (Option(r.get("contains_null")).exists(_.asInstanceOf[Boolean]),
                          byteOf("lower_bound"), byteOf("upper_bound"))
                      }.toSeq
                    }
                }
              val anyMissing = perMan.exists(_.isEmpty)
              val arr = new org.apache.avro.generic.GenericData.Array[GenericRecord](
                types.length, FS)
              types.zipWithIndex.foreach { case (dt, i) =>
                val col0 = perMan.flatten.map(s0 =>
                  if (i < s0.length) s0(i) else (true, None, None))
                val rec = new org.apache.avro.generic.GenericData.Record(FS.getElementType)
                rec.put("contains_null", anyMissing || col0.exists(_._1))
                // bounds are only SAFE when every member is covered:
                // either it has both bounds, or it is a null-only
                // summary (contains_null, no values to bound). A
                // member with VALUES but no bounds (contains_null
                // false, bounds absent — spec-legal) poisons the
                // field: emit no bounds, the merged manifest stays
                // unprunable rather than wrongly prunable.
                val nullOnly = (t: (Boolean, Option[Array[Byte]], Option[Array[Byte]])) =>
                  t._1 && t._2.isEmpty && t._3.isEmpty
                val bounded = col0.filter(t => t._2.isDefined && t._3.isDefined)
                val safe = !anyMissing &&
                  col0.forall(t => nullOnly(t) || (t._2.isDefined && t._3.isDefined))
                if (safe && bounded.nonEmpty) {
                  rec.put("lower_bound", java.nio.ByteBuffer.wrap(
                    bounded.map(_._2.get)
                      .reduce((a, x) => if (cmpBound(dt, x, a) < 0) x else a)))
                  rec.put("upper_bound", java.nio.ByteBuffer.wrap(
                    bounded.map(_._3.get)
                      .reduce((a, x) => if (cmpBound(dt, x, a) > 0) x else a)))
                }
                arr.add(rec)
              }
              arr
            }
          outList += ((mp.toString, f.getFileStatus(mp).getLen, content,
            b.map(m => gLong(m.rec, "sequence_number", 0L)).max,
            specId, snapshotId, parts))
        }
      }
    }
    if (mergedAway == 0) return (curId, 0, listRecs.length)
    val out = outList.result()
    try {
      onBeforeCommit()
      val snap = commitMeta(spark, f, root, v0, StructType(Nil), snapshotId,
        seqNo, Nil, replace = false, operation = Some("replace"),
        priorOverride = Some(out))
      (snap, mergedAway, out.length)
    } catch {
      case _: java.util.ConcurrentModificationException =>
        out.filter(_._6 == snapshotId).foreach { case (p, _, _, _, _, _, _) =>
          f.delete(new Path(p), false)
        }
        throw new IllegalStateException(
          s"rewriteManifests on $dir raced a concurrent commit — its " +
          "merged manifest set no longer reflects the head; re-run")
    }
  }

  /** REWRITE POSITION DELETES — Iceberg's `rewrite_position_deletes`
    * maintenance: consolidate a merge-on-read-heavy table's
    * ACCUMULATED delete files WITHOUT touching any data file. Live
    * deletion vectors (the max-sequence DV per referenced data file —
    * superseded blobs drop) re-emit as ONE Puffin; live
    * position-delete parquet rows fold into ONE spec-shaped file;
    * equality-delete entries carry into the new delete manifest
    * verbatim. Every consolidated entry is EXISTING (status 0) with
    * its ORIGINAL `snapshot_id`/`sequence_number` preserved — DV
    * entries each keep their own pair; merged position rows take the
    * max-sequence contributor's (sound: positional deletes name exact
    * (file, pos) coordinates, and every named file's sequence was
    * already ≤ its original delete's) — so masked reads are
    * bit-identical, incremental tailers skip the snapshot (the
    * rewrite-manifests contract), and the changelog stays silent
    * (`replace`). Data manifests carry verbatim; ONE metadata commit.
    * The long-run answer for the upsert sink's per-batch delete files
    * that [[compact]]'s full data rewrite was previously the only
    * maintenance for. Returns (snapshotId, deleteFilesBefore,
    * deleteFilesAfter) — (currentSnapshot, n, n) when there is
    * nothing to consolidate. */
  def rewritePositionDeletes(spark: SparkSession, dir: String)
      : (Long, Int, Int) = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.col
    val f = fs(spark, dir)
    val root = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val v0 = currentVersion(f, root)
    require(v0 > 0, s"$dir has no snapshots to rewrite deletes for")
    val m0 = readMeta(f, root, v0).get
    val curId = m0.path("current-snapshot-id").asLong(-1L)
    val snapNode = m0.path("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong(-2L) == curId)
      .getOrElse(return (curId, 0, 0))
    val listRecs = IcebergFormat.readAvro(conf,
      new Path(resolveU(snapNode.path("manifest-list").asText)))
    val (delMans, dataMans) = listRecs.partition(r => gInt(r, "content", 0) != 0)
    if (delMans.isEmpty) return (curId, 0, 0)
    // graft writes every delete manifest under the empty spec 0; a
    // FOREIGN partition-scoped delete manifest would be misdeclared by
    // a spec-0 consolidation — refuse by name rather than emit
    // metadata another reader mis-scopes
    delMans.find(r => gInt(r, "partition_spec_id", 0) != 0).foreach { r =>
      throw new IllegalArgumentException(
        s"rewritePositionDeletes: delete manifest ${gStr(r, "manifest_path")} " +
        s"declares partition spec ${gInt(r, "partition_spec_id", 0)} — " +
        "partition-scoped foreign delete layouts are not consolidated; " +
        "compact the table instead")
    }
    // live delete entries with their ORIGINAL (snapshot, sequence)
    final case class DelEntry(df: GenericRecord, snap: Long, seq: Long)
    val live: Seq[DelEntry] = graft.pipeline.Par.map(delMans) { r =>
      val manSeq = gLong(r, "sequence_number", 0L)
      val manSnap = gLong(r, "added_snapshot_id", curId)
      IcebergFormat.readAvro(conf, new Path(resolveU(gStr(r, "manifest_path"))))
        .filter(e => gInt(e, "status", 0) != 2)
        .map(e => DelEntry(e.get("data_file").asInstanceOf[GenericRecord],
          gLong(e, "snapshot_id", manSnap), gLong(e, "sequence_number", manSeq)))
    }.flatten
    def isDv(df: GenericRecord): Boolean =
      Option(df.getSchema.getField("content_offset"))
        .flatMap(_ => Option(df.get("content_offset"))).isDefined
    val (dvs0, rest) = live.partition(e => isDv(e.df))
    val (eqs, poss) = rest.partition(e => gInt(e.df, "content", 0) == 2)
    // live DV per referenced file: the max-sequence entry wins
    val dvLive: Seq[DelEntry] = dvs0
      .groupBy(e => canonPath(resolveU(gStr(e.df, "referenced_data_file"))))
      .values.map(_.maxBy(_.seq)).toSeq
      .sortBy(e => gStr(e.df, "referenced_data_file"))
    val posFiles = poss.map(e => resolveU(gStr(e.df, "file_path"))).distinct
    val dvPuffins = dvs0.map(e => resolveU(gStr(e.df, "file_path"))).distinct
    val eqFiles = eqs.map(e => resolveU(gStr(e.df, "file_path"))).distinct
    val before = posFiles.length + dvPuffins.length + eqFiles.length
    // nothing to fold: at most one physical file per consolidatable kind
    if (posFiles.length <= 1 && dvPuffins.length <= 1 &&
        dvLive.length == dvs0.length)
      return (curId, before, before)

    val snapshotId = freshSnapshotId(f, root, v0)
    val seqNo = m0.path("last-sequence-number").asLong(0L) + 1L
    val entries = Seq.newBuilder[GenericRecord]
    val newFiles = Seq.newBuilder[Path]
    // ONE consolidated Puffin of every live DV blob, original ids kept
    if (dvLive.nonEmpty) {
      val blobs: Seq[(String, Array[Byte], Long)] = dvLive.map { e =>
        val bytes = IcebergFormat.readPuffinDvBytes(conf,
          new Path(resolveU(gStr(e.df, "file_path"))),
          gLong(e.df, "content_offset", -1L),
          gLong(e.df, "content_size_in_bytes", -1L))
        (gStr(e.df, "referenced_data_file"), bytes,
          gLong(e.df, "record_count", 0L))
      }
      val puffinP = new Path(root, s"data/dv-${java.util.UUID.randomUUID()}.puffin")
      val refs = IcebergFormat.writePuffinDvBlobs(f, puffinP, blobs)
      newFiles += puffinP
      val puffinLen = f.getFileStatus(puffinP).getLen
      val byRef = dvLive.map(e => gStr(e.df, "referenced_data_file") -> e).toMap
      refs.foreach { case (rf, off, size) =>
        val e = byRef(rf)
        entries += IcebergFormat.entry(1, puffinP.toString,
          gLong(e.df, "record_count", 0L), puffinLen, e.snap, e.seq,
          fileFormat = "PUFFIN", dvRef = Some((rf, off, size)), status = 0)
      }
    }
    // ONE consolidated position-delete parquet (max contributor's ids)
    if (posFiles.nonEmpty) {
      val rows = spark.read.parquet(posFiles: _*)
        .select(
          col("file_path").as("file_path", new MetadataBuilder()
            .putLong("parquet.field.id", 2147483546L).build()),
          col("pos").cast(LongType).as("pos", new MetadataBuilder()
            .putLong("parquet.field.id", 2147483545L).build()))
        .distinct()
      spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
      val staging = new Path(root,
        s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
      rows.coalesce(1).write.parquet(staging.toString)
      val part = f.listStatus(staging)
        .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
      val dst = new Path(root, s"data/delete-${java.util.UUID.randomUUID()}.parquet")
      require(f.rename(part, dst), s"rename $part failed")
      f.delete(staging, true)
      newFiles += dst
      val n = footerRowCounts(spark, Seq(dst.toString))
        .getOrElse(canonPath(dst.toString), 0L)
      val top = poss.maxBy(_.seq)
      entries += IcebergFormat.entry(1, dst.toString, n,
        f.getFileStatus(dst).getLen, top.snap, top.seq, status = 0)
    }
    // equality deletes carry verbatim (their sequence SEMANTICS forbid
    // merging — raising a seq would widen what they mask)
    eqs.foreach { e =>
      entries += IcebergFormat.entry(2, gStr(e.df, "file_path"),
        gLong(e.df, "record_count", 0L), gLong(e.df, "file_size_in_bytes", 0L),
        e.snap, e.seq,
        equalityIds = Option(e.df.getSchema.getField("equality_ids"))
          .flatMap(_ => Option(e.df.get("equality_ids")))
          .map(_.asInstanceOf[java.util.List[_]].asScala
            .map(_.asInstanceOf[Number].intValue).toSeq).getOrElse(Nil),
        bounds = entryBounds(e.df), status = 0)
    }
    val mp = new Path(root,
      s"metadata/delete-manifest-$snapshotId-${java.util.UUID.randomUUID().toString.take(8)}.avro")
    IcebergFormat.writeAvro(f, mp, IcebergFormat.EntrySchema, entries.result())
    val outList: Seq[(String, Long, Int, Long, Int, Long, AnyRef)] =
      dataMans.map(r => (gStr(r, "manifest_path"),
        gLong(r, "manifest_length", 0L), 0,
        gLong(r, "sequence_number", 0L), gInt(r, "partition_spec_id", 0),
        gLong(r, "added_snapshot_id", curId),
        Option(r.getSchema.getField("partitions"))
          .flatMap(_ => Option(r.get("partitions"))).orNull)) :+
      ((mp.toString, f.getFileStatus(mp).getLen, 1,
        delMans.map(r => gLong(r, "sequence_number", 0L)).max, 0,
        snapshotId, null: AnyRef))
    try {
      onBeforeCommit()
      val snap = commitMeta(spark, f, root, v0, StructType(Nil), snapshotId,
        seqNo, Nil, replace = false, operation = Some("replace"),
        priorOverride = Some(outList),
        minFormatVersion = if (dvLive.nonEmpty) 3 else 0)
      val after = (if (dvLive.nonEmpty) 1 else 0) +
        (if (posFiles.nonEmpty) 1 else 0) + eqFiles.length
      (snap, before, after)
    } catch {
      case _: java.util.ConcurrentModificationException =>
        f.delete(mp, false)
        newFiles.result().foreach(p => f.delete(p, false))
        throw new IllegalStateException(
          s"rewritePositionDeletes on $dir raced a concurrent commit — " +
          "its consolidated delete set no longer reflects the head; re-run")
    }
  }

  /** Turn v3 ROW LINEAGE ON for an EXISTING table — metadata-only
    * (zero data-file work): every live data manifest rewrites 1:1 with
    * a `first_row_id` range stamped per entry (one running watermark
    * in manifest-list order), delete manifests carry verbatim, and the
    * commit sets `next-row-id` and upgrades the format to v3. From
    * here every append / update / merge / compaction maintains the
    * watermark ([[appendLineage]] is the creation-time twin). Existing
    * rows get their ids NOW — first_row_id + position — and keep them
    * through later rewrites (materialize-on-rewrite). Idempotent.
    * Returns the committed snapshot id. */
  def enableRowLineage(spark: SparkSession, dir: String): Long = {
    import scala.jdk.CollectionConverters._
    val f = fs(spark, dir)
    val root = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val v0 = currentVersion(f, root)
    require(v0 > 0, s"$dir has no snapshots to enable row lineage on")
    val m0 = readMeta(f, root, v0).get
    if (nextRowIdOf(Some(m0)).isDefined)
      return m0.path("current-snapshot-id").asLong(-1L) // already on
    val curId = m0.path("current-snapshot-id").asLong(-1L)
    val snapNode = m0.path("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong(-2L) == curId)
    val snapshotId = freshSnapshotId(f, root, v0)
    val seqNo = m0.path("last-sequence-number").asLong(0L) + 1L
    var rowIdW = 0L
    val outList = Seq.newBuilder[(String, Long, Int, Long, Int, Long, AnyRef)]
    snapNode.toSeq.flatMap(s0 => IcebergFormat.readAvro(conf,
      new Path(resolveU(s0.path("manifest-list").asText)))).foreach { r =>
      val content = gInt(r, "content", 0)
      val parts: AnyRef = Option(r.getSchema.getField("partitions"))
        .flatMap(_ => Option(r.get("partitions"))).orNull
      if (content != 0)
        outList += ((gStr(r, "manifest_path"),
          gLong(r, "manifest_length", 0L), content,
          gLong(r, "sequence_number", 0L), gInt(r, "partition_spec_id", 0),
          gLong(r, "added_snapshot_id", curId), parts)) // deletes: verbatim
      else {
        val manSeq = gLong(r, "sequence_number", 0L)
        val manSnap = gLong(r, "added_snapshot_id", curId)
        val live = IcebergFormat.readAvro(conf,
          new Path(resolveU(gStr(r, "manifest_path"))))
          .filter(e => gInt(e, "status", 0) != 2)
        // each entry carries through VERBATIM (a foreign writer's
        // partition tuple / value counts / split offsets survive) —
        // only status, the pinned originals, and first_row_id change
        val outSchema =
          if (live.isEmpty) IcebergFormat.EntrySchema
          else IcebergFormat.lineageEntrySchema(live.head.getSchema)
        val dfSchema = outSchema.getField("data_file").schema()
        val entries = live.map { e =>
          val df0 = e.get("data_file").asInstanceOf[GenericRecord]
          val rows = gLong(df0, "record_count", 0L)
          val fr = { val v = rowIdW; rowIdW += rows; v }
          val ne = IcebergFormat.recordTo(outSchema, e)
          ne.put("status", 0)
          ne.put("snapshot_id", gLong(e, "snapshot_id", manSnap))    // ORIGINAL
          ne.put("sequence_number", gLong(e, "sequence_number", manSeq))
          val df = IcebergFormat.recordTo(dfSchema, df0)
          df.put("first_row_id", fr)
          ne.put("data_file", df)
          ne
        }
        val mp = new Path(root,
          s"metadata/manifest-$snapshotId-l${java.util.UUID.randomUUID().toString.take(8)}.avro")
        IcebergFormat.writeAvro(f, mp, outSchema, entries)
        outList += ((mp.toString, f.getFileStatus(mp).getLen, 0, manSeq,
          gInt(r, "partition_spec_id", 0), snapshotId, parts))
      }
    }
    val out = outList.result()
    try {
      onBeforeCommit()
      commitMeta(spark, f, root, v0, StructType(Nil), snapshotId, seqNo,
        Nil, replace = false, operation = Some("replace"),
        priorOverride = Some(out), nextRowId = Some(rowIdW))
    } catch {
      case _: java.util.ConcurrentModificationException =>
        out.filter(_._6 == snapshotId).foreach { case (p, _, _, _, _, _, _) =>
          f.delete(new Path(p), false)
        }
        throw new IllegalStateException(
          s"enableRowLineage on $dir raced a concurrent commit — re-run")
    }
  }

  /** ANALYZE: compute per-column NDV (+ row count) over the LIVE rows
    * in ONE distributed aggregation and publish them as a Puffin
    * STATISTICS file registered under the table metadata's
    * `statistics` field (iceberg.apache.org/spec/ "Table statistics").
    * Blob type `apache-datasketches-theta-v1`: the payload is a
    * STANDARD datasketches compact theta sketch (built by Spark's own
    * bundled `theta_sketch_agg`), so a foreign Iceberg reader can
    * deserialize it, estimate from it, and MERGE it with its own
    * sketches across partitions/snapshots; the standard `ndv`
    * property rides alongside. `exact = false` (default) records the
    * sketch's estimate — the 100 TB path, one pass, no per-column
    * shuffle; `exact = true` additionally pays COUNT(DISTINCT) per
    * column and records that as `ndv` for an oracle-replayable
    * result (the payload stays the sketch). Replaces any prior statistics entry
    * for the same snapshot (the spec's one-entry-per-snapshot shape)
    * and deletes the replaced file; METADATA-ONLY commit, no new
    * snapshot. Returns (snapshotId, column → ndv). */
  def analyzeTable(spark: SparkSession, dir: String,
                   cols: Seq[String] = Nil,
                   exact: Boolean = false): (Long, Map[String, Long]) = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.{approx_count_distinct, col,
      count, count_distinct, lit}
    val f = fs(spark, dir)
    val root = new Path(dir)
    val v0 = currentVersion(f, root)
    require(v0 > 0, s"$dir has no snapshots to analyze")
    val m0 = readMeta(f, root, v0).get
    val curId = m0.path("current-snapshot-id").asLong(-1L)
    require(curId > 0, s"$dir has no current snapshot to analyze")
    val seqNo = m0.path("last-sequence-number").asLong(0L)
    val idsByName = currentFieldIds(m0).toMap
    val rows = IcebergInterop.readIceberg(spark, dir)
    // default target set: ATOMIC columns only (ndv over a nested type
    // is not a meaningful planner statistic); explicit cols may still
    // name anything count-distinct supports
    val atomic: Set[String] = rows.schema.fields.collect {
      case f if (f.dataType match {
        case BooleanType | IntegerType | LongType | FloatType | DoubleType |
             StringType | BinaryType | DateType | TimestampType |
             TimestampNTZType => true
        case _: DecimalType => true
        case _ => false
      }) => f.name
    }.toSet
    val targets = if (cols.nonEmpty) cols
      else currentFieldIds(m0).map(_._1).filter(atomic.contains)
    require(targets.nonEmpty, s"no analyzable columns at $dir")
    targets.foreach(c => require(idsByName.contains(c),
      s"unknown column $c (table has ${idsByName.keys.toSeq.sorted.mkString(",")})"))
    // STANDARD datasketches THETA payload: theta_sketch_agg (Spark 4
    // bundles datasketches-java) yields compact-sketch bytes any
    // Iceberg reader can deserialize AND merge — the spec's
    // `apache-datasketches-theta-v1` blob type. One aggregation pass
    // computes every column's sketch (+ exact NDV when asked).
    val sketchAggs = targets.map(c =>
      org.apache.spark.sql.functions.theta_sketch_agg(col(c))
        .as(s"_sk_$c"))
    val exactAggs = if (!exact) Nil
      else targets.map(c => count_distinct(col(c)).as(s"_ndv_$c"))
    val aggs = count(lit(1)).as("_n") +: (sketchAggs ++ exactAggs)
    val r = rows.agg(aggs.head, aggs.tail: _*).head()
    val nRows = r.getLong(0)
    val sketchOf: Map[String, Array[Byte]] = targets.zipWithIndex.map {
      case (c, i) => c -> r.getAs[Array[Byte]](i + 1) }.toMap
    def estimateOf(bytes: Array[Byte]): Long =
      Math.round(org.apache.datasketches.theta.Sketches.wrapCompactSketch(
        org.apache.datasketches.memory.Memory.wrap(bytes)).getEstimate)
    val ndv = targets.zipWithIndex.map { case (c, i) =>
      c -> (if (exact) r.getLong(1 + targets.length + i)
            else estimateOf(sketchOf(c))) }.toMap
    val statsP = new Path(root,
      s"metadata/stats-$curId-${java.util.UUID.randomUUID().toString.take(8)}.puffin")
    val blobs = targets.map { c =>
      IcebergFormat.StatsBlob("apache-datasketches-theta-v1",
        Seq(idsByName(c)), curId, seqNo,
        Map("ndv" -> ndv(c).toString, "row-count" -> nRows.toString),
        sketchOf(c))
    }
    val (sz, fsz) = IcebergFormat.writePuffinStats(f, statsP, blobs)
    val n = m0.deepCopy[JsonNode]().asInstanceOf[ObjNode]
    type ArrNode = com.fasterxml.jackson.databind.node.ArrayNode
    val prior = Option(n.get("statistics")).toSeq
      .flatMap(_.elements().asScala.toSeq)
    val (stale, kept) = prior.partition(_.path("snapshot-id").asLong == curId)
    val arr = n.putArray("statistics")
    kept.foreach(arr.add)
    val e = arr.addObject()
    e.put("snapshot-id", curId)
    e.put("statistics-path", statsP.toString)
    e.put("file-size-in-bytes", sz)
    e.put("file-footer-size-in-bytes", fsz)
    val bm = e.putArray("blob-metadata")
    blobs.foreach { b =>
      val o = bm.addObject()
      o.put("type", b.blobType)
      o.put("snapshot-id", b.snapshotId)
      o.put("sequence-number", b.sequenceNumber)
      val fa = o.putArray("fields"); b.fields.foreach(fa.add)
      val props = o.putObject("properties")
      b.properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    }
    // a lost version race must not strand the just-written stats file:
    // nothing references it yet, and the orphan sweep is age-guarded,
    // so reclaim it HERE before surfacing the race
    try commitMetadataOnly(f, root, v0, m0, n, "analyzeTable")
    catch { case e: IllegalStateException =>
      f.delete(statsP, false); throw e }
    // the replaced entry's file only reclaims AFTER its replacement
    // committed (a lost race leaves everything intact)
    stale.foreach(s0 => f.delete(
      new Path(resolveU(s0.path("statistics-path").asText)), false))
    (curId, ndv)
  }

  /** PARTITION STATISTICS (iceberg.apache.org/spec/ "Partition
    * statistics"): derive per-partition-tuple live row/file/byte
    * counts ENTIRELY from manifest metadata (graft writes one manifest
    * per partition VALUE tuple, so each manifest's field summary IS
    * its tuple — zero data scanned), write them as the spec's
    * partition-statistics parquet (`partition` struct typed by the
    * spec's transform result types, `spec_id`, `data_record_count`,
    * `data_file_count`, `total_data_file_size_in_bytes`), and register
    * the file under the metadata `partition-statistics` field — the
    * [[analyzeTable]] twin for the "how big is each partition"
    * question a 100 TB planner asks first. One entry per snapshot
    * (re-analysis replaces and reclaims); freshness on read
    * ([[IcebergInterop.partitionStatsTable]]). Requires a partitioned
    * table whose live data manifests share ONE spec. Returns
    * (snapshotId, partitionCount). */
  def analyzePartitions(spark: SparkSession, dir: String): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val f = fs(spark, dir)
    val root = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val v0 = currentVersion(f, root)
    require(v0 > 0, s"$dir has no snapshots to analyze")
    val m0 = readMeta(f, root, v0).get
    val curId = m0.path("current-snapshot-id").asLong(-1L)
    require(curId > 0, s"$dir has no current snapshot")
    val snapNode = m0.path("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong(-2L) == curId).get
    val listRecs = IcebergFormat.readAvro(conf,
      new Path(resolveU(snapNode.path("manifest-list").asText)))
    val dataMans = listRecs.filter(r => gInt(r, "content", 0) == 0)
    val specIds = dataMans.map(gInt(_, "partition_spec_id", 0)).distinct
    require(specIds.length == 1 && specIds.head != 0,
      s"partition statistics need a partitioned table under ONE spec " +
      s"(found specs ${specIds.mkString(",")})")
    val specId = specIds.head
    val schemaTypes: Map[Int, DataType] = {
      val names = currentFieldIds(m0) // (name, id)
      val dts = currentSchemaNode(m0)
      names.map { case (nm, id) =>
        // decode via the read-side's type mapping on the schema node
        val fieldT = dts.path("fields").elements().asScala
          .find(_.path("id").asInt(-1) == id).map(_.path("type").asText(""))
        id -> (fieldT match {
          case Some("int") => IntegerType
          case Some("long") => LongType
          case Some("string") => StringType
          case Some("date") => DateType
          case Some("timestamp") => TimestampNTZType
          case Some("timestamptz") => TimestampType
          case Some("double") => DoubleType
          case Some("float") => FloatType
          case _ => NullType
        })
      }.toMap
    }
    val fieldsNode = m0.path("partition-specs").elements().asScala
      .find(_.path("spec-id").asInt(-1) == specId)
      .map(_.path("fields"))
      .getOrElse(throw new IllegalArgumentException(s"unknown spec $specId"))
    val pFields: Seq[(String, DataType)] = (0 until fieldsNode.size).map { i =>
      val fd = fieldsNode.get(i)
      val srcT = schemaTypes.getOrElse(fd.path("source-id").asInt, NullType)
      val rt = IcebergTransforms.resultType(fd.path("transform").asText, srcT)
        .getOrElse(throw new IllegalArgumentException(
          s"unsupported transform ${fd.path("transform").asText} over $srcT"))
      (fd.path("name").asText, rt)
    }
    import java.nio.ByteOrder
    def decode(dt: DataType, b: Array[Byte]): Any = dt match {
      case IntegerType => java.nio.ByteBuffer.wrap(b)
        .order(ByteOrder.LITTLE_ENDIAN).getInt
      case LongType => java.nio.ByteBuffer.wrap(b)
        .order(ByteOrder.LITTLE_ENDIAN).getLong
      case StringType => new String(b, "UTF-8")
      case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
        java.nio.ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong))
      case TimestampType | TimestampNTZType =>
        val micros = java.nio.ByteBuffer.wrap(b)
          .order(ByteOrder.LITTLE_ENDIAN).getLong
        val inst = java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
        if (dt == TimestampType) inst
        else java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC)
      case other => throw new IllegalArgumentException(
        s"cannot decode partition value of type $other")
    }
    // per manifest: the tuple from its field summary (graft writes
    // lo == hi per field; a spanning summary would mean a foreign
    // layout this derivation cannot attribute — refuse loudly), counts
    // from its live entries
    val perTuple = dataMans.flatMap { r =>
      val live = IcebergFormat.readAvro(conf,
        new Path(resolveU(gStr(r, "manifest_path"))))
        .filter(e => gInt(e, "status", 0) != 2)
        .map(_.get("data_file").asInstanceOf[GenericRecord])
      if (live.isEmpty) None
      else {
        val parts = Option(r.getSchema.getField("partitions"))
          .flatMap(_ => Option(r.get("partitions")))
          .map(_.asInstanceOf[java.util.List[_]].asScala.toSeq)
          .getOrElse(throw new IllegalArgumentException(
            s"manifest ${gStr(r, "manifest_path")} lacks a field summary"))
        require(parts.length == pFields.length,
          "field summary arity must match the spec")
        val tuple: Seq[Any] = parts.zip(pFields).map { case (p0, (_, dt)) =>
          val p = p0.asInstanceOf[GenericRecord]
          val containsNull = Option(p.get("contains_null"))
            .exists(_.asInstanceOf[Boolean])
          def bytesOf(fd: String): Option[Array[Byte]] =
            Option(p.get(fd)).map { bb0 =>
              val bb = bb0.asInstanceOf[java.nio.ByteBuffer].duplicate()
              val out = new Array[Byte](bb.remaining()); bb.get(out); out
            }
          (bytesOf("lower_bound"), bytesOf("upper_bound")) match {
            case (Some(lo), Some(hi)) if java.util.Arrays.equals(lo, hi) =>
              decode(dt, lo)
            case (None, None) if containsNull => null
            case _ => throw new IllegalArgumentException(
              s"manifest ${gStr(r, "manifest_path")} spans partition values " +
              "— not a per-tuple layout; compact first")
          }
        }
        Some((tuple,
          live.map(gLong(_, "record_count", 0L)).sum,
          live.length.toLong,
          live.map(gLong(_, "file_size_in_bytes", 0L)).sum))
      }
    }.groupBy(_._1).map { case (tuple, ms) =>
      (tuple, ms.map(_._2).sum, ms.map(_._3).sum, ms.map(_._4).sum)
    }.toSeq
    val structT = StructType(pFields.map { case (nm, dt) =>
      StructField(nm, dt, nullable = true) })
    val outSchema = StructType(Seq(
      StructField("partition", structT, nullable = false),
      StructField("spec_id", IntegerType, nullable = false),
      StructField("data_record_count", LongType, nullable = false),
      StructField("data_file_count", IntegerType, nullable = false),
      StructField("total_data_file_size_in_bytes", LongType, nullable = false)))
    val rowsJ = perTuple.map { case (tuple, n, files, sz) =>
      org.apache.spark.sql.Row(
        org.apache.spark.sql.Row(tuple: _*), specId, n, files.toInt, sz)
    }.asJava
    val df = spark.createDataFrame(rowsJ, outSchema)
    val staging = new Path(root,
      s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    df.coalesce(1).write.parquet(staging.toString)
    val part = f.listStatus(staging)
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    val statsP = new Path(root,
      s"metadata/partition-stats-$curId-${java.util.UUID.randomUUID().toString.take(8)}.parquet")
    require(f.rename(part, statsP), s"rename $part failed")
    f.delete(staging, true)
    val n = m0.deepCopy[JsonNode]().asInstanceOf[ObjNode]
    val prior = Option(n.get("partition-statistics")).toSeq
      .flatMap(_.elements().asScala.toSeq)
    val (stale, kept) = prior.partition(_.path("snapshot-id").asLong == curId)
    val arr = n.putArray("partition-statistics")
    kept.foreach(arr.add)
    val e = arr.addObject()
    e.put("snapshot-id", curId)
    e.put("statistics-path", statsP.toString)
    e.put("file-size-in-bytes", f.getFileStatus(statsP).getLen)
    try commitMetadataOnly(f, root, v0, m0, n, "analyzePartitions")
    catch { case e: IllegalStateException =>
      f.delete(statsP, false); throw e }
    stale.foreach(s0 => f.delete(
      new Path(resolveU(s0.path("statistics-path").asText)), false))
    (curId, perTuple.length.toLong)
  }

  /** Crash-orphan age floor: list-based deletion (files NO snapshot —
    * kept or expired — references) only touches files at least this
    * old, independent of how aggressive `retainMillis` is. A RETAIN 0
    * expiry must never eat a concurrent in-flight writer's freshly
    * renamed data files, just-authored manifests, or active
    * `.staging-*` directory — those are all seconds old; genuine crash
    * debris is hours old. */
  val OrphanMinAgeMillis: Long = 3600000L

  /** SNAPSHOT EXPIRY + file reclaim for native Iceberg tables — the
    * maintenance that keeps a long-running [[appendOnce]] sink's
    * `metadata/` BOUNDED: snapshots older than `retainMillis` expire
    * (the current snapshot and every ref-pinned snapshot always
    * survive), then files reclaim by REFERENCE DIFF — reachable from
    * an EXPIRED snapshot, unreachable from every kept one — never by
    * bare directory listing, so a concurrent writer's already-renamed
    * data files and freshly-authored manifests (referenced by NO
    * expired snapshot, by construction) are structurally safe. Old
    * metadata JSONs below the previous version drop (previous kept as
    * the undo step) and their dangling `metadata-log` entries prune
    * with them; crash debris no snapshot ever referenced (lost-race
    * leftovers, `.staging-*` dirs) sweeps only past the
    * [[OrphanMinAgeMillis]] age floor. Time travel to an expired
    * snapshot fails loudly ("snapshot not found"). Driver work is
    * metadata- and file-count-bounded.
    * Returns (snapshotsExpired, filesReclaimed). */
  def expireSnapshots(spark: SparkSession, dir: String,
                      retainMillis: Long): (Int, Int) = {
    import scala.jdk.CollectionConverters._
    val f = fs(spark, dir)
    val root = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val v0 = currentVersion(f, root)
    require(v0 > 0, s"$dir has no Iceberg metadata to expire")
    val m0 = readMeta(f, root, v0).get
    val now = System.currentTimeMillis()
    val cutoff = now - retainMillis
    // list-based deletion is gated on BOTH horizons: old enough to
    // expire AND old enough that no in-flight writer can own it
    val orphanCutoff = now - math.max(retainMillis, OrphanMinAgeMillis)
    var reclaimed = 0
    // crash-window sweep: a failed write's .staging-* dir has no
    // committed reference, ever — reclaim once it is older than the
    // orphan horizon (an in-flight writer's staging is younger; a
    // RETAIN 0 expiry must not eat it)
    f.listStatus(root).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith(".staging-") &&
          st.getModificationTime < orphanCutoff) {
        if (f.delete(st.getPath, true)) reclaimed += 1
      }
    }
    val curId = m0.path("current-snapshot-id").asLong(-1L)
    val snaps = m0.path("snapshots").elements().asScala.toSeq
    val snapTs: Map[Long, Long] = snaps.map(s0 =>
      s0.path("snapshot-id").asLong(-1L) ->
        s0.path("timestamp-ms").asLong(0L)).toMap
    // ── per-ref retention (the spec's snapshot-reference fields) ──
    // a non-main ref declaring `max-ref-age-ms` (or inheriting the
    // table default `history.expire.max-ref-age-ms-default`) AGES OUT
    // once its referenced snapshot is older than that — an abandoned
    // audit branch stops pinning its staged chain and main's fork
    // segment, and everything it held reclaims through the normal
    // reference diff below. Refs without the property never age (the
    // conservative default every existing table keeps).
    def refLong(node: JsonNode, field: String): Option[Long] = {
      val v = node.path(field)
      if (v.isMissingNode || v.isNull) None else Some(v.asLong)
    }
    def propLong(name: String): Option[Long] = {
      val v = m0.path("properties").path(name)
      if (v.isMissingNode || v.isNull) None
      else scala.util.Try(v.asText.toLong).toOption
    }
    val defaultMaxRefAge = propLong("history.expire.max-ref-age-ms-default")
    val agedRefs: Set[String] = m0.path("refs").properties().asScala
      .filter { e =>
        e.getKey != "main" &&
          refLong(e.getValue, "max-ref-age-ms").orElse(defaultMaxRefAge)
            .exists { maxAge =>
              val ts = snapTs.getOrElse(
                e.getValue.path("snapshot-id").asLong(-1L), now)
              now - ts > maxAge
            }
      }.map(_.getKey).toSet
    val liveRefs = m0.path("refs").properties().asScala
      .filterNot(e => agedRefs.contains(e.getKey)).toSeq
    val refIds: Set[Long] =
      liveRefs.map(_.getValue.path("snapshot-id").asLong(-1L)).toSet
    // while an un-published BRANCH ref exists, expiry must keep (a)
    // the branch-only chain from its head to the fork point —
    // fastForward's ancestor walk and the branch's own reads need the
    // intermediates — and (b) MAIN's segment from the current head
    // down to that fork point, or the main-ancestry walk the
    // branch-attribution filter depends on would break and staged
    // rows would leak back into main consumers. Pre-fork history ages
    // out normally; everything here frees on dropRef / publish.
    val parentOf: Map[Long, Long] = snaps.map(s0 =>
      s0.path("snapshot-id").asLong(-1L) ->
        s0.path("parent-snapshot-id").asLong(-1L)).toMap
    val onMain: Seq[Long] = { // head-first main ancestry
      val out = Seq.newBuilder[Long]
      val seen = scala.collection.mutable.HashSet.empty[Long]
      var cur = curId
      while (cur > 0 && !seen.contains(cur)) {
        out += cur; seen += cur; cur = parentOf.getOrElse(cur, -1L)
      }
      out.result()
    }
    val mainIdx = onMain.zipWithIndex.toMap
    val defaultMinKeep = propLong("history.expire.min-snapshots-to-keep-default")
    val defaultMaxSnapAge = propLong("history.expire.max-snapshot-age-ms-default")
    val branchChain: Set[Long] = {
      val out = scala.collection.mutable.HashSet.empty[Long]
      var deepestFork = -1 // farthest main index any branch forks from
      liveRefs
        .filter(e => e.getKey != "main" &&
          e.getValue.path("type").asText("branch") == "branch")
        .foreach { e =>
          // branch-tail retention: a branch declaring
          // `min-snapshots-to-keep` / `max-snapshot-age-ms` (or
          // inheriting the table defaults) pins only its newest N /
          // young-enough staged snapshots — older tail snapshots fall
          // back to the GLOBAL cutoff and age out. No declaration =
          // pin the whole chain (publishability-safe default; note
          // that trimming a tail makes fastForward's ancestry walk
          // refuse once intermediates expire — the spec's documented
          // trade for bounded branch history).
          val minKeepOpt = refLong(e.getValue, "min-snapshots-to-keep")
            .orElse(defaultMinKeep)
          val maxSnapAgeOpt = refLong(e.getValue, "max-snapshot-age-ms")
            .orElse(defaultMaxSnapAge)
          val declared = minKeepOpt.isDefined || maxSnapAgeOpt.isDefined
          val minKeep = minKeepOpt.getOrElse(1L)
          val maxSnapAge = maxSnapAgeOpt.getOrElse(retainMillis)
          var cur = e.getValue.path("snapshot-id").asLong(-1L)
          var fork = -1
          var staged = 0
          var idx = 0L
          while (cur > 0 && fork < 0 && !out.contains(cur)) {
            mainIdx.get(cur) match {
              case Some(i) => fork = i // reached main: stop, record depth
              case None =>
                val pin = !declared || idx < minKeep ||
                  now - snapTs.getOrElse(cur, now) <= maxSnapAge
                if (pin) { out += cur; staged += 1 }
                idx += 1
                cur = parentOf.getOrElse(cur, -1L)
            }
          }
          if (fork < 0 && cur <= 0)
            fork = onMain.length - 1 // unknown topology: keep all of main
          // a branch whose head IS a main-ancestry node (a plain
          // pinned ref, no staged commits) needs no segment
          // protection — its attribution chain is empty either way
          if (staged > 0) deepestFork = math.max(deepestFork, fork)
        }
      // main's head→fork segment (inclusive) stays walkable
      if (deepestFork >= 0) out ++= onMain.take(deepestFork + 1)
      out.toSet
    }
    val (kept, expired) = snaps.partition { s0 =>
      val id = s0.path("snapshot-id").asLong(-2L)
      id == curId || refIds.contains(id) || branchChain.contains(id) ||
        s0.path("timestamp-ms").asLong(0L) >= cutoff
    }
    if (expired.isEmpty && agedRefs.isEmpty) return (0, reclaimed)
    val keptIds = kept.map(_.path("snapshot-id").asLong).toSet

    // new metadata version FIRST (readers switch before files vanish)
    val n = m0.deepCopy[JsonNode]().asInstanceOf[ObjNode]
    // aged-out refs drop in the SAME commit that expires what they
    // pinned — readers never observe a ref to an expired snapshot
    if (n.path("refs").isObject)
      agedRefs.foreach(n.path("refs").asInstanceOf[ObjNode].remove(_))
    val snapArr = M.createArrayNode(); kept.foreach(snapArr.add)
    n.set[JsonNode]("snapshots", snapArr)
    // the exactly-once txn ledger rides the snapshot summaries —
    // fold the EXPIRED snapshots' watermarks into table properties so
    // a replayed batch is still recognized after maintenance (the
    // durability Delta checkpoints give txn actions)
    val props =
      if (n.path("properties").isObject) n.path("properties").asInstanceOf[ObjNode]
      else n.putObject("properties")
    expired.foreach { s0 =>
      val sum = s0.path("summary")
      val appId = sum.path("graft-app-id").asText("")
      if (appId.nonEmpty) {
        val key = s"graft.txn.$appId"
        val tv = math.max(sum.path("graft-txn").asLong(-1L),
          props.path(key).asLong(-1L))
        props.put(key, tv)
      }
    }
    val logArr = M.createArrayNode()
    m0.path("snapshot-log").elements().asScala
      .filter(e => keptIds.contains(e.path("snapshot-id").asLong(-2L)))
      .foreach(logArr.add)
    n.set[JsonNode]("snapshot-log", logArr)
    // statistics / partition-statistics files attach to snapshots —
    // entries of expired snapshots prune with them (files reclaim
    // after the commit)
    val droppedStats = Seq.newBuilder[Path]
    Seq("statistics", "partition-statistics").foreach { fieldName =>
      if (n.has(fieldName)) {
        val stArr = M.createArrayNode()
        m0.path(fieldName).elements().asScala.foreach { e =>
          if (keptIds.contains(e.path("snapshot-id").asLong(-2L))) stArr.add(e)
          else droppedStats += new Path(resolveU(e.path("statistics-path").asText))
        }
        n.set[JsonNode](fieldName, stArr)
      }
    }
    val prevUpdated = m0.path("last-updated-ms").asLong(now)
    n.put("last-updated-ms", now)
    // metadata-log: entries pointing at the v<N metadata JSONs this
    // expiry deletes (everything below v0) would dangle for any
    // spec-conformant client walking the log — prune them with the
    // files; the undo step (v0) keeps its entry below.
    val mlKept = M.createArrayNode()
    m0.path("metadata-log").elements().asScala.filter { e =>
      val nm = new Path(e.path("metadata-file").asText("")).getName
      """^v(\d+)\.metadata\.json$""".r.findFirstMatchIn(nm)
        .forall(_.group(1).toLong >= v0)
    }.foreach(mlKept.add)
    n.set[JsonNode]("metadata-log", mlKept)
    val ml = n.withArray[com.fasterxml.jackson.databind.node.ArrayNode](
      "metadata-log").addObject()
    ml.put("timestamp-ms", prevUpdated)
    ml.put("metadata-file", new Path(root, s"metadata/v$v0.metadata.json").toString)
    val target = new Path(root, s"metadata/v${v0 + 1}.metadata.json")
    val tmp = new Path(root,
      s"metadata/.tmp-v${v0 + 1}-${java.util.UUID.randomUUID().toString.take(8)}.json")
    val out = f.create(tmp, false)
    try out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(n))
    finally out.close()
    if (!putIfAbsent(f, tmp, target)) {
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"expireSnapshots on $dir raced a concurrent commit — re-run")
    }
    val hint = f.create(new Path(root, "metadata/version-hint.text"), true)
    try hint.write(String.valueOf(v0 + 1).getBytes) finally hint.close()
    droppedStats.result().foreach { p => if (f.delete(p, false)) reclaimed += 1 }

    // reachability walk: (manifest-list + manifest + data/puffin
    // names) per snapshot set. Kept walk counts only LIVE entries —
    // a kept snapshot's status-2 tombstone does not protect a file;
    // expired walk counts EVERY entry (a file its delete snapshot
    // tombstoned was live in earlier, also-expired snapshots).
    def reach(snapSet: Seq[JsonNode], liveOnly: Boolean)
        : (scala.collection.mutable.HashSet[String],
           scala.collection.mutable.HashSet[String]) = {
      val meta = scala.collection.mutable.HashSet.empty[String]
      val data = scala.collection.mutable.HashSet.empty[String]
      snapSet.foreach { s0 =>
        val lp = resolveU(s0.path("manifest-list").asText)
        meta += new Path(lp).getName
        if (f.exists(new Path(lp)))
          IcebergFormat.readAvro(conf, new Path(lp)).foreach { r =>
            val mp = resolveU(gStr(r, "manifest_path"))
            meta += new Path(mp).getName
            if (f.exists(new Path(mp)))
              IcebergFormat.readAvro(conf, new Path(mp)).foreach { e =>
                if (!liveOnly || gInt(e, "status", 0) != 2) {
                  val df = e.get("data_file").asInstanceOf[GenericRecord]
                  data += new Path(resolveU(gStr(df, "file_path"))).getName
                }
              }
          }
      }
      (meta, data)
    }
    val (keepMeta, keepData) = reach(kept, liveOnly = true)
    val (expMeta, expData) = reach(expired, liveOnly = false)
    // REFERENCE-DIFF reclaim: reachable from an expired snapshot AND
    // from no kept one. A concurrent in-flight commit's freshly
    // renamed files appear in NEITHER set — structurally untouchable.
    (expMeta --= keepMeta).foreach { name =>
      if (f.delete(new Path(root, s"metadata/$name"), false)) reclaimed += 1
    }
    (expData --= keepData).foreach { name =>
      if (f.delete(new Path(root, s"data/$name"), false)) reclaimed += 1
    }
    // superseded metadata JSONs are version-numbered below the head —
    // nothing in-flight can own them (a racer writes v0+1 or later)
    f.listStatus(new Path(root, "metadata")).foreach { st =>
      val name = st.getPath.getName
      val drop = """^v(\d+)\.metadata\.json$""".r.findFirstMatchIn(name)
        .exists(_.group(1).toLong < v0) // keep v0 as the undo step
      if (drop && f.delete(st.getPath, false)) reclaimed += 1
    }
    // AGE-GUARDED orphan sweep: debris NO snapshot (kept or expired)
    // ever referenced — lost-race leftovers, crash remnants — deletes
    // only past the orphan horizon, so a racing writer's seconds-old
    // manifests and data files survive even RETAIN 0
    // statistics files referenced by the POST-EXPIRY metadata survive;
    // stats-*.puffin / partition-stats-*.parquet nothing references
    // (a lost analyzeTable race that crashed before its own cleanup)
    // sweep with the same age guard as the avro debris
    val keepStats: Set[String] =
      Seq("statistics", "partition-statistics").flatMap { fieldName =>
        n.path(fieldName).elements().asScala.map(e =>
          new Path(resolveU(e.path("statistics-path").asText)).getName).toSeq
      }.toSet
    f.listStatus(new Path(root, "metadata")).foreach { st =>
      val name = st.getPath.getName
      val orphanAvro = name.endsWith(".avro") && !keepMeta.contains(name)
      val orphanStats = (name.startsWith("stats-") ||
        name.startsWith("partition-stats-")) &&
        (name.endsWith(".puffin") || name.endsWith(".parquet")) &&
        !keepStats.contains(name)
      if ((orphanAvro || orphanStats) && st.getModificationTime < orphanCutoff) {
        if (f.delete(st.getPath, false)) reclaimed += 1
      }
    }
    val dataDir = new Path(root, "data")
    if (f.exists(dataDir)) f.listStatus(dataDir).foreach { st =>
      val name = st.getPath.getName
      if (st.isFile && !keepData.contains(name) &&
          st.getModificationTime < orphanCutoff &&
          (name.endsWith(".parquet") || name.endsWith(".puffin") ||
            name.endsWith(".bin"))) {
        if (f.delete(st.getPath, false)) reclaimed += 1
      }
    }
    (expired.length, reclaimed)
  }

  /** Append `df` GLOBALLY SORTED on `orderBy` ((column, ascending)*) —
    * Iceberg's `WRITE ORDERED BY`: one range-partitioned sort job
    * clusters rows across files (near-disjoint min/max bands per file
    * ⇒ far tighter file-level pruning on the sort columns), the sort
    * order registers in table metadata (an existing declaration with
    * the same ordered fields is REUSED; `default-sort-order-id`
    * updates), and every data-file manifest entry stamps
    * `sort_order_id`, so a foreign engine sees the declared layout.
    * Ascending sorts nulls-first, descending nulls-last (the spec's
    * defaults). Returns the committed snapshot id. */
  def appendSorted(df: DataFrame, dir: String,
                   orderBy: Seq[(String, Boolean)]): Long = {
    require(orderBy.nonEmpty, "appendSorted needs at least one sort column")
    orderBy.foreach { case (c, _) =>
      require(df.columns.contains(c), s"no sort column $c") }
    write(df, dir, replace = false, sortBy = orderBy)
  }

  /** The order-id `fields` resolves to against `m`: an existing
    * sort-order with the same ordered (source-id, direction) fields,
    * else max + 1 (deterministic per base version — a lost race
    * recomputes against the new head). */
  private def resolveSortOrderId(m: Option[JsonNode],
                                 fields: Seq[(Int, Boolean)]): Int = {
    import scala.jdk.CollectionConverters._
    val orders = m.map(_.path("sort-orders").elements().asScala.toSeq)
      .getOrElse(Nil)
    orders.find { o =>
      val fs0 = o.path("fields")
      fs0.size == fields.size && fields.zipWithIndex.forall {
        case ((sid, asc), i) =>
          fs0.get(i).path("source-id").asInt(-1) == sid &&
            fs0.get(i).path("transform").asText == "identity" &&
            fs0.get(i).path("direction").asText ==
              (if (asc) "asc" else "desc")
      }
    }.map(_.path("order-id").asInt(0)).getOrElse(
      orders.map(_.path("order-id").asInt(0)).maxOption.getOrElse(0) + 1)
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

  /** Highest `graft-txn` recorded for `appId` (-1 when none) — the
    * replay watermark: the max over live snapshots' summaries AND the
    * `graft.txn.<appId>` table property [[expireSnapshots]] folds the
    * expired snapshots' ledger into (so maintenance never silently
    * re-admits a replayed batch). */
  private def committedTxn(spark: SparkSession, f: FileSystem, root: Path,
                           appId: String): Long = {
    import scala.jdk.CollectionConverters._
    readMeta(f, root, currentVersion(f, root)).toSeq.flatMap { m =>
      m.path("snapshots").elements().asScala.flatMap { s0 =>
        val sum = s0.path("summary")
        if (sum.path("graft-app-id").asText("") == appId)
          Some(sum.path("graft-txn").asLong(-1L))
        else None
      }.toSeq :+ m.path("properties").path(s"graft.txn.$appId").asLong(-1L)
    }.maxOption.getOrElse(-1L)
  }

  private def write(df0: DataFrame, dir: String, replace: Boolean,
                    txn: Option[(String, Long)] = None,
                    sortBy: Seq[(String, Boolean)] = Nil,
                    lineage: Boolean = false): Long = {
    val spark = df0.sparkSession
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
    // v3 write-default: a column the frame OMITS but the schema
    // declares with a write-default fills with the default literal
    // (the spec's write contract); omitted columns WITHOUT a default
    // still refuse below.
    val df = meta0 match {
      case Some(m) =>
        val defs = IcebergInterop.writeDefaultColumns(currentSchemaNode(m))
        currentFieldIds(m).map(_._1)
          .filterNot(df0.columns.contains).filter(defs.contains)
          .foldLeft(df0)((d, c) => d.withColumn(c, defs(c)))
      case None => df0
    }

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
    // references them, reclaimable if the commit never lands. A sorted
    // write stages through ONE global range-partitioned sort.
    val staging = new Path(root, s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    val toStage =
      if (sortBy.isEmpty) df
      else {
        import org.apache.spark.sql.functions.col
        df.sort(sortBy.map { case (c, asc) =>
          if (asc) col(c).asc_nulls_first else col(c).desc_nulls_last }: _*)
      }
    withFieldIds(toStage, idsByName).write.parquet(staging.toString)
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

    val sortFieldIds = sortBy.map { case (c, asc) => (idsByName(c), asc) }
    var attempt = 0
    var base = v0
    while (true) {
      val snapshotId = freshSnapshotId(f, root, base)
      val baseMeta = readMeta(f, root, base)
      val seqNo = baseMeta
        .map(_.path("last-sequence-number").asLong(0L)).getOrElse(0L) + 1L
      val orderId: Option[Int] =
        if (sortFieldIds.isEmpty) None
        else Some(resolveSortOrderId(baseMeta, sortFieldIds))
      // v3 ROW LINEAGE: assign each new file's first_row_id from the
      // BASE version's watermark (re-read per attempt — a lost race
      // re-derives against the new head, so ids never collide)
      if (lineage) require(baseMeta.isEmpty || nextRowIdOf(baseMeta).isDefined,
        s"$dir already exists without row lineage — lineage is set at " +
        "creation (or via enableRowLineage), not per-append")
      val lin0: Option[Long] = nextRowIdOf(baseMeta)
        .orElse(if (lineage) Some(0L) else None)
      var rowIdW = lin0.getOrElse(0L)
      val entries = dataFiles.map { case (p, size) =>
        val (rows, bounds) = stats.getOrElse(canonPath(p.toString),
          throw new IllegalStateException(s"no stats row for $p"))
        val fr = lin0.map { _ => val v = rowIdW; rowIdW += rows; v }
        IcebergFormat.entry(0, p.toString, rows, size, snapshotId, seqNo,
          bounds = bounds, sortOrderId = orderId, firstRowId = fr)
      }
      val manifestP = new Path(root,
        s"metadata/manifest-$snapshotId-${java.util.UUID.randomUUID().toString.take(8)}.avro")
      IcebergFormat.writeAvro(f, manifestP, IcebergFormat.EntrySchema, entries)
      try {
        onBeforeCommit()
        return commitMeta(spark, f, root, base, df.schema, snapshotId, seqNo,
          Seq(NewManifest(manifestP, partitioned = false, None,
            entries = entries)), replace, txn,
          sortReq = orderId.map(id => (id, sortFieldIds)),
          nextRowId = lin0.map(_ => rowIdW))
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

  /** PUT-IF-ABSENT commit of a fully-written temp file: rename WITHOUT
    * overwrite through FileContext (Options.Rename.NONE — fails on an
    * existing destination instead of clobbering it, HadoopTableOperations'
    * commit protocol; a bare FileSystem.rename on LocalFileSystem has
    * POSIX semantics and would silently replace a concurrent winner's
    * already-committed version). */
  private def putIfAbsent(f: FileSystem, tmp: Path, target: Path): Boolean =
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        target.toUri, f.getConf)
      fc.rename(fc.makeQualified(tmp), fc.makeQualified(target))
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case e: java.io.IOException if f.exists(target) => false
    }

  /** Author `v<base+1>.metadata.json` + the snapshot's manifest list and
    * commit by put-if-absent rename; throws ConcurrentModificationException
    * on a lost race. Prior manifests carry forward from the current
    * snapshot's manifest list on append; an overwrite starts from just
    * the new manifests (older files stay reachable through older
    * snapshots). The metadata JSON starts from a DEEP COPY of the
    * previous version — every field this commit doesn't change
    * (properties, refs, sort-orders, a foreign writer's extras)
    * carries forward verbatim. */
  private def commitMeta(spark: SparkSession, f: FileSystem, root: Path,
                         base: Int, schema: StructType, snapshotId: Long,
                         seqNo: Long, newManifests: Seq[NewManifest],
                         replace: Boolean,
                         txn: Option[(String, Long)] = None,
                         partSpec: Option[SpecReq] = None,
                         operation: Option[String] = None,
                         // compaction hands the EXACT carried manifest
                         // set (path, len, content, seq, specId,
                         // addedBy, partitions-raw) instead of the
                         // head's list — it drops folded delete
                         // manifests and swaps rewritten ones
                         priorOverride: Option[Seq[(String, Long, Int,
                           Long, Int, Long, AnyRef)]] = None,
                         // one-way format upgrade (v3 for deletion
                         // vectors) — never downgrades
                         minFormatVersion: Int = 0,
                         // a sorted write's (order-id, (source-id,
                         // asc)*): registered when new, verified when
                         // declared; default-sort-order-id updates
                         sortReq: Option[(Int, Seq[(Int, Boolean)])] = None,
                         // v3 ROW LINEAGE: the advanced `next-row-id`
                         // watermark after this commit's first_row_id
                         // assignments (None on non-lineage tables);
                         // implies format-version >= 3
                         nextRowId: Option[Long] = None): Long = {
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
      if (priorOverride.isDefined) priorOverride.get
      else if (replace) Nil
      else prevMeta.toSeq.flatMap { m =>
        val cur = headIdOf(m) // branch commits carry the BRANCH head
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
    // ---- metadata node: DEEP COPY of the previous version (every
    // field this commit doesn't touch carries forward verbatim — a
    // foreign table's properties/refs/sort-orders survive a graft
    // append), or the full v2-required field set on table creation ----
    val n: ObjNode = prevMeta match {
      case Some(m) => m.deepCopy[JsonNode]().asInstanceOf[ObjNode]
      case None =>
        val c = M.createObjectNode()
        c.put("format-version", 2)
        c.put("table-uuid", java.util.UUID.randomUUID().toString)
        c.put("location", root.toString)
        val schemas = c.putArray("schemas")
        val sc = schemas.addObject()
        sc.put("schema-id", 0); sc.put("type", "struct")
        val fields = sc.putArray("fields")
        schema.fields.zipWithIndex.foreach { case (fd, i) =>
          val fn = fields.addObject()
          fn.put("id", i + 1); fn.put("name", fd.name)
          fn.put("required", !fd.nullable)
          fn.put("type", IcebergFormat.icebergType(fd.dataType))
        }
        c.put("last-column-id", schema.fields.length)
        c.put("current-schema-id", 0)
        val specs = c.putArray("partition-specs")
        val sp = specs.addObject(); sp.put("spec-id", 0); sp.putArray("fields")
        c.put("default-spec-id", 0)
        c.put("last-partition-id", 999) // spec: 999 before any partition field
        val orders = c.putArray("sort-orders")
        val so = orders.addObject(); so.put("order-id", 0); so.putArray("fields")
        c.put("default-sort-order-id", 0)
        c.putObject("properties")
        c.putObject("refs")
        c.putArray("snapshots")
        c.putArray("snapshot-log")
        c.putArray("metadata-log")
        c
    }
    val minFv = math.max(minFormatVersion, if (nextRowId.isDefined) 3 else 0)
    if (minFv > n.path("format-version").asInt(2))
      n.put("format-version", minFv)
    // row-lineage watermark: monotone by construction — every caller
    // derives its assignment from THIS base version's watermark and a
    // lost race re-reads before re-assigning
    nextRowId.foreach(v => n.put("next-row-id", v))
    val curSchemaId = n.path("current-schema-id").asInt(0)
    val nowMs = System.currentTimeMillis()
    val prevUpdatedMs = prevMeta.map(_.path("last-updated-ms").asLong(nowMs))
    n.put("last-sequence-number", seqNo)
    n.put("last-updated-ms", nowMs)

    // partition-spec resolution: reuse an existing single-field spec
    // with the same (source-id, transform); else register a fresh one
    // (spec-id = max + 1, field-id = last-partition-id + 1 — partition
    // field ids are never reused, the same rule as column ids)
    type ArrNode = com.fasterxml.jackson.databind.node.ArrayNode
    val specsArr = n.withArray[ArrNode]("partition-specs")
    if (!specsArr.elements().asScala.exists(_.path("spec-id").asInt(-1) == 0)) {
      val sp = specsArr.addObject(); sp.put("spec-id", 0); sp.putArray("fields")
    }
    val specId: Int = partSpec match {
      case None => 0
      case Some(req) =>
        specsArr.elements().asScala.find { s0 =>
          val fs0 = s0.path("fields")
          fs0.size == req.fields.size && req.fields.zipWithIndex.forall {
            case ((_, srcId, transform), i) =>
              fs0.get(i).path("source-id").asInt(-1) == srcId &&
                fs0.get(i).path("transform").asText == transform
          }
        } match {
          case Some(s0) => s0.path("spec-id").asInt(0)
          case None =>
            val newId = specsArr.elements().asScala
              .map(_.path("spec-id").asInt(0)).maxOption.getOrElse(-1) + 1
            val sp = specsArr.addObject(); sp.put("spec-id", newId)
            val arr = sp.putArray("fields")
            var fieldId = math.max(n.path("last-partition-id").asInt(999), 999)
            req.fields.foreach { case (name, srcId, transform) =>
              fieldId += 1
              val fd = arr.addObject()
              fd.put("name", name); fd.put("transform", transform)
              fd.put("source-id", srcId); fd.put("field-id", fieldId)
            }
            n.put("last-partition-id", fieldId)
            if (prevMeta.isEmpty) n.put("default-spec-id", newId)
            newId
        }
    }

    // sort-order registration: reuse the declared order (id must agree
    // — both sides derive it from the SAME base version, so a mismatch
    // means a racer rewrote the orders: rebase), else append it
    sortReq.foreach { case (oid, fields) =>
      val orders = n.withArray[ArrNode]("sort-orders")
      val existing = orders.elements().asScala.find { o =>
        val fs0 = o.path("fields")
        fs0.size == fields.size && fields.zipWithIndex.forall {
          case ((sid, asc), i) =>
            fs0.get(i).path("source-id").asInt(-1) == sid &&
              fs0.get(i).path("transform").asText == "identity" &&
              fs0.get(i).path("direction").asText ==
                (if (asc) "asc" else "desc")
        }
      }
      existing match {
        case Some(o) =>
          if (o.path("order-id").asInt(-1) != oid)
            throw new java.util.ConcurrentModificationException(
              s"sort order ids moved under $root — rebase")
        case None =>
          val mx = orders.elements().asScala
            .map(_.path("order-id").asInt(0)).maxOption.getOrElse(0)
          if (oid != mx + 1)
            throw new java.util.ConcurrentModificationException(
              s"sort order ids moved under $root — rebase")
          val o = orders.addObject(); o.put("order-id", oid)
          val fa = o.putArray("fields")
          fields.foreach { case (sid, asc) =>
            val fo = fa.addObject()
            fo.put("transform", "identity"); fo.put("source-id", sid)
            fo.put("direction", if (asc) "asc" else "desc")
            fo.put("null-order", if (asc) "nulls-first" else "nulls-last")
          }
      }
      n.put("default-sort-order-id", oid)
    }

    val FS = MFS.getField("partitions").schema().getTypes.get(1)
    val fresh: Seq[(String, Long, Int, Long, Int, Long, AnyRef)] =
      newManifests.map { nm =>
        val parts: AnyRef = nm.summary.map { sums =>
          val arr = new org.apache.avro.generic.GenericData.Array[GenericRecord](
            sums.length, FS)
          sums.foreach { s0 =>
            val fsRec = new org.apache.avro.generic.GenericData.Record(
              FS.getElementType)
            fsRec.put("contains_null", s0.containsNull)
            s0.bounds.foreach { case (lo, hi) =>
              fsRec.put("lower_bound", java.nio.ByteBuffer.wrap(lo))
              fsRec.put("upper_bound", java.nio.ByteBuffer.wrap(hi))
            }
            arr.add(fsRec)
          }
          arr
        }.orNull
        (nm.path.toString, f.getFileStatus(nm.path).getLen, nm.content,
          seqNo, if (nm.partitioned) specId else 0, snapshotId, parts)
      }
    val listRecords: Seq[GenericRecord] =
      (prior ++ fresh).map {
        case (mp, len, content, mseq, mSpecId, addedBy, parts) =>
        val r = new org.apache.avro.generic.GenericData.Record(MFS)
        r.put("manifest_path", mp)
        r.put("manifest_length", len)
        r.put("partition_spec_id", mSpecId)
        r.put("content", content)
        r.put("sequence_number", mseq)
        r.put("added_snapshot_id", addedBy)
        if (parts != null) r.put("partitions", parts)
        r
      }
    val listP = new Path(root,
      s"metadata/snap-$snapshotId-${java.util.UUID.randomUUID().toString.take(8)}.avro")
    IcebergFormat.writeAvro(f, listP, MFS, listRecords)

    val parentId = prevMeta.map(headIdOf).filter(_ > 0)
    if (branchCtx.value.isEmpty) n.put("current-snapshot-id", snapshotId)
    else require(prevMeta.isDefined,
      "a branch commit needs an existing table — create it on main first")
    val snaps = n.withArray[ArrNode]("snapshots")
    val s0 = snaps.addObject()
    s0.put("snapshot-id", snapshotId)
    parentId.foreach(p => s0.put("parent-snapshot-id", p))
    s0.put("sequence-number", seqNo)
    s0.put("timestamp-ms", nowMs)
    s0.put("manifest-list", listP.toString)
    s0.put("schema-id", curSchemaId)
    val sum = s0.putObject("summary")
    sum.put("operation",
      operation.getOrElse(if (replace) "overwrite" else "append"))
    txn.foreach { case (appId, tv) =>
      sum.put("graft-app-id", appId); sum.put("graft-txn", tv)
    }
    // ---- standard summary counts (all values STRINGS, the spec's
    // Map<String,String>) so foreign engines' snapshots/history views
    // show real numbers. added-* reads only THIS commit's manifests;
    // total-* rolls forward from the previous snapshot's summary
    // (O(1) per append) and falls back to one full manifest walk when
    // the lineage has no recorded totals (first commit after upgrade,
    // foreign history) or the commit restructured the list
    // (overwrite / compaction / rollback / manifest merge). ----
    final case class Tot(records: Long = 0, dataFiles: Long = 0,
                         delFiles: Long = 0, posDel: Long = 0,
                         eqDel: Long = 0, size: Long = 0) {
      def +(o: Tot) = Tot(records + o.records, dataFiles + o.dataFiles,
        delFiles + o.delFiles, posDel + o.posDel, eqDel + o.eqDel, size + o.size)
    }
    // DELETION VECTORS need replacement-aware counting: a superseded
    // DV's manifest entry stays LIVE-listed in carried manifests, but
    // only the highest-sequence DV per data file is real — summing
    // entries naively double-counts every replaced DV forever.
    def isDvEntry(df: GenericRecord): Boolean =
      gInt(df, "content", 0) == 1 &&
        Option(df.getSchema.getField("content_offset"))
          .flatMap(_ => Option(df.get("content_offset"))).isDefined
    def totOf(entries: Seq[GenericRecord], addedOnly: Boolean): Tot =
      entries.foldLeft(Tot()) { (t, e) =>
        val st = Option(e.get("status")).map(_.asInstanceOf[Number].intValue).getOrElse(0)
        if ((addedOnly && st != 1) || (!addedOnly && st == 2)) t
        else {
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          if (isDvEntry(df)) t // DVs counted replacement-aware below
          else {
            val rc = gLong(df, "record_count", 0L)
            val sz = gLong(df, "file_size_in_bytes", 0L)
            gInt(df, "content", 0) match {
              case 0 => t + Tot(records = rc, dataFiles = 1, size = sz)
              case 1 => t + Tot(delFiles = 1, posDel = rc)
              case _ => t + Tot(delFiles = 1, eqDel = rc)
            }
          }
        }
      }
    // (referenced data file, entry sequence, cardinality) per DV entry.
    // `manSeq` is the INHERITANCE default for entries without an
    // explicit sequence_number — the spec's rule is the OWNING
    // manifest's sequence, not this commit's (a foreign-written
    // carried manifest's stale DV must not win the max-by-sequence
    // dedup just because graft is committing now).
    def dvOf(entries: Seq[GenericRecord], addedOnly: Boolean,
             manSeq: Long): Seq[(String, Long, Long)] =
      entries.flatMap { e =>
        val st = Option(e.get("status")).map(_.asInstanceOf[Number].intValue).getOrElse(0)
        if ((addedOnly && st != 1) || (!addedOnly && st == 2)) None
        else {
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          if (!isDvEntry(df)) None
          else Some((df.get("referenced_data_file").toString,
            gLong(e, "sequence_number", manSeq), gLong(df, "record_count", 0L)))
        }
      }
    val conf2 = spark.sparkContext.hadoopConfiguration
    val newEntries: Seq[Seq[GenericRecord]] =
      newManifests.map(nm =>
        if (nm.entries.nonEmpty) nm.entries
        else IcebergFormat.readAvro(conf2, nm.path))
    val addedDvs = newEntries.flatMap(dvOf(_, addedOnly = true, manSeq = seqNo))
    val added = newEntries.map(totOf(_, addedOnly = true))
      .foldLeft(Tot())(_ + _) +
      Tot(delFiles = addedDvs.length, posDel = addedDvs.map(_._3).sum)
    val prevTot: Option[Tot] = prevMeta.flatMap { m =>
      val cur = headIdOf(m)
      m.path("snapshots").elements().asScala
        .find(_.path("snapshot-id").asLong == cur)
        .map(_.path("summary")).filter(_.has("total-records")).map { s1 =>
          def g(k: String) = s1.path(k).asText("0").toLong
          Tot(g("total-records"), g("total-data-files"), g("total-delete-files"),
            g("total-position-deletes"), g("total-equality-deletes"),
            g("total-files-size"))
        }
    }
    // a fresh manifest with status-2 entries restructures live content
    // beyond "append new files" — only the full walk counts that
    val freshRemovals = newEntries.exists(_.exists(e =>
      Option(e.get("status")).exists(_.asInstanceOf[Number].intValue == 2)))
    val totals: Tot =
      if (addedDvs.isEmpty && priorOverride.isEmpty && !replace &&
          !freshRemovals && prevTot.isDefined)
        prevTot.get + added // append-shaped, no DV replacement: nothing removed
      else if (priorOverride.isEmpty && !replace && !freshRemovals &&
          prevTot.isDefined) {
        // DV-adding append-shaped commit (upsert/delete micro-batch):
        // account INCREMENTALLY — the only retirements are the prior
        // live DVs of the files this commit re-vectors, and those
        // resolve from the carried DELETE manifests alone (content!=0
        // in the manifest-list tuple), so an append-heavy table pays
        // O(delete manifests) metadata reads per commit, not a full
        // re-walk of every manifest.
        val reVectored = addedDvs.map(_._1).toSet
        val superseded = graft.pipeline.Par.map(prior.filter(_._3 != 0))(t =>
            dvOf(IcebergFormat.readAvro(conf2, new Path(t._1)),
              addedOnly = false, manSeq = t._4))
          .flatten
          .groupBy(_._1).map { case (_, es) => es.maxBy(_._2) }
          .filter(dv => reVectored.contains(dv._1)).toSeq
        prevTot.get + added + Tot(delFiles = -superseded.size,
          posDel = -superseded.map(_._3).sum)
      } else {
        // full walk with DV dedup: only the HIGHEST-sequence DV per
        // data file is live (the spec's replacement rule)
        val freshByPath = newManifests
          .map(nm => nm.path.toString -> nm.entries).toMap
        val withSeq = prior.map(t => (t._1, t._4)) ++ fresh.map(t => (t._1, t._4))
        val parsed = graft.pipeline.Par.map(withSeq) { case (p, mseq) =>
          val es = freshByPath.get(p).filter(_.nonEmpty)
            .getOrElse(IcebergFormat.readAvro(conf2, new Path(p)))
          (es, mseq)
        }
        val base0 = parsed.map(pe => totOf(pe._1, addedOnly = false))
          .foldLeft(Tot())(_ + _)
        val liveDvs = parsed
          .flatMap { case (es, mseq) => dvOf(es, addedOnly = false, manSeq = mseq) }
          .groupBy(_._1).map { case (_, es) => es.maxBy(_._2) }
        base0 + Tot(delFiles = liveDvs.size, posDel = liveDvs.map(_._3).sum)
      }
    def putN(k: String, v: Long): Unit = sum.put(k, v.toString)
    putN("added-data-files", added.dataFiles)
    putN("added-records", added.records)
    putN("added-files-size", added.size)
    if (added.delFiles > 0) putN("added-delete-files", added.delFiles)
    if (added.posDel > 0) putN("added-position-deletes", added.posDel)
    if (added.eqDel > 0) putN("added-equality-deletes", added.eqDel)
    prevTot.foreach { p =>
      val remFiles = p.dataFiles + added.dataFiles - totals.dataFiles
      val remRecs = p.records + added.records - totals.records
      val remDel = p.delFiles + added.delFiles - totals.delFiles
      val remPos = p.posDel + added.posDel - totals.posDel
      if (remFiles > 0) putN("deleted-data-files", remFiles)
      if (remRecs > 0) putN("deleted-records", remRecs)
      if (remDel > 0) putN("removed-delete-files", remDel)
      // a DV replacement retires the superseded vector's positions
      if (remPos > 0) putN("removed-position-deletes", remPos)
    }
    putN("total-records", totals.records)
    putN("total-files-size", totals.size)
    putN("total-data-files", totals.dataFiles)
    putN("total-delete-files", totals.delFiles)
    putN("total-position-deletes", totals.posDel)
    putN("total-equality-deletes", totals.eqDel)
    // refs: the TARGET ref tracks the new head — main for plain
    // commits, the active branch inside onBranch (main untouched);
    // every other ref carries forward untouched in the deep copy
    val refs =
      if (n.path("refs").isObject) n.path("refs").asInstanceOf[ObjNode]
      else n.putObject("refs")
    val refName = branchCtx.value.getOrElse("main")
    val prevRef = refs.path(refName) // captured before the replace
    val targetRef = refs.putObject(refName)
    targetRef.put("snapshot-id", snapshotId); targetRef.put("type", "branch")
    // a commit advances the ref but never forgets its declared
    // retention (max-ref-age-ms / min-snapshots-to-keep / …)
    Seq("max-ref-age-ms", "min-snapshots-to-keep", "max-snapshot-age-ms")
      .foreach { k =>
        if (prevRef.has(k))
          targetRef.set[JsonNode](k, prevRef.path(k).deepCopy[JsonNode]())
      }
    // snapshot-log tracks MAIN's lineage only (the spec's contract) —
    // branch commits do not append; metadata-log: the version this
    // commit supersedes (both REQUIRED by v2 TableMetadataParser)
    if (branchCtx.value.isEmpty) {
      val sl = n.withArray[ArrNode]("snapshot-log").addObject()
      sl.put("timestamp-ms", nowMs); sl.put("snapshot-id", snapshotId)
    }
    if (base > 0) {
      val ml = n.withArray[ArrNode]("metadata-log").addObject()
      ml.put("timestamp-ms", prevUpdatedMs.getOrElse(nowMs))
      ml.put("metadata-file",
        new Path(root, s"metadata/v$base.metadata.json").toString)
    }

    // THE COMMIT: full write to a hidden temp, then put-if-absent
    // RENAME into the next metadata version — a reader never sees
    // partial bytes, and the rename FAILS when a concurrent writer
    // got there first (never truncates the winner's version)
    val target = new Path(root, s"metadata/v${base + 1}.metadata.json")
    val tmp = new Path(root,
      s"metadata/.tmp-v${base + 1}-${java.util.UUID.randomUUID().toString.take(8)}.json")
    val out = f.create(tmp, false)
    try out.write(M.writerWithDefaultPrettyPrinter().writeValueAsBytes(n))
    finally out.close()
    if (!putIfAbsent(f, tmp, target)) {
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
