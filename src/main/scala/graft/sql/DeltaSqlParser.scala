package graft.sql

import graft.io.DeltaInterop
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

/** SQL front-end for the Delta mutation surface — the reference's
  * end-user contract is SQL over a shared catalog (its users type
  * `MERGE INTO`/`DELETE` in Athena, not Scala), so the graft engine
  * must accept the same statements. Injected via
  * [[graft.GraftExtensions]] (`injectParser`); everything that is not
  * a graft-Delta statement delegates verbatim to Spark's parser, so
  * the full Spark SQL surface is untouched.
  *
  * Path tables use delta-spark's own spelling: ``delta.`/path/to/t` ``.
  *
  * Statements handled (executed through [[graft.io.DeltaInterop]], so
  * every gate — protocol features, appendOnly, constraints, column
  * mapping — applies identically to SQL and Scala callers):
  *
  *   - `DELETE FROM delta.`p` [WHERE cond]` → `deleteWhere`
  *   - `UPDATE delta.`p` SET c = e[, ...] [WHERE cond]` → `updateWhere`
  *   - `MERGE INTO delta.`p` [AS] t USING src [AS] s ON t.k = s.k [AND ...]
  *      WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  *      → `merge` (the canonical upsert-all form; `src` is a table /
  *      temp view name or a parenthesized subquery)
  *   - `INSERT INTO|OVERWRITE delta.`p` <query>` → `writeDelta`
  *      (positional column resolution + cast, Spark INSERT semantics)
  *   - `CREATE TABLE [IF NOT EXISTS] delta.`p` [USING delta]
  *      [PARTITIONED BY (c, ...)] AS <query>` → `writeDelta` (CTAS)
  *   - `DESCRIBE HISTORY delta.`p`` → `history`
  *   - `DESCRIBE DETAIL delta.`p`` / `SHOW TBLPROPERTIES delta.`p``
  *   - `RESTORE [TABLE] delta.`p` TO VERSION AS OF n | TIMESTAMP AS OF 'ts'`
  *   - `VACUUM delta.`p` [RETAIN n HOURS]` → `vacuum`
  *   - `OPTIMIZE delta.`p` [ZORDER BY (c, ...)]` → `compact` / `optimizeZOrder`
  *   - `ALTER TABLE delta.`p` ADD COLUMN c type | RENAME COLUMN a TO b |
  *      SET TBLPROPERTIES (k=v, ...) | ADD CONSTRAINT n CHECK (e)`
  *   - `table_changes('p', from[, to])` anywhere inside a query →
  *      rewritten to a temp view over `readChangeFeed` (the TVF shape
  *      delta-spark exposes), then parsed by Spark as usual.
  *
  * Scale shape: parsing is driver-side string work; execution is the
  * same distributed DeltaInterop paths the Scala API runs (file-pruned
  * scans, distributed DV authoring, broadcast CDF maps). Command
  * results are metadata-sized (affected-row counts, history rows).
  */
class DeltaSqlParser(delegate: ParserInterface) extends ParserInterface {
  import DeltaSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = {
    val t = sqlText.trim
    deleteRe.findFirstMatchIn(t).foreach { m =>
      val (dir, whereOpt) = (m.group(1), Option(m.group(2)))
      return command(Seq(attr("num_affected_rows", LongType))) { spark =>
        val pred = whereOpt.map(parseCol(spark, _))
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        // affected rows from footer-stats metadata (live row count
        // before − after), no extra table scan; a foreign file without
        // numRecords falls back to one predicate-pushed count
        def liveRows(spark: SparkSession): Option[Long] = {
          val fs = DeltaInterop.state(spark, dir).files
          if (fs.exists(_.numRecords < 0)) None
          else Some(fs.map { a =>
            // a DV'd file's live rows = physical rows − masked rows
            val masked =
              if (a.deletionVector == null) 0L
              else new com.fasterxml.jackson.databind.ObjectMapper()
                .readTree(a.deletionVector).path("cardinality").asLong(0L)
            a.numRecords - masked
          }.sum)
        }
        val before = liveRows(spark)
        val counted = if (before.isEmpty)
          Some(DeltaInterop.readDelta(spark, dir).filter(pred).count()) else None
        DeltaInterop.deleteWhere(spark, dir, pred)
        val n = counted.orElse(
          for (b <- before; a <- liveRows(spark)) yield b - a).getOrElse(-1L)
        Seq(Row(n))
      }
    }
    updateRe.findFirstMatchIn(t).foreach { m =>
      val (dir, setsTxt, whereOpt) = (m.group(1), m.group(2), Option(m.group(3)))
      return command(Seq(attr("num_affected_rows", LongType))) { spark =>
        val sets = splitTopLevel(setsTxt, ',').map { a =>
          val i = topLevelIndexOf(a, '=')
          require(i > 0, s"bad SET assignment: $a")
          a.take(i).trim.stripPrefix("`").stripSuffix("`") ->
            parseCol(spark, a.drop(i + 1))
        }.toMap
        val pred = whereOpt.map(parseCol(spark, _))
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        val n = DeltaInterop.readDelta(spark, dir).filter(pred).count()
        DeltaInterop.updateWhere(spark, dir, pred, sets)
        Seq(Row(n))
      }
    }
    mergeRe.findFirstMatchIn(t).foreach { m =>
      val dir = m.group(1)
      val tAlias = Option(m.group(2)).map(_.trim).filter(_.nonEmpty)
      val srcTxt = m.group(3).trim
      val sAlias = Option(m.group(4)).map(_.trim).filter(_.nonEmpty)
      val onTxt = m.group(5)
      return command(Seq(attr("num_files_rewritten", LongType),
        attr("num_inserted_rows", LongType))) { spark =>
        val source =
          if (srcTxt.startsWith("(")) spark.sql(srcTxt.stripPrefix("(").stripSuffix(")"))
          else spark.table(srcTxt.replace("`", ""))
        val keys = splitTopLevel(onTxt, "AND").map { eq =>
          val i = topLevelIndexOf(eq, '=')
          require(i > 0, s"MERGE ON must be conjunctive equalities, got: $eq")
          def colName(s: String) = {
            val parts = s.trim.replace("`", "").split('.')
            (parts.dropRight(1).lastOption, parts.last)
          }
          val (q1, c1) = colName(eq.take(i))
          val (q2, c2) = colName(eq.drop(i + 1))
          require(c1 == c2, s"MERGE ON key must equate the SAME column on both sides: $eq")
          val quals = Set(q1, q2).flatten
          val known = Set(Some("delta"), tAlias, sAlias).flatten ++ Set.empty[String]
          require(quals.forall(known.contains),
            s"unknown qualifier in MERGE ON ($eq); aliases: ${known.mkString(",")}")
          c1
        }
        val (_, rewritten, inserted) = DeltaInterop.merge(spark, dir, source, keys)
        Seq(Row(rewritten.toLong, inserted))
      }
    }
    mergeExtRe.findFirstMatchIn(t).foreach { m =>
      val dir = m.group(1)
      val srcTxt = m.group(3).trim
      val onTxt = m.group(5)
      val clausesTxt = m.group(6)
      return command(Seq(attr("num_files_rewritten", LongType),
        attr("num_inserted_rows", LongType))) { spark =>
        val source =
          if (srcTxt.startsWith("(")) spark.sql(srcTxt.stripPrefix("(").stripSuffix(")"))
          else spark.table(srcTxt.replace("`", ""))
        val keys = splitTopLevel(onTxt, "AND").map { eq =>
          val i = topLevelIndexOf(eq, '=')
          require(i > 0, s"MERGE ON must be conjunctive equalities, got: $eq")
          val c1 = eq.take(i).trim.replace("`", "").split('.').last
          val c2 = eq.drop(i + 1).trim.replace("`", "").split('.').last
          require(c1 == c2, s"MERGE ON key must equate the SAME column on both sides: $eq")
          c1
        }
        val st = DeltaInterop.state(spark, dir)
        def assignments(txt: String): Map[String, org.apache.spark.sql.Column] =
          if (txt.trim == "*")
            st.schema.fieldNames.map(c => c ->
              org.apache.spark.sql.functions.col(s"s.$c")).toMap
          else splitTopLevel(txt, ',').map { a =>
            val i = topLevelIndexOf(a, '=')
            require(i > 0, s"bad assignment: $a")
            val lhs = a.take(i).trim.replace("`", "").split('.').last
            lhs -> parseCol(spark, a.drop(i + 1))
          }.toMap
        val matchedClauses = Seq.newBuilder[DeltaInterop.MatchedClause]
        var notMatched: Option[(Option[org.apache.spark.sql.Column],
          Map[String, org.apache.spark.sql.Column])] = None
        mergeWhenRe.findAllMatchIn(clausesTxt).foreach { w =>
          val isNot = w.group(1) != null
          val cond = Option(w.group(2)).map(parseCol(spark, _))
          (Option(w.group(3)), Option(w.group(4)), Option(w.group(5))) match {
            case (Some(setTxt), _, _) =>
              require(!isNot, "WHEN NOT MATCHED supports INSERT only")
              matchedClauses += DeltaInterop.MatchedClause(cond, assignments(setTxt))
            case (_, Some(_), _) =>
              require(!isNot, "WHEN NOT MATCHED supports INSERT only")
              matchedClauses += DeltaInterop.MatchedClause(cond, Map.empty, delete = true)
            case (_, _, Some(insTxt)) =>
              require(isNot, "INSERT belongs to WHEN NOT MATCHED")
              require(notMatched.isEmpty, "at most one WHEN NOT MATCHED clause")
              val trimmed = insTxt.trim
              val set =
                if (trimmed == "*") Map.empty[String, org.apache.spark.sql.Column]
                else {
                  val im = insertValuesRe.findFirstMatchIn(trimmed).getOrElse(
                    throw new IllegalArgumentException(
                      s"INSERT must be `*` or `(cols) VALUES (exprs)`: $trimmed"))
                  val cols = splitTopLevel(im.group(1), ',')
                    .map(_.replace("`", "").split('.').last)
                  val exprs = splitTopLevel(im.group(2), ',').map(parseCol(spark, _))
                  require(cols.length == exprs.length,
                    s"INSERT column/value arity mismatch: $trimmed")
                  cols.zip(exprs).toMap
                }
              notMatched = Some((cond, set))
            case _ =>
              throw new IllegalArgumentException(s"unparseable MERGE clause: ${w.matched}")
          }
        }
        val (_, rewritten, inserted) = DeltaInterop.mergeClauses(
          spark, dir, source, keys, matchedClauses.result(), notMatched)
        Seq(Row(rewritten.toLong, inserted))
      }
    }
    historyRe.findFirstMatchIn(t).foreach { m =>
      val dir = m.group(1)
      return command(Seq(attr("version", LongType),
        attr("timestamp", org.apache.spark.sql.types.TimestampType),
        attr("operation", StringType), attr("engineInfo", StringType))) { spark =>
        DeltaInterop.history(spark, dir).collect().toSeq
      }
    }
    restoreRe.findFirstMatchIn(t).foreach { m =>
      val dir = m.group(1)
      return command(Seq(attr("version", LongType),
        attr("num_files_readded", LongType),
        attr("num_files_removed", LongType))) { spark =>
        val v =
          if (m.group(2) != null) m.group(2).toLong
          else DeltaInterop.versionAtTimestamp(spark, dir, parseTs(m.group(3)))
        val (nv, added, removed) = DeltaInterop.restore(spark, dir, v)
        Seq(Row(nv, added.toLong, removed.toLong))
      }
    }
    insertRe.findFirstMatchIn(t).foreach { m =>
      val (mode, dir, query) = (m.group(1), m.group(2), m.group(3).trim)
      return command(Nil) { spark =>
        val df = spark.sql(query)
        val st = DeltaInterop.state(spark, dir)
        require(df.columns.length == st.schema.fields.length,
          s"INSERT provides ${df.columns.length} columns; table has ${st.schema.fields.length}")
        // positional resolution, then cast to the table's types —
        // Spark SQL INSERT semantics for path tables
        val aligned = df.toDF(st.schema.fieldNames.toIndexedSeq: _*)
          .select(st.schema.fields.map(f =>
            org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
        DeltaInterop.writeDelta(aligned, dir, st.partitionColumns,
          overwrite = mode.equalsIgnoreCase("OVERWRITE"))
        Nil
      }
    }
    ctasRe.findFirstMatchIn(t).foreach { m =>
      val ifNotExists = m.group(1) != null
      val (dir, partTxt, query) = (m.group(2), Option(m.group(3)), m.group(4).trim)
      return command(Nil) { spark =>
        if (DeltaInterop.latestVersion(spark, dir) >= 0) {
          require(ifNotExists, s"Delta table already exists at $dir")
        } else {
          val partCols = partTxt.toSeq.flatMap(_.split(',')).map(_.trim.replace("`", ""))
            .filter(_.nonEmpty)
          DeltaInterop.writeDelta(spark.sql(query), dir, partCols)
        }
        Nil
      }
    }
    cloneRe.findFirstMatchIn(t).foreach { m =>
      val (dst, src) = (m.group(1), m.group(2))
      return command(Seq(attr("version", LongType))) { spark =>
        Seq(Row(DeltaInterop.shallowClone(spark, src, dst)))
      }
    }
    convertRe.findFirstMatchIn(t).foreach { m =>
      val (dir, partTxt) = (m.group(1), Option(m.group(2)))
      return command(Seq(attr("version", LongType))) { spark =>
        // PARTITIONED BY entries may carry types (`lang string`) — only
        // the names matter here (types come from schema inference)
        val partCols = partTxt.toSeq.flatMap(_.split(','))
          .map(_.trim.replace("`", "").split("\\s+").head).filter(_.nonEmpty)
        Seq(Row(DeltaInterop.convertToDelta(spark, dir, partCols)))
      }
    }
    vacuumRe.findFirstMatchIn(t).foreach { m =>
      val (dir, hours) = (m.group(1), Option(m.group(2)).map(_.toDouble))
      return command(Seq(attr("num_files_reclaimed", LongType))) { spark =>
        val n = hours match {
          case Some(h) => DeltaInterop.vacuum(spark, dir,
            retainMillis = (h * 3600 * 1000).toLong)
          case None => DeltaInterop.vacuum(spark, dir)
        }
        Seq(Row(n.toLong))
      }
    }
    optimizeRe.findFirstMatchIn(t).foreach { m =>
      val (dir, zTxt) = (m.group(1), Option(m.group(2)))
      return command(Seq(attr("num_files_removed", LongType),
        attr("num_files_added", LongType))) { spark =>
        val (_, removed, added) = zTxt match {
          case Some(cols) => DeltaInterop.optimizeZOrder(spark, dir,
            cols.split(',').map(_.trim.replace("`", "")).filter(_.nonEmpty).toSeq)
          case None => DeltaInterop.compact(spark, dir)
        }
        Seq(Row(removed.toLong, added.toLong))
      }
    }
    alterAddColRe.findFirstMatchIn(t).foreach { m =>
      val (dir, colName, dtypeTxt) = (m.group(1),
        m.group(2).replace("`", ""), m.group(3).trim)
      return command(Seq(attr("version", LongType))) { spark =>
        Seq(Row(DeltaInterop.addColumn(spark, dir, colName,
          delegate.parseDataType(dtypeTxt))))
      }
    }
    alterRenameColRe.findFirstMatchIn(t).foreach { m =>
      val (dir, from, to) = (m.group(1),
        m.group(2).replace("`", ""), m.group(3).replace("`", ""))
      return command(Seq(attr("version", LongType))) { spark =>
        Seq(Row(DeltaInterop.renameColumn(spark, dir, from, to)))
      }
    }
    alterSetPropsRe.findFirstMatchIn(t).foreach { m =>
      val (dir, propsTxt) = (m.group(1), m.group(2))
      return command(Seq(attr("version", LongType))) { spark =>
        val props = splitTopLevel(propsTxt, ',').map { kv =>
          val i = topLevelIndexOf(kv, '=')
          require(i > 0, s"bad TBLPROPERTIES entry: $kv")
          def unq(s: String) = {
            val x = s.trim
            if (x.length >= 2 && ((x.head == '\'' && x.last == '\'') ||
              (x.head == '"' && x.last == '"'))) x.substring(1, x.length - 1) else x
          }
          unq(kv.take(i)) -> unq(kv.drop(i + 1))
        }.toMap
        Seq(Row(DeltaInterop.setTableProperties(spark, dir, props)))
      }
    }
    alterConstraintRe.findFirstMatchIn(t).foreach { m =>
      val (dir, name, exprTxt) = (m.group(1), m.group(2), m.group(3).trim)
      return command(Seq(attr("version", LongType))) { spark =>
        Seq(Row(DeltaInterop.addConstraint(spark, dir, name, exprTxt)))
      }
    }
    describeDetailRe.findFirstMatchIn(t).foreach { m =>
      val dir = m.group(1)
      return command(Seq(attr("format", StringType), attr("location", StringType),
        attr("version", LongType), attr("numFiles", LongType),
        attr("sizeInBytes", LongType), attr("partitionColumns", StringType),
        attr("properties", StringType),
        attr("minReaderVersion", LongType), attr("minWriterVersion", LongType))) { spark =>
        val st = DeltaInterop.state(spark, dir)
        Seq(Row("delta", dir, st.version, st.files.length.toLong,
          st.files.map(_.size).sum, st.partitionColumns.mkString(","),
          st.configuration.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(","),
          st.protocol.minReader.toLong, st.protocol.minWriter.toLong))
      }
    }
    showPropsRe.findFirstMatchIn(t).foreach { m =>
      val dir = m.group(1)
      return command(Seq(attr("key", StringType), attr("value", StringType))) { spark =>
        DeltaInterop.state(spark, dir).configuration.toSeq.sorted
          .map { case (k, v) => Row(k, v) }
      }
    }
    val rewritten = rewriteReads(t)
    if (rewritten ne t) return delegate.parsePlan(rewritten)
    delegate.parsePlan(sqlText)
  }

  private def parseCol(spark: SparkSession, txt: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(delegate.parseExpression(txt.trim))

  /** Substitute graft-Delta READ references with temp views so the
    * surrounding query parses and optimizes as plain Spark SQL:
    *   - `table_changes('p', from[, to])` → a view over
    *     `readChangeFeed` (delta-spark's CDF TVF shape);
    *   - `delta.`p` [VERSION AS OF n]` in a FROM position → a view over
    *     `readDelta` (optionally time-traveled).
    * Returns the input reference unchanged (eq) when nothing matched,
    * so the common non-Delta statement costs two regex probes. */
  private def rewriteReads(sql: String): String = {
    val hasTc = tableChangesRe.findFirstIn(sql).isDefined
    val hasPath = deltaPathRe.findFirstIn(sql).isDefined
    if (!hasTc && !hasPath) return sql
    val spark = SparkSession.active
    var i = 0
    val afterTc =
      if (!hasTc) sql
      else tableChangesRe.replaceAllIn(sql, m => {
        val dir = m.group(1)
        val from = m.group(2).toLong
        val to = Option(m.group(3)).map(_.toLong)
          .getOrElse(DeltaInterop.latestVersion(spark, dir))
        i += 1
        val view = s"graft_table_changes_$i"
        DeltaInterop.readChangeFeed(spark, dir, from, to)
          .createOrReplaceTempView(view)
        view
      })
    if (!hasPath) afterTc
    else deltaPathRe.replaceAllIn(afterTc, m => {
      val dir = m.group(1)
      val version = Option(m.group(2)).map(_.toLong).orElse(
        Option(m.group(3)).map(ts =>
          DeltaInterop.versionAtTimestamp(spark, dir, parseTs(ts))))
      i += 1
      val view = s"graft_delta_read_$i"
      DeltaInterop.readDelta(spark, dir, version).createOrReplaceTempView(view)
      view
    })
  }

  override def parseQuery(sqlText: String): LogicalPlan = {
    val rewritten = rewriteReads(sqlText)
    if (rewritten ne sqlText) delegate.parseQuery(rewritten)
    else delegate.parseQuery(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object DeltaSqlParser {
  // delta-spark's path-table spelling: delta.`/absolute/or/relative/path`
  private val T = """(?i)delta\s*\.\s*`([^`]+)`"""

  private[sql] val deleteRe =
    s"""(?is)^\\s*DELETE\\s+FROM\\s+$T\\s*(?:WHERE\\s+(.+?))?\\s*;?\\s*$$""".r
  private[sql] val updateRe =
    s"""(?is)^\\s*UPDATE\\s+$T\\s+SET\\s+(.+?)\\s*(?:WHERE\\s+(.+?))?\\s*;?\\s*$$""".r
  private[sql] val mergeRe =
    (s"""(?is)^\\s*MERGE\\s+INTO\\s+$T(?:\\s+(?:AS\\s+)?(\\w+))?\\s+""" +
     s"""USING\\s+(\\(.*?\\)|[\\w`.]+)(?:\\s+(?:AS\\s+)?(\\w+))?\\s+ON\\s+(.+?)\\s+""" +
     s"""WHEN\\s+MATCHED\\s+THEN\\s+UPDATE\\s+SET\\s+\\*\\s+""" +
     s"""WHEN\\s+NOT\\s+MATCHED\\s+THEN\\s+INSERT\\s+\\*\\s*;?\\s*$$""").r
  // general MERGE: arbitrary ordered WHEN clauses after ON
  private[sql] val mergeExtRe =
    (s"""(?is)^\\s*MERGE\\s+INTO\\s+$T(?:\\s+(?:AS\\s+)?(\\w+))?\\s+""" +
     s"""USING\\s+(\\(.*?\\)|[\\w`.]+)(?:\\s+(?:AS\\s+)?(\\w+))?\\s+ON\\s+(.+?)\\s+""" +
     s"""(WHEN\\s+.+?)\\s*;?\\s*$$""").r
  private[sql] val mergeWhenRe =
    ("""(?is)WHEN\s+(NOT\s+)?MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+""" +
     """(?:UPDATE\s+SET\s+(.+?)|(DELETE)|INSERT\s+(.+?))\s*""" +
     """(?=WHEN\s+(?:NOT\s+)?MATCHED|$)""").r
  private[sql] val insertValuesRe =
    """(?is)^\(([^)]*)\)\s*VALUES\s*\((.*)\)$""".r
  private[sql] val historyRe =
    s"""(?is)^\\s*DESCRIBE\\s+HISTORY\\s+$T\\s*;?\\s*$$""".r
  private[sql] val restoreRe =
    (s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$T\\s+TO\\s+""" +
     s"""(?:VERSION\\s+AS\\s+OF\\s+(\\d+)|TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)')\\s*;?\\s*$$""").r
  private[sql] val insertRe =
    s"""(?is)^\\s*INSERT\\s+(INTO|OVERWRITE)\\s+(?:TABLE\\s+)?$T\\s+(SELECT\\b.+|VALUES\\b.+|TABLE\\b.+|FROM\\b.+)$$""".r
  private[sql] val ctasRe =
    (s"""(?is)^\\s*CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?$T""" +
     s"""(?:\\s+USING\\s+delta)?(?:\\s+PARTITIONED\\s+BY\\s*\\(([^)]*)\\))?""" +
     s"""\\s+AS\\s+(.+)$$""").r
  private[sql] val cloneRe =
    s"""(?is)^\\s*CREATE\\s+TABLE\\s+$T\\s+SHALLOW\\s+CLONE\\s+$T\\s*;?\\s*$$""".r
  private[sql] val convertRe =
    ("""(?is)^\s*CONVERT\s+TO\s+DELTA\s+parquet\s*\.\s*`([^`]+)`""" +
     """(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?\s*;?\s*$""").r
  private[sql] val vacuumRe =
    s"""(?is)^\\s*VACUUM\\s+$T(?:\\s+RETAIN\\s+([\\d.]+)\\s+HOURS?)?\\s*;?\\s*$$""".r
  private[sql] val optimizeRe =
    s"""(?is)^\\s*OPTIMIZE\\s+$T(?:\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\))?\\s*;?\\s*$$""".r
  private[sql] val alterAddColRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+$T\\s+ADD\\s+COLUMNS?\\s*""" +
     s"""\\(?\\s*([\\w`]+)\\s+([\\w()<>,\\s]+?)\\s*\\)?\\s*;?\\s*$$""").r
  private[sql] val alterRenameColRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$T\\s+RENAME\\s+COLUMN\\s+([\\w`]+)\\s+TO\\s+([\\w`]+)\\s*;?\\s*$$""".r
  private[sql] val alterSetPropsRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$T\\s+SET\\s+TBLPROPERTIES\\s*\\((.+)\\)\\s*;?\\s*$$""".r
  private[sql] val alterConstraintRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$T\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*$$""".r
  private[sql] val describeDetailRe =
    s"""(?is)^\\s*DESCRIBE\\s+DETAIL\\s+$T\\s*;?\\s*$$""".r
  private[sql] val showPropsRe =
    s"""(?is)^\\s*SHOW\\s+TBLPROPERTIES\\s+$T\\s*;?\\s*$$""".r

  /** 'yyyy-MM-dd HH:mm:ss[.f]' or ISO-8601 instant → epoch millis. */
  private[sql] def parseTs(s: String): Long =
    try java.sql.Timestamp.valueOf(s).getTime
    catch {
      case _: IllegalArgumentException =>
        try java.time.Instant.parse(s).toEpochMilli
        catch {
          case _: java.time.format.DateTimeParseException =>
            java.sql.Date.valueOf(s).getTime
        }
    }
  private[sql] val tableChangesRe =
    """(?is)table_changes\s*\(\s*'([^']+)'\s*,\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)""".r
  // a read reference: delta.`p` with optional time travel (version or timestamp)
  private[sql] val deltaPathRe =
    """(?is)delta\s*\.\s*`([^`]+)`(?:\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?""".r

  private def attr(name: String, dt: DataType): Attribute =
    AttributeReference(name, dt, nullable = true)()

  private def command(out: Seq[Attribute])(body: SparkSession => Seq[Row]): LogicalPlan =
    GraftDeltaCommand(out, body)

  /** Split on a top-level separator (not inside parens/backticks/quotes). */
  private[sql] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0; var i = 0; var inQ = false; var inB = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else if (inB) { if (c == '`') inB = false }
      else c match {
        case '\'' => inQ = true
        case '`' => inB = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case x if x == sep && depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Split on a top-level KEYWORD separator (case-insensitive, word-bounded). */
  private[sql] def splitTopLevel(s: String, sep: String): Seq[String] = {
    val re = s"(?i)\\b${java.util.regex.Pattern.quote(sep)}\\b".r
    // find keyword occurrences at paren depth 0
    val cuts = re.findAllMatchIn(s).filter { m =>
      val prefix = s.take(m.start)
      prefix.count(_ == '(') == prefix.count(_ == ')') &&
        prefix.count(_ == '`') % 2 == 0 && prefix.count(_ == '\'') % 2 == 0
    }.toSeq
    val bounds = (0 +: cuts.flatMap(m => Seq(m.start, m.end))) :+ s.length
    bounds.grouped(2).collect { case Seq(a, b) => s.substring(a, b).trim }
      .filter(_.nonEmpty).toSeq
  }

  private[sql] def topLevelIndexOf(s: String, c: Char): Int = {
    var depth = 0; var i = 0; var inQ = false; var inB = false
    while (i < s.length) {
      val x = s.charAt(i)
      if (inQ) { if (x == '\'') inQ = false }
      else if (inB) { if (x == '`') inB = false }
      else x match {
        case '\'' => inQ = true
        case '`' => inB = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case y if y == c && depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    -1
  }
}

/** A graft-Delta SQL statement as an eagerly-run command (the same
  * execution shape Spark gives its own DDL/DML): `run` fires once when
  * the `spark.sql(...)` Dataset materializes, and the metadata-sized
  * result rows become the statement's output. */
case class GraftDeltaCommand(override val output: Seq[Attribute],
                             body: SparkSession => Seq[Row])
  extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = body(sparkSession)
}
