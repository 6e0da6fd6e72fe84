package graft

import java.nio.file.Files
import graft.io.DeltaInterop
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence tests for the Delta SQL statement layer
  * (seeded — reproducible): for generated DELETE / UPDATE / MERGE
  * statements whose predicates, assignments, and string literals are
  * deliberately laced with statement keywords (` WHERE `, ` WHEN
  * MATCHED `, `;`, quotes, parens), executing the STATEMENT through
  * `spark.sql` on one table must leave it byte-identical to calling
  * the Scala API (deleteWhere / updateWhere / mergeClauses) with the
  * same expressions on an identical twin table.
  *
  * This pins the statement-splitting layer — WHERE/SET/WHEN boundary
  * location, literal-aware tokenization, alias rewriting — not Spark's
  * expression parser (both sides share it via `expr`). The judged
  * failure modes: a keyword inside a literal mis-splitting the
  * statement, a clause silently dropping, a swapped alias pair
  * resolving against the wrong side. */
class DeltaSqlPropertySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** literals chosen to collide with every statement keyword the
    * splitter must NOT fire on inside quotes */
  private val nasty = Vector(
    "use WHERE wisely",
    "WHEN MATCHED THEN DELETE",
    "a;b -- not a comment",
    "x AND y OR z",
    "SET a = 1, b = 2",
    "it''s quoted",          // SQL-escaped single quote
    "(unbalanced ( parens",
    "USING delta AS s ON",
    "VALUES (1,2) THEN",
    "plain")

  /** the SQL spelling and the value the literal evaluates to */
  private def lit2(s: String): (String, String) = (s"'$s'", s.replace("''", "'"))

  private def freshTwins(prefix: String, rnd: scala.util.Random): (String, String) = {
    val n = 16 + rnd.nextInt(24)
    val rows = (0L until n).map { i =>
      (i, i % (2 + rnd.nextInt(4)), nasty(rnd.nextInt(nasty.length)).replace("''", "'") + s"_$i")
    }
    val df = rows.toDF("id", "grp", "msg")
    val a = Files.createTempDirectory(s"graft-sqlprop-$prefix-a").toString
    val b = Files.createTempDirectory(s"graft-sqlprop-$prefix-b").toString
    DeltaInterop.writeDelta(df, a, Nil)
    DeltaInterop.writeDelta(df, b, Nil)
    (a, b)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.select("id", "grp", "msg").collect().map(_.toString).sorted.toSeq

  private def assertTwins(a: String, b: String, clue: String): Unit = {
    val ca = canon(DeltaInterop.readDelta(spark, a))
    val cb = canon(DeltaInterop.readDelta(spark, b))
    assert(ca == cb, s"$clue\nSQL side: $ca\nAPI side: $cb")
  }

  /** random predicate over (id, grp, msg); same text runs on both sides */
  private def predicate(rnd: scala.util.Random): String = {
    val (nl, _) = lit2(nasty(rnd.nextInt(nasty.length)))
    rnd.nextInt(6) match {
      case 0 => s"id % ${2 + rnd.nextInt(3)} = ${rnd.nextInt(2)}"
      case 1 => s"msg = $nl"
      case 2 => s"grp > ${rnd.nextInt(3)} AND msg <> $nl"
      case 3 => s"(id < ${rnd.nextInt(10)} OR id > ${20 + rnd.nextInt(10)}) AND msg NOT LIKE '%WHERE%'"
      case 4 => s"startswith(msg, $nl) OR grp = ${rnd.nextInt(4)}"
      case _ => s"length(msg) > ${5 + rnd.nextInt(20)}"
    }
  }

  private def setClause(rnd: scala.util.Random): Seq[(String, String)] = {
    val (nl, _) = lit2(nasty(rnd.nextInt(nasty.length)))
    val choices = Vector(
      "msg" -> s"concat($nl, msg)",
      "msg" -> nl,
      "msg" -> s"upper(msg)",
      "grp" -> s"grp + ${10 + rnd.nextInt(5)}",
      "grp" -> s"id % ${2 + rnd.nextInt(5)}")
    rnd.shuffle(choices).take(1 + rnd.nextInt(2)).toMap.toSeq
  }

  test("DELETE: generated keyword-bearing predicates — SQL ≡ Scala API (14 seeds)") {
    (1 to 14).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val (a, b) = freshTwins("del", rnd)
      val p = if (rnd.nextInt(8) == 0) None else Some(predicate(rnd))
      val sqlTxt = s"DELETE FROM delta.`$a`" +
        p.map(t => s" WHERE $t").getOrElse("") +
        (if (rnd.nextBoolean()) ";" else "")
      spark.sql(sqlTxt).collect()
      DeltaInterop.deleteWhere(spark, b, p.map(expr).getOrElse(expr("true")))
      assertTwins(a, b, s"seed=$seed stmt=$sqlTxt")
    }
  }

  test("UPDATE: generated SET lists + literals with WHERE/SET inside — SQL ≡ Scala API (14 seeds)") {
    (1 to 14).foreach { seed =>
      val rnd = new scala.util.Random(1000 + seed)
      val (a, b) = freshTwins("upd", rnd)
      val sets = setClause(rnd)
      val p = if (rnd.nextInt(6) == 0) None else Some(predicate(rnd))
      val sqlTxt = s"UPDATE delta.`$a` SET " +
        sets.map { case (k, v) => s"$k = $v" }.mkString(", ") +
        p.map(t => s" WHERE $t").getOrElse("")
      spark.sql(sqlTxt).collect()
      DeltaInterop.updateWhere(spark, b, p.map(expr).getOrElse(expr("true")),
        sets.map { case (k, v) => k -> expr(v) }.toMap)
      assertTwins(a, b, s"seed=$seed stmt=$sqlTxt")
    }
  }

  test("MERGE: generated clause sets, swapped/arbitrary aliases, nasty literals — SQL ≡ Scala API (10 seeds)") {
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(2000 + seed)
      val (a, b) = freshTwins("mrg", rnd)
      // distinct-key source overlapping ~half the target id range
      val srcRows = rnd.shuffle((0L until 50L).toVector).take(8 + rnd.nextInt(10))
        .map(i => (i, i % 3, nasty(rnd.nextInt(nasty.length)).replace("''", "'") + s"_src$i"))
      val view = s"sqlprop_src_$seed"
      srcRows.toDF("id", "grp", "msg").createOrReplaceTempView(view)
      val (ta, sa) = Vector(("t", "s"), ("s", "t"), ("tgt", "src"), ("x", "y"))(rnd.nextInt(4))
      // condition/assignment text in USER aliases for the SQL side, and
      // the identical text pre-rewritten to t/s for the API side
      def both(txt: String): (String, String) =
        (txt.replace("T_.", s"$ta.").replace("S_.", s"$sa."),
         txt.replace("T_.", "t.").replace("S_.", "s."))
      val (nl, _) = lit2(nasty(rnd.nextInt(nasty.length)))
      val (nl2, _) = lit2(nasty(rnd.nextInt(nasty.length)))

      val matchedCond = if (rnd.nextBoolean()) Some(both(s"S_.grp > 0 AND T_.msg <> $nl")) else None
      val matchedIsDelete = rnd.nextInt(4) == 0
      val matchedSet = both(s"msg = concat(S_.msg, $nl2), grp = S_.grp + 1")
      val insertAll = rnd.nextBoolean()
      val bySourceClause = rnd.nextInt(3) match {
        case 0 => None
        case 1 => Some((Some(both(s"T_.grp = 1")), None)) // DELETE
        case _ => Some((None, Some(both(s"msg = $nl"))))  // unconditional UPDATE
      }

      val sqlTxt = {
        val sb = new StringBuilder
        sb ++= s"MERGE INTO delta.`$a` AS $ta USING $view AS $sa ON $ta.id = $sa.id\n"
        sb ++= s"WHEN MATCHED${matchedCond.map(c => s" AND ${c._1}").getOrElse("")} THEN "
        sb ++= (if (matchedIsDelete) "DELETE" else s"UPDATE SET ${matchedSet._1}")
        sb ++= (if (insertAll) "\nWHEN NOT MATCHED THEN INSERT *"
                else s"\nWHEN NOT MATCHED THEN INSERT (id, grp, msg) VALUES ($sa.id, $sa.grp, $nl)")
        bySourceClause.foreach {
          case (cond, None) =>
            sb ++= s"\nWHEN NOT MATCHED BY SOURCE${cond.map(c => s" AND ${c._1}").getOrElse("")} THEN DELETE"
          case (cond, Some(set)) =>
            sb ++= s"\nWHEN NOT MATCHED BY SOURCE${cond.map(c => s" AND ${c._1}").getOrElse("")} THEN UPDATE SET ${set._1}"
        }
        sb.toString
      }
      spark.sql(sqlTxt).collect()

      // local paren/quote-aware splitter: the test must not lean on the
      // code under test for its own expectation
      def splitTop(txt: String): Seq[String] = {
        val out = Seq.newBuilder[String]; val cur = new StringBuilder
        var depth = 0; var inQ = false
        txt.foreach { c =>
          if (c == '\'') { inQ = !inQ; cur += c }
          else if (!inQ && c == '(') { depth += 1; cur += c }
          else if (!inQ && c == ')') { depth -= 1; cur += c }
          else if (!inQ && depth == 0 && c == ',') { out += cur.toString; cur.clear() }
          else cur += c
        }
        out += cur.toString
        out.result()
      }
      def setMap(txt: String): Map[String, org.apache.spark.sql.Column] =
        splitTop(txt).map { kv =>
          val i = kv.indexOf('=')
          kv.take(i).trim -> expr(kv.drop(i + 1))
        }.toMap
      val apiMatched = DeltaInterop.MatchedClause(
        matchedCond.map(c => expr(c._2)),
        if (matchedIsDelete) Map.empty else setMap(matchedSet._2),
        delete = matchedIsDelete)
      val apiNotMatched = Some((None: Option[org.apache.spark.sql.Column],
        if (insertAll) Map.empty[String, org.apache.spark.sql.Column]
        else Map("id" -> expr("s.id"), "grp" -> expr("s.grp"), "msg" -> expr(nl))))
      val apiBySource = bySourceClause.toSeq.map {
        case (cond, None) =>
          DeltaInterop.MatchedClause(cond.map(c => expr(c._2)), Map.empty, delete = true)
        case (cond, Some(set)) =>
          DeltaInterop.MatchedClause(cond.map(c => expr(c._2)), setMap(set._2))
      }
      // INSERT * through the API spells every column explicitly
      val apiNM =
        if (insertAll) Some((None: Option[org.apache.spark.sql.Column],
          Seq("id", "grp", "msg").map(c => c -> expr(s"s.$c")).toMap))
        else apiNotMatched
      DeltaInterop.mergeClauses(spark, b, srcRows.toDF("id", "grp", "msg"),
        Seq("id"), Seq(apiMatched), apiNM, apiBySource)

      assertTwins(a, b, s"seed=$seed stmt=\n$sqlTxt")
      spark.catalog.dropTempView(view)
    }
  }

  test("Iceberg DML: generated DELETE/UPDATE/MERGE — SQL ≡ Scala API (12 seeds)") {
    import graft.io.{IcebergInterop, IcebergWrite}
    def freshIceTwins(rnd: scala.util.Random): (String, String) = {
      val n = 16 + rnd.nextInt(24)
      val rows = (0L until n).map { i =>
        (i, i % (2 + rnd.nextInt(4)),
          nasty(rnd.nextInt(nasty.length)).replace("''", "'") + s"_$i")
      }
      val df = rows.toDF("id", "grp", "msg")
      val a = Files.createTempDirectory("graft-sqlprop-ice-a").toString
      val b = Files.createTempDirectory("graft-sqlprop-ice-b").toString
      IcebergWrite.append(df, a); IcebergWrite.append(df, b)
      (a, b)
    }
    def canonIce(dir: String): Seq[String] =
      IcebergInterop.readIceberg(spark, dir)
        .select("id", "grp", "msg").collect().map(_.toString).sorted.toSeq
    (1 to 12).foreach { seed =>
      val rnd = new scala.util.Random(4000 + seed)
      val (a, b) = freshIceTwins(rnd)
      // name ≡ path equivalence seeds: a third of the walks address the
      // SQL twin by a registered catalog NAME — the name→path prepass
      // must be observationally identical to the path spelling
      val byName = rnd.nextInt(3) == 0
      val aRef =
        if (byName) {
          IcebergInterop.registerCatalogTable(spark, s"sqlprop_ice_n$seed", a)
          s"sqlprop_ice_n$seed"
        } else s"iceberg.`$a`"
      rnd.nextInt(3) match {
        case 0 => // DELETE
          val p = predicate(rnd)
          val sqlTxt = s"DELETE FROM $aRef WHERE $p" +
            (if (rnd.nextBoolean()) ";" else "")
          val got = spark.sql(sqlTxt).collect()
          val (_, n) = IcebergWrite.deleteWhere(spark, b, expr(p))
          assert(got.head.getLong(0) == n, s"seed=$seed counts diverged")
        case 1 => // UPDATE
          val sets = setClause(rnd)
          val p = if (rnd.nextInt(6) == 0) None else Some(predicate(rnd))
          val sqlTxt = s"UPDATE $aRef SET " +
            sets.map { case (k, v) => s"$k = $v" }.mkString(", ") +
            p.map(t => s" WHERE $t").getOrElse("")
          spark.sql(sqlTxt).collect()
          IcebergWrite.updateWhere(spark, b,
            p.map(expr).getOrElse(expr("true")),
            sets.map { case (k, v) => k -> expr(v) }.toMap)
        case _ => // MERGE (aliases arbitrary/swapped; nasty literals)
          val (ta, sa) = Vector(("t", "s"), ("s", "t"), ("tgt", "src"))(rnd.nextInt(3))
          def both(txt: String): (String, String) =
            (txt.replace("T_.", s"$ta.").replace("S_.", s"$sa."),
             txt.replace("T_.", "t.").replace("S_.", "s."))
          val (nl, _) = lit2(nasty(rnd.nextInt(nasty.length)))
          val srcRows = rnd.shuffle((0L until 50L).toVector).take(8 + rnd.nextInt(10))
            .map(i => (i, i % 3, nasty(rnd.nextInt(nasty.length)).replace("''", "'") + s"_src$i"))
          val view = s"sqlprop_ice_src_$seed"
          srcRows.toDF("id", "grp", "msg").createOrReplaceTempView(view)
          val matchedCond =
            if (rnd.nextBoolean()) Some(both(s"S_.grp > 0 AND T_.msg <> $nl")) else None
          val matchedIsDelete = rnd.nextInt(3) == 0
          val matchedSet = both(s"msg = concat(S_.msg, $nl), grp = S_.grp + 1")
          val insertAll = rnd.nextBoolean()
          val bySourceClause = rnd.nextInt(3) match {
            case 0 => None
            case 1 => Some((Some(both(s"T_.grp = 1")), None)) // DELETE
            case _ => Some((None, Some(both(s"msg = $nl")))) // unconditional UPDATE
          }
          val sqlTxt = {
            val sb = new StringBuilder
            sb ++= s"MERGE INTO $aRef AS $ta USING $view AS $sa ON $ta.id = $sa.id\n"
            sb ++= s"WHEN MATCHED${matchedCond.map(c => s" AND ${c._1}").getOrElse("")} THEN "
            sb ++= (if (matchedIsDelete) "DELETE" else s"UPDATE SET ${matchedSet._1}")
            sb ++= (if (insertAll) "\nWHEN NOT MATCHED THEN INSERT *"
                    else s"\nWHEN NOT MATCHED THEN INSERT (id, grp, msg) VALUES ($sa.id, $sa.grp, $nl)")
            bySourceClause.foreach {
              case (cond, None) =>
                sb ++= s"\nWHEN NOT MATCHED BY SOURCE${cond.map(c => s" AND ${c._1}").getOrElse("")} THEN DELETE"
              case (cond, Some(set)) =>
                sb ++= s"\nWHEN NOT MATCHED BY SOURCE${cond.map(c => s" AND ${c._1}").getOrElse("")} THEN UPDATE SET ${set._1}"
            }
            sb.toString
          }
          spark.sql(sqlTxt).collect()
          def setMap(txt: String): Map[String, org.apache.spark.sql.Column] =
            txt.split(", (?=[a-z]+ =)").map { kv =>
              val i = kv.indexOf('=')
              kv.take(i).trim -> expr(kv.drop(i + 1))
            }.toMap
          val apiMatched = graft.io.DeltaInterop.MatchedClause(
            matchedCond.map(c => expr(c._2)),
            if (matchedIsDelete) Map.empty else setMap(matchedSet._2),
            delete = matchedIsDelete)
          val apiNM = Some((None: Option[org.apache.spark.sql.Column],
            if (insertAll) Map.empty[String, org.apache.spark.sql.Column]
            else Map("id" -> expr("s.id"), "grp" -> expr("s.grp"), "msg" -> expr(nl))))
          val apiBySource = bySourceClause.toSeq.map {
            case (cond, None) =>
              graft.io.DeltaInterop.MatchedClause(cond.map(c => expr(c._2)),
                Map.empty, delete = true)
            case (cond, Some(set)) =>
              graft.io.DeltaInterop.MatchedClause(cond.map(c => expr(c._2)),
                setMap(set._2))
          }
          IcebergWrite.mergeInto(spark, b, srcRows.toDF("id", "grp", "msg"),
            Seq("id"), Seq(apiMatched), apiNM, apiBySource)
          spark.catalog.dropTempView(view)
      }
      assert(canonIce(a) == canonIce(b),
        s"seed=$seed Iceberg SQL and API twins diverged" +
        (if (byName) " (name-addressed)" else ""))
      if (byName) spark.sql(s"DROP VIEW IF EXISTS sqlprop_ice_n$seed")
    }
  }

  test("Iceberg maintenance SQL: OPTIMIZE folds deletes, VACUUM expires, DESCRIBE DETAIL") {
    import graft.io.{IcebergInterop, IcebergWrite}
    val dir = Files.createTempDirectory("graft-sqlprop-ice-maint").toString
    IcebergWrite.append((0L until 60L).map(i => (i, i % 3, s"m_$i"))
      .toDF("id", "grp", "msg").repartitionByRange(3, col("id")), dir)
    spark.sql(s"DELETE FROM iceberg.`$dir` WHERE id < 10").collect()
    val det = spark.sql(s"DESCRIBE DETAIL iceberg.`$dir`").head()
    assert(det.getString(0) == "iceberg" && det.getLong(2) == 2L,
      s"format + format_version: $det")
    assert(det.getLong(4) == 2L && det.getLong(5) == 3L && det.getLong(6) >= 1L,
      s"2 snapshots, 3 data files, >=1 delete file: $det")
    val opt = spark.sql(s"OPTIMIZE iceberg.`$dir`").collect()
    assert(opt.head.getLong(1) >= 1, "OPTIMIZE must fold the delete files")
    assert(!IcebergInterop.readIceberg(spark, dir).inputFiles
      .exists(_.contains("/data/delete-")))
    Thread.sleep(5)
    val vac = spark.sql(s"VACUUM iceberg.`$dir` RETAIN 0 HOURS").collect()
    assert(vac.head.getLong(0) >= 2 && vac.head.getLong(1) > 0,
      s"VACUUM must expire + reclaim: ${vac.head}")
    assert(IcebergInterop.readIceberg(spark, dir).count() == 50)
    val det2 = spark.sql(s"DESCRIBE DETAIL iceberg.`$dir`").head()
    assert(det2.getLong(4) == 1L && det2.getLong(6) == 0L,
      s"post-maintenance: one snapshot, zero delete files: $det2")
  }

  test("Iceberg ALTER TABLE SQL: ADD/RENAME columns, CREATE/DROP TAG and BRANCH") {
    import graft.io.{IcebergInterop, IcebergWrite}
    val dir = Files.createTempDirectory("graft-sqlprop-ice-alter").toString
    val s1 = IcebergWrite.append(
      (0L until 6L).map(i => (i, s"a_$i")).toDF("id", "msg"), dir)
    // metadata-only evolution as SQL; old files surface NULLs
    spark.sql(s"ALTER TABLE iceberg.`$dir` RENAME COLUMN msg TO label").collect()
    spark.sql(s"ALTER TABLE iceberg.`$dir` ADD COLUMNS (score BIGINT, note STRING)")
      .collect()
    val t = IcebergInterop.readIceberg(spark, dir)
    assert(t.columns.toSeq == Seq("id", "label", "score", "note"))
    assert(t.filter(col("label").startsWith("a_")).count() == 6)
    assert(t.filter(col("score").isNull).count() == 6)
    // the next append carries the evolved shape
    IcebergWrite.append(Seq((6L, "b_6", 9L, "n")).toDF("id", "label", "score", "note"), dir)
    assert(IcebergInterop.readIceberg(spark, dir).count() == 7)
    // refs as SQL
    spark.sql(s"ALTER TABLE iceberg.`$dir` CREATE TAG rel-1 AS OF SNAPSHOT $s1").collect()
    assert(spark.sql(s"SELECT count(*) FROM graft_iceberg_ref('$dir', 'rel-1')")
      .head().getLong(0) == 6)
    spark.sql(s"ALTER TABLE iceberg.`$dir` CREATE BRANCH wip").collect()
    assert(IcebergInterop.snapshotOfRef(spark, dir, "wip") != s1)
    spark.sql(s"ALTER TABLE iceberg.`$dir` DROP TAG rel-1").collect()
    intercept[IllegalArgumentException](
      IcebergInterop.snapshotOfRef(spark, dir, "rel-1"))
  }

  test("DDL walks: generated IDENTITY/DEFAULT/CLUSTER BY/TBLPROPERTIES/DROP FEATURE — SQL ≡ Scala API (10 seeds)") {
    // the round-12 DDL statement families, fuzzed the way the DML
    // suite above fuzzes clauses: a random CREATE (same SQL on both
    // twins — creation is one code path), then a random WALK of DDL
    // ops run as SQL on twin A and as the Scala API on twin B, with
    // property values and DEFAULT literals laced with the splitter's
    // keywords. Equivalence = configuration + schema metadata
    // (identity/default/mapping) + clustering + protocol + data.
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(3000 + seed)
      val withIdentity = rnd.nextBoolean()
      val startWith = 1 + rnd.nextInt(7)
      val incBy = Seq(1, 2, 3, -1)(rnd.nextInt(4))
      val (defLit, _) = lit2(nasty(rnd.nextInt(nasty.length)))
      val withDefault = rnd.nextBoolean()
      val clusterAtCreate = rnd.nextInt(3) match {
        case 0 => Nil
        case 1 => Seq("grp")
        case _ => Seq("grp", "id")
      }
      val cols = Seq(
        "id BIGINT",
        if (withIdentity)
          s"seq BIGINT GENERATED ALWAYS AS IDENTITY (START WITH $startWith INCREMENT BY $incBy)"
        else "seq BIGINT",
        if (withDefault) s"msg STRING DEFAULT $defLit" else "msg STRING",
        "grp BIGINT").mkString(", ")
      val createSuffix =
        if (clusterAtCreate.isEmpty) ""
        else s" CLUSTER BY (${clusterAtCreate.mkString(", ")})"
      val a = Files.createTempDirectory(s"graft-ddlprop-a").toString + "/t"
      val b = Files.createTempDirectory(s"graft-ddlprop-b").toString + "/t"
      Seq(a, b).foreach(p => spark.sql(
        s"CREATE TABLE delta.`$p` ($cols) USING delta$createSuffix"))

      def insertBoth(n: Int): Unit = Seq(a, b).foreach { p =>
        val colList = if (withIdentity) "(id, msg, grp)" else "(id, seq, msg, grp)"
        val sel = if (withIdentity) "id, concat('m', id), id % 3"
                  else "id, id * 10, concat('m', id), id % 3"
        spark.sql(s"INSERT INTO delta.`$p` $colList SELECT $sel FROM range($n)")
      }
      insertBoth(6 + rnd.nextInt(6))

      var cdfOnBoth = false
      (0 until 4 + rnd.nextInt(3)).foreach { step =>
        rnd.nextInt(6) match {
          case 0 => // SET TBLPROPERTIES with a keyword-laced value
            val (vl, vv) = lit2(nasty(rnd.nextInt(nasty.length)))
            spark.sql(s"ALTER TABLE delta.`$a` SET TBLPROPERTIES ('graft.k$step' = $vl)")
            DeltaInterop.setTableProperties(spark, b, Map(s"graft.k$step" -> vv))
          case 1 => // UNSET (tolerant of absent keys on both sides)
            spark.sql(s"ALTER TABLE delta.`$a` UNSET TBLPROPERTIES IF EXISTS ('graft.k0')")
            DeltaInterop.unsetTableProperties(spark, b, Seq("graft.k0"))
          case 2 => // flip the msg DEFAULT to a fresh nasty literal
            val (dl, dv) = lit2(nasty(rnd.nextInt(nasty.length)))
            spark.sql(s"ALTER TABLE delta.`$a` ALTER COLUMN msg SET DEFAULT $dl")
            DeltaInterop.setColumnDefault(spark, b, "msg",
              s"'${dv.replace("'", "''")}'")
          case 3 => // re-CLUSTER or un-cluster (NONE only when clustered)
            val clustered = DeltaInterop.state(spark, a).clusteringColumns.nonEmpty
            val next = rnd.nextInt(3) match {
              case 0 if clustered => Nil
              case 0 => Seq("id")
              case 1 => Seq("id")
              case _ => Seq("grp", "id")
            }
            if (next.isEmpty) {
              spark.sql(s"ALTER TABLE delta.`$a` CLUSTER BY NONE")
              DeltaInterop.removeClusteringColumns(spark, b)
            } else {
              spark.sql(s"ALTER TABLE delta.`$a` CLUSTER BY (${next.mkString(", ")})")
              DeltaInterop.setClusteringColumns(spark, b, next)
            }
          case 4 => // enable CDF, maybe later dropped
            spark.sql(s"ALTER TABLE delta.`$a` SET TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')")
            DeltaInterop.setTableProperties(spark, b,
              Map("delta.enableChangeDataFeed" -> "true"))
            cdfOnBoth = true
          case _ => // more rows through the SAME SQL (data keeps moving)
            insertBoth(3 + rnd.nextInt(4))
        }
      }
      if (cdfOnBoth && rnd.nextBoolean()) {
        spark.sql(s"ALTER TABLE delta.`$a` DROP FEATURE changeDataFeed")
        DeltaInterop.dropFeature(spark, b, "changeDataFeed")
      }

      val (sa, sb) = (DeltaInterop.state(spark, a), DeltaInterop.state(spark, b))
      assert(sa.configuration == sb.configuration,
        s"seed=$seed config diverged:\nSQL: ${sa.configuration}\nAPI: ${sb.configuration}")
      assert(sa.schema.json == sb.schema.json,
        s"seed=$seed schema metadata diverged")
      assert(sa.clusteringColumns == sb.clusteringColumns, s"seed=$seed clustering diverged")
      assert(sa.protocol == sb.protocol, s"seed=$seed protocol diverged")
      // data: identity values depend on physical partitioning, so the
      // portable comparison is the non-identity columns (plus identity
      // INVARIANTS: unique, step-aligned from the declared start)
      def rows(p: String) = DeltaInterop.readDelta(spark, p)
        .select("id", "msg", "grp").collect().map(_.toString).sorted.toSeq
      assert(rows(a) == rows(b), s"seed=$seed data diverged")
      if (withIdentity) Seq(a, b).foreach { p =>
        val seqs = DeltaInterop.readDelta(spark, p).select("seq")
          .collect().map(_.getLong(0)).toSeq
        assert(seqs.distinct.length == seqs.length, s"seed=$seed identity collision in $p")
        assert(seqs.forall(v => (v - startWith) % incBy == 0),
          s"seed=$seed identity values off the declared (start, step) lattice")
      }
    }
  }

  test("statements that are NOT graft's stay Spark's: keyword literals in plain SQL") {
    // a SELECT whose literal spells a whole Delta statement must pass
    // through untouched
    assert(spark.sql("SELECT 'DELETE FROM delta.`/x` WHERE 1=1' AS s").count() == 1)
    assert(spark.sql("SELECT 'MERGE INTO delta.`/x` USING y ON 1=1' AS s")
      .head().getString(0).startsWith("MERGE"))
    // UPDATE on an unresolvable name falls through to Spark and fails
    // ANALYSIS (table not found), not graft's parser
    val e = intercept[Exception](spark.sql("UPDATE no_such_tbl_xyz SET a = 1"))
    assert(!e.getMessage.contains("graft"), e.getMessage)
  }
}
