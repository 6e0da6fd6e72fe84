package graft.sql

import org.scalatest.funsuite.AnyFunSuite

/** Pure parser-layer units for the Delta SQL front-end: the statement
  * regexes, top-level splitters, and timestamp parsing — no Spark
  * session, no tables. (Statement SEMANTICS are covered end-to-end in
  * DeltaSqlSpec.) */
class DeltaSqlParserUnitSpec extends AnyFunSuite {

  test("splitTopLevel(char) respects parens, quotes, and backticks") {
    assert(DeltaSqlParser.splitTopLevel("a = 1, b = f(x, y), c = 'p,q'", ',') ==
      Seq("a = 1", "b = f(x, y)", "c = 'p,q'"))
    assert(DeltaSqlParser.splitTopLevel("`we,ird` = 2, z = 3", ',') ==
      Seq("`we,ird` = 2", "z = 3"))
    assert(DeltaSqlParser.splitTopLevel("solo", ',') == Seq("solo"))
  }

  test("splitTopLevel(keyword) is case-insensitive and paren-aware") {
    assert(DeltaSqlParser.splitTopLevel("t.a = s.a AND t.b = s.b", "AND") ==
      Seq("t.a = s.a", "t.b = s.b"))
    assert(DeltaSqlParser.splitTopLevel("t.a = s.a and t.b = s.b", "AND") ==
      Seq("t.a = s.a", "t.b = s.b"))
    // an AND inside parens is NOT a separator
    assert(DeltaSqlParser.splitTopLevel("t.k = s.k AND (x > 1 AND y < 2)", "AND").length == 2)
    // ...and neither is an AND inside a string literal
    assert(DeltaSqlParser.splitTopLevel("a = 'x AND y' AND b = 1", "AND").length == 2)
  }

  test("topLevelIndexOf finds the first separator outside nesting") {
    assert(DeltaSqlParser.topLevelIndexOf("a = b = c", '=') == 2)
    assert(DeltaSqlParser.topLevelIndexOf("f(a = b) = c", '=') == 9)
    assert(DeltaSqlParser.topLevelIndexOf("'a = b'", '=') == -1)
  }

  test("parseTs accepts SQL timestamps, ISO instants, and bare dates") {
    assert(DeltaSqlParser.parseTs("2026-01-02 03:04:05") ==
      java.sql.Timestamp.valueOf("2026-01-02 03:04:05").getTime)
    assert(DeltaSqlParser.parseTs("2026-01-02T03:04:05Z") ==
      java.time.Instant.parse("2026-01-02T03:04:05Z").toEpochMilli)
    assert(DeltaSqlParser.parseTs("2026-01-02") ==
      java.sql.Date.valueOf("2026-01-02").getTime)
  }

  test("statement regexes match across casing, whitespace, and trailing semicolons") {
    assert(DeltaSqlParser.deleteRe.findFirstIn(
      "delete from DELTA.`/tmp/t` where id < 5 ;").isDefined)
    assert(DeltaSqlParser.deleteRe.findFirstIn("DELETE FROM delta.`/t`").isDefined)
    assert(DeltaSqlParser.updateRe.findFirstIn(
      "UPDATE delta.`/t`\n  SET a = 1, b = c + 1\n  WHERE d > 0").isDefined)
    assert(DeltaSqlParser.vacuumRe.findFirstIn("VACUUM delta.`/t` RETAIN 0.5 HOURS").isDefined)
    assert(DeltaSqlParser.optimizeRe.findFirstIn("optimize delta.`/t` zorder by (a, b)").isDefined)
    assert(DeltaSqlParser.restoreRe.findFirstIn(
      "RESTORE TABLE delta.`/t` TO TIMESTAMP AS OF '2026-01-01'").isDefined)
    assert(DeltaSqlParser.convertRe.findFirstIn(
      "CONVERT TO DELTA parquet.`/lake` PARTITIONED BY (lang string)").isDefined)
    assert(DeltaSqlParser.cloneRe.findFirstIn(
      "CREATE TABLE delta.`/dst` SHALLOW CLONE delta.`/src`").isDefined)
    // non-delta statements must NOT match
    assert(DeltaSqlParser.deleteRe.findFirstIn("DELETE FROM plain_table").isEmpty)
    assert(DeltaSqlParser.updateRe.findFirstIn("UPDATE t SET a = 1").isEmpty)
  }

  test("MERGE clause segmentation: ordered WHEN clauses with conditions") {
    val txt = """WHEN MATCHED AND s.x > 1 THEN UPDATE SET a = s.a, b = t.b + 1
                |WHEN MATCHED THEN DELETE
                |WHEN NOT MATCHED AND s.ok THEN INSERT (a, b) VALUES (s.a, 0)""".stripMargin
    val ms = DeltaSqlParser.mergeWhenRe.findAllMatchIn(txt).toList
    assert(ms.length == 3)
    assert(ms(0).group(1) == null && ms(0).group(2).trim == "s.x > 1" &&
      ms(0).group(3).trim.startsWith("a = s.a"))
    assert(ms(1).group(4) == "DELETE")
    assert(ms(2).group(1) != null && ms(2).group(5).trim.startsWith("(a, b)"))
    // the extended MERGE statement regex captures target/source/on/clauses
    val m = DeltaSqlParser.mergeExtRe.findFirstMatchIn(
      s"MERGE INTO delta.`/t` t USING src s ON t.k = s.k\n$txt").get
    assert(m.group(1) == "/t" && m.group(5).trim == "t.k = s.k")
  }

  test("read-reference regex captures version and timestamp travel") {
    val m1 = DeltaSqlParser.deltaPathRe.findFirstMatchIn(
      "SELECT * FROM delta.`/t` VERSION AS OF 7").get
    assert(m1.group(1) == "/t" && m1.group(2) == "7" && m1.group(3) == null)
    val m2 = DeltaSqlParser.deltaPathRe.findFirstMatchIn(
      "SELECT * FROM delta.`/t` TIMESTAMP AS OF '2026-01-01 00:00:00'").get
    assert(m2.group(2) == null && m2.group(3) == "2026-01-01 00:00:00")
    val m3 = DeltaSqlParser.deltaPathRe.findFirstMatchIn("FROM delta.`/t` WHERE x").get
    assert(m3.group(2) == null && m3.group(3) == null)
  }

  test("table_changes regex: two- and three-arg forms") {
    val m = DeltaSqlParser.tableChangesRe.findFirstMatchIn(
      "SELECT * FROM table_changes('/t', 2, 5)").get
    assert(m.group(1) == "/t" && m.group(2) == "2" && m.group(3) == "5")
    val m2 = DeltaSqlParser.tableChangesRe.findFirstMatchIn(
      "select count(*) from TABLE_CHANGES('/t', 0)").get
    assert(m2.group(3) == null)
  }
}
