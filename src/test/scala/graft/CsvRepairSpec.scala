package graft

import graft.ops.CsvRepair
import org.scalatest.funsuite.AnyFunSuite

class CsvRepairSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("parseLine handles quotes, doubled quotes and skipinitialspace") {
    assert(CsvRepair.parseLine("""a,b,c""").get.toSeq == Seq("a", "b", "c"))
    assert(CsvRepair.parseLine("""a, b,  c""").get.toSeq == Seq("a", "b", "c"))
    assert(CsvRepair.parseLine("""a,"b,с",d""").get.toSeq == Seq("a", "b,с", "d"))
    assert(CsvRepair.parseLine("a,\"say \"\"hi\"\"\",c").get.toSeq == Seq("a", "say \"hi\"", "c"))
    assert(CsvRepair.parseLine("a,,c").get.toSeq == Seq("a", "", "c"))
    // unterminated quote tolerated (python csv yields the rest as a field)
    assert(CsvRepair.parseLine("""a,"unterminated""").get.toSeq == Seq("a", "unterminated"))
  }

  test("align truncates long rows and pads short rows (reference R2)") {
    assert(CsvRepair.align(Array("a", "b", "c", "d"), 3).toSeq == Seq("a", "b", "c"))
    assert(CsvRepair.align(Array("a"), 3).toSeq == Seq("a", "", ""))
  }

  test("repair: header-named all-string frame, malformed rows fixed, unnamed cols dropped") {
    import spark.implicits._
    val lines = Seq(
      "id,name,,amount",       // one unnamed column (dropped)
      "1,alice,junk,10",
      "2,bob,x,20,EXTRA",      // extra field → truncated
      "3,carol",               // short → padded
      "4,\"d,e\",y,40"
    ).toDS()
    val df = CsvRepair.repair(spark, lines).get
    assert(df.columns.toSeq == Seq("id", "name", "amount"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(rows(1) == ("2", "bob", "20"))
    assert(rows(2) == ("3", "carol", ""))
    assert(rows(3) == ("4", "d,e", "40"))
  }

  test("repair on empty input returns None (reference empty guards)") {
    import spark.implicits._
    assert(CsvRepair.repair(spark, spark.emptyDataset[String]).isEmpty)
  }
}
