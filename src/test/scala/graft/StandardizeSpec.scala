package graft

import org.apache.spark.sql.functions._
import graft.operators.Standardize

class StandardizeSpec extends SparkSpec {

  test("cleanColumnNames keeps last dash token") {
    val d = df("SELECT 1 AS `grp-sub-field`, 2 AS plain")
    assert(Standardize.cleanColumnNames(d).columns.toSeq == Seq("field", "plain"))
  }

  test("standardizeCase uppercases and squishes whitespace") {
    val d = df("SELECT '  nguzo   kulalu ' AS v")
      .select(Standardize.standardizeCase(col("v")).as("v"))
    assert(d.head().getString(0) == "NGUZO KULALU")
  }

  test("fixTypos applies replacements in order") {
    val d = df("SELECT 'NGUZ0' AS v")
      .select(Standardize.fixTypos(col("v"), Seq("NGUZ0" -> "NGUZO")).as("v"))
    assert(d.head().getString(0) == "NGUZO")
  }

  test("correctedAge is fractional years") {
    val d = df("SELECT DATE'2000-01-01' AS dob, DATE'2010-01-01' AS asof")
      .select(Standardize.correctedAge(col("dob"), col("asof")).as("age"))
    val age = d.head().getDouble(0)
    assert(math.abs(age - 3653.0 / 365.25) < 1e-9)
  }

  test("padHhid zero-pads to width 5") {
    val d = df("SELECT 42 AS hhid").select(Standardize.padHhid(col("hhid")).as("h"))
    assert(d.head().getString(0) == "00042")
  }

  test("visitNum extracts ordinal") {
    val d = df("SELECT 'V12' AS v").select(Standardize.visitNum(col("v")).as("n"))
    assert(d.head().getInt(0) == 12)
  }

  test("cascadeVisit shifts to next visit and caps") {
    val d = df("SELECT * FROM VALUES ('V1'), ('V4'), ('V5') t(visit)")
    val out = Standardize.cascadeVisit(d, "visit", cap = 5)
    assert(rows(out) == Set(Seq("V2"), Seq("V5")))
  }
}
