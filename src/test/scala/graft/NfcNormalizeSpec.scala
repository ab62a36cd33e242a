package graft

import org.apache.spark.sql.functions._
import graft.plans.NfcNormalize

class NfcNormalizeSpec extends SparkSpec {

  // decomposed fixtures are built by concatenating "́" (combining
  // acute) at runtime so no editor/tool can silently pre-compose a
  // source literal; NB Spark SQL's chr() is byte-ranged (chr(769)
  // wraps to 0x01) and CANNOT build this fixture

  test("composes combining sequences; already-NFC strings pass through") {
    val src = spark.range(1).select(
      concat(lit("e"), lit("\u0301"), lit("clair")).as("dec"),
      lit("ascii only").as("plain"),
      lit(null).cast("string").as("n"))
    val r = src.select(
      NfcNormalize(col("dec")).as("a"),
      NfcNormalize(col("plain")).as("b"),
      NfcNormalize(col("n")).as("c")).head()
    assert(r.getString(0) == "éclair") // é precomposed
    assert(r.getString(1) == "ascii only")
    assert(r.isNullAt(2))
  }

  test("codepoint length contracts under composition") {
    val r = spark.range(1)
      .select(concat(lit("e"), lit("\u0301")).as("s"))
      .select(length(col("s")).as("before"),
        length(NfcNormalize(col("s"))).as("after"))
      .head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 1)
  }

  test("participates in whole-stage codegen") {
    val q = spark.range(10)
      .select(NfcNormalize(
        concat(lit("e"), lit("\u0301"), col("id").cast("string"))).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("nfc_normalize") && !plan.contains("CodegenFallback"), plan)
    assert(q.collect().forall(_.getString(0).startsWith("é")))
  }
}
