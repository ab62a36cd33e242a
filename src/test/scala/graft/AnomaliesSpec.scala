package graft

import org.apache.spark.sql.functions._
import graft.operators.Anomalies

class AnomaliesSpec extends SparkSpec {

  test("detectDuplication emits one anomaly per duplicated group with sorted ids") {
    val d = df(
      """SELECT * FROM VALUES
        |  ('V1', 'h1', 'kB'), ('V1', 'h1', 'kA'), ('V1', 'h2', 'k3')
        |  t(visit, hhid, key)""".stripMargin)
    val out = Anomalies.detectDuplication(d, "safety", "dup_hh", Seq("visit", "hhid"), "key")
    val r = out.collect()
    assert(r.length == 1)
    val m = r(0).getValuesMap[Any](Anomalies.schemaColumns)
    assert(m("form_id") == "safety" && m("anomalies_id") == "dup_hh")
    assert(m("resolution_id") == "safety__V1|h1__dup_hh")
    assert(m("anomalies_description").toString.contains("ids=kA,kB"))
    assert(m("resolution_status") == "to_do")
  }

  test("detectThreshold flags above and below") {
    val d = df("SELECT * FROM VALUES ('k1', 20.0), ('k2', 5.0) t(key, acc)")
    val above = Anomalies.detectThreshold(d, "f", "acc_gt", "key", col("acc"), 15.0)
    assert(rows(above.select("key")) == Set(Seq("k1")))
    val below = Anomalies.detectThreshold(d, "f", "acc_lt", "key", col("acc"), 15.0, above = false)
    assert(rows(below.select("key")) == Set(Seq("k2")))
  }

  test("consolidate unions detector outputs all-string with blanks") {
    val a = df("SELECT 'k' AS key, 1 AS extra")
    val b = df("SELECT 'j' AS key")
    val out = Anomalies.consolidate(Seq(a, b))
    assert(rows(out) == Set(Seq("k", "1"), Seq("j", "")))
  }

  test("summarize counts by form and rule") {
    val d = df(
      """SELECT * FROM VALUES ('f1','a1'), ('f1','a1'), ('f1','a2')
        |  t(form_id, anomalies_id)""".stripMargin)
    val out = Anomalies.summarize(d, lit("2026-01-01"))
    assert(rows(out) == Set(
      Seq("f1", "a1", 2L, "2026-01-01"), Seq("f1", "a2", 1L, "2026-01-01")))
  }
}
