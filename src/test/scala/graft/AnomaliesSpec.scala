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

  test("detectDistinctMismatch flags groups with >1 distinct value, sorted list") {
    val d = df(
      """SELECT * FROM VALUES
        |  ('h1', 'c2'), ('h1', 'c1'), ('h1', 'c1'), ('h2', 'c3')
        |  t(hhid, cluster)""".stripMargin)
    val out = Anomalies.detectDistinctMismatch(d, "safety",
      "multi_cluster", Seq("hhid"), "cluster").collect()
    assert(out.length == 1)
    val m = out(0).getValuesMap[Any](Anomalies.schemaColumns)
    assert(m("key") == "h1")
    assert(m("anomalies_description") ==
      "multi_cluster: 2 distinct values, values=c1,c2")
  }

  test("detectConditionalCount counts distinct members under the condition only") {
    val d = df(
      """SELECT * FROM VALUES
        |  ('h1', 'p1', 'Died'), ('h1', 'p2', 'Died'), ('h1', 'p2', 'Died'),
        |  ('h1', 'p3', 'Absent'), ('h2', 'p4', 'Died')
        |  t(hhid, extid, reason)""".stripMargin)
    // threshold 1: only h1 has >1 DISTINCT died members (p2 dup ignored)
    val out = Anomalies.detectConditionalCount(d, "safety", "too_many_died",
      Seq("hhid"), col("reason") === "Died", "extid", 1L).collect()
    assert(out.length == 1)
    val m = out(0).getValuesMap[Any](Anomalies.schemaColumns)
    assert(m("key") == "h1")
    assert(m("anomalies_description") == "too_many_died: 2 members, ids=p1,p2")
  }

  test("detectInvalidCode flags null and listed codes with NA for null") {
    val d = df(
      """SELECT * FROM VALUES
        |  ('k1', 4), ('k2', 10), ('k3', CAST(NULL AS INT))
        |  t(key, code)""".stripMargin)
    val out = Anomalies.detectInvalidCode(d, "f", "bad_code", "key",
      col("code"), Seq(1L, 4L, 6L))
    assert(rows(out.select("key", "anomalies_description")) == Set(
      Seq("k1", "bad_code: code=4"), Seq("k3", "bad_code: code=NA")))
  }

  test("detectMappingMismatch reports rows disagreeing with the truth mapping") {
    val d = df(
      """SELECT * FROM VALUES
        |  ('K1', 'pk1', 'e1'), ('K2', 'pk1', 'e2'), ('K3', 'pk2', 'e3')
        |  t(key, pk_id, extid)""".stripMargin)
    val truth = df(
      "SELECT * FROM VALUES ('pk1', 'e1'), ('pk2', 'e3') t(pk_id, expected)")
    val out = Anomalies.detectMappingMismatch(d, "pk", "map_mismatch",
      col("key"), "pk_id", "extid", truth)
    assert(rows(out.select("key", "anomalies_description")) == Set(
      Seq("K2", "map_mismatch: pk_id=pk1 got=e2 expected=e1")))
  }

  test("detectRepeatCountMismatch compares declared vs actual, missing group = 0") {
    val parent = df(
      """SELECT * FROM VALUES ('h1', 2), ('h2', 1), ('h3', 2)
        |  t(hhid, num_members)""".stripMargin)
    val repeats = df(
      """SELECT * FROM VALUES ('h1', 'p1'), ('h1', 'p2'), ('h2', 'p3'), ('h2', 'p4')
        |  t(hhid, extid)""".stripMargin)
    val out = Anomalies.detectRepeatCountMismatch(parent, "safety",
      "repeat_count_mismatch", "hhid", col("num_members"), repeats, "hhid")
    assert(rows(out.select("key", "anomalies_description")) == Set(
      Seq("h2", "repeat_count_mismatch: declared=1 actual=2"),
      Seq("h3", "repeat_count_mismatch: declared=2 actual=0")))
  }

  test("detectOrphans flags child rows absent from the parent form") {
    val child = df(
      """SELECT * FROM VALUES ('K1', 'h1'), ('K2', 'h2'), ('K3', 'h2'), ('K4', 'h9')
        |  t(key, hhid)""".stripMargin)
    val parent = df("SELECT * FROM VALUES ('h1'), ('h2') t(hhid)")
    val out = Anomalies.detectOrphans(child, "followup", "missing_day0",
      "key", "hhid", parent, "hhid")
    assert(rows(out.select("key", "anomalies_description")) == Set(
      Seq("K4", "missing_day0: hhid=h9 has no row in the parent form")))
  }

  test("detectCombo fires only when every condition holds and lists all values") {
    val d = df(
      """SELECT * FROM VALUES
        |  ('K1', 20.0, 5), ('K2', 20.0, 15), ('K3', 9.0, 5)
        |  t(key, accuracy, mins)""".stripMargin)
    val out = Anomalies.detectCombo(d, "efficacy", "gps_time_combo", "key", Seq(
      ("accuracy", col("accuracy"), col("accuracy") > 15.0),
      ("time_diff", col("mins"), col("mins") < 10)))
    assert(rows(out.select("key", "anomalies_description")) == Set(
      Seq("K1", "gps_time_combo: accuracy=20.0 time_diff=5")))
  }

  test("detectConditionalCountMulti fires on ANY labeled count over threshold") {
    val d = df(
      """SELECT * FROM VALUES
        |  ('h1', 'p1', 'Died'), ('h1', 'p2', 'Died'), ('h1', 'p3', 'Migrated'),
        |  ('h2', 'p4', 'Migrated'), ('h2', 'p5', 'Migrated'), ('h2', 'p6', 'Absent')
        |  t(hhid, extid, reason)""".stripMargin)
    val out = Anomalies.detectConditionalCountMulti(d, "safety", "members_left",
      Seq("hhid"), Seq(
        ("died", col("reason") === "Died"),
        ("migrated", col("reason") === "Migrated")), "extid", 1L)
    assert(rows(out.select("key", "anomalies_description")) == Set(
      Seq("h1", "members_left: died=2 migrated=1"),
      Seq("h2", "members_left: died=0 migrated=2")))
  }

  test("summarize counts by form and rule") {
    val d = df(
      """SELECT * FROM VALUES ('f1','a1'), ('f1','a1'), ('f1','a2')
        |  t(form_id, anomalies_id)""".stripMargin)
    val out = Anomalies.summarize(d, lit("2026-01-01"))
    assert(rows(out) == Set(
      Seq("f1", "a1", 2L, "2026-01-01"), Seq("f1", "a2", 1L, "2026-01-01")))
  }

  test("detectRowBattery == union of the single-rule detectors it fuses") {
    val d = df(
      """SELECT * FROM VALUES
        |  (1, -5.0, 4), (2, 10.0, 2), (3, -1.0, 1), (4, 3.0, CAST(NULL AS INT))
        |  t(id, bal, code)""".stripMargin)
    val fused = Anomalies.detectRowBattery(d, "f", col("id"), Seq(
      ("neg", concat(lit("value="), col("bal").cast("string"),
        lit(" vs threshold=0.0")), col("bal") < 0.0),
      ("badcode", concat(lit("code="),
        coalesce(col("code").cast("string"), lit("NA"))),
        col("code").isNull || col("code").isin(1, 4))))
    val single = Anomalies.detectThreshold(d, "f", "neg", "id", col("bal"),
        0.0, above = false)
      .unionByName(Anomalies.detectInvalidCode(d, "f", "badcode", "id",
        col("code"), Seq(1, 4)))
    assert(rows(fused) == rows(single) && fused.count() == 5)
  }

  test("memberStats matches the countDistinct definition incl. null members") {
    val d = df(
      """SELECT * FROM VALUES
        |  ('g1', 'R', 'm1'), ('g1', 'R', 'm1'), ('g1', 'R', 'm2'),
        |  ('g1', 'A', 'm9'), ('g1', 'R', CAST(NULL AS STRING)),
        |  ('g2', 'X', 'm1')
        |  t(g, flag, member)""".stripMargin)
    val out = Anomalies.memberStats(d, Seq("g"), Seq(
      ("died", col("flag") === "R"), ("migrated", col("flag") === "A")), "member")
    assert(rows(out) == Set(
      Seq("g1", 2L, "m1,m2", 1L, "m9"),
      Seq("g2", 0L, "", 0L, "")))
    // the plan must stay Expand-free (the whole point vs countDistinct)
    assert(!out.queryExecution.executedPlan.toString.contains("Expand"))
  }
}
