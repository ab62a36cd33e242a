package graft

import org.apache.spark.sql.functions._
import graft.operators.RdtScan

class RdtScanSpec extends SparkSpec {

  private def visits = df(
    """SELECT extid, CAST(d AS DATE) AS d, positive, treated FROM VALUES
      |  ('p1', '2024-01-01', true,  false),
      |  ('p1', '2024-01-20', true,  true),
      |  ('p1', '2024-01-30', true,  false),
      |  ('p1', '2024-03-01', true,  false),
      |  ('p2', '2024-01-01', false, false),
      |  ('p2', '2024-02-01', true,  true),
      |  ('p2', '2024-02-10', true,  false)
      |  t(extid, d, positive, treated)""".stripMargin)

  test("incident cases depend on carried state, not just the previous row") {
    val out = RdtScan.evaluate(visits, "extid", "d")
      .select("extid", "d", "incident_case", "days_at_risk")
    val got = out.collect().map(r =>
      (r.getString(0), r.getDate(1).toString) -> (r.getBoolean(2), r.getInt(3))).toMap
    // p1: untreated positive carries indefinitely → Jan 20 not incident;
    // treatment on Jan 20 ends episode Feb 3 → Jan 30 still carried;
    // Mar 1 (past episode end) is a NEW incident.
    assert(got(("p1", "2024-01-01")) == (true, 0))
    assert(got(("p1", "2024-01-20")) == (false, 5)) // gap 19 - 14 treated
    assert(got(("p1", "2024-01-30")) == (false, 10))
    assert(got(("p1", "2024-03-01")) == (true, 31))
    // p2: negative first; treated positive Feb 1; Feb 10 carried (≤ Feb 15)
    assert(got(("p2", "2024-01-01")) == (false, 0))
    assert(got(("p2", "2024-02-01")) == (true, 17)) // gap 31 - 14
    assert(got(("p2", "2024-02-10")) == (false, 9))
  }

  test("recurrence is partition-count independent") {
    val a = RdtScan.evaluate(visits.repartition(1), "extid", "d")
    val b = RdtScan.evaluate(visits.repartition(5), "extid", "d")
    assert(rows(a) == rows(b))
  }

  test("a lag()-only formulation disagrees: carried state needs the scan") {
    // the naive "incident = positive && !lag(positive)" misses that p1's
    // Mar 1 should be incident (episode expired) — prove the scan differs
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("extid").orderBy("d")
    val naive = visits.withColumn("incident_case",
      col("positive") && !coalesce(lag(col("positive"), 1).over(w), lit(false)))
    val scan = RdtScan.evaluate(visits, "extid", "d")
    val n = naive.filter(col("extid") === "p1" && col("d") === "2024-03-01")
      .head().getAs[Boolean]("incident_case")
    val s = scan.filter(col("extid") === "p1" && col("d") === "2024-03-01")
      .head().getAs[Boolean]("incident_case")
    assert(!n && s, "scan must re-open expired episodes where lag cannot")
  }
}
