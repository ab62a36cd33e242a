package graft

import org.apache.spark.sql.functions._
import graft.operators.RdtScan

/** Goldens hand-traced from the reference flowchart
  * (evaluate_rdts.R:84-131); every branch of the pf-positive streak
  * logic, the skipped-visit rule, the NA (null) outcome, and the
  * previous-visit treatment offset is exercised.
  */
class RdtScanSpec extends SparkSpec {

  private def visits = df(
    """SELECT extid, CAST(vn AS INT) AS visit_number, CAST(day AS BIGINT) AS day,
      |       pan_result, pf_result, child_took_coartem FROM VALUES
      |  ('p1', 1, 0,  '',         'Positive', 'no'),
      |  ('p1', 2, 10, '',         'Positive', 'yes'),
      |  ('p1', 3, 20, '',         'Positive', 'no'),
      |  ('p1', 4, 30, '',         'Positive', 'no'),
      |  ('p1', 6, 40, '',         'Positive', 'no'),
      |  ('p1', 7, 50, '',         '',         'no'),
      |  ('p1', 8, 60, '',         'Positive', 'no'),
      |  ('p2', 1, 0,  'Negative', 'Negative', 'no'),
      |  ('p2', 2, 31, 'Positive', '',         'yes'),
      |  ('p2', 3, 41, '',         'Negative', 'no')
      |  t(extid, vn, day, pan_result, pf_result, child_took_coartem)""".stripMargin)

  private def evaluated =
    RdtScan.evaluate(visits, "extid", "visit_number", "day")

  test("matches the reference flowchart branch for branch") {
    val got = evaluated.collect().map { r =>
      (r.getString(0), r.getInt(1)) ->
        ((if (r.isNullAt(6)) null else r.getInt(6),
          if (r.isNullAt(7)) null else r.getInt(7),
          if (r.isNullAt(8)) null else r.getBoolean(8)))
    }.toMap
    // p1 trace:
    // v1 enrollment, pf Positive -> incident TRUE, days null
    assert(got(("p1", 1)) == ((null, null, true)))
    // v2 consecutive, prev incident TRUE, prev pf Positive, prev co no -> TRUE
    assert(got(("p1", 2)) == ((10, 10, true)))
    // v3 consecutive, prev TRUE, prev pf Positive, prev co yes -> FALSE;
    // days_at_risk = 10 - 14 (previous visit treated; may go negative)
    assert(got(("p1", 3)) == ((10, -4, false)))
    // v4 prev incident known FALSE -> TRUE
    assert(got(("p1", 4)) == ((10, 10, true)))
    // v6 skipped v5 -> TRUE regardless of streak
    assert(got(("p1", 6)) == ((10, 10, true)))
    // v7 pan blank-ish, pf blank -> unknown (NA)
    assert(got(("p1", 7)) == ((10, 10, null)))
    // v8 prev pf not Positive -> TRUE (prev incident NA does not clear it)
    assert(got(("p1", 8)) == ((10, 10, true)))
    // p2 trace: enrollment both Negative -> FALSE (not NA)
    assert(got(("p2", 1)) == ((null, null, false)))
    // pan Positive always incident
    assert(got(("p2", 2)) == ((31, 31, true)))
    // pf Negative -> FALSE; previous visit treated -> 10 - 14
    assert(got(("p2", 3)) == ((10, -4, false)))
  }

  test("recurrence is partition-count independent") {
    val a = RdtScan.evaluate(visits.repartition(1), "extid", "visit_number", "day")
    val b = RdtScan.evaluate(visits.repartition(5), "extid", "visit_number", "day")
    assert(rows(a) == rows(b))
  }

  test("a lag()-only formulation disagrees: the streak needs the scan") {
    // naive "pf positive and previous pf not positive" misses p1 v4:
    // incident because the PREVIOUS COMPUTED flag is false, even though
    // the previous pf was Positive
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("extid").orderBy("visit_number")
    val naive = visits.withColumn("incident_case",
      col("pf_result") === "Positive" &&
        coalesce(lag(col("pf_result"), 1).over(w), lit("")) =!= "Positive")
    val n = naive.filter(col("extid") === "p1" && col("visit_number") === 4)
      .head().getAs[Boolean]("incident_case")
    val s = evaluated.filter(col("extid") === "p1" && col("visit_number") === 4)
      .head().getAs[Boolean]("incident_case")
    assert(!n && s, "computed-flag dependence is invisible to lag()")
  }
}
