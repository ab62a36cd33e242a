package graft

import org.apache.spark.sql.functions._

/** Invariant + equivalence companion for the g18 ICF aging composite
  * (pipeline-reporting/R/monitoring/icf.Rmd:380-520 semantics).
  *
  * The load-bearing claim of g18's engine plan is that the interval
  * delta / island-union / prefix-sum form reconstructs EXACTLY what the
  * reference's weekly snapshot expansion computes — including the
  * count(DISTINCT extid) that naive +1/-1 deltas would break. The first
  * test states the naive semantics literally in Spark (weeks crossJoin
  * records, per-week anti-join) and pins the two plans row-for-row on
  * sf0.001; the rest pin the branches that a vacuous fixture could
  * silently skip.
  */
class IcfAgingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val out =
    SparkEntry.queries("g18_icf_aging")(spark, sfDir).persist()

  test("g18: delta/prefix-sum form == naive weekly snapshot expansion") {
    val weeks = spark.range(0, 13)
      .select(date_add(lit("1996-01-06").cast("date"), (col("id") * 7).cast("int"))
        .as("run_date"))
    val roster = graft.core.Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("extid"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "safety")
        .otherwise("efficacy").as("study"),
      when(col("o_orderstatus") === "O", "").otherwise(col("o_orderstatus")).as("status"),
      col("o_orderdate").cast("date").as("submit"))
    val icf = graft.core.Tables.lineitem(spark, sfDir).select(
        col("l_orderkey").as("extid"),
        when(col("l_returnflag") === "R", "Rectification")
          .when(col("l_returnflag") === "A", "Archived")
          .otherwise("Lost-Not Found").as("icf_stat"),
        col("l_shipdate").cast("date").as("isubmit"))
      .join(roster.select("extid", "study", "status"), Seq("extid"))
    val icfLegs = weeks.crossJoin(icf)
      .filter(col("isubmit") <= col("run_date"))
      .filter(col("study") === "safety" || col("status") =!= "")
      .select(col("run_date"), col("study"), col("extid"),
        when(col("icf_stat") === "Rectification" &&
          datediff(col("run_date"), col("isubmit")) > 20, "ICF Unresolved >20days")
          .when(col("icf_stat") === "Rectification", "ICF Unresolved")
          .when(col("icf_stat") === "Lost-Not Found", "ICF Missing")
          .otherwise("ICF Archived/Resolved").as("metric_group"))
    val verifiedWeeks = weeks.crossJoin(icf.select("extid", "study", "isubmit"))
      .filter(col("isubmit") <= col("run_date"))
      .select("run_date", "extid", "study").distinct()
    val unvLegs = weeks.crossJoin(roster)
      .filter(col("submit") <= col("run_date"))
      .join(verifiedWeeks, Seq("run_date", "extid", "study"), "left_anti")
      .select(col("run_date"), col("study"), col("extid"),
        when(datediff(col("run_date"), col("submit")) > 30,
          "ICF Missing (Unverified >30 days)")
          .when(datediff(col("run_date"), col("submit")) > 20, "ICF Unverified >20days")
          .otherwise("ICF Unverified").as("metric_group"))
    val naive = icfLegs.unionByName(unvLegs)
      .groupBy("run_date", "study", "metric_group")
      .agg(countDistinct("extid").as("n"))
    assert(rows(out) == rows(naive))
  }

  test("g18: every aging branch fires on the fixture") {
    val groups = out.select("metric_group").distinct()
      .collect().map(_.getString(0)).toSet
    val expected = Set("ICF Unresolved", "ICF Unresolved >20days", "ICF Missing",
      "ICF Archived/Resolved", "ICF Unverified", "ICF Unverified >20days",
      "ICF Missing (Unverified >30 days)")
    assert(groups == expected, s"missing branches: ${expected -- groups}")
  }

  test("g18: both studies present and counts positive") {
    assert(out.select("study").distinct().count() == 2)
    assert(out.filter(col("n") <= 0).isEmpty)
  }

  test("g18: distinct-union is load-bearing (duplicate records per extid)") {
    // at least one (week, study) has a Rectification extid with >1 record
    // whose naive row count would exceed the distinct count — i.e. the
    // islands merge actually collapsed overlapping intervals somewhere
    val icfRecs = graft.core.Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .groupBy("l_orderkey").agg(count(lit(1)).as("c")).filter(col("c") > 1)
    assert(icfRecs.count() > 0, "fixture has no multi-record Rectification extid")
  }
}
