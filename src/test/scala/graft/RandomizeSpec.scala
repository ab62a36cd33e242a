package graft

import org.apache.spark.sql.functions._
import graft.operators.Randomize

class RandomizeSpec extends SparkSpec {

  private def units = spark.range(96).select(
    col("id").cast("string").as("cluster"),
    when(col("id") % 2 === 0, "north").otherwise("south").as("stratum"),
    (col("id") % 17).cast("double").as("age"))

  test("assignArms: balanced within stratum, deterministic, seed-sensitive") {
    val a = Randomize.assignArms(units, "cluster", Seq("stratum"), Seq("ivm", "ctl"), seed = 123)
    val counts = a.groupBy("stratum", "arm").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(math.abs(counts(("north", "ivm")) - counts(("north", "ctl"))) <= 1)
    assert(math.abs(counts(("south", "ivm")) - counts(("south", "ctl"))) <= 1)
    // deterministic across partitionings
    val b = Randomize.assignArms(units.repartition(7), "cluster", Seq("stratum"), Seq("ivm", "ctl"), 123)
    assert(rows(a) == rows(b))
    // different seed → different permutation
    val c = Randomize.assignArms(units, "cluster", Seq("stratum"), Seq("ivm", "ctl"), 124)
    assert(rows(a) != rows(c))
  }

  test("selectCohort: eligibility window, at most k per group, no duplicates") {
    val people = spark.range(2000).select(
      col("id").cast("string").as("extid"),
      (col("id") % 96).cast("string").as("cluster"),
      (col("id") % 20).cast("double").as("age"))
    val sel = Randomize.selectCohort(people, Seq("cluster"), "extid", k = 5,
      seed = 17, eligible = col("age") >= 5 && col("age") <= 15)
    val agg = sel.groupBy("cluster").agg(count(lit(1)).as("n"),
      countDistinct("extid").as("nd")).collect()
    agg.foreach { r => assert(r.getLong(1) <= 5 && r.getLong(1) == r.getLong(2)) }
    assert(sel.filter(col("age") < 5 || col("age") > 15).count() == 0)
    // stable under re-run
    val again = Randomize.selectCohort(people, Seq("cluster"), "extid", 5,
      17, col("age") >= 5 && col("age") <= 15)
    assert(rows(sel) == rows(again))
  }
}
