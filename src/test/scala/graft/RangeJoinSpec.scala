package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  private def points = spark.range(1000).select(col("id"),
    (col("id").cast("double") * 7.3 % 500).as("p"))
  private def intervals = spark.range(100).select(col("id").as("iid"),
    (col("id").cast("double") * 4.9 % 450).as("lo"))
    .withColumn("hi", col("lo") + (col("iid") % 5 + 1).cast("double") * 13)

  test("matches the naive range join exactly, each pair once") {
    val naive = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select("id", "iid")
    for (width <- Seq(5.0, 20.0, 100.0)) {
      val bucketed = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", width)
        .select("id", "iid")
      assert(bucketed.count() == naive.count(), s"width $width: duplicate or lost matches")
      assert(rows(bucketed) == rows(naive), s"width $width")
    }
  }

  test("plans as an equi-join, not a nested-loop join") {
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 20.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
  }

  test("empty and inverted intervals match nothing; giant intervals capped") {
    val bad = df("""SELECT * FROM (VALUES (1L, 10.0, 10.0), (2L, 20.0, 5.0))
                   |  t(iid, lo, hi)""".stripMargin)
    assert(RangeJoin.pointInInterval(points, "p", bad, "lo", "hi", 5.0).count() == 0)
    val giant = df("SELECT 1L AS iid, 0.0 AS lo, 1e9 AS hi")
    assert(RangeJoin.pointInInterval(points, "p", giant, "lo", "hi", 1.0,
      maxBucketsPerInterval = 1000).count() == 0, "over-cap interval dropped")
    assert(RangeJoin.pointInInterval(points, "p", giant, "lo", "hi", 1e7).count()
      == 1000L, "wide buckets keep the giant interval joinable")
  }
}
