package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends SparkSpec {

  test("profiles every column type in one pass with exact null/min/max") {
    val d = df(
      """SELECT * FROM VALUES
        |  (1, CAST(1.5 AS DOUBLE), 'b', TIMESTAMP '2024-01-02 00:00:00'),
        |  (2, NULL,                'a', NULL),
        |  (3, CAST(9.25 AS DOUBLE), NULL, TIMESTAMP '2024-03-01 12:00:00')
        |  t(i, x, s, ts)""".stripMargin)
    val p = Profile.profile(d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("i", "x", "s", "ts"))
    assert(p.values.forall(_.getLong(1) == 3L)) // n_rows
    assert(p("i").getLong(2) == 0L && p("x").getLong(2) == 1L &&
      p("s").getLong(2) == 1L && p("ts").getLong(2) == 1L) // n_nulls
    assert(p("i").getString(3) == "1" && p("i").getString(4) == "3")
    assert(p("x").getString(3) == "1.5" && p("x").getString(4) == "9.25")
    assert(p("s").getString(3) == "a" && p("s").getString(4) == "b")
    assert(p("ts").getString(3).startsWith("2024-01-02"))
    // approx distinct is exact at these cardinalities
    assert(p("i").getLong(5) == 3L && p("s").getLong(5) == 2L)
  }

  test("plan is a single global aggregate: one pass, no per-column scans") {
    val d = spark.range(100).select(col("id"), (col("id") % 7).as("m"))
    val plan = Profile.profile(d).queryExecution.executedPlan.toString
    assert("Scan|Range".r.findAllIn(plan).size <= 2,
      s"profile must read the input once:\n$plan")
  }

  test("histogram quantiles: within one bin width of exact, partition-independent") {
    val d = spark.range(10000)
      .select((col("id") * col("id")).cast("double").as("v")) // skewed
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val est = Profile.histogramQuantiles(d, "v", bins = 200, qs = qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exact = d.selectExpr(
        s"percentile(v, array(${qs.mkString(",")})) AS p")
      .head().getSeq[Double](0)
    val width = (9999.0 * 9999.0 - 0.0) / 200
    qs.zip(exact).foreach { case (q, ex) =>
      assert(math.abs(est(q) - ex) <= width,
        s"q=$q est=${est(q)} exact=$ex width=$width")
    }
    val est2 = Profile.histogramQuantiles(d.repartition(7), "v", 200, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(est == est2)
  }

  test("histogram quantiles ignore nulls: estimates match the null-free input") {
    val clean = spark.range(1000).select(col("id").cast("double").as("v"))
    val withNulls = clean.union(
      spark.range(500).select(lit(null).cast("double").as("v")))
    val qs = Seq(0.1, 0.5, 0.9)
    def est(d: org.apache.spark.sql.DataFrame) =
      Profile.histogramQuantiles(d, "v", 50, qs)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(est(withNulls) == est(clean))
  }
}
