package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  private def pop = spark.range(20000).select(col("id"),
    (col("id") % 3).cast("string").as("stratum"))

  test("hashSample: rate within tolerance, partition-stable, salt-sensitive") {
    val a = Sampling.hashSample(pop, "id", 0.3, "x")
    val n = a.count().toDouble
    assert(math.abs(n / 20000 - 0.3) < 0.02, s"rate ${n / 20000}")
    assert(rows(Sampling.hashSample(pop.repartition(13), "id", 0.3, "x")) == rows(a))
    assert(rows(Sampling.hashSample(pop, "id", 0.3, "y")) != rows(a))
  }

  test("hashSample: nested property — smaller fraction is a subset of larger") {
    val small = rows(Sampling.hashSample(pop, "id", 0.1, "x"))
    val large = rows(Sampling.hashSample(pop, "id", 0.4, "x"))
    assert(small.subsetOf(large))
  }

  test("stratifiedHashSample applies per-stratum rates; absent strata drop") {
    val s = Sampling.stratifiedHashSample(pop, "id", "stratum",
      Map("0" -> 0.6, "1" -> 0.2), salt = "x")
    val byStratum = s.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byStratum("0") / 6667.0 - 0.6) < 0.05)
    assert(math.abs(byStratum("1") / 6667.0 - 0.2) < 0.05)
    assert(!byStratum.contains("2"), "unlisted stratum fully dropped")
  }

  test("edge fractions: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.hashSample(pop, "id", 0.0).count() == 0)
    assert(Sampling.hashSample(pop, "id", 1.0).count() == 20000)
  }
}
