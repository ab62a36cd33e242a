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

  test("weightedHashSample: per-row rates, clamping, constant-weight equivalence") {
    // constant weight 0.25 ≡ hashSample(0.25): 0.25 * 0x10000 is exact,
    // so floor (weighted) and round (thresholdHex) agree
    val w25 = Sampling.weightedHashSample(pop, "id", lit(0.25), "x")
    assert(rows(w25) == rows(Sampling.hashSample(pop, "id", 0.25, "x")))
    // per-row weight: ids < 10000 weight 0.1, rest weight 0.8 — observed
    // rates must track each group's own weight
    val w = when(col("id") < 10000, 0.1).otherwise(0.8)
    val out = Sampling.weightedHashSample(pop, "id", w, "x")
    val lo = out.filter(col("id") < 10000).count() / 10000.0
    val hi = out.filter(col("id") >= 10000).count() / 10000.0
    assert(math.abs(lo - 0.1) < 0.02, s"low-weight rate $lo")
    assert(math.abs(hi - 0.8) < 0.02, s"high-weight rate $hi")
    // clamped edges: <=0 drops, >=1 (incl. past 1) keeps
    assert(Sampling.weightedHashSample(pop, "id", lit(-3.0), "x").count() == 0)
    assert(Sampling.weightedHashSample(pop, "id", lit(7.0), "x").count() == 20000)
    // partition-stable
    assert(rows(Sampling.weightedHashSample(pop.repartition(13), "id", w, "x"))
      == rows(out))
  }

  test("mixToTarget: output proportions hit targets, binding domain kept whole") {
    // domains sized 12000/6000/2000; targets 50:30:20 → binding domain is
    // "c" (2000/0.2 = 10000 = N_out): keep all of c, 5000 of a, 3000 of b
    val pop3 = spark.range(20000).select(col("id"),
      when(col("id") < 12000, "a").when(col("id") < 18000, "b")
        .otherwise("c").as("domain"))
    val out = Sampling.mixToTarget(pop3, "id", "domain",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), salt = "x")
    val byDomain = out.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain("c") == 2000L, s"binding domain must be whole: $byDomain")
    assert(math.abs(byDomain("a") / 5000.0 - 1.0) < 0.05, byDomain.toString)
    assert(math.abs(byDomain("b") / 3000.0 - 1.0) < 0.05, byDomain.toString)
    // deterministic under repartitioning
    assert(rows(Sampling.mixToTarget(pop3.repartition(13), "id", "domain",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), salt = "x")) == rows(out))
    // a domain absent from the targets is dropped entirely
    val withJunk = pop3.withColumn("domain",
      when(col("id") % 100 === 0, "junk").otherwise(col("domain")))
    assert(Sampling.mixToTarget(withJunk, "id", "domain",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), salt = "x")
      .filter(col("domain") === "junk").count() == 0)
  }
}
