package graft

import org.apache.spark.sql.functions._
import graft.plans.MinHashSignature

class MinHashSignatureSpec extends SparkSpec {

  test("signature is the element-wise min over the hash family") {
    val d = df("SELECT * FROM VALUES (1L, 10L), (1L, 20L), (1L, 30L) t(id, h)")
    val sig = d.groupBy("id").agg(MinHashSignature(col("h"), 4).as("sig"))
      .head().getSeq[Long](1)
    assert(sig.length == 4)
    // brute-force the same family on the driver
    def fmix(h0: Long): Long = {
      var h = h0
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^ (h >>> 33)
    }
    val mixes = Array.tabulate(4) { i =>
      var z = i.toLong + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z ^ (z >>> 27)
    }
    val want = mixes.map(m => Seq(10L, 20L, 30L).map(h => fmix(h ^ m)).min)
    assert(sig == want.toSeq)
  }

  test("partition-count independent (merge path exercised)") {
    val d = spark.range(100000).select((col("id") % 50).as("id"), xxhash64(col("id")).as("h"))
    val a = d.repartition(1).groupBy("id").agg(MinHashSignature(col("h"), 16).as("sig"))
    val b = d.repartition(17).groupBy("id").agg(MinHashSignature(col("h"), 16).as("sig"))
    assert(rows(a) == rows(b))
  }

  test("null inputs are skipped") {
    val d = df("SELECT * FROM VALUES (1L, CAST(NULL AS BIGINT)), (1L, 5L) t(id, h)")
    val sig = d.groupBy("id").agg(MinHashSignature(col("h"), 2).as("sig"))
      .head().getSeq[Long](1)
    assert(sig.forall(_ != Long.MaxValue))
  }
}
