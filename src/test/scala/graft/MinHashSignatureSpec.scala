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

  test("scalar MinHashSketch bit-identical to the explode+aggregate path") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val viaAgg = docs
      .select(col("doc_id"),
        explode(graft.plans.ShingleHashes(col("text"), 2)).as("s"))
      .groupBy("doc_id")
      .agg(MinHashSignature(col("s"), 16).as("sig"), count(lit(1)).as("n"))
      .select(col("doc_id"), col("sig"), col("n").cast("int").as("n"))
    val viaSketch = docs
      .select(col("doc_id"), graft.plans.MinHashSketch(col("text"), 2, 16).as("sk"))
      .select(col("doc_id"), col("sk.sig").as("sig"), col("sk.n").as("n"))
      .filter(col("n") > 0)
    assert(rows(viaAgg) == rows(viaSketch))
  }

  test("MinHashSketch: sub-n-gram doc yields n=0, all-MaxValue signature") {
    val r = df("SELECT 'solo' AS t")
      .select(graft.plans.MinHashSketch(col("t"), 2, 4).as("sk"))
      .select(col("sk.n"), col("sk.sig")).head()
    assert(r.getInt(0) == 0)
    assert(r.getSeq[Long](1).forall(_ == Long.MaxValue))
  }

  test("MinHashSketch generated code compiles (CODEGEN_ONLY)") {
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      val n = docs.select(graft.plans.MinHashSketch(col("text"), 2, 8).as("sk"))
        .filter(col("sk.n") > 0).count()
      assert(n > 0)
    } finally {
      prevMode.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFb.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
