package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Packing

class PackingSpec extends SparkSpec {

  private def toks = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"))

  private def reference = {
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    toks.withColumn("shard",
      floor((sum(col("n_tokens")).over(w).cast("double") - col("n_tokens")) / 2000)
        .cast("bigint"))
  }

  test("matches the global-window reference for any bucket width") {
    val expected = rows(reference)
    for (width <- Seq(1L, 7L, 128L, 1000000L)) {
      val got = rows(Packing.tokenShards(toks, "doc_id", "n_tokens", 2000, width))
      assert(got == expected, s"bucketWidth=$width diverged")
    }
  }

  test("data-sized window is bucket-partitioned, not a global ordered exchange") {
    val plan = Packing.tokenShards(toks, "doc_id", "n_tokens", 2000, 128)
      .queryExecution.executedPlan.toString
    // the cumulative sum over rows must carry a partition spec (__b);
    // only the tiny per-bucket totals may flow through SinglePartition
    assert(plan.contains("windowspecdefinition(__b"),
      s"expected the row-level window partitioned by __b:\n$plan")
  }

  test("stable under repartitioning") {
    val a = rows(Packing.tokenShards(toks.repartition(13), "doc_id", "n_tokens", 2000, 64))
    val b = rows(Packing.tokenShards(toks.repartition(1), "doc_id", "n_tokens", 2000, 64))
    assert(a == b)
  }

  test("packSequences: first-fit-decreasing on a hand example") {
    // shard 0, capacity 10: sorted desc = 7(a),6(b),4(c),3(d),2(e),1(f)
    // FFD: a->bin1(rem 3), b->bin2(rem 4), c->bin2(rem 0, fits exactly),
    //      d->bin1(rem 0), e->bin3(rem 8), f->bin3(rem 7)
    val d = df("""SELECT * FROM VALUES
      (1L, 7L, 0L), (2L, 6L, 0L), (3L, 4L, 0L),
      (4L, 3L, 0L), (5L, 2L, 0L), (6L, 1L, 0L) t(id, n, shard)""")
    val got = Packing.packSequences(d, "id", "n", "shard", seqLen = 10)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 3L, 6L -> 3L))
  }

  test("packSequences: oversize doc opens its own bin; ties break by id") {
    val d = df("""SELECT * FROM VALUES
      (1L, 15L, 0L), (2L, 8L, 0L), (3L, 8L, 0L) t(id, n, shard)""")
    val got = Packing.packSequences(d, "id", "n", "shard", seqLen = 10)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    // 15 > capacity: own bin, nothing joins it; the equal 8s order by id
    assert(got == Seq(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("packSequences invariants on real docs: every doc once, no bin over capacity, deterministic") {
    val shards = Packing.tokenShards(toks, "doc_id", "n_tokens", 2000, 128)
    val packed = Packing.packSequences(shards, "doc_id", "n_tokens", "shard", seqLen = 128)
    val joined = packed.join(toks, "doc_id")
    assert(packed.count() == toks.count())
    assert(packed.select("doc_id").distinct().count() == toks.count())
    val maxLoad = joined.groupBy("shard", "bin").agg(sum("n_tokens").as("load"))
      .agg(max("load")).head().getLong(0)
    assert(maxLoad <= 128, s"bin over capacity: $maxLoad")
    val again = rows(Packing.packSequences(
      shards.repartition(17), "doc_id", "n_tokens", "shard", seqLen = 128))
    assert(again == rows(packed))
  }
}
