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
}
