package graft

import org.apache.spark.sql.functions._
import graft.operators.{Anomalies, Compaction}

class CompactionSpec extends SparkSpec {

  private def fragmented(): String = {
    val root = graft.core.TempDirs.scratch("cspec_frag_").toString
    val s = spark; import s.implicits._
    val rows = (1L to 300L).map(i => (i, s"v$i", (i % 2).toInt))
    val day0 = java.time.LocalDate.of(2026, 3, 1)
    for (off <- 0 to 1)
      Anomalies.writeHistory(
        rows.filter(_._3 == off).map(r => (r._1, r._2)).toDF("id", "v")
          .repartition(8),
        root, day0.plusDays(off))
    root
  }

  test("compact to one file per partition preserves content exactly") {
    val frag = fragmented()
    val dst = graft.core.TempDirs.scratch("cspec_out_").toString
    Compaction.compact(spark, frag, dst, "partition_date")
    val before = Compaction.partitionFileCounts(spark, frag, "partition_date")
    val after = Compaction.partitionFileCounts(spark, dst, "partition_date")
    assert(before.forall(_._2 == 8), s"fixture must be fragmented: $before")
    assert(after.forall(_._2 == 1), s"expected one file per partition: $after")
    assert(rows(spark.read.parquet(dst).select("id", "v")) ==
      rows(spark.read.parquet(frag).select("id", "v")))
  }

  test("maxRecordsPerFile splits each partition deterministically, content intact") {
    val frag = fragmented()
    val dst = graft.core.TempDirs.scratch("cspec_out2_").toString
    // 150 rows per partition, cap 60 -> ceil(150/60) = 3 files
    Compaction.compact(spark, frag, dst, "partition_date",
      maxRecordsPerFile = 60L)
    val after = Compaction.partitionFileCounts(spark, dst, "partition_date")
    assert(after.forall(_._2 == 3), s"expected 3 files per partition: $after")
    assert(rows(spark.read.parquet(dst).select("id", "v")) ==
      rows(spark.read.parquet(frag).select("id", "v")))
  }

  test("partition pruning works identically on the compacted layout") {
    val frag = fragmented()
    val dst = graft.core.TempDirs.scratch("cspec_out3_").toString
    Compaction.compact(spark, frag, dst, "partition_date")
    val pruned = spark.read.parquet(dst)
      .filter(col("partition_date") === lit(java.sql.Date.valueOf("2026-03-02")))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("partition_date"), "pruning must reach the scan")
    assert(pruned.count() == 150)
  }
}
