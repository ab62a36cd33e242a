package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Value pins for the round-15 work beyond the cross-engine oracles:
  * the null-payload failure-ledger law (ADVICE r14) and the g41 lab
  * summary cascade/normalization branches.
  */
class Round15Spec extends SparkSpec {

  // ---- ADVICE r14: null payloads in the reconcile ledger -------------------

  test("reconcile: a null payload fails ONCE and never regrows failed_v") {
    val store = graft.core.TempDirs.scratch("m12null_").toString
    val ids = spark.range(4).select(col("id").as("doc_id"))
    // ids 0-2 carry real images; id 3 presents a NULL payload. Before
    // the sentinel hash, the (id, null) key matched no anti-join, so
    // every reconcile re-attempted the decode and appended a duplicate
    // failure row — failed_v grew without bound for that id.
    def present(sub: org.apache.spark.sql.DataFrame) =
      Multimodal.withImagePayload(sub, "doc_id")
        .withColumn("payload",
          when(col("doc_id") === 3, lit(null).cast("binary"))
            .otherwise(col("payload")))
    val r1 = Multimodal.reconcileStatsBy(
      spark, ids, "doc_id", present, "payload", store)
    assert((r1.decoded, r1.total, r1.failed) == ((3L, 3L, 1L)), s"run 1: $r1")
    val r2 = Multimodal.reconcileStatsBy(
      spark, ids, "doc_id", present, "payload", store)
    assert((r2.decoded, r2.total, r2.failed) == ((0L, 3L, 0L)), s"run 2: $r2")
    val r3 = Multimodal.reconcileStatsBy(
      spark, ids, "doc_id", present, "payload", store)
    assert((r3.decoded, r3.total, r3.failed) == ((0L, 3L, 0L)), s"run 3: $r3")
    // exactly ONE failure row ever written, under the sentinel hash
    val failedDirs = graft.core.Fs.listDir(java.nio.file.Path.of(store))
      .map(_.getFileName.toString).filter(_.startsWith("failed_v"))
    assert(failedDirs == List("failed_v1"), s"failed versions: $failedDirs")
    val failed = spark.read.parquet(s"$store/failed_v1").collect()
    assert(failed.length == 1 && failed(0).getLong(0) == 3L)
    // the sentinel is md5 of the empty byte string on BOTH hash paths
    assert(failed(0).getString(1) == "d41d8cd98f00b204e9800998ecf8427e")
    // content arriving for the id re-attempts and joins the stats table
    val r4 = Multimodal.reconcileStatsBy(
      spark, ids, "doc_id",
      sub => Multimodal.withImagePayload(sub, "doc_id"), "payload", store)
    assert((r4.decoded, r4.total, r4.failed) == ((1L, 4L, 0L)), s"run 4: $r4")
  }

  test("reconcile: no scratch dirs survive a reconcile (staged decode)") {
    val store = graft.core.TempDirs.scratch("m12scr_").toString
    val ids = spark.range(3).select(col("id").as("doc_id"))
    def present(sub: org.apache.spark.sql.DataFrame) =
      Multimodal.withImagePayload(sub, "doc_id")
    Multimodal.reconcileStatsBy(spark, ids, "doc_id", present, "payload", store)
    Multimodal.reconcileStatsBy(spark, ids, "doc_id", present, "payload", store)
    val leftover = graft.core.Fs.listDir(java.nio.file.Path.of(store))
      .map(_.getFileName.toString).filter(_.startsWith("scratch_"))
    assert(leftover.isEmpty, s"scratch dirs left behind: $leftover")
  }
}
