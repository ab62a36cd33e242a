package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** Pins the production (xxhash64-bucket) path of the hashed linear
  * classifier — the registry row t29 pins the md5 family against the
  * DuckDB oracle; this spec pins everything the oracle can't see.
  */
class ClassifierSpec extends SparkSpec {

  private def docs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "good words here"),
      (2L, "bad words"),
      (3L, ""),
      (4L, "good words here")).toDF("doc_id", "text")
  }

  private def xxWeights(n: Int) =
    spark.range(n).select(col("id").cast("string").as("bucket"),
      (col("id") % 7 - 3).as("weight"))

  private def noHitWeights = {
    val s = spark; import s.implicits._
    Seq(("zzz-no-such-bucket", 5L)).toDF("bucket", "weight")
  }

  test("xxhash64 path: one row per doc, deterministic, identical text = identical score") {
    val out = Classifier.scoreHashed(docs, "doc_id", "text",
      xxWeights(64), "bucket", "weight", Classifier.xxBucket(64), bias = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 4)
    val out2 = Classifier.scoreHashed(docs, "doc_id", "text",
      xxWeights(64), "bucket", "weight", Classifier.xxBucket(64), bias = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == out2, "scoring must be deterministic")
    assert(out(1L) == out(4L), "same text must score identically")
  }

  test("doc with no matching tokens scores exactly the bias") {
    // empty text splits to [""], which hashes somewhere — use a weights
    // table that only covers a bucket space no token can reach
    val out = Classifier.scoreHashed(docs, "doc_id", "text",
      noHitWeights, "bucket", "weight", Classifier.xxBucket(64), bias = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.forall(_ == 7L))
  }

  test("threshold splits kept on score >= threshold") {
    val out = Classifier.scoreHashed(docs, "doc_id", "text",
      xxWeights(64), "bucket", "weight", Classifier.xxBucket(64),
      bias = 0L, threshold = 1L)
      .collect().map(r => (r.getLong(1), r.getBoolean(2)))
    assert(out.forall { case (s, k) => k == (s >= 1L) })
  }

  test("null-text doc scores exactly the bias even with full bucket coverage") {
    // xxhash64 of an all-null input returns the seed, so an unguarded
    // bucket expression maps the explode_outer null token to a REAL
    // bucket; with every bucket carrying a weight, that doc would score
    // bias+weight. The guard keeps the bucket NULL -> left join miss.
    val s = spark; import s.implicits._
    val withNull = Seq((1L, "good words"), (2L, null: String))
      .toDF("doc_id", "text")
    val out = Classifier.scoreHashed(withNull, "doc_id", "text",
      xxWeights(64), "bucket", "weight", Classifier.xxBucket(64), bias = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) == 100L,
      s"null-text doc must score the bias, got ${out(2L)}")
  }

  test("plan shape: weights join is a broadcast, not a shuffle join") {
    val plan = Classifier.scoreHashed(docs, "doc_id", "text",
      xxWeights(64), "bucket", "weight", Classifier.xxBucket(64), bias = 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join for the weights table, got:\n$plan")
  }
}
