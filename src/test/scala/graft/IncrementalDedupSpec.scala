package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Pins the production (xxhash64-family) incremental near-dup operator:
  * sketching only the NEW batch and probing the STORED corpus signatures
  * must find exactly the new-vs-old pairs that a full minhashLshPairs run
  * over the union finds — incrementality changes the COST of adding a
  * batch, never the answer. (The registry row s22 pins the md5-family
  * oracle twin of the same shape; this spec pins the engine-hash path.)
  */
class IncrementalDedupSpec extends SparkSpec {

  private val N = 2      // shingle size
  private val K = 16     // minhashes
  private val B = 4      // bands
  private val T = 0.3    // jaccard threshold

  /** ~30 docs with deliberate near-dup structure straddling the
    * new/old split (new = doc_id % 5 == 0): exact copies, one-word
    * edits, and unrelated filler. */
  private def corpus = {
    val s = spark; import s.implicits._
    val base = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank",
      "pack my box with five dozen liquor jugs before the night ends",
      "how vexingly quick daft zebras jump over fences in the field")
    val docs = (1L to 30L).map { id =>
      val t = (id % 6) match {
        case 0 => base(0)                                   // new-side copy of 0
        case 1 => base(0)                                   // old-side copy of 0
        case 2 => base(0).replace("lazy", "sleepy")         // near-dup of 0
        case 3 => base(1)
        case 4 => base(1).replace("night", "day")           // near-dup of 3
        case _ => base(2) + s" unique tail $id"             // mostly unrelated
      }
      (id, t)
    }
    docs.toDF("doc_id", "text")
  }

  test("incremental pairs == new-vs-old subset of full-union LSH pairs") {
    val docs = corpus
    val newDocs = docs.filter(col("doc_id") % 5 === 0)
    val oldDocs = docs.filter(col("doc_id") % 5 =!= 0)
    val oldSigs = Dedup.minhashSignatures(oldDocs, "doc_id", "text", N, K)

    val inc = Dedup.incrementalNearDupPairs(
        newDocs, oldDocs, oldSigs, "doc_id", "text", N, K, B, T)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val newIds = newDocs.select("doc_id").collect().map(_.getLong(0)).toSet
    val full = Dedup.minhashLshPairs(docs, "doc_id", "text", N, K, B, T)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .collect { // orient cross pairs as (new, old); drop within-side pairs
        case (a, b, j) if newIds(a) && !newIds(b) => (a, b, j)
        case (a, b, j) if newIds(b) && !newIds(a) => (b, a, j)
      }.toSet

    assert(inc.nonEmpty, "fixture must produce cross near-dup pairs")
    assert(inc == full,
      s"incremental=${inc.toSeq.sorted} full-cross=${full.toSeq.sorted}")
  }

  test("no corpus x corpus work: within-old pairs never appear") {
    val docs = corpus
    val newDocs = docs.filter(col("doc_id") % 5 === 0)
    val oldDocs = docs.filter(col("doc_id") % 5 =!= 0)
    val oldSigs = Dedup.minhashSignatures(oldDocs, "doc_id", "text", N, K)
    val newIds = newDocs.select("doc_id").collect().map(_.getLong(0)).toSet
    val out = Dedup.incrementalNearDupPairs(
        newDocs, oldDocs, oldSigs, "doc_id", "text", N, K, B, T)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.forall { case (n2, o) => newIds(n2) && !newIds(o) })
  }

  test("bucket cap applies to both sides independently") {
    val docs = corpus
    val newDocs = docs.filter(col("doc_id") % 5 === 0)
    val oldDocs = docs.filter(col("doc_id") % 5 =!= 0)
    val oldSigs = Dedup.minhashSignatures(oldDocs, "doc_id", "text", N, K)
    // cap=1 drops every shared bucket on the old side (each dup family
    // has >1 old member) — candidates can only come from buckets where
    // the old side has exactly one member
    val capped = Dedup.incrementalNearDupPairs(
        newDocs, oldDocs, oldSigs, "doc_id", "text", N, K, B, T,
        maxBucketSize = 1)
      .collect()
    val uncapped = Dedup.incrementalNearDupPairs(
        newDocs, oldDocs, oldSigs, "doc_id", "text", N, K, B, T)
      .collect()
    assert(capped.length <= uncapped.length)
  }
}
