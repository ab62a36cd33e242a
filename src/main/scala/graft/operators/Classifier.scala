package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Hashed-feature linear classifier application — the "run the quality
  * model over the corpus" stage of a training-data pipeline (public
  * practice: fastText-style models gate C4/ccnet-style corpora; GPT-3's
  * curation applied a linear classifier over hashed features).
  *
  * The model is data, not code: a (bucket, weight) table small enough to
  * broadcast (the whole point of feature hashing is a FIXED bucket space,
  * independent of corpus vocabulary). Scoring is then one narrow explode →
  * broadcast hash join → per-doc hash aggregate: O(tokens) work, a single
  * shuffle (the per-doc agg), no model binary on the executors, no UDF.
  * At 100 TB nothing here grows with the corpus except the data scan.
  */
object Classifier {

  /** Score every document: tokens bucket via `bucketOf`, bucket weights
    * join in from `weights` (broadcast), and the document's score is the
    * weight sum plus `bias`. Documents with no surviving tokens score
    * `bias`. Output: (idCol, score: long, kept: boolean).
    *
    * `weights` must be keyed by `bucketCol` with integral `weightCol`
    * values — integer weights keep the fold order-free and the score
    * exactly reproducible on any engine (IEEE float folds would pin the
    * reduction order; a linear model quantized to integer weights is the
    * determinism-friendly form of the same decision boundary).
    */
  def scoreHashed(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      bucketCol: String,
      weightCol: String,
      bucketOf: Column => Column,
      bias: Long,
      threshold: Long = 0L): DataFrame = {
    // explode_outer + LEFT broadcast join: a doc with no tokens (or whose
    // tokens hit no weight bucket) stays in the aggregation and scores the
    // bias — no second shuffle to join scores back onto the doc table (the
    // join-back form costs two extra exchanges of the full corpus).
    // The null-token row explode_outer emits for tokenless docs must keep a
    // NULL bucket: some bucket families map NULL to a non-null key (xxhash64
    // of an all-null input returns the seed), which would let a tokenless doc
    // join a real weight row and score bias+weight instead of bias.
    val toks = docs
      .select(col(idCol), explode_outer(TextFunctions.tokens(col(textCol))).as("__tok"))
      .select(
        col(idCol),
        when(col("__tok").isNotNull, bucketOf(col("__tok"))).as(bucketCol))
    toks
      .join(broadcast(weights), Seq(bucketCol), "left")
      .groupBy(idCol)
      .agg((coalesce(sum(col(weightCol).cast("long")), lit(0L)) + lit(bias))
        .as("score"))
      .withColumn("kept", col("score") >= lit(threshold))
  }

  /** Production bucketing: xxhash64 into `n` buckets as a string key
    * (string so either hash family keys the same weights schema). */
  def xxBucket(n: Int)(tok: Column): Column =
    pmod(xxhash64(tok), lit(n.toLong)).cast("string")

  /** Oracle-replayable bucketing: first 3 hex chars of md5 — 4096 buckets,
    * reproducible on any engine with md5 (the cross-engine hash family
    * this repo standardizes on). */
  def md5Bucket(tok: Column): Column = substring(md5(tok), 1, 3)

  /** Deterministic 4096-bucket demo weight table for the md5 family:
    * bucket i ("%03x") carries weight i % 21 - 10 (symmetric around 0). */
  def md5DemoWeights(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.range(4096).select(
      format_string("%03x", col("id")).as("bucket"),
      (col("id") % 21 - 10).as("weight"))
}
