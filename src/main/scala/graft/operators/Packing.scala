package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing: assign rows (in stable `idCol` order) to
  * shards of ~`budget` tokens — shard = floor(tokens-before-this-row /
  * budget), the deterministic precursor of sequence packing for
  * training runs.
  *
  * A global prefix sum is inherently single-ordered, but it does NOT
  * need a single-reducer window (the round-1 scale-killer): bucket rows
  * by an order-preserving range key, aggregate per-bucket token totals,
  * turn those into per-bucket offsets with a window over the tiny
  * totals table (#buckets rows, not #rows), broadcast the offsets back,
  * and run the cumulative window within buckets only. Every data-sized
  * exchange is hash/range-partitioned; the only ordered pass is over
  * bucket totals.
  */
object Packing {

  /** Adds `shard` given a numeric id column and a token-count column.
    *
    * @param bucketWidth id-range width per bucket — pick so that
    *   #rows/bucketWidth ≈ a few thousand buckets at the target scale;
    *   correctness does not depend on it (any order-preserving bucketing
    *   yields the same shards).
    */
  def tokenShards(df: DataFrame, idCol: String, tokensCol: String,
                  budget: Long, bucketWidth: Long = 1024): DataFrame = {
    val b = floor(col(idCol) / lit(bucketWidth)).cast("bigint")
    val rows = df.withColumn("__b", b)
    val totals = rows.groupBy("__b").agg(sum(col(tokensCol)).as("__bt"))
    // window over #buckets rows only — single partition is fine here,
    // the totals table is ~rows/bucketWidth
    val offsets = totals.withColumn("__off",
        coalesce(sum(col("__bt")).over(
          Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__b", "__off")
    val w = Window.partitionBy("__b").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    rows.join(broadcast(offsets), "__b")
      .withColumn("shard",
        floor(((col("__off") + sum(col(tokensCol)).over(w)).cast("double")
          - col(tokensCol)) / budget).cast("bigint"))
      .drop("__b", "__off")
  }

  /** Sequence packing: first-fit-decreasing bin packing of documents
    * into fixed-`seqLen`-token training sequences, within the shards
    * [[tokenShards]] produced. Docs are never split (contrast the
    * concat-and-chunk style t32+t12 compose to); FFD keeps padding
    * waste near the 11/9-OPT bound, and confining it to a shard makes
    * the sequential part of the algorithm O(shard) — each shard holds
    * ~budget tokens by construction, so per-group state is bounded and
    * the operator is one shuffle by `shardCol` no matter the corpus
    * size. Output: (idCol, shardCol, bin) with bins numbered 1.. in
    * creation order — deterministic for a given input regardless of
    * partitioning, because docs are sorted (tokens desc, id asc)
    * inside each group before the scan. A doc longer than `seqLen`
    * opens its own (over-full) bin and nothing else joins it.
    *
    * mapGroups is the right tool here, not a window: first-fit needs
    * the mutable bin-remainder list no SQL recurrence short of the
    * full recursive-CTE form (the oracle replays exactly that).
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    shardCol: String, seqLen: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(shardCol).cast("long"), col(idCol).cast("long"),
        col(tokensCol).cast("long")).as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val docs = it.map(t => (t._2, t._3)).toArray
          .sortBy { case (id, n) => (-n, id) }
        val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
        docs.iterator.map { case (id, n) =>
          var i = 0
          while (i < rem.length && rem(i) < n) i += 1
          if (i == rem.length) rem += (seqLen - n) else rem(i) -= n
          (id, shard, (i + 1).toLong)
        }
      }
      .toDF(idCol, shardCol, "bin")
  }
}
