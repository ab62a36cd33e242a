package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: match points to [start, end) intervals as an
  * EQUI-join instead of the nested-loop join Spark plans for a raw range
  * condition (BroadcastNestedLoopJoin when one side is small, a
  * cartesian otherwise — both quadratic).
  *
  * Mechanics: pick a bucket width; each point belongs to one bucket
  * (floor(p / width)), each interval is exploded to every bucket it
  * overlaps. Joining on the bucket id and re-checking the exact
  * condition yields each (point, interval) match EXACTLY once — the
  * match is found in the point's own bucket and no other — so no
  * dedup pass is needed.
  *
  * Scale notes: both sides shuffle once on the bucket id (or the
  * interval side broadcasts if small); interval blow-up is
  * ceil(len/width)+1 rows per interval, so width should be of the order
  * of the typical interval length. Degenerate giant intervals bound the
  * blow-up at (domain span / width); cap with `maxBucketsPerInterval`
  * (intervals exceeding it are dropped — eval-set hygiene, count them
  * upstream if they must be handled via a broadcast side channel).
  */
object RangeJoin {

  /** Join `points` (value `ptCol`) to `intervals` ([startCol, endCol))
    * on containment. Output: all point columns + all interval columns.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Double,
                      maxBucketsPerInterval: Int = 1 << 20): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bk",
      floor(col(ptCol) / lit(bucketWidth)).cast("long"))
    val lo = floor(col(startCol) / lit(bucketWidth)).cast("long")
    val hi = floor(col(endCol) / lit(bucketWidth)).cast("long")
    // the clamp duplicates the filter's bound on purpose: constant
    // folding evaluates sequence() on literal intervals BEFORE the
    // filter can prune them, so the endpoint itself must be bounded
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .filter(hi - lo < lit(maxBucketsPerInterval.toLong))
      .withColumn("__bk",
        explode(sequence(lo, least(hi, lo + lit(maxBucketsPerInterval.toLong - 1)))))
    p.join(iv, Seq("__bk"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bk")
  }
}
