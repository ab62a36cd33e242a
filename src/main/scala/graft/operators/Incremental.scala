package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of decomposable aggregates: instead of
  * re-aggregating the whole table each refresh (the reference's hourly
  * cadence recomputes everything), keep the aggregate table and fold in
  * a partial aggregate of just the new rows —
  * combine(base, partial(delta)) is exact for count/sum/min/max
  * because those aggregates are commutative monoids.
  *
  * Shape: one partial aggregation over the (small) delta plus one
  * outer join against the maintained table on the group keys — the
  * base FACTS are never rescanned. At warehouse scale the maintained
  * table is keyed and bucketable, so the refresh cost tracks the delta
  * size, not the history size. Not applicable to non-decomposable
  * aggregates (exact distinct, percentile) — those either keep a
  * sketch (HLL) or re-aggregate.
  */
object Incremental {

  /** Fold a partial aggregate into the maintained one. Both inputs
    * carry `keys` plus the named aggregate columns; `sums` are summed
    * (counts are sums of partial counts), `mins`/`maxs` take the
    * element-wise least/greatest (Spark's least/greatest skip nulls, so
    * a key present on one side only keeps that side's value).
    */
  def combine(base: DataFrame, delta: DataFrame, keys: Seq[String],
              sums: Seq[String], mins: Seq[String] = Nil,
              maxs: Seq[String] = Nil): DataFrame = {
    val renamed = (sums ++ mins ++ maxs).foldLeft(delta)(
      (d, c) => d.withColumnRenamed(c, s"__d_$c"))
    base.join(renamed, keys, "full_outer")
      .select(keys.map(col)
        ++ sums.map(c => (coalesce(col(c), lit(0)) +
          coalesce(col(s"__d_$c"), lit(0))).as(c))
        ++ mins.map(c => least(col(c), col(s"__d_$c")).as(c))
        ++ maxs.map(c => greatest(col(c), col(s"__d_$c")).as(c)): _*)
  }
}
