package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Scan fan-out for compute-heavy narrow inputs (optimization guide
  * §2.5, "input skew: one huge unsplittable file — repartition
  * immediately after the read").
  *
  * A parquet row group is the atomic scan unit, so a single-row-group
  * input runs its whole map side — shingle explodes, image decodes,
  * winnowing scans, hash batteries — in ONE task no matter how many
  * cores the session has (measured this round: s39's 25M-row shingle
  * join ran 5.8 s in one task; t44/t46 7.2 s each). At production scale
  * the same tables arrive as many files/row groups and the scan
  * parallelizes naturally, which is why the fan-out is CONDITIONAL: it
  * inspects the plan's actual scan partitioning and becomes the
  * identity (no exchange at all in the executed plan) once the source
  * already fans at least half the session's default parallelism. The
  * exchange it inserts on the degenerate path moves only the projected
  * narrow columns, hash-keyed (deterministic under task retry, unlike
  * round-robin of a non-deterministic input — SPARK-38388).
  */
object Par {

  /** Repartition `df` to the session's default parallelism, keyed by
    * `key`, iff its current plan would execute in fewer than half that
    * many partitions. Call on the NARROW projection (ids + the columns
    * the heavy stage needs), never on payload-carrying rows unless the
    * payload itself is what the heavy stage consumes.
    */
  def fanOut(df: DataFrame, key: Column): DataFrame = {
    if (df.isStreaming) return df // micro-batch planner owns partitioning
    val p = df.sparkSession.sparkContext.defaultParallelism
    // .rdd plans (no job); cheap for the scan+project shapes this is
    // called on, and the answer is exact rather than estimated
    if (df.rdd.getNumPartitions * 2 >= p) df else df.repartition(p, key)
  }
}
