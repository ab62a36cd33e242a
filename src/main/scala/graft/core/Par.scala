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
    *
    * The decision never executes the input (ADVICE r15): with AQE on,
    * `df.rdd` on a plan containing exchanges materializes its query
    * stages — real shuffle/broadcast jobs run at DataFrame-CONSTRUCTION
    * time and then again at the action. So:
    *  - plan has any Exchange -> repartition unconditionally. The
    *    runtime partition count is unknowable without executing (AQE
    *    coalescing), the rows at every call site are narrow projections,
    *    and a pinned hash fan before a heavy map stage is the posture
    *    that survives coalescing (AQE does not merge user-specified
    *    repartitions with an explicit numPartitions).
    *  - exchange-free plan (scan+project chains) -> `df.rdd` builds RDD
    *    lineage only (no stages exist, so no job), and the scan's split
    *    count is exact: fan only the degenerate single-row-group case.
    */
  def fanOut(df: DataFrame, key: Column): DataFrame = {
    if (df.isStreaming) return df // micro-batch planner owns partitioning
    val p = df.sparkSession.sparkContext.defaultParallelism
    val hasExchange = df.queryExecution.sparkPlan.find(
      n => n.getClass.getName.contains("Exchange")).isDefined
    if (hasExchange) df.repartition(p, key)
    else if (df.rdd.getNumPartitions * 2 >= p) df
    else df.repartition(p, key)
  }
}
