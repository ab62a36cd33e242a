package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded randomization (SURVEY.md §3.3, randomize.R): stratified arm
  * assignment and bounded cohort selection. We match the reference's
  * PROCEDURE (seeded stratified permutation), not R's RNG stream
  * (SURVEY §7.4.5): same seed ⇒ same assignment on any cluster layout,
  * because order comes from xxhash64 of the unit id, never from rand().
  */
object Randomize {

  /** Stratified balanced arm assignment: units are permuted within each
    * stratum by xxhash64(unit, seed) and arms assigned round-robin, so
    * per-stratum arm counts differ by at most 1.
    */
  def assignArms(df: DataFrame, unitCol: String, strataCols: Seq[String],
                 arms: Seq[String], seed: Long): DataFrame = {
    val ranked = Windows.seededShuffleRank(df, strataCols, unitCol, seed, "__rn")
    val armArr = array(arms.map(lit): _*)
    ranked.withColumn("arm", element_at(armArr, (pmod(col("__rn") - 1, lit(arms.size)) + 1).cast("int")))
      .drop("__rn")
  }

  /** Seeded top-k cohort per group among eligible units (the efficacy /
    * PK selection pattern: eligibility window, then ≤ k per cluster).
    */
  def selectCohort(df: DataFrame, groupKeys: Seq[String], unitCol: String,
                   k: Int, seed: Long, eligible: Column): DataFrame =
    Windows.seededShuffleRank(df.filter(eligible), groupKeys, unitCol, seed)
      .filter(col("randomization_number") <= k)
}
