package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / ordered operators from SURVEY.md §2.5.
  *
  * All operators take explicit tiebreaker columns so results are fully
  * deterministic regardless of partitioning — at cluster scale a window
  * over an ambiguous order is a silent nondeterminism bug.
  *
  * Scale notes: every window here shuffles once on its partition keys and
  * sorts within partitions. None of them require a global sort or a
  * driver-side collect; skewed partition keys are handled by AQE.
  */
object Windows {

  /** A10 (latest-per-group dedup): keep the single row per `keys` with the
    * greatest (`ord`, tiebreakers) — reference semantics
    * `end_time == max(end_time) over (visit, extid)` collapsed to one row.
    * Ref: pipeline-reporting/R/00.store_se_goals.R:551-556.
    */
  /** w46's PRODUCTION leg: rolling 7-day distinct users per event type
    * via stored daily HLL sketches — ONE sketch per (type, day), each
    * replicated into the ≤ 7 trailing windows it serves (the explode
    * runs over day-cardinality rows, so it is free), then a sketch
    * union per window. This is the path that runs at scale; the exact
    * rolling count-distinct beside it in the w46 gate row exists ONLY
    * to assert the ≤ 5% bound at gate SFs (it re-scans every window —
    * the thing this sketch plan exists to avoid). Extracted so the
    * posture harness times exactly the shipped plan (ScaleReplica's
    * w46_production_sketch entry).
    */
  def rollingDistinctSketch(events: DataFrame): DataFrame = {
    val e = events.select(col("event_type"),
      datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"),
      col("user_id"))
    e.groupBy("event_type", "day")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .select(col("event_type"),
        explode(sequence(col("day"), col("day") + 6)).as("day"), col("sk"))
      .groupBy("event_type", "day")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
  }

  def latestPerGroup(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** W9 (first-per-group): ascending variant of latestPerGroup.
    * Ref: efficacy_status...Rmd:143-150 (`arrange(desc) %>% distinct(.keep_all)`).
    */
  def firstPerGroup(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** W3 (top-k per group): keep k rows per group by (`ord` desc, tiebreakers).
    * Ref: pipeline-metadata/analyses/randomization/randomize.R:661-662,1135-1139.
    */
  def topKPerGroup(df: DataFrame, keys: Seq[String], ord: Seq[Column], k: Int,
                   rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord.map(_.desc): _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** W2 (seeded stable shuffle): deterministic per-group permutation via
    * xxhash64(key, seed) — same seed ⇒ same order regardless of partitioning,
    * unlike rand(). Mirrors the reference's set.seed + sample_n contract
    * (randomize.R:569-591) without reproducing R's RNG stream.
    */
  def seededShuffleRank(df: DataFrame, groupKeys: Seq[String], idCol: String,
                        seed: Long, rankCol: String = "randomization_number",
                        crossEngine: Boolean = false): DataFrame = {
    // xxhash64 is the fast codegen'd default; crossEngine swaps in md5
    // over the string form so any SQL engine can replicate the exact
    // permutation (md5 is the one hash both sides share)
    val h =
      if (crossEngine) md5(concat(col(idCol).cast("string"), lit(seed.toString)))
      else xxhash64(col(idCol), lit(seed))
    val w = Window.partitionBy(groupKeys.map(col): _*)
      .orderBy(h, col(idCol))
    df.withColumn(rankCol, row_number().over(w))
  }

  /** W7 (forward fill): last non-null value of `cols` per `keys` ordered by
    * `ord` — tidyr::fill(.direction='down').
    * Ref: 00.store_se_goals.R:305-313,416-420.
    */
  def forwardFill(df: DataFrame, keys: Seq[String], ord: Seq[Column],
                  cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** W1 (count over partition, no row reduction). Ref: safety.R:95-97. */
  def countOver(df: DataFrame, keys: Seq[String], as: String = "n"): DataFrame =
    df.withColumn(as, count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))

  /** W6 (cumulative sum) per keys ordered by `ord`. Ref: prevalence_incidence.qmd:54-59. */
  def cumSum(df: DataFrame, keys: Seq[String], ord: Seq[Column],
             valueCol: Column, as: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, sum(valueCol).over(w))
  }
}
