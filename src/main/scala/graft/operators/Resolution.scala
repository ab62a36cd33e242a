package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Human-resolution batch SET/DELETE operators from SURVEY.md §2.3
  * (J3, J6, R8) — the reference's google-sheets fix loop
  * (pipeline-cleaning/R/processing_utils.R:237-429).
  *
  * The resolution table has one row per (key, column, operation):
  *   key STRING, column STRING, setTo STRING, operation ∈ {SET, DELETE}.
  *
  * Scale notes: the resolution side is human-authored (≤ 20k rows in the
  * reference) so it is always broadcast; the data side never shuffles.
  * DELETE before SET, matching the reference (processing_utils.R:404-405).
  */
object Resolution {

  /** J3 (batch DELETE as anti join): drop rows whose key appears among the
    * DELETE operations. Ref: processing_utils.R:369-389.
    */
  def applyDeletes(df: DataFrame, resolution: DataFrame, dataKey: String,
                   resKey: String = "key"): DataFrame = {
    val deletes = resolution.filter(col("operation") === "DELETE")
      .select(col(resKey).as("__delkey")).distinct()
    df.join(broadcast(deletes), col(dataKey) === col("__delkey"), "left_anti")
  }

  /** J6 (batch SET via pivoted join + coalesce): pivot the SET rows wide
    * (key → one column per target column), broadcast-left-join on the key,
    * then per affected column take the resolution value if present, cast to
    * the EXISTING column's type — the reference's dtype-reconciliation rule
    * (processing_utils.R:305-318: prefer the data column's type).
    */
  def applySets(df: DataFrame, resolution: DataFrame, dataKey: String,
                resKey: String = "key"): DataFrame = {
    val sets = resolution.filter(col("operation") === "SET")
    val targetCols = sets.select("column").distinct().collect()
      .map(_.getString(0)).filter(df.columns.contains).sorted
    if (targetCols.isEmpty) return df
    // One collect_list(struct) per key (ObjectHashAggregate), then the
    // per-column winner as row-level array algebra: max over setTo —
    // deterministic when the sheet holds duplicate (key, column) rows
    // (the reference instead dedups by last edit, W8). A pivot +
    // max(string) computes the same thing but plans a SortAggregate
    // (string agg buffers are immutable, so HashAggregateExec can't hold
    // them); hash-aggregating the entry list keeps the whole resolution
    // prep sort-free (VERDICT r8 item 2).
    val kv = sets.filter(col("column").isin(targetCols.toIndexedSeq: _*))
      .groupBy(col(resKey).as("__setkey"))
      .agg(collect_list(struct(col("column").as("c"), col("setTo").as("v"))).as("__kv"))
    val wide = kv.select((col("__setkey") +: targetCols.map { c =>
        array_max(filter(col("__kv"), x => x.getField("c") === lit(c)))
          .getField("v").as(s"__set_$c")
      }).toIndexedSeq: _*)
    val joined = df.join(broadcast(wide), col(dataKey) === col("__setkey"), "left")
    val projected = df.columns.map { c =>
      // try_cast, not cast: Spark 4 runs ANSI mode, where one malformed
      // human-authored SET value ('abc' onto an int column) would throw
      // and kill the job; the reference prefers the data column's type
      // and degrades to the existing value.
      if (targetCols.contains(c))
        coalesce(expr(s"try_cast(__set_$c AS ${df.schema(c).dataType.sql})"), col(c)).as(c)
      else col(c)
    }
    joined.select(projected.toIndexedSeq: _*)
  }

  /** DELETE-then-SET, the reference's fix ordering (processing_utils.R:404-429). */
  def applyResolution(df: DataFrame, resolution: DataFrame, dataKey: String,
                      resKey: String = "key"): DataFrame =
    applySets(applyDeletes(df, resolution, dataKey, resKey), resolution, dataKey, resKey)

  /** Gsheets round-trip half 1 (aws_src/get_ever_resolved.py:7-9): the
    * accumulated resolution history, deduplicated to the FIRST-seen row
    * per resolution_id (pandas drop_duplicates keep='first' over runs
    * concatenated in run order). One shuffle on resolution_id; history
    * grows with run count, so no broadcast — AQE picks the join strategy
    * downstream.
    */
  def everResolved(history: DataFrame, runCol: String = "run_time"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("resolution_id").orderBy(col(runCol))
    history.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Gsheets round-trip half 2 (gsheets_src/anomalies_populate.py:17-25):
    * the next run's tracker sheet = freshly detected anomalies MINUS the
    * ever-resolved ids whose status is confirmed_correct (manual
    * resolutions stay visible until the anomaly actually disappears),
    * carrying forward in_progress/blocked statuses from the previous
    * sheet and defaulting everything else to to_do.
    *
    * Scale: anti join shuffles on resolution_id (ever-resolved grows
    * without bound across runs); the carried-status side is bounded by
    * the ≤20k live-tracker contract, left to AQE to broadcast.
    */
  def populateTracker(anomalies: DataFrame, everResolved: DataFrame,
                      otherStatus: DataFrame): DataFrame = {
    val confirmed = everResolved
      .filter(col("resolution_status") === "confirmed_correct")
      .select("resolution_id")
    anomalies.drop("resolution_status")
      .join(confirmed, Seq("resolution_id"), "left_anti")
      .join(otherStatus.select(col("resolution_id"),
          col("resolution_status").as("__carried")),
        Seq("resolution_id"), "left")
      .withColumn("resolution_status", coalesce(col("__carried"), lit("to_do")))
      .drop("__carried")
  }

  /** R8 (cascade expansion): SET rows on a source column are copied to its
    * "connected" columns per a small mapping table, optionally rewriting the
    * value. Ref: processing_utils.R:512-552.
    */
  def cascadeExpand(resolution: DataFrame,
                    mapping: Seq[(String, String)],
                    rewrite: Map[(String, String), String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = resolution.sparkSession
    val mapSchema = StructType(Seq(
      StructField("__src", StringType), StructField("__dst", StringType)))
    val mapDf = spark.createDataFrame(
      spark.sparkContext.parallelize(mapping.map(m => Row(m._1, m._2)), 1), mapSchema)
    val rewriteCol = rewrite.foldLeft(col("setTo")) {
      case (acc, ((dst, from), to)) =>
        when(col("__dst") === dst && col("setTo") === from, lit(to)).otherwise(acc)
    }
    val cascaded = resolution.filter(col("operation") === "SET")
      .join(broadcast(mapDf), col("column") === col("__src"), "inner")
      .withColumn("setTo", rewriteCol)
      .withColumn("column", col("__dst"))
      .drop("__src", "__dst")
    resolution.unionByName(cascaded)
  }
}
