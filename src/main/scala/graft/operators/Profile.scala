package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the generic "data quality check" the reference
  * hand-writes per form (pipeline-cleaning/R/05.run_anomaly_detection.R
  * rule tables, pipeline-metadata completeness summaries): per-column
  * row count, null count, distinct estimate, and min/max, for every
  * column of any table.
  *
  * Scale notes: ONE aggregation pass computes every metric for every
  * column simultaneously (a single 1-row global aggregate — map-side
  * partials, one tiny exchange), then the 1×(4·C) row melts to C rows
  * driver-free via stack(). Never one scan per column. min/max are
  * cast to string so heterogeneous column types share one output
  * schema; approx_count_distinct is the engine-side estimate (excluded
  * from cross-engine oracles — HLL sketches differ by engine).
  */
object Profile {

  /** (column, n_rows, n_nulls, min_str, max_str, approx_distinct) per column. */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val aggs = names.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"),
        approx_count_distinct(col(c)).as(s"__ad_$c"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // melt via stack: one output row per column, no driver loop over data
    val stackArgs = names.map { c =>
      s"'$c', __nn_$c, __mn_$c, __mx_$c, __ad_$c"
    }.mkString(", ")
    one.selectExpr("__n",
        s"stack(${names.size}, $stackArgs) AS (column, n_nulls, min_str, max_str, approx_distinct)")
      .select(col("column"), col("__n").as("n_rows"), col("n_nulls"),
        col("min_str"), col("max_str"), col("approx_distinct"))
  }
}
