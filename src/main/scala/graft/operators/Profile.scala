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
  /** Histogram-interpolated quantiles: two narrow passes (global
    * min/max/count, then fixed-width bin counts) and a tiny bins-sized
    * reduction — the quantile path that SURVIVES scale, where exact
    * percentile (a18) needs a global sort. Bin counts are mergeable
    * partials (map-side combine); the interpolation is plain IEEE
    * +,-,*,/ and floor, so results are bit-identical across engines
    * and partitionings (no libm, no order-dependent folds).
    *
    * Output: one row per requested quantile, (q, est). Estimate error
    * is bounded by the bin width — bins trades memory for accuracy,
    * the classic histogram sketch contract.
    */
  def histogramQuantiles(df: DataFrame, valueCol: String, bins: Int,
                         qs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("double")
    val (mn, mx, n) = {
      val r = df.agg(min(v), max(v), count(v)).head()
      require(!r.isNullAt(0), s"histogramQuantiles: no non-null $valueCol rows")
      (r.getDouble(0), r.getDouble(1), r.getLong(2))
    }
    // a constant column would make width 0 and the bin expression an
    // engine-dependent Infinity path — fail loud instead
    require(mx > mn, s"histogramQuantiles: $valueCol is constant ($mn)")
    val width = (mx - mn) / bins
    // nulls must not reach the binning: a null v makes a null bin row
    // that sorts FIRST in the cumulative window, inflating cum/before
    // for every real bin while n = count(v) excludes nulls — quantiles
    // would shift low and (q*n - before) could go negative
    val counts = df.where(v.isNotNull).select(
        least(floor((v - lit(mn)) / lit(width)), lit(bins - 1).cast("long"))
          .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    val wcum = org.apache.spark.sql.expressions.Window
      .orderBy("bin").rowsBetween(Long.MinValue, 0)
    // bins-sized table: the single-partition window is over ≤ `bins` rows
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(wcum))
      .withColumn("before", col("cum") - col("cnt"))
    val qdf = qs.toDF("q")
    qdf.crossJoin(cum)
      .filter(col("cum") >= col("q") * n)
      .groupBy("q").agg(min_by(
        struct(col("bin"), col("cnt"), col("before")), col("bin")).as("b"))
      .select(col("q"),
        (lit(mn) + lit(width) * (col("b.bin") +
          (col("q") * n - col("b.before")) / col("b.cnt"))).as("est"))
  }

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
