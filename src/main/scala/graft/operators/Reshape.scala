package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reshape / set operators from SURVEY.md §2.6.
  *
  * Scale notes: pivots take an EXPLICIT value list — `pivot(col)` without
  * one triggers a driver-side distinct collect, which is a scan of the
  * whole table before the real job can start. The reference's pivots are
  * all over small closed domains (visits V1..V7, metric names), so the
  * list is always known.
  */
object Reshape {

  /** R1/R2 (pivot_wider): long → wide over a closed domain of pivot values.
    * `agg` should be deterministic (max/min/sum — not first).
    * Ref: efficacy...Rmd:219-247; se_and_pfu.Rmd:531-534.
    */
  def pivotWide(df: DataFrame, groupKeys: Seq[String], pivotCol: String,
                values: Seq[String], agg: Column): DataFrame =
    df.groupBy(groupKeys.map(col): _*).pivot(pivotCol, values).agg(agg)

  /** R3 (pivot_longer / unpivot): wide numeric columns → (name, value) rows.
    * Ref: monitoring/pharmacy.Rmd:231-247.
    */
  def unpivot(df: DataFrame, ids: Seq[String], valueCols: Seq[String],
              nameCol: String = "name", valueName: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, valueCols.map(col).toArray, nameCol, valueName)

  /** R4 (separate): split a delimited column into named parts.
    * Ref: pharmacy.Rmd:760.
    */
  def separate(df: DataFrame, src: String, sep: String,
               into: Seq[String]): DataFrame =
    into.zipWithIndex.foldLeft(df) { case (d, (name, i)) =>
      d.withColumn(name, split(col(src), sep).getItem(i))
    }

  /** R5 (row explosion by count): repeat each row `countCol` times and
    * number the copies — the reference's tube-key synthesis.
    * Ref: ento_dataset_for_sponsors.Rmd:250-262.
    */
  def explodeByCount(df: DataFrame, countCol: Column,
                     idxCol: String = "idx"): DataFrame =
    df.withColumn(idxCol, explode(sequence(lit(1), countCol.cast("int"))))

  /** R6 (bind_rows): union by name, missing columns null-filled. */
  def unionAligned(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** R7: unionAligned + all-string cast + nulls to ''. */
  def unionAllString(dfs: Seq[DataFrame]): DataFrame = {
    val u = unionAligned(dfs)
    u.select(u.columns.map(c => col(c).cast("string").as(c)).toIndexedSeq: _*).na.fill("")
  }
}
