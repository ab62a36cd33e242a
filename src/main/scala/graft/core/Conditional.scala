package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Presence-conditional transform combinators (SURVEY.md §1.3): the
  * reference guards every transform on column existence
  * (`if('hhid' %in% names(data))`, `any_of()` selectors, try/catch
  * fallbacks that return the input unchanged). These combinators encode
  * that idiom declaratively so form pipelines compose over heterogeneous
  * schemas without reflection at every call site.
  */
object Conditional {

  /** Apply `f` only when `column` exists; otherwise return `df` unchanged. */
  def whenHasColumn(df: DataFrame, column: String)(f: DataFrame => DataFrame): DataFrame =
    if (df.columns.contains(column)) f(df) else df

  /** Apply `f` only when ALL `columns` exist. */
  def whenHasColumns(df: DataFrame, columns: Seq[String])(f: DataFrame => DataFrame): DataFrame =
    if (columns.forall(df.columns.contains)) f(df) else df

  /** Transform each present column of `columns` with `f` (any_of + across). */
  def mapPresentColumns(df: DataFrame, columns: Seq[String])(f: Column => Column): DataFrame =
    columns.filter(df.columns.contains).foldLeft(df)((d, c) => d.withColumn(c, f(col(c))))

  /** Select only the present subset of `columns`, in the given order. */
  def selectPresent(df: DataFrame, columns: Seq[String]): DataFrame =
    df.select(columns.filter(df.columns.contains).map(col): _*)

  /** Ensure `column` exists, adding it as a typed null when absent —
    * bind_rows-style schema alignment for a single column.
    */
  def ensureColumn(df: DataFrame, column: String, dataType: String): DataFrame =
    if (df.columns.contains(column)) df
    else df.withColumn(column, lit(null).cast(dataType))
}
