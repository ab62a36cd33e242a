package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level cleaning / standardization operators from SURVEY.md §2.2.
  *
  * All are pure narrow projections — no shuffle, fully codegen'd, so they
  * fuse into the enclosing WholeStageCodegen span and cost nothing extra
  * at 100 TB beyond the scan itself.
  */
object Standardize {

  /** P1 (column-name normalize): keep the last `-`-separated token of each
    * ODK `group-subgroup-field` column name.
    * Ref: pipeline-cleaning/R/processing_utils.R:42-45.
    */
  def cleanColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.split('-').last).toIndexedSeq: _*)

  /** P6 (case/whitespace standardize): upper-case, squish repeated spaces,
    * trim. Ref: processing_utils.R:180-187 (`toupper(str_squish(str_to_title(x)))`
    * — the title-case step is a no-op under the outer toupper).
    */
  def standardizeCase(c: Column): Column =
    upper(regexp_replace(trim(c), " +", " "))

  /** P7 (typo fix): targeted regexp replacements, e.g. NGUZ0→NGUZO.
    * Ref: processing_utils.R:198-209.
    */
  def fixTypos(c: Column, fixes: Seq[(String, String)]): Column =
    fixes.foldLeft(c) { case (acc, (pat, rep)) => regexp_replace(acc, pat, rep) }

  /** P8 (dob/date standardize): lenient parse of a date-ish column to
    * DATE, with fallback alternates tried in order — the reference keeps
    * sibling `dob_select`/`dob_string` columns carrying the same fact in
    * different shapes and standardizes them into one date without ever
    * erroring on malformed input (its parser returns NA, the whole
    * mutate is wrapped in tryCatch). `try_to_date` reproduces exactly
    * that never-throw contract under ANSI mode; each alternate is a
    * (column, format) pair, `format = ""` meaning the default ISO parse.
    * Pure projection — fuses into the scan's codegen span.
    * Ref: processing_utils.R:189-196 (standardize_col_dobs),
    * :515-518 (dob ← dob_select/dob_string cascade).
    */
  def standardizeDob(alternates: (Column, String)*): Column =
    coalesce(alternates.map {
      case (c, "")  => try_to_date(c)
      case (c, fmt) => try_to_date(c, fmt)
    }: _*)

  /** P9 (derived age in fractional years): (asOf - dob) / 365.25.
    * Ref: processing_utils.R:23-38.
    */
  def correctedAge(dob: Column, asOf: Column): Column =
    datediff(asOf, dob).cast("double") / 365.25

  /** P10 (hhid zero-pad to width 5). Ref: processing_utils.R:2-9. */
  def padHhid(c: Column, width: Int = 5): Column =
    lpad(c.cast("string"), width, "0")

  /** Visit ordinal: 'V12' → 12. Ref: 00.store_se_goals.R:225. */
  def visitNum(c: Column): Column =
    regexp_extract(c, "[0-9]+", 0).cast("int")

  /** W10 (visit cascade): re-label rows to the NEXT visit — rows become the
    * next visit's goal; pure projection, capped.
    * Ref: 00.store_se_goals.R:224-227.
    */
  def cascadeVisit(df: DataFrame, visitCol: String, cap: Int): DataFrame =
    df.withColumn("__vn", visitNum(col(visitCol)) + 1)
      .filter(col("__vn") <= cap)
      .withColumn(visitCol, concat(lit("V"), col("__vn")))
      .drop("__vn")
}
