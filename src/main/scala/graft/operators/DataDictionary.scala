package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** XLSForm survey + choices → human-readable data dictionary.
  *
  * Re-expresses the reference's dictionary generator
  * (pipeline-data-dict/R/generate.R:19-56): the survey sheet's
  * `select_one <list>` / `select_multiple <list>` types are resolved
  * against the choices sheet, each list's option names concatenated
  * '; '-separated IN SHEET ORDER (the reference's paste0(collapse)
  * preserves row order); structural rows (groups, repeats, notes,
  * calculates) are dropped; and the type keeps only its first word.
  *
  * Scale posture: an XLSForm is a human-authored artifact — a choices
  * sheet is at most a few thousand rows — so the resolved options table
  * is always broadcast; the survey side streams. At fleet scale
  * (thousands of forms) both sheets carry a form_id and the same plan
  * holds with form_id prepended to the keys.
  */
object DataDictionary {

  /** Build the dictionary.
    *
    * @param survey  columns (ord, type, name, label) — ord is the sheet
    *                row position (any monotone unique key)
    * @param choices columns (ord, list_name, name, label)
    * @return columns (type, variable, question, choices) — choices null
    *         for non-select rows and for lists with no options
    */
  def build(survey: DataFrame, choices: DataFrame): DataFrame = {
    // choices rows missing a list or a name are sheet noise (generate.R
    // filters both); options concatenate in sheet order via a sorted
    // (ord, name) struct list — array_sort on structs orders by the
    // leading field, and ord is unique, so the order is total
    val opts = choices
      .filter(col("list_name").isNotNull && col("name").isNotNull)
      .groupBy("list_name")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("ord"), col("name")))),
          x => x.getField("name")),
        "; ").as("choices"))
    val withList = survey.withColumn("list_name",
      when(col("type").contains("select"),
        regexp_replace(col("type"), "select_one |select_multiple ", "")))
    withList
      .join(broadcast(opts), Seq("list_name"), "left")
      // structural rows out: groups, notes, calculates, repeats
      // (null-type rows drop here too — contains(null) is null = filtered,
      // matching R's NA-dropping filter semantics)
      .filter(!col("type").contains("group") &&
        col("type") =!= "note" && col("type") =!= "calculate" &&
        !col("type").contains("repeat"))
      .select(split(col("type"), " ").getItem(0).as("type"),
        col("name").as("variable"),
        col("label").as("question"),
        col("choices"))
  }
}
