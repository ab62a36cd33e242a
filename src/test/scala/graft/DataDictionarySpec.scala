package graft

import org.apache.spark.sql.functions._
import graft.operators.DataDictionary

/** Pins the XLSForm → dictionary semantics against generate.R:19-56:
  * list_name extraction for both select kinds, option concatenation in
  * SHEET order (not alphabetical), structural-row filters, first-word
  * type, and the null edges (choice rows missing list/name excluded,
  * select with an empty list → null choices).
  */
class DataDictionarySpec extends SparkSpec {

  private def survey = df(
    """SELECT * FROM VALUES
      |  (1, 'begin group', 'g1', 'Group one'),
      |  (2, 'text', 'q_name', 'Your name'),
      |  (3, 'select_one yn', 'q_consent', 'Consent?'),
      |  (4, 'note', 'n1', 'Read this aloud'),
      |  (5, 'select_multiple symptoms', 'q_sym', 'Symptoms'),
      |  (6, 'calculate', 'c1', 'hidden calc'),
      |  (7, 'begin repeat', 'r1', 'Household members'),
      |  (8, 'integer', 'q_age', 'Age in years'),
      |  (9, 'end repeat', 'r1e', NULL),
      |  (10, 'end group', 'g1e', NULL),
      |  (11, 'select_one emptylist', 'q_empty', 'No options exist'),
      |  (12, 'date', 'q_dob', 'Date of birth')
      |AS t(ord, type, name, label)""".stripMargin)

  private def choices = df(
    """SELECT * FROM VALUES
      |  (1, 'yn', 'yes', 'Yes'),
      |  (2, 'yn', 'no', 'No'),
      |  (3, 'symptoms', 'fever', 'Fever'),
      |  (4, NULL, 'orphan', 'no list'),
      |  (5, 'symptoms', NULL, 'no name'),
      |  (6, 'symptoms', 'aches', 'Aches'),
      |  (7, 'unreferenced', 'x', 'X')
      |AS t(ord, list_name, name, label)""".stripMargin)

  test("dictionary matches the reference chain end to end") {
    val out = DataDictionary.build(survey, choices)
    assert(out.columns.toSeq == Seq("type", "variable", "question", "choices"))
    val m = out.collect().map(r => r.getString(1) ->
      (r.getString(0), r.getString(2), r.getString(3))).toMap
    // structural rows dropped
    assert(!m.contains("g1") && !m.contains("g1e") && !m.contains("n1") &&
      !m.contains("c1") && !m.contains("r1") && !m.contains("r1e"))
    // select_one: first-word type, options joined in sheet order
    assert(m("q_consent") == ("select_one", "Consent?", "yes; no"))
    // select_multiple: null-list and null-name choice rows excluded,
    // order is sheet order (fever before aches) not alphabetical
    assert(m("q_sym") == ("select_multiple", "Symptoms", "fever; aches"))
    // select against a list with no options → null choices
    assert(m("q_empty") == ("select_one", "No options exist", null))
    // non-select rows keep their type and get null choices
    assert(m("q_age") == ("integer", "Age in years", null))
    assert(m("q_dob") == ("date", "Date of birth", null))
    assert(m("q_name") == ("text", "Your name", null))
    assert(m.size == 6)
  }

  test("options join is a broadcast (bounded human-authored sheet)") {
    val plan = DataDictionary.build(survey, choices)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan)
  }
}
