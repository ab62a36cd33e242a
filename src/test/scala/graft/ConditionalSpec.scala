package graft

import org.apache.spark.sql.functions._
import graft.core.Conditional._

class ConditionalSpec extends SparkSpec {

  private def d = df("SELECT 1 AS a, 'x' AS b")

  test("whenHasColumn applies only when present") {
    assert(whenHasColumn(d, "a")(_.withColumn("a", col("a") + 1)).head().getInt(0) == 2)
    assert(rows(whenHasColumn(d, "zz")(_.limit(0))) == rows(d))
  }

  test("whenHasColumns requires all") {
    assert(whenHasColumns(d, Seq("a", "b"))(_.drop("b")).columns.toSeq == Seq("a"))
    assert(whenHasColumns(d, Seq("a", "zz"))(_.drop("b")).columns.toSeq == Seq("a", "b"))
  }

  test("mapPresentColumns transforms the present subset") {
    val out = mapPresentColumns(d, Seq("b", "zz"))(c => upper(c))
    assert(out.head().getString(1) == "X")
  }

  test("selectPresent keeps order and drops absent") {
    assert(selectPresent(d, Seq("b", "zz", "a")).columns.toSeq == Seq("b", "a"))
  }

  test("ensureColumn adds typed null only when absent") {
    val out = ensureColumn(d, "c", "double")
    assert(out.schema("c").dataType.typeName == "double")
    assert(out.head().isNullAt(2))
    assert(ensureColumn(d, "a", "double").schema("a").dataType.typeName == "integer")
  }

  // ---- r18: the reference-width status/reason decision table --------------

  test("r18: every reason branch, every disjunct multiple, both drug outcomes fire") {
    val out = SparkEntry.queries("r18_status_reason_full")(
      spark, "/root/testdata/sf0.001").persist()
    val reasons = out.groupBy("safety_reason").count()
      .collect().map(r => Option(r.getString(0)).getOrElse("<null>") -> r.getLong(1)).toMap
    // all 30 reference reasons present (plus the NULL default)
    val expected = Set("died", "migrated", "not resident", "under weight",
      "study drug", "concom meds", "severe illness", "baby under 1 week",
      "pregnancy test refusal", "pregnant", "other trials", "visited loa loa",
      "spent night at the hospital", "not agree to safety procedures",
      "participant withdrew informed consent (refuse drug)",
      "not wish to continue", "Ineligible at obvious reasoning",
      "A baby that cannot walk yet", "no witness", "absent",
      "a person who does not want to participate",
      "does not speak English or Swahili",
      "not consented or provided their thumbprint",
      "not agree or sign informed consent", "minor not sign assent",
      "completion", "in", "previously eos", "previously refusal",
      "previously out", "<null>")
    assert(reasons.keySet == expected,
      s"missing: ${expected.diff(reasons.keySet)}; extra: ${reasons.keySet.diff(expected)}")
    // per-disjunct coverage shows as slot multiples: 1500 keys / 67 slots
    // = 22-23 rows per slot, so a 10-disjunct reason counts ~10x a
    // 1-disjunct one
    assert(reasons("pregnancy test refusal") > 9 * reasons("study drug") / 2)
    val drugs = out.groupBy("took_drug").count()
      .collect().map(r => Option(r.getString(0)).getOrElse("<null>") -> r.getLong(1)).toMap
    assert(drugs.keySet == Set("yes", "no", "<null>"))
    // the UNDEFINED slot is filtered: 67 slots minus 1
    assert(out.select("extid").distinct().count() ==
      out.count(), "extid must stay unique")
    out.unpersist()
  }

  test("r18: first-match-wins and NULL fall-through pin on constructed rows") {
    // slot 0 -> died; slot 2 -> the COMPOUND migrated disjunct; a row
    // whose flags are all NULL falls through 63 conditions to NULL
    val out = SparkEntry.queries("r18_status_reason_full")(
      spark, "/root/testdata/sf0.001")
    val bySel = out.withColumn("sel", col("extid") % 67)
      .groupBy("sel").agg(first("safety_reason").as("r"), first("took_drug").as("d"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(bySel(0L)._1 == "died")
    assert(bySel(2L)._1 == "migrated")   // person_migrated AND starting='in'
    assert(bySel(35L)._1 == "spent night at the hospital")
    assert(bySel(56L)._1 == "previously out") // out_v4 disjunct
    assert(bySel(64L)._1 == null && bySel(64L)._2 == null) // full fall-through
    assert(bySel(61L)._2 == "no")  // take_drug='no' AND take_drug_2 IS NULL
    assert(bySel(57L)._2 == "yes") // 'no' then 'yes' re-dose
    assert(!bySel.contains(63L))   // UNDEFINED filtered out
  }

  test("r18: the 63-condition projection plans no exchange and stays codegen") {
    val plan = SparkEntry.queries("r18_status_reason_full")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "decision table must be a pure projection")
    assert(!plan.contains("CodegenFallback"), "CaseWhen fell out of codegen")
  }
}
