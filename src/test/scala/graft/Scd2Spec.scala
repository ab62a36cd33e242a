package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd2

/** SCD2 merge contracts: unchanged/changed/new/no-op-resend branches,
  * null-safe attribute comparison, two-version output for changed keys,
  * and the single-join plan shape.
  */
class Scd2Spec extends SparkSpec {

  private def cur = df(
    """SELECT * FROM VALUES
      |  (1, 'a', 10, DATE '2025-01-01', CAST(NULL AS DATE)),
      |  (2, 'b', 20, DATE '2025-01-01', CAST(NULL AS DATE)),
      |  (3, 'c', CAST(NULL AS INT), DATE '2025-01-01', CAST(NULL AS DATE)),
      |  (4, 'd', 40, DATE '2025-01-01', CAST(NULL AS DATE))
      |AS t(k, seg, sz, valid_from, valid_to)""".stripMargin)

  private def inc = df(
    """SELECT * FROM VALUES
      |  (2, 'B', 20),                 -- changed attr
      |  (3, 'c', CAST(NULL AS INT)),  -- resend with same (null) attrs: no-op
      |  (4, 'd', 41),                 -- second attr changed
      |  (5, 'e', 50)                  -- new key
      |AS t(k, seg, sz)""".stripMargin)

  private def merged = Scd2.merge(cur, inc, Seq("k"), Seq("seg", "sz"),
    lit("2025-06-01"))

  test("branch semantics: keep, close+reopen, no-op resend, insert") {
    val got = rows(merged.select(col("k"), col("seg"), col("sz"),
      col("valid_from").cast("string"), col("valid_to").cast("string")))
    val expect = Set(
      Seq[Any](1, "a", 10, "2025-01-01", null),              // untouched
      Seq[Any](2, "b", 20, "2025-01-01", "2025-06-01"),      // closed
      Seq[Any](2, "B", 20, "2025-06-01", null),              // reopened
      Seq[Any](3, "c", null, "2025-01-01", null),            // null attrs equal
      Seq[Any](4, "d", 40, "2025-01-01", "2025-06-01"),
      Seq[Any](4, "d", 41, "2025-06-01", null),
      Seq[Any](5, "e", 50, "2025-06-01", null))              // new key
    assert(got == expect)
  }

  test("exactly one open row per key after the merge") {
    val open = merged.filter(col("valid_to").isNull)
      .groupBy("k").count().filter(col("count") =!= 1).count()
    assert(open == 0)
  }

  test("idempotent re-apply: merging the same batch again is a no-op") {
    val again = Scd2.merge(
      merged.filter(col("valid_to").isNull), inc, Seq("k"),
      Seq("seg", "sz"), lit("2025-06-01"))
    assert(rows(again) == rows(merged.filter(col("valid_to").isNull)))
  }

  test("plan has a single join (changed keys fan out via explode, not union)") {
    val plan = merged.queryExecution.optimizedPlan.toString
    assert("Join".r.findAllIn(plan).size == 1, plan)
  }

  test("assertUniqueKeys fails loud on a duplicate-key batch, passes a clean one") {
    val dup = inc.union(df("SELECT 2 AS k, 'Z' AS seg, 99 AS sz"))
    val ex = intercept[Exception] {
      Scd2.merge(cur, dup, Seq("k"), Seq("seg", "sz"), lit("2025-06-01"),
        assertUniqueKeys = true).collect()
    }
    assert(ex.getMessage.contains("duplicate incoming key"), ex.getMessage)
    // clean batch: enforcement on must produce the unchanged result
    val checked = Scd2.merge(cur, inc, Seq("k"), Seq("seg", "sz"),
      lit("2025-06-01"), assertUniqueKeys = true)
    assert(rows(checked) == rows(merged))
  }
}
