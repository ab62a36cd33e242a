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
}
