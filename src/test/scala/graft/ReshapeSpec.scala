package graft

import org.apache.spark.sql.functions._
import graft.operators.Reshape

class ReshapeSpec extends SparkSpec {

  test("pivotWide turns long visits into wide columns") {
    val d = df(
      """SELECT * FROM VALUES
        |  ('p1', 'V1', 'in'), ('p1', 'V2', 'out'), ('p2', 'V1', 'in')
        |  t(extid, visit, status)""".stripMargin)
    val out = Reshape.pivotWide(d, Seq("extid"), "visit", Seq("V1", "V2"), max(col("status")))
    assert(rows(out) == Set(Seq("p1", "in", "out"), Seq("p2", "in", null)))
  }

  test("unpivot melts metric columns to rows") {
    val d = df("SELECT 'h1' AS id, 1 AS alb, 2 AS ivm")
    val out = Reshape.unpivot(d, Seq("id"), Seq("alb", "ivm"))
    assert(rows(out) == Set(Seq("h1", "alb", 1), Seq("h1", "ivm", 2)))
  }

  test("separate splits a delimited column") {
    val d = df("SELECT 'stock_add' AS v")
    val out = Reshape.separate(d, "v", "_", Seq("prefix", "action"))
    assert(rows(out.select("prefix", "action")) == Set(Seq("stock", "add")))
  }

  test("explodeByCount repeats rows and numbers copies") {
    val d = df("SELECT 'm1' AS id, 3 AS num_samp")
    val out = Reshape.explodeByCount(d, col("num_samp"))
    assert(rows(out.select("id", "idx")) == Set(Seq("m1", 1), Seq("m1", 2), Seq("m1", 3)))
  }

  test("unionAligned fills missing columns with null (bind_rows)") {
    val a = df("SELECT 1 AS x, 'p' AS y")
    val b = df("SELECT 2 AS x, true AS z")
    val out = Reshape.unionAligned(Seq(a, b))
    assert(out.columns.toSet == Set("x", "y", "z"))
    assert(rows(out) == Set(Seq(1, "p", null), Seq(2, null, true)))
  }

  test("unionAllString casts everything to string and blanks nulls") {
    val a = df("SELECT 1 AS x, 'p' AS y")
    val b = df("SELECT 2 AS x, true AS z")
    val out = Reshape.unionAllString(Seq(a, b))
    assert(rows(out) == Set(Seq("1", "p", ""), Seq("2", "", "true")))
  }
}
