package graft

import org.apache.spark.sql.functions._

/** SURVEY §7.4.3: R NA vs Spark null is the biggest silent-divergence
  * risk. These tests pin the exact three-valued-logic behaviors the
  * engine relies on, so a Spark upgrade or refactor that shifts them
  * fails loudly.
  */
class NullSemanticsSpec extends SparkSpec {

  private def d = df(
    """SELECT * FROM VALUES
      |  (1, CAST(10 AS INT), 'a'),
      |  (2, CAST(NULL AS INT), 'b'),
      |  (3, CAST(3 AS INT), CAST(NULL AS STRING))
      |  t(id, v, s)""".stripMargin)

  test("filter on a null comparison drops the row (like R filter on NA)") {
    assert(rows(d.filter(col("v") > 5).select("id")) == Set(Seq(1)))
    assert(rows(d.filter(!(col("v") > 5)).select("id")) == Set(Seq(3)),
      "negated null comparison still drops the null row")
  }

  test("when-chain: null condition falls through to the next branch / otherwise") {
    val out = d.select(col("id"),
      when(col("v") > 5, "big").when(col("v") <= 5, "small").otherwise("unknown").as("c"))
    assert(rows(out) == Set(Seq(1, "big"), Seq(2, "unknown"), Seq(3, "small")))
  }

  test("aggregates skip nulls; count(*) does not; countDistinct skips") {
    val r = d.agg(sum("v"), count(col("v")), count(lit(1)), avg("v"),
      countDistinct(col("s"))).head()
    assert(r.getLong(0) == 13L)
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 3L)
    assert(r.getDouble(3) == 6.5)
    assert(r.getLong(4) == 2L)
  }

  test("groupBy treats null as a real key (one group)") {
    val g = d.groupBy("s").count()
    assert(g.count() == 3)
    assert(g.filter(col("s").isNull).head().getLong(1) == 1L)
  }

  test("concat_ws skips nulls, concat propagates them") {
    val r = d.filter(col("id") === 3)
      .select(concat_ws("-", col("s"), lit("x")), concat(col("s"), lit("x"))).head()
    assert(r.getString(0) == "x")
    assert(r.isNullAt(1))
  }

  test("null-safe equality <=> vs ===") {
    val r = d.select((col("s") === lit(null).cast("string")).as("eq"),
      (col("s") <=> lit(null).cast("string")).as("nse")).collect()
      .map(x => (if (x.isNullAt(0)) null else x.getBoolean(0), x.getBoolean(1)))
    assert(r.toSet == Set((null, false), (null, false), (null, true)))
  }

  test("na.drop subset and na.fill behave per-column") {
    assert(d.na.drop(Seq("v")).count() == 2)
    assert(d.na.drop("all").count() == 3)
    val filled = d.na.fill(Map("v" -> -1, "s" -> ""))
    assert(rows(filled) == Set(Seq(1, 10, "a"), Seq(2, -1, "b"), Seq(3, 3, "")))
  }

  test("isin never matches null (three-valued logic)") {
    assert(d.filter(col("s").isin("a", "b")).count() == 2)
    assert(d.filter(!col("s").isin("a", "b")).count() == 0,
      "negated isin drops the null row too")
  }
}
