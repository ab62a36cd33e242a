package graft

import org.apache.spark.sql.functions._
import graft.plans.LcsTokens

/** Pins the LcsTokens codegen kernel: textbook values, the LCS laws,
  * equality with a HOF formulation (the executable semantic spec — the
  * assignMatHof precedent), and SQL registration. */
class LcsSpec extends SparkSpec {

  private def lcsOf(a: Seq[String], b: Seq[String]): Long = {
    val d = spark.createDataFrame(Seq((a, b))).toDF("a", "b")
    d.select(LcsTokens(col("a"), col("b")).as("l")).head().getLong(0)
  }

  test("textbook values and LCS laws") {
    assert(lcsOf(Seq("a", "b", "c", "d"), Seq("a", "b", "c", "d")) == 4)
    assert(lcsOf(Seq("a", "b", "c"), Seq("x", "y")) == 0)
    assert(lcsOf(Seq.empty, Seq("a")) == 0)
    // classic: ABCBDAB vs BDCABA -> 4 (BCBA / BDAB)
    assert(lcsOf("abcbdab".map(_.toString), "bdcaba".map(_.toString)) == 4)
    // subsequence, not substring: gaps allowed, order required
    assert(lcsOf(Seq("the", "cat", "sat"), Seq("the", "dog", "sat")) == 2)
    assert(lcsOf(Seq("a", "b"), Seq("b", "a")) == 1)
    // symmetry (the kernel swaps internally for the short-side row)
    assert(lcsOf(Seq("a", "x", "b", "y", "c"), Seq("a", "b")) ==
      lcsOf(Seq("a", "b"), Seq("a", "x", "b", "y", "c")))
  }

  test("kernel equals the HOF executable spec on real corpus pairs") {
    // the same nested-fold DP the DuckDB oracle runs, in Spark HOFs —
    // O(len) array copy per cell, so it is the spec, not the shipped path
    val hof = expr("""
      element_at(aggregate(a, transform(sequence(0, size(b)), z -> 0L),
        (prev, t) -> aggregate(sequence(1, size(b)), array(0L),
          (acc, j) -> concat(acc, array(greatest(
            element_at(prev, j + 1),
            element_at(acc, -1),
            element_at(prev, j)
              + if(t = element_at(b, j), 1L, 0L)))))),
        size(b) + 1)""")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
    val pairs = docs.select(col("doc_id"), col("tok").as("a"))
      .join(docs.select((col("doc_id") - 7).as("doc_id"), col("tok").as("b")),
        "doc_id")
    val diff = pairs
      .select(LcsTokens(col("a"), col("b")).as("k"), hof.as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(diff == 0, s"$diff corpus pairs disagree with the HOF spec")
  }

  test("null tokens match nothing; SQL registration works") {
    val d = df("""SELECT array('a', CAST(NULL AS STRING), 'b') AS a,
                 |       array('a', CAST(NULL AS STRING), 'b') AS b""".stripMargin)
    assert(d.select(LcsTokens(col("a"), col("b"))).head().getLong(0) == 2)
    val viaSql = spark.sql(
      "SELECT lcs_tokens(array('x','a','b'), array('a','b','y')) AS l")
    assert(viaSql.head().getLong(0) == 2)
    // analysis-time type error, not a runtime janino failure
    val e = intercept[Exception] {
      spark.sql("SELECT lcs_tokens(1, 2)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("lcs_tokens"))
  }
}
