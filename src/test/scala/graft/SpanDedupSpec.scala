package graft

import org.apache.spark.sql.functions._
import graft.operators.SpanDedup

/** Fixture-level pins for the C4-style duplicate-span removal (t42).
  * Units of w=2 tokens, spans of 3 units = 6 tokens, so fixtures stay
  * readable. */
class SpanDedupSpec extends SparkSpec {

  private def docs(rows: (Int, String)*) =
    spark.createDataFrame(rows.map { case (i, t) => (i.toLong, t) })
      .toDF("doc_id", "text")

  test("cross-doc duplicate span: first doc keeps, later doc loses it") {
    // S = "a b c d e f" (3 units of 2). doc 2 = S + "x y".
    val out = SpanDedup.rewrite(
      docs(1 -> "a b c d e f", 2 -> "a b c d e f x y"), w = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("a b c d e f", 0L))
    assert(out(2L) == ("x y", 3L))
  }

  test("docs shorter than one span are untouched") {
    val out = SpanDedup.rewrite(
      docs(1 -> "a b c d", 2 -> "a b c d"), w = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // 2 units each -> no 3-unit span exists -> both pass through
    assert(out(1L) == ("a b c d", 0L))
    assert(out(2L) == ("a b c d", 0L))
  }

  test("within-doc repetition is cut after the first occurrence") {
    // doc = S S (12 tokens, 6 units): span at u=0 equals span at u=3
    val out = SpanDedup.rewrite(docs(7 -> "a b c d e f a b c d e f"), w = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(7L)._2 >= 3L, s"expected at least one span cut: ${out(7L)}")
    assert(out(7L)._1.startsWith("a b c d e f"), out(7L)._1)
    assert(out(7L)._1.length < "a b c d e f a b c d e f".length)
  }

  test("a doc that is one duplicated span collapses to empty text") {
    val out = SpanDedup.rewrite(
      docs(1 -> "a b c d e f", 2 -> "a b c d e f"), w = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("a b c d e f", 0L))
    assert(out(2L) == ("", 3L))
  }

  test("unit boundary, not substring, defines a span (offset copy survives)") {
    // doc 2 holds the same 6 TOKENS but shifted one token, so its unit
    // decomposition differs and no span key matches doc 1's
    val out = SpanDedup.rewrite(
      docs(1 -> "a b c d e f", 2 -> "z a b c d e f w"), w = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(2L) == ("z a b c d e f w", 0L))
  }

  test("registry row runs on the real corpus and removes something") {
    val out = SparkEntry.queries("t42_span_dedup_rewrite")(
      spark, "/root/testdata/sf0.001")
    val removed = out.agg(sum("n_removed")).collect()(0).getLong(0)
    val n = out.count()
    assert(n == graft.core.Tables.documents(spark, "/root/testdata/sf0.001").count(),
      "rewrite must return every doc exactly once")
    assert(removed > 0, "synthetic corpus has repeated spans; none were cut")
  }
}
