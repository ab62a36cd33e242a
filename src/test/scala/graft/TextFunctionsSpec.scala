package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Edge cases the synthetic corpus never produces: empty and single-token
  * texts, sub-n-gram documents, punctuation-free ratio denominators.
  */
class TextFunctionsSpec extends SparkSpec {

  private def one(expr: org.apache.spark.sql.Column, text: String) =
    spark.sql(s"SELECT '${text}' AS t").select(expr).head()

  test("tokenCount: single token and multi token") {
    assert(one(tokenCount(col("t")), "hello").getInt(0) == 1)
    assert(one(tokenCount(col("t")), "a b c").getInt(0) == 3)
  }

  test("regexTokenCount counts words and symbols separately") {
    val d = df("SELECT 'ab, cd! 12' AS t")
      .select(regexTokenCount(col("t")).as("n")).head()
    assert(d.getInt(0) == 5) // ab , cd ! 12
  }

  test("shingles: fewer tokens than n yields empty, exactly n yields one") {
    assert(one(shingles(col("t"), 3), "a b").getSeq[String](0).isEmpty)
    assert(one(shingles(col("t"), 2), "a b").getSeq[String](0) == Seq("a b"))
    // duplicates collapse
    assert(one(shingles(col("t"), 2), "x y x y x").getSeq[String](0).sorted ==
      Seq("x y", "y x"))
  }

  test("fingerprint: stable, order-sensitive, single-token defined") {
    val f1 = one(fingerprint(col("t")), "a b c").getLong(0)
    val f2 = one(fingerprint(col("t")), "a b c").getLong(0)
    val f3 = one(fingerprint(col("t")), "c b a").getLong(0)
    assert(f1 == f2)
    assert(f1 != f3, "rolling hash must be order-sensitive")
    assert(one(fingerprint(col("t")), "solo").getLong(0) >= 0)
  }

  test("stopwordRatio and meanWordLen on boundary inputs") {
    val r = one(stopwordRatio(col("t"), Seq("the")), "the").getDouble(0)
    assert(r == 1.0)
    assert(one(meanWordLen(col("t")), "ab cdef").getDouble(0) == 3.0)
  }

  test("langId tie breaks to the first language in marker order") {
    val markers = Seq("en" -> Seq("the"), "es" -> Seq("el"))
    // no markers at all → all scores 0 → first language wins
    assert(one(langId(col("t"), markers), "xyz abc").getString(0) == "en")
    assert(one(langId(col("t"), markers), "el gato").getString(0) == "es")
  }

  test("punctRatio zero when no punctuation") {
    assert(one(punctRatio(col("t")), "abc def").getDouble(0) == 0.0)
  }
}
